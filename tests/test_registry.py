import pytest

from waveformml_tpu.registry import Registry


class Foo:
    def __init__(self, a=0, b=0):
        self.a, self.b = a, b


def test_exact_and_suffix_lookup():
    r = Registry()
    r.register("models.Foo", Foo)
    assert r.retrieve_class("models.Foo") is Foo
    assert r.retrieve_class("Foo") is Foo
    assert r.retrieve_class("src.models.Foo") is Foo


def test_aliases():
    r = Registry()
    r.register("Foo", Foo, aliases=("nn.Foo", "torch.nn.Foo"))
    assert r.retrieve_class("nn.Foo") is Foo
    assert r.retrieve_class("torch.nn.Foo") is Foo


def test_unknown_raises():
    r = Registry()
    with pytest.raises(KeyError):
        r.retrieve_class("Nope")


def test_algorithm_dsl():
    r = Registry()
    r.register("Foo", Foo)
    out = r.create_class_instances(["Foo", [1, 2], "Foo", "Foo", {"a": 5}])
    assert len(out) == 3
    assert (out[0].a, out[0].b) == (1, 2)
    assert (out[1].a, out[1].b) == (0, 0)  # bare class, no args
    assert out[2].a == 5


def test_lazy_registration():
    r = Registry()
    r.register_lazy("OrderedDict", "collections:OrderedDict")
    import collections
    assert r.retrieve_class("OrderedDict") is collections.OrderedDict
