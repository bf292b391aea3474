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


def test_lazy_registration_survives_failed_import():
    """A failed lazy import must not erase the registration: the next lookup
    should retry (and re-raise the real error), not a misleading KeyError."""
    from waveformml_tpu.registry import Registry

    r = Registry()
    r.register_lazy("Ghost", "no_such_module_xyz:Ghost")
    with pytest.raises(ModuleNotFoundError):
        r.retrieve_class("Ghost")
    # second attempt: SAME root-cause error, not "no registered class"
    with pytest.raises(ModuleNotFoundError):
        r.retrieve_class("Ghost")


def test_cross_entropy_class_weights():
    """criterion_params class weights must be honored (torch semantics:
    weighted mean divides by the sum of selected weights), and unsupported
    params must raise instead of being silently dropped."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from waveformml_tpu.nn.functional import CrossEntropyLoss

    logits = np.array([[2.0, 0.5, -1.0], [0.1, 1.5, 0.3], [0.0, 0.2, 2.2]],
                      dtype=np.float32)
    target = np.array([0, 2, 1])
    w = [1.0, 5.0, 0.5]
    ours = CrossEntropyLoss(w)(jnp.asarray(logits), jnp.asarray(target))
    theirs = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(target))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)

    unweighted = CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(target))
    ref_unweighted = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                                 torch.tensor(target))
    np.testing.assert_allclose(float(unweighted), float(ref_unweighted),
                               rtol=1e-6)

    with pytest.raises(ValueError, match="unsupported"):
        from waveformml_tpu.nn.functional import MSELoss
        MSELoss([1.0, 2.0])


def test_softmax_dim_translation_matches_torch():
    """nn.Softmax(dim) configs use torch's channels-first axis numbering;
    on our channels-last tensors the axis must be translated."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from waveformml_tpu.nn.layers import LayerNorm, Softmax

    x_t = torch.randn(2, 3, 5)          # [B, C, L] torch layout
    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 1)))  # [B, L, C]
    for dim in (1, 2, -1, 0):
        ours = Softmax(dim=dim).apply({}, x_j)
        theirs = torch.nn.Softmax(dim=dim)(x_t).numpy()
        np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 2, 1)),
                                   theirs, rtol=1e-5, atol=1e-6)

    # LayerNorm over the trailing TWO axes (torch normalized_shape=[L, C]
    # on our layout): statistics span both axes, params match their shape
    import jax

    ln = LayerNorm(normalized_shape=[5, 3])
    vs = ln.init(jax.random.PRNGKey(0), x_j)
    out = ln.apply(vs, x_j)
    theirs_ln = torch.nn.LayerNorm([3, 5])(x_t).detach().numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1)),
                               theirs_ln, rtol=1e-4, atol=1e-5)


def test_layernorm_partial_trailing_axes_match_torch():
    """torch normalized_shape names trailing axes of the CHANNELS-FIRST
    activation: LayerNorm(L) on [B, C, L] normalizes samples. On our
    channels-last [B, L, C] that is axis -2, NOT the trailing channel axis
    — and LayerNorm([H, W]) on 4D is (-3, -2), not (W, C)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from waveformml_tpu.nn.layers import LayerNorm

    torch.manual_seed(0)
    x_t = torch.randn(2, 3, 5)                                # [B, C, L]
    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 1)))   # [B, L, C]
    ln = LayerNorm(normalized_shape=5)
    vs = ln.init(jax.random.PRNGKey(0), x_j)
    ours = ln.apply(vs, x_j)
    theirs = torch.nn.LayerNorm(5)(x_t).detach().numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 2, 1)),
                               theirs, rtol=1e-4, atol=1e-5)

    x4_t = torch.randn(2, 3, 4, 6)                              # [B, C, H, W]
    x4_j = jnp.asarray(np.transpose(x4_t.numpy(), (0, 2, 3, 1)))  # [B,H,W,C]
    ln2 = LayerNorm(normalized_shape=[4, 6])
    vs2 = ln2.init(jax.random.PRNGKey(0), x4_j)
    ours2 = ln2.apply(vs2, x4_j)
    theirs2 = torch.nn.LayerNorm([4, 6])(x4_t).detach().numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours2), (0, 3, 1, 2)), theirs2,
        rtol=1e-4, atol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    """CrossEntropyLoss/NLLLoss with per-class weights: torch's 'mean'
    reduction divides by the SUM OF WEIGHTS of the targets, not the count —
    and the masked path must keep that convention."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from waveformml_tpu.nn.functional import CrossEntropyLoss, NLLLoss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(12, 3)).astype(np.float32)
    targets = rng.integers(0, 3, 12)
    w = np.array([0.2, 1.0, 3.5], np.float32)

    t_ce = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(targets))
    ours = CrossEntropyLoss(w.tolist())(jnp.asarray(logits),
                                        jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), float(t_ce), rtol=1e-5)

    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    t_nll = torch.nn.NLLLoss(weight=torch.from_numpy(w))(
        logp, torch.from_numpy(targets))
    ours_nll = NLLLoss(w.tolist())(jnp.asarray(np.asarray(logp)),
                                   jnp.asarray(targets))
    np.testing.assert_allclose(float(ours_nll), float(t_nll), rtol=1e-5)

    # masked path: padding rows excluded from BOTH numerator and Σw
    mask = np.ones(12, bool)
    mask[8:] = False
    t_sub = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits[:8]), torch.from_numpy(targets[:8]))
    ours_masked = CrossEntropyLoss(w.tolist())(
        jnp.asarray(logits), jnp.asarray(targets), where=jnp.asarray(mask))
    np.testing.assert_allclose(float(ours_masked), float(t_sub), rtol=1e-5)
