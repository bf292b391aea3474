import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.config import Config
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

N_SAMPLES = 8


def _batch(rng, n_events=3, n_feat=2 * N_SAMPLES, n_pad=32):
    rows = []
    for e in range(n_events):
        sites = rng.choice(NX * NY, size=rng.integers(1, 4), replace=False)
        for s in sites:
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.normal(size=(coords.shape[0], n_feat)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, n_pad)
    return SparseBatch(jnp.array(c), jnp.array(f), jnp.array(m), n_events)


def _base_config(**net):
    return Config({
        "system_config": {"n_samples": N_SAMPLES, "n_type": 3, "model_name": "m",
                          "model_base_path": "/tmp/m"},
        "net_config": net,
    })


def test_dense_conv_net(rng):
    from waveformml_tpu.models.nets import DenseConvNet
    cfg = _base_config(hparams={"n_conv": 2, "n_lin": 2, "out_planes": 4,
                                "conv_params": {"size_factor": 3, "pad_factor": 1.0}})
    model = DenseConvNet(cfg)
    b = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b)
    assert out.shape == (3, 3)


def test_spconvnet_hparams(rng):
    from waveformml_tpu.models.nets import SPConvNet
    cfg = _base_config(hparams={"n_dil": 0, "n_conv": 2, "n_lin": 2, "out_planes": 4,
                                "conv_params": {"size_factor": 3, "pad_factor": 1.0,
                                                "version": 3}})
    model = SPConvNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)


def test_spconvnet_with_tcn(rng):
    from waveformml_tpu.models.nets import SPConvNet
    cfg = _base_config(hparams={"n_dil": 2, "n_conv": 2, "n_lin": 1, "out_planes": 4,
                                "wf_params": {"kernel_size": 3, "dropout": 0.0},
                                "conv_params": {"size_factor": 3, "pad_factor": 1.0,
                                                "version": 3}})
    model = SPConvNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)


def test_spconv_preserve_net(rng):
    from waveformml_tpu.models.nets import SPConvPreserveNet
    cfg = _base_config(hparams={"n_conv": 3,
                                "conv_params": {"pointwise_factor": 0, "pad_factor": 1.0,
                                                "size_factor": 3, "stride_factor": 1.2,
                                                "n_expansion": 1, "expansion_factor": 1.2,
                                                "version": 1, "n_contraction": 2}})
    model = SPConvPreserveNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    # per-site rows [N, ntype]; padding rows zero
    assert out.shape == (b.n_rows, 3)
    assert np.abs(np.asarray(out)[~np.asarray(b.mask)]).max() == 0


def test_scnet_algorithm_dsl(rng):
    from waveformml_tpu.models.nets import SCNet
    s2 = 2 * N_SAMPLES
    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "spconv.SubMConv2d", [s2, 8, 3, 1, 1, 1],
            "nn.BatchNorm1d", [8],
            "nn.ReLU",
            "spconv.ToDense",
            "nn.Linear", [8 * NX * NY, 16],
            "nn.ReLU",
            "nn.Linear", [16, 3],
        ])
    model = SCNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)


def test_single_ended_z_conv(rng):
    from waveformml_tpu.models.nets import SingleEndedZConv
    cfg = _base_config(net_type="2DConvolution", algorithm="conv",
                       hparams={"conv": {"kernel_size": 3, "n_layers": 2},
                                "point": {"pointwise_layers": 1}})
    model = SingleEndedZConv(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 1, NX, NY)  # dense [B, 1, NX, NY]


def test_single_ended_ez_conv(rng):
    from waveformml_tpu.models.nets import SingleEndedEZConv
    cfg = _base_config(net_type="2DConvolution", algorithm="conv",
                       hparams={"kernel_size": 3, "n_conv": 1, "n_point": 2,
                                "conv_position": 1, "version": 1})
    model = SingleEndedEZConv(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 2, NX, NY)


def test_temporal_waveform_net(rng):
    from waveformml_tpu.models.waveform_models import TemporalWaveformNet
    cfg = _base_config(net_type="TemporalConvolution",
                       hparams={"n_expand": 2, "n_contract": 2, "expansion_factor": 4,
                                "out_planes": 1, "n_lin": 2,
                                "conv_params": {"kernel_size": 3, "dropout": 0.0}})
    model = TemporalWaveformNet(cfg)
    x = jnp.array(rng.normal(size=(5, N_SAMPLES)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (5, 1)


def test_linear_waveform_net(rng):
    from waveformml_tpu.models.waveform_models import LinearWaveformNet
    cfg = _base_config(hparams={"n_lin": 3})
    model = LinearWaveformNet(cfg)
    x = jnp.array(rng.normal(size=(5, N_SAMPLES)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (5, 1)


def test_recurrent_waveform_net(rng):
    from waveformml_tpu.models.waveform_models import RecurrentWaveformNet
    cfg = _base_config(net_type="RNN",
                       hparams={"n_hidden": 6, "n_layers": 1, "n_lin": 1,
                                "out_size": 1, "rnn_params": {}})
    model = RecurrentWaveformNet(cfg)
    x = jnp.array(rng.normal(size=(4, N_SAMPLES)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (4, 1)


def test_conv_waveform_net_with_detector_number(rng):
    from waveformml_tpu.models.waveform_models import ConvWaveformNet
    cfg = _base_config(net_type="CNN", use_detector_number=True,
                       hparams={"n_lin": 2, "out_size": 1,
                                "cnn_params": {"num_channels": 1, "out_size": 4,
                                               "num_expand": 1, "num_contract": 1,
                                               "expand_factor": 4.0}})
    model = ConvWaveformNet(cfg)
    x = jnp.array(rng.normal(size=(4, N_SAMPLES)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (4, 1)


def test_model_validation_dsl():
    from waveformml_tpu.utils.model_validation import ModelValidation
    s2 = 2 * N_SAMPLES
    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "spconv.SubMConv2d", [s2, 8, 3, 1, 1, 1],
            "spconv.ToDense",
            "nn.Flatten", [],
            "nn.Linear", [8 * NX * NY, 3],
        ])
    cfg["system_config"] = Config({"n_samples": N_SAMPLES})
    ModelValidation.validate(cfg)  # no error

    bad = _base_config(
        net_type="2DConvolution",
        algorithm=["nn.Linear", [999, 3]])
    bad["system_config"] = Config({"n_samples": N_SAMPLES})
    with pytest.raises(IOError):
        ModelValidation.validate(bad)


def test_model_registry_resolution():
    from waveformml_tpu.registry import retrieve_class
    for name in ("SPConvNet.SPConvNet", "SCNet.SCNet", "DenseConvNet",
                 "WaveformModels.TemporalWaveformNet", "SingleEndedZConv",
                 "src.models.SPConvNet.SPConvPreserveNet"):
        assert retrieve_class(name) is not None


def test_scnet_dsl_with_waveform_conv1d_stack(rng):
    """A leading nn.Conv1d waveform section (ref SCNet.py:69-72) runs on
    plain [N, S, 2] arrays: the stack must be built from the DENSE layer
    registry, not the sparse translation table (SparseReLU on an array
    crashed before)."""
    from waveformml_tpu.models.nets import SCNet

    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "nn.Conv1d", [2, 4, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.SubMConv2d", [4 * N_SAMPLES, 8, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.ToDense",
            "nn.Linear", [8 * NX * NY, 3],
        ])
    model = SCNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_scnet_waveform_path_propagates_host_plans(rng):
    """Regression: SCNet's waveform front-end rebuilds the SparseBatch with
    transformed feats; the host-prefetched neighbor plans must ride along or
    the row path silently falls back to the in-trace build (paying the plan
    build twice). Proven by corruption: a sabotaged plan MUST change the
    output, so the shipped plan is the one actually consumed."""
    from waveformml_tpu.models.nets import SCNet
    from waveformml_tpu.ops.row_conv import host_neighbor_plan

    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "nn.Conv1d", [2, 4, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.SubMConv2d", [4 * N_SAMPLES, 8, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.ToDense",
            "nn.Linear", [8 * NX * NY, 3],
        ])
    model = SCNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    want = model.apply(variables, b)

    plan = host_neighbor_plan(np.asarray(b.coords), np.asarray(b.mask),
                              b.n_events, 3, None)
    bp = SparseBatch(b.coords, b.feats, b.mask, b.n_events,
                     plans={"k3": jnp.asarray(plan)})
    got = model.apply(variables, bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    bad = plan.copy()
    bad[np.asarray(b.mask)] = -1  # every real row loses all neighbors
    bbad = SparseBatch(b.coords, b.feats, b.mask, b.n_events,
                       plans={"k3": jnp.asarray(bad)})
    sab = model.apply(variables, bbad)
    assert not np.allclose(np.asarray(sab), np.asarray(want))


def test_spconvnet_dsl_with_waveform_conv1d_stack(rng):
    from waveformml_tpu.models.nets import SPConvNet

    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "nn.Conv1d", [2, 4, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.SubMConv2d", [4 * N_SAMPLES, 8, 3, 1, 1, 1],
            "nn.ReLU",
            "spconv.ToDense",
            "nn.Linear", [8 * NX * NY, 3],
        ])
    model = SPConvNet(cfg)
    b = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)


def test_model_validation_pooling_downsample():
    """Pooling layers must downsample current_dim in the static validator
    (o = (i - k)//s + 1, stride defaults to kernel_size) — skipping them
    spuriously rejects valid configs using the registered nn.*Pool layers."""
    from waveformml_tpu.utils.model_validation import ModelValidation
    s2 = 2 * N_SAMPLES
    # 14x11 grid conv → 2x2 max pool → flatten: 7*5*8 features
    cfg = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "nn.Conv2d", [s2, 8, 3, 1, 1, 1],
            "nn.MaxPool2d", [2],
            "nn.Flatten", [],
            "nn.Linear", [7 * 5 * 8, 3],
        ])
    cfg["system_config"] = Config({"n_samples": N_SAMPLES})
    ModelValidation.validate(cfg)  # no error

    wrong = _base_config(
        net_type="2DConvolution",
        algorithm=[
            "nn.Conv2d", [s2, 8, 3, 1, 1, 1],
            "nn.MaxPool2d", [2],
            "nn.Flatten", [],
            "nn.Linear", [14 * 11 * 8, 3],  # un-pooled size: must fail
        ])
    wrong["system_config"] = Config({"n_samples": N_SAMPLES})
    with pytest.raises(IOError):
        ModelValidation.validate(wrong)


def test_masked_array_batchnorm_bf16_stats_accumulate_f32(rng):
    # regression twin of the MaskedBatchNorm fix: with bf16 rows the batch
    # count/sums must accumulate in f32 (a bf16 count is exact only to 256)
    from waveformml_tpu.models.blocks import MaskedArrayBatchNorm

    N, C = 600, 4
    mask = np.ones(N, dtype=bool)
    mask[550:] = False
    x = rng.normal(size=(N, C)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    bn = MaskedArrayBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), xb, mask=jnp.asarray(mask),
                        train=True)
    _, updates = bn.apply(variables, xb, mask=jnp.asarray(mask), train=True,
                          mutable=["batch_stats"])
    active = np.asarray(xb, np.float32)[mask]
    want_mean = 0.1 * active.mean(axis=0)
    got_mean = np.asarray(updates["batch_stats"]["mean"])
    assert got_mean.dtype == np.float32
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-5)


def test_dsl_to_row_specs_kwargs_form():
    # the dict/kwargs DSL form (supported by build_sparse_instances and
    # registry.create_class_instances) must translate like the positional
    # form instead of crashing with KeyError: 0
    from waveformml_tpu.models.algorithm import dsl_to_row_specs

    positional = ["spconv.SubMConv2d", [2, 4, 3],
                  "nn.BatchNorm1d", [4],
                  "nn.ReLU",
                  "nn.Dropout", [0.25]]
    kwargs = ["spconv.SubMConv2d",
              {"in_channels": 2, "out_channels": 4, "kernel_size": 3},
              "nn.BatchNorm1d", {"num_features": 4},
              "nn.ReLU",
              "nn.Dropout", {"p": 0.25}]
    want = [("subm", 2, 4, 3, 1, "subm3"), ("bn", 4), ("relu",),
            ("dropout", 0.25)]
    assert dsl_to_row_specs(positional) == want
    assert dsl_to_row_specs(kwargs) == want
    # strided conv still falls back to the grid path in either form
    assert dsl_to_row_specs(["spconv.SubMConv2d",
                             {"in_channels": 2, "out_channels": 4,
                              "kernel_size": 3, "stride": 2}]) is None
