import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse
from waveformml_tpu.ops.sparse_conv import (
    MaskedBatchNorm, SparseConv2d, SparseGrid, SparseInverseConv2d, SparseReLU,
    SparseSequential, SubMConv2d, ToDense, dilate_occupancy)


def _grid(rng, B=2, C=4, density=0.15):
    occ = rng.random((B, NX, NY)) < density
    occ[:, 0, 0] = True  # at least one site
    feats = rng.normal(size=(B, NX, NY, C)).astype(np.float32)
    feats = feats * occ[..., None]
    return SparseGrid(jnp.array(feats), jnp.array(occ))


def _brute_force_subm(feats, occ, kernel, bias):
    """Reference semantics: out at active sites only, summing over active
    inputs in the centered window."""
    B, H, W, Cin = feats.shape
    kh, kw, _, Cout = kernel.shape
    out = np.zeros((B, H, W, Cout), np.float32)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                if not occ[b, i, j]:
                    continue
                acc = np.zeros(Cout, np.float32)
                for di in range(kh):
                    for dj in range(kw):
                        ii, jj = i + di - kh // 2, j + dj - kw // 2
                        if 0 <= ii < H and 0 <= jj < W and occ[b, ii, jj]:
                            acc += feats[b, ii, jj] @ kernel[di, dj]
                out[b, i, j] = acc + bias
    return out


def test_subm_conv_exact_semantics(rng):
    g = _grid(rng)
    layer = SubMConv2d(4, 3, kernel_size=3)
    params = layer.init(jax.random.PRNGKey(0), g)
    out = layer.apply(params, g)
    kernel = np.asarray(params["params"]["conv"]["kernel"])
    bias = np.asarray(params["params"]["conv"]["bias"])
    expect = _brute_force_subm(np.asarray(g.features), np.asarray(g.occupancy),
                               kernel, bias)
    np.testing.assert_allclose(np.asarray(out.features), expect, atol=1e-4)
    # occupancy unchanged
    np.testing.assert_array_equal(np.asarray(out.occupancy), np.asarray(g.occupancy))


def test_sparse_conv_occupancy_dilation(rng):
    g = _grid(rng, density=0.05)
    layer = SparseConv2d(4, 3, kernel_size=3, stride=1, padding=1)
    params = layer.init(jax.random.PRNGKey(0), g)
    out = layer.apply(params, g)
    occ = np.asarray(g.occupancy)
    # brute-force: output site active iff window touches an active input
    B, H, W = occ.shape
    expect_occ = np.zeros_like(occ)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                lo_i, hi_i = max(0, i - 1), min(H, i + 2)
                lo_j, hi_j = max(0, j - 1), min(W, j + 2)
                expect_occ[b, i, j] = occ[b, lo_i:hi_i, lo_j:hi_j].any()
    np.testing.assert_array_equal(np.asarray(out.occupancy), expect_occ)
    # features zero off the new occupancy
    off = ~expect_occ
    assert np.abs(np.asarray(out.features)[off]).max() == 0


def test_sparse_conv_strided_occupancy(rng):
    g = _grid(rng, density=0.3)
    layer = SparseConv2d(4, 2, kernel_size=3, stride=2, padding=1)
    params = layer.init(jax.random.PRNGKey(1), g)
    out = layer.apply(params, g)
    assert out.features.shape == (2, 7, 6, 2)
    assert out.occupancy.shape == (2, 7, 6)


def test_inverse_conv_restores_occupancy(rng):
    g = _grid(rng, density=0.1)
    net = SparseSequential([
        SparseConv2d(4, 6, 3, 1, 1, indice_key="k0"),
        SparseInverseConv2d(6, 4, 3, indice_key="k0"),
    ])
    params = net.init(jax.random.PRNGKey(0), g)
    out = net.apply(params, g)
    np.testing.assert_array_equal(np.asarray(out.occupancy), np.asarray(g.occupancy))


def test_masked_batchnorm_ignores_padding(rng):
    g = _grid(rng, density=0.2)
    bn = MaskedBatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), g, train=True)
    out, updates = bn.apply(variables, g, train=True, mutable=["batch_stats"])
    # normalized active rows should have ~zero mean / unit var per channel
    feats = np.asarray(out.features)
    occ = np.asarray(g.occupancy)
    active = feats[occ]
    np.testing.assert_allclose(active.mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(active.var(axis=0), 1, atol=1e-2)
    # inactive rows stay zero
    assert np.abs(feats[~occ]).max() == 0
    # running stats computed over active rows only
    raw_active = np.asarray(g.features)[occ]
    got_mean = np.asarray(updates["batch_stats"]["mean"])
    np.testing.assert_allclose(got_mean, 0.1 * raw_active.mean(axis=0), atol=1e-5)


def test_dilate_occupancy_kernel1_identity(rng):
    occ = jnp.array(rng.random((2, NX, NY)) < 0.2)
    out = dilate_occupancy(occ, 1, 1, 0, 1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(occ))


def test_todense_layout(rng):
    g = _grid(rng, C=5)
    dense = ToDense()(g)
    assert dense.shape == (2, 5, NX, NY)  # torch [B, C, H, W] order


def test_sparse_dropout_train_eval_and_schedules():
    """Configured dropout must actually drop in train mode (the reference
    appends nn.Dropout after each bn+relu, SPConvBlocks.py:507) and be
    identity in eval; schedules with dropout=0 emit no dropout specs."""
    import jax

    from waveformml_tpu.models.sparse_blocks import (
        SparseConv2DBlock, SparseConv2DPreserve)
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    specs = SparseConv2DBlock.schedule(4, 8, 2, dropout=0.5)
    assert ("dropout", 0.5) in specs
    assert all(s[0] != "dropout"
               for s in SparseConv2DBlock.schedule(4, 8, 2))
    assert ("dropout", 0.25) in SparseConv2DPreserve.schedule(
        4, 8, n_contraction=2, version=1, dropout=0.25)

    rng = np.random.default_rng(0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1]], dtype=np.int32)
    feats = rng.random((3, 4)).astype(np.float32) + 1.0
    c, f, m = pad_sparse(coords, feats, 8)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), 2)

    model = SparseConv2DPreserve(4, 8, n_contraction=2, version=1, dropout=0.5)
    variables = model.init(jax.random.PRNGKey(0), b)
    eval1 = model.apply(variables, b, train=False)
    eval2 = model.apply(variables, b, train=False)
    np.testing.assert_array_equal(np.asarray(eval1.features),
                                  np.asarray(eval2.features))
    tr1, _ = model.apply(variables, b, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    tr2, _ = model.apply(variables, b, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    # different dropout rngs give different activations; eval differs too
    assert np.abs(np.asarray(tr1.features) - np.asarray(tr2.features)).max() > 0


def test_masked_batchnorm_bf16_stats_accumulate_f32(rng):
    # regression: with bf16 features the batch count/sums must accumulate in
    # f32 — a bf16 count is exact only up to 256, so >256 active sites used
    # to bias the mean and the f32 running statistics
    B, C = 4, 4
    occ = rng.random((B, NX, NY)) < 0.9  # ~500+ active sites, well past 256
    occ[:, 0, 0] = True
    feats = rng.normal(size=(B, NX, NY, C)).astype(np.float32)
    feats = (feats * occ[..., None]).astype(jnp.bfloat16)
    g = SparseGrid(jnp.array(feats), jnp.array(occ))
    assert int(occ.sum()) > 256
    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), g, train=True)
    _, updates = bn.apply(variables, g, train=True, mutable=["batch_stats"])
    active = np.asarray(feats, np.float32)[occ]
    want_mean = 0.1 * active.mean(axis=0)
    got_mean = np.asarray(updates["batch_stats"]["mean"])
    assert got_mean.dtype == np.float32
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-5)
    want_var = 0.9 + 0.1 * active.var(axis=0, ddof=1)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]), want_var, atol=1e-4)
