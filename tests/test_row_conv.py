import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.models.nets import batch_to_grid
from waveformml_tpu.models.sparse_blocks import SparseConv2DForEZ
from waveformml_tpu.ops.row_conv import (
    build_neighbor_plan, build_site_lookup, rows_to_dense, subm_conv_rows)
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse


def _batch(rng, n_events=4, n_feat=10, n_pad=32):
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=3, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.normal(size=(coords.shape[0], n_feat)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, n_pad)
    return SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)


def test_neighbor_plan_correct(rng):
    b = _batch(rng)
    plan = np.asarray(build_neighbor_plan(b, 3))
    coords = np.asarray(b.coords)
    mask = np.asarray(b.mask)
    # brute force: neighbor k of row r
    site_of = {}
    for r in range(coords.shape[0]):
        if mask[r]:
            site_of[(coords[r, 2], coords[r, 0], coords[r, 1])] = r
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for r in range(coords.shape[0]):
        if not mask[r]:
            continue
        for k, (dx, dy) in enumerate(offs):
            x, y = coords[r, 0] + dx, coords[r, 1] + dy
            expect = site_of.get((coords[r, 2], x, y), -1) \
                if 0 <= x < NX and 0 <= y < NY else -1
            assert plan[r, k] == expect, (r, k, dx, dy)


def test_host_plan_matches_device_plan_2d(rng):
    from waveformml_tpu.ops.row_conv import host_neighbor_plan

    for k in (3, 5):
        b = _batch(rng)
        dev = np.asarray(build_neighbor_plan(b, k))
        host = host_neighbor_plan(np.asarray(b.coords), np.asarray(b.mask),
                                  b.n_events, k)
        np.testing.assert_array_equal(host, dev)
        # padding rows must be all -1 in both
        assert (host[~np.asarray(b.mask)] == -1).all()


def test_host_plan_matches_device_plan_3d(rng):
    from waveformml_tpu.ops.row_conv import (build_neighbor_plan_3d,
                                             host_neighbor_plan)

    n_t, n_events = 4, 3
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY * n_t, size=5, replace=False):
            t = s % n_t
            xy = s // n_t
            rows.append([xy % NX, xy // NX, t, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.normal(size=(coords.shape[0], 4)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 32)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)
    dev = np.asarray(build_neighbor_plan_3d(b, 3, n_t))
    host = host_neighbor_plan(c, m, n_events, 3, n_t=n_t)
    np.testing.assert_array_equal(host, dev)


def test_prefetched_plan_keeps_numerics(rng):
    """The row forward with a host-prefetched SparseBatch.plans entry equals
    the in-trace plan build bit-for-bit, and init records the requirement."""
    from waveformml_tpu.ops.row_conv import (host_neighbor_plan,
                                             record_plan_requirements)

    b = _batch(rng, n_feat=10)
    model = SparseConv2DForEZ(10, out_planes=2, kernel_size=3, n_conv=1,
                              n_point=2, conv_position=1, version=2)
    reqs = set()
    with record_plan_requirements(reqs):
        variables = model.init(jax.random.PRNGKey(0), b)
    # the k=3 convs and the k=1 pointwise convs each need a plan
    assert reqs == {(3, 2, None), (1, 2, None)}
    out_intrace = model.apply(variables, b)
    plan = host_neighbor_plan(np.asarray(b.coords), np.asarray(b.mask),
                              b.n_events, 3)
    b_pref = SparseBatch(b.coords, b.feats, b.mask, b.n_events,
                         plans={"k3": jnp.asarray(plan)})
    out_pref = model.apply(variables, b_pref)
    np.testing.assert_array_equal(np.asarray(out_pref), np.asarray(out_intrace))


def test_task_prepare_block_ships_plans(rng, tmp_path):
    """After init_variables, the flagship task's prepare_block carries the
    host-built plan and the jitted forward consumes it with identical
    outputs to a plan-less batch."""
    import jax.numpy as jnp

    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = Config({
        "run_config": {"exp_name": "s", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "s", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1, "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D", "dataset_params": {},
                           "n_train": 4, "n_validate": 2},
    })
    task = LitPSD(cfg)
    coords = np.array([[1, 1, 0], [2, 2, 0], [2, 1, 1], [7, 7, 1]], np.int32)
    feats = np.asarray(rng.random((4, 16)), np.float32)
    block = FileBlock(coords, feats, np.array([0, 1], np.int64), {})
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db0 = task.prepare_block(block, rb, eb)
    assert not any(k.startswith("plan_") for k in db0)  # nothing recorded yet
    variables = task.init_variables(jax.random.PRNGKey(0),
                                    {k: jnp.asarray(v) for k, v in db0.items()})
    db1 = task.prepare_block(block, rb, eb)
    assert "plan_k3" in db1 and db1["plan_k3"].shape == (rb, 9)
    out_pref, _ = task.apply_model(variables,
                                   {k: jnp.asarray(v) for k, v in db1.items()},
                                   train=False)
    out_plain, _ = task.apply_model(variables,
                                    {k: jnp.asarray(v) for k, v in db0.items()},
                                    train=False)
    np.testing.assert_array_equal(np.asarray(out_pref), np.asarray(out_plain))


def test_subm_rows_matches_dense_conv(rng):
    """Row-space SubM conv == dense-grid SubM conv exactly."""
    from waveformml_tpu.ops.sparse_conv import SubMConv2d

    b = _batch(rng)
    g = batch_to_grid(b)
    dense_layer = SubMConv2d(10, 6, kernel_size=3)
    variables = dense_layer.init(jax.random.PRNGKey(0), g)
    out_dense = dense_layer.apply(variables, g)
    kernel = variables["params"]["conv"]["kernel"]  # [3, 3, 10, 6]
    bias = variables["params"]["conv"]["bias"]
    plan = build_neighbor_plan(b, 3)
    out_rows = subm_conv_rows(b.feats, plan, kernel.reshape(9, 10, 6), bias, b.mask)
    # gather dense output at active rows and compare
    from waveformml_tpu.ops.sparse import gather_from_dense

    dense_rows = gather_from_dense(out_dense.features, b)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(dense_rows),
                               atol=1e-5)


def test_forez_row_path_matches_dense(rng):
    """SparseConv2DForEZ v2 (pure SubM) via SparseBatch (row path) equals the
    SparseGrid (dense path) execution with the same parameters."""
    b = _batch(rng, n_feat=10)
    model = SparseConv2DForEZ(10, out_planes=2, kernel_size=3, n_conv=1,
                              n_point=2, conv_position=1, version=2)
    g = batch_to_grid(b)
    v_dense = model.init(jax.random.PRNGKey(0), g)
    out_dense = model.apply(v_dense, g)
    v_rows = model.init(jax.random.PRNGKey(0), b)
    # copy dense conv params into the row-path layout
    rp = flax.core.unfreeze(v_rows)["params"]
    dp = flax.core.unfreeze(v_dense)["params"]
    for lname, layer_params in dp.items():
        if "conv" in layer_params:  # SubM layer
            k = layer_params["conv"]["kernel"]
            kk = k.shape[0] * k.shape[1]
            rp[lname]["kernel"] = k.reshape(kk, k.shape[2], k.shape[3])
            rp[lname]["bias"] = layer_params["conv"]["bias"]
        else:  # batchnorm etc: same structure
            rp[lname] = layer_params
    out_rows = model.apply({"params": rp,
                            **{k: v for k, v in v_rows.items() if k != "params"}}, b)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(out_dense),
                               atol=1e-5)


def test_rows_to_dense_layout(rng):
    b = _batch(rng, n_feat=2)
    dense = rows_to_dense(b.feats, b)
    assert dense.shape == (4, 2, NX, NY)
    coords = np.asarray(b.coords)
    mask = np.asarray(b.mask)
    feats = np.asarray(b.feats)
    d = np.asarray(dense)
    for r in range(coords.shape[0]):
        if mask[r]:
            np.testing.assert_allclose(d[coords[r, 2], :, coords[r, 0], coords[r, 1]],
                                       feats[r], rtol=1e-6)


def test_submpsdnet_trains(rng, tmp_path):
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = Config({
        "run_config": {"exp_name": "s", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "s", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1, "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9, "nesterov": True}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D", "dataset_params": {},
                           "n_train": 4, "n_validate": 2},
    })
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:2]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1], [7, 7, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((4, 16)), dtype=np.float32)
    labels = np.array([0, 1], dtype=np.int64)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    # overfit: loss must drop
    losses = []
    for i in range(40):
        out = trainer._train_step_fn(trainer.state.params,
                                     trainer.state.batch_stats,
                                     trainer.state.opt_state,
                                     jax.random.PRNGKey(i), db)
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state) = out[0], out[1], out[2]
        losses.append(float(out[3]))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]


@pytest.mark.parametrize("mode", ["auto", "gather", "dense"])
def test_folded_site_linear_matches_dense_flatten(rng, mode):
    """FoldedSiteLinear (both execution paths) == Dense over
    flatten(rows_to_dense(...)) exactly."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.models.blocks import FoldedSiteLinear
    from waveformml_tpu.ops.row_conv import rows_to_dense
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    n_events, C, F = 5, 6, 7
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(1, 4)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], C)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 32)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)

    layer = FoldedSiteLinear(C, F, mode=mode)
    variables = layer.init(jax.random.PRNGKey(0), b.feats, b)
    out = layer.apply(variables, b.feats, b)

    dense = rows_to_dense(b.feats, b).reshape(n_events, -1)  # [B, C*NX*NY]
    ref = dense @ variables["params"]["kernel"] + variables["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_site_linear_paths_grads_match(rng):
    """d_rows and d_kernel agree between the gather and dense paths."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.models.blocks import FoldedSiteLinear
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    n_events, C, F = 4, 3, 5
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=3, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], C)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 16)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)

    variables = FoldedSiteLinear(C, F, mode="gather").init(
        jax.random.PRNGKey(0), b.feats, b)

    def loss(params, rows_in, mode):
        layer = FoldedSiteLinear(C, F, mode=mode)
        out = layer.apply({"params": params}, rows_in, b)
        return jnp.sum(out * out)

    g_g = jax.grad(loss, argnums=(0, 1))(variables["params"], b.feats, "gather")
    g_d = jax.grad(loss, argnums=(0, 1))(variables["params"], b.feats, "dense")
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5), g_g, g_d)

    # the rematerialized dense backward (jax.checkpoint past remat_bytes)
    # must be numerically identical to the saved-residual one
    def loss_remat(params, rows_in):
        layer = FoldedSiteLinear(C, F, mode="dense", remat_bytes=0)
        out = layer.apply({"params": params}, rows_in, b)
        return jnp.sum(out * out)

    g_r = jax.grad(loss_remat, argnums=(0, 1))(variables["params"], b.feats)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6), g_d, g_r)


def test_submpsdnet_folded_head_matches_dense_head(rng):
    """SubMPSDNet (folded head) == stack→rows_to_dense→flatten→same weights."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.config import Config
    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.models.nets import SubMPSDNet
    from waveformml_tpu.ops.row_conv import rows_to_dense
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    cfg = Config({
        "system_config": {"n_samples": 8, "n_type": 3, "model_name": "m",
                          "model_base_path": "/tmp/m"},
        "net_config": {"hparams": {"out_planes": 4, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 1,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
    })
    model = SubMPSDNet(cfg)
    rows = []
    for e in range(4):
        for s in rng.choice(NX * NY, size=2, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], 16)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 32)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), 4)
    variables = model.init(jax.random.PRNGKey(1), b)
    out = model.apply(variables, b)
    assert out.shape == (4, 3)

    # reference: run the stack to rows, dense-scatter, flatten, apply the
    # SAME head parameters as plain matmuls
    rows_out = model.apply(variables, b, method=lambda mdl, bb: mdl.stack(
        bb, train=False, return_rows=True))
    dense = rows_to_dense(rows_out, b).reshape(4, -1)
    p = variables["params"]
    x = dense @ p["head0"]["kernel"] + p["head0"]["bias"]
    x = x @ p["linear"]["dense_0"]["kernel"] + p["linear"]["dense_0"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_subm_conv_rows_custom_vjp_matches_autodiff(rng):
    """The gather-based custom VJP equals autodiff of the plain gather-GEMM
    (which XLA differentiates with a scatter-add)."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.ops.row_conv import (_gather_gemm, build_neighbor_plan,
                                             subm_conv_rows)
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    n_events, C, Cout, K = 6, 5, 4, 3
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(2, 6)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], C)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 64)
    b = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)
    plan = build_neighbor_plan(b, K)
    kernel = jnp.asarray(rng.normal(size=(K * K, C, Cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b.n_rows, Cout)).astype(np.float32))

    def plain(feats, kernel, bias):
        out = _gather_gemm(feats, plan, kernel) + bias
        return jnp.where(b.mask[:, None], out, 0)

    def custom(feats, kernel, bias):
        return subm_conv_rows(feats, plan, kernel, bias, b.mask)

    np.testing.assert_allclose(np.asarray(custom(b.feats, kernel, bias)),
                               np.asarray(plain(b.feats, kernel, bias)),
                               rtol=1e-6)
    loss_p = lambda *a: jnp.sum(plain(*a) * cot)
    loss_c = lambda *a: jnp.sum(custom(*a) * cot)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(b.feats, kernel, bias)
    gc = jax.grad(loss_c, argnums=(0, 1, 2))(b.feats, kernel, bias)
    for a, bb, name in zip(gp, gc, ("feats", "kernel", "bias")):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)

    # no-bias path
    g1 = jax.grad(lambda f: jnp.sum(subm_conv_rows(f, plan, kernel, None,
                                                   b.mask) * cot))(b.feats)
    g2 = jax.grad(lambda f: jnp.sum(jnp.where(
        b.mask[:, None], _gather_gemm(f, plan, kernel), 0) * cot))(b.feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_subm_rows_custom_vjp_matches_dense_autodiff(rng):
    """The custom VJP (k-reversed-plan gather backward, no scatter) must
    produce the SAME gradients as plain autodiff through the dense-grid SubM
    conv — for d_feats, d_kernel, and d_bias, probed with a random
    cotangent. The forward-parity test alone would not catch a wrong
    backward plan."""
    from waveformml_tpu.ops.sparse import gather_from_dense
    from waveformml_tpu.ops.sparse_conv import SubMConv2d

    b = _batch(rng)
    dense_layer = SubMConv2d(10, 6, kernel_size=3)
    g0 = batch_to_grid(b)
    variables = dense_layer.init(jax.random.PRNGKey(0), g0)
    kernel = variables["params"]["conv"]["kernel"]          # [3, 3, 10, 6]
    bias = variables["params"]["conv"]["bias"]
    plan = build_neighbor_plan(b, 3)
    probe = jnp.asarray(rng.normal(size=(b.feats.shape[0], 6))
                        .astype(np.float32))

    def loss_rows(feats, k, bb):
        out = subm_conv_rows(feats, plan, k.reshape(9, 10, 6), bb, b.mask)
        return jnp.sum(out * probe * b.mask[:, None])

    def loss_dense(feats, k, bb):
        v = {"params": {"conv": {"kernel": k, "bias": bb}}}
        g = batch_to_grid(SparseBatch(b.coords, feats, b.mask, b.n_events))
        out = dense_layer.apply(v, g)
        rows = gather_from_dense(out.features, b)
        return jnp.sum(rows * probe * b.mask[:, None])

    gr = jax.grad(loss_rows, argnums=(0, 1, 2))(b.feats, kernel, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(b.feats, kernel, bias)
    for name, a, c in zip(("d_feats", "d_kernel", "d_bias"), gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, err_msg=name)


# ---------------------------------------------------------------------------------
# site-grouped head (ops/site_head.py): the bysite FoldedSiteLinear path
# ---------------------------------------------------------------------------------

def _layout_batch(rng, n_events=6, C=5, n_pad=48):
    from waveformml_tpu.ops.site_head import host_site_layout

    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(1, 5)),
                            replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], C)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, n_pad)
    lay = host_site_layout(c, m)
    b_plain = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m),
                          n_events)
    b_lay = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m),
                        n_events,
                        plans={k: jnp.asarray(v) for k, v in lay.items()})
    return b_plain, b_lay, lay


def test_host_site_layout_roundtrip(rng):
    """Every real row lands in exactly one slot of its own site's group,
    with the 1-based encoding and power-of-two capacity."""
    from waveformml_tpu.ops.site_head import host_site_layout

    b, _, lay = _layout_batch(rng)[0:3]
    coords = np.asarray(b.coords)
    mask = np.asarray(b.mask)
    take = lay["site_take"]
    n_real = int(mask.sum())
    occupied = take[take > 0] - 1
    assert sorted(occupied.tolist()) == sorted(np.nonzero(mask)[0].tolist())
    assert take.shape[1] & (take.shape[1] - 1) == 0  # power of two
    g_idx, s_idx = np.nonzero(take)
    for g, sl in zip(g_idx, s_idx):
        r = take[g, sl] - 1
        assert coords[r, 0] * NY + coords[r, 1] == lay["site_s"][g] - 1
        assert lay["site_ev"][g, sl] - 1 == coords[r, -1]
    # grow-only min_cap is honored
    lay2 = host_site_layout(coords, mask, min_cap=take.shape[1] * 4)
    assert lay2["site_take"].shape[1] == take.shape[1] * 4


def test_folded_site_linear_bysite_matches_dense(rng):
    """bysite == dense == flatten-Linear reference, fwd and both grads."""
    from waveformml_tpu.models.blocks import FoldedSiteLinear

    C, F = 5, 7
    b_plain, b_lay, _ = _layout_batch(rng, C=C)
    variables = FoldedSiteLinear(C, F, mode="dense").init(
        jax.random.PRNGKey(0), b_plain.feats, b_plain)

    def loss(params, rows_in, mode, b):
        out = FoldedSiteLinear(C, F, mode=mode).apply(
            {"params": params}, rows_in, b)
        return jnp.sum(out * out), out

    (_, out_d), g_d = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        variables["params"], b_plain.feats, "dense", b_plain)
    # mode='auto' must select bysite when the layout is present
    (_, out_b), g_b = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        variables["params"], b_lay.feats, "auto", b_lay)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5), g_b, g_d)
    # forced bysite without a layout is a hard error, not a silent fallback
    with pytest.raises(ValueError, match="site"):
        FoldedSiteLinear(C, F, mode="bysite").apply(
            {"params": variables["params"]}, b_plain.feats, b_plain)


def test_bysite_zero_pad_and_group_stitch_invariance(rng):
    """The 1-based layout encoding makes every multi-device transform a
    no-op semantically: zero-padding the capacity dim (stack_shards /
    _agree_shapes) and concatenating extra all-empty groups (multi-host
    stitch) leave the output bit-identical; permuting groups only reorders
    the scatter-add reduction."""
    from waveformml_tpu.models.blocks import FoldedSiteLinear

    C, F = 4, 6
    b_plain, b_lay, lay = _layout_batch(rng, C=C)
    variables = FoldedSiteLinear(C, F, mode="dense").init(
        jax.random.PRNGKey(1), b_plain.feats, b_plain)
    apply = lambda b: FoldedSiteLinear(C, F, mode="auto").apply(
        {"params": variables["params"]}, b.feats, b)
    ref = np.asarray(apply(b_lay))

    def with_lay(d):
        return SparseBatch(b_plain.coords, b_plain.feats, b_plain.mask,
                           b_plain.n_events,
                           plans={k: jnp.asarray(v) for k, v in d.items()})

    padded = {k: (np.pad(v, ((0, 0), (0, 16))) if v.ndim == 2 else v)
              for k, v in lay.items()}
    np.testing.assert_array_equal(np.asarray(apply(with_lay(padded))), ref)

    perm = rng.permutation(lay["site_take"].shape[0])
    permuted = {k: v[perm] for k, v in lay.items()}
    # group order changes the scatter-add summation order -> float noise
    np.testing.assert_allclose(np.asarray(apply(with_lay(permuted))), ref,
                               rtol=1e-6, atol=1e-6)

    stitched = {k: np.concatenate([v, np.zeros_like(v)]) for k, v in lay.items()}
    np.testing.assert_array_equal(np.asarray(apply(with_lay(stitched))), ref)


def test_prepare_block_ships_site_layout(rng):
    """After init_variables traces a FoldedSiteLinear model, prepare_block
    host-builds the site layout and the train path consumes it (same loss
    as the layout-free trace)."""
    import sys
    sys.path.insert(0, "tests")
    from _dist_train_common import make_cfg_block
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg, block = make_cfg_block()
    task = LitPSD(cfg)
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db0 = task.prepare_block(block, rb, eb)
    assert not any(k.startswith("plan_site") for k in db0)  # not yet traced
    task.init_variables(jax.random.PRNGKey(0), db0)
    db1 = task.prepare_block(block, rb, eb)
    for k in ("plan_site_take", "plan_site_ev", "plan_site_s"):
        assert k in db1, k
    # the shipped layout reproduces the layout-free forward exactly
    variables = task.init_variables(jax.random.PRNGKey(0), db0)
    b0 = task.sparse_batch({k: jnp.asarray(v) for k, v in db0.items()})
    b1 = task.sparse_batch({k: jnp.asarray(v) for k, v in db1.items()})
    assert b1.plans and "site_take" in b1.plans
    out0 = task.model.apply(variables, b0, train=False)
    out1 = task.model.apply(variables, b1, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
