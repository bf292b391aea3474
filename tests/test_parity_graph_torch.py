"""FULL-model GraphNet parity vs hand-written torch message passing.

The 19 golden-value layer tests (test_graph_layers_golden.py) verify each
conv against numpy oracles of the PyG-documented formulas, but oracle and
implementation share one author's reading of the docs. This test composes
the whole flagship graph config — kNN edges, conv stack, masked BatchNorm,
global max pool, LinearBlock head — against an INDEPENDENT torch mirror
written from the PyG formulas, with shared randomized weights AND
randomized BN running statistics, so a shared misreading of a layer
default would surface at the composed-model level
(ref: src/models/GraphNet.py:222-315 builds the same stack with PyG).
"""
import numpy as np
import torch
import torch.nn as tnn

import flax.linen as fnn
import jax
import jax.numpy as jnp

from waveformml_tpu.config import Config
from waveformml_tpu.detector import NX, NY

K = 4  # config/examples/IoniClassifierGraph.json hparams.k


def _graph_cfg(graph_class_index: int, tmp: str):
    """IoniClassifierGraph.json shape (k=4, n_graph=2, n_lin=2, linear
    plane schedule) at test-sized n_samples."""
    return Config({
        "run_config": {"exp_name": "g", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "g", "n_samples": 8, "n_type": 2,
                          "type_names": ["Ioni", "Recoil"],
                          "model_base_path": tmp, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "GraphNet.GraphNet", "net_type": "Graph",
                       "hparams": {"k": K, "n_graph": 2, "n_lin": 2,
                                   "graph_out": 6,
                                   "graph_class_index": graph_class_index}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1,
                           "data_module": "GraphDataModule"},
    })


def _block(rng, n_events=8, n_in=16):
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock

    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(5, 9)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], n_in)).astype(np.float32)
    labels = rng.integers(0, 2, n_events).astype(np.int64)
    return FileBlock(coords, feats, labels, {})


def _randomize_tree(v, rng):
    def randomize(x):
        return jnp.asarray(rng.normal(size=np.shape(x)).astype(np.float32) * 0.3)

    params = jax.tree.map(randomize, v["params"])
    bstats = jax.tree.map(randomize, v.get("batch_stats", {}))
    bstats = jax.tree.map(
        lambda x: jnp.abs(x) + 0.5, bstats)  # vars must be positive
    return {"params": params, "batch_stats": bstats}


def _randomized_variables(task, db, rng):
    v = task.init_variables(jax.random.PRNGKey(0),
                            {k: jnp.asarray(x) for k, x in db.items()})
    return _randomize_tree(v, rng)


def _np_tree(t):
    return jax.tree.map(lambda x: np.asarray(x, np.float32), t)


def _mean_agg(x, src, dst, emask, n):
    """mean_{j in N(i)} x_j over masked incoming edges (torch)."""
    s = torch.zeros(n, x.shape[1])
    cnt = torch.zeros(n, 1)
    w = emask.float().unsqueeze(1)
    s.index_add_(0, dst, x[src] * w)
    cnt.index_add_(0, dst, w)
    return s / cnt.clamp(min=1)


def _bn_eval(x, p, bs):
    """PyG stacks use torch BatchNorm1d in eval: normalize with running
    stats over every row."""
    return ((x - torch.from_numpy(bs["mean"])) /
            torch.sqrt(torch.from_numpy(bs["var"]) + 1e-5)
            * torch.from_numpy(p["scale"]) + torch.from_numpy(p["bias"]))


def _head(x, p):
    """LinearBlock: chained Linear layers, no inter-layer activation
    (ref: ConvBlocks.py:82-102)."""
    for i in range(len(p)):
        lp = p[f"dense_{i}"]
        x = x @ torch.from_numpy(lp["kernel"]) + torch.from_numpy(lp["bias"])
    return x


def _run_jax(graph_class_index, rng, tmp_path, graph_params=None):
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _graph_cfg(graph_class_index, str(tmp_path))
    if graph_params:
        cfg.net_config.hparams.graph_params = graph_params
    task = LitPSD(cfg)
    block = _block(rng)
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db = task.prepare_block(block, rb, eb)
    variables = _randomized_variables(task, db, rng)
    out, _ = task.apply_model(variables,
                              {k: jnp.asarray(v) for k, v in db.items()},
                              train=False)
    n_ev = block.labels.shape[0]
    return np.asarray(out)[:n_ev], db, variables, n_ev


def test_graphnet_sage_full_model_parity(rng, tmp_path):
    """graph_class_index=1 (SAGEConv) — the IoniClassifierGraph.json conv.
    PyG SAGEConv: x'_i = W_r x_i + W_l mean_{j∈N(i)} x_j + b."""
    got, db, variables, n_ev = _run_jax(1, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    src = torch.from_numpy(db[f"edges_knn{K}"][0].astype(np.int64))
    dst = torch.from_numpy(db[f"edges_knn{K}"][1].astype(np.int64))
    emask = torch.from_numpy(db[f"edge_mask_knn{K}"])
    n = x.shape[0]
    for i in range(2):
        lp = p[f"gconv_{i}"]
        agg = _mean_agg(x, src, dst, emask, n)
        x = (agg @ torch.from_numpy(lp["lin_l"]["kernel"])
             + torch.from_numpy(lp["lin_l"]["bias"])
             + x @ torch.from_numpy(lp["lin_r"]["kernel"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _pool_and_head(x, db, p, n_ev):
    """Masked per-event max pool + LinearBlock head (torch)."""
    coords = db["coords"]
    mask = torch.from_numpy(db["mask"])
    ev = torch.from_numpy(coords[:, 2].astype(np.int64))
    pooled = torch.full((n_ev, x.shape[1]), -torch.inf)
    ridx = torch.nonzero(mask, as_tuple=True)[0]
    ridx = ridx[ev[ridx] < n_ev]
    pooled = pooled.index_reduce_(0, ev[ridx], x[ridx], "amax",
                                  include_self=True)
    pooled = torch.where(torch.isfinite(pooled), pooled,
                         torch.zeros(()))
    return _head(pooled, p["linear"]).numpy()


def test_graphnet_gcn_full_model_parity(rng, tmp_path):
    """graph_class_index=0 (GCNConv): X' = D̂^-1/2 (A+I) D̂^-1/2 X W + b,
    self-loops added with fill weight 1 (PyG defaults)."""
    got, db, variables, n_ev = _run_jax(0, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)
    em0 = db[f"edge_mask_knn{K}"]
    # add self-loops on EVERY row (jax adds them on all n padded rows too;
    # padded rows never reach the pooled output)
    src = np.concatenate([src0[em0], np.arange(n)])
    dst = np.concatenate([dst0[em0], np.arange(n)])
    deg = np.bincount(dst, minlength=n).astype(np.float32)
    norm = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    coeff = torch.from_numpy(norm[src] * norm[dst]).unsqueeze(1)
    src_t, dst_t = torch.from_numpy(src), torch.from_numpy(dst)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        h = x @ torch.from_numpy(lp["lin"]["kernel"])
        out = torch.zeros(n, h.shape[1])
        out.index_add_(0, dst_t, h[src_t] * coeff)
        x = out + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_edgeconv_full_model_parity(rng, tmp_path):
    """graph_class_index=12 (EdgeConv): x'_i = max_{j∈N(i)}
    MLP([x_i ‖ x_j − x_i]) (DGCNN), MLP = LinearPlanes with ReLU."""
    got, db, variables, n_ev = _run_jax(12, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    src = torch.from_numpy(db[f"edges_knn{K}"][0].astype(np.int64))
    dst = torch.from_numpy(db[f"edges_knn{K}"][1].astype(np.int64))
    emask = torch.from_numpy(db[f"edge_mask_knn{K}"])
    n = x.shape[0]
    for i in range(2):
        lp = p[f"gconv_{i}"]["net"]["LinearPlanes_0"]
        z = torch.cat([x[dst], x[src] - x[dst]], dim=1)
        msg = torch.relu(z @ torch.from_numpy(lp["dense_0"]["kernel"])
                         + torch.from_numpy(lp["dense_0"]["bias"]))
        msg = torch.where(emask.unsqueeze(1), msg,
                          torch.full((), -torch.inf))
        out = torch.full((n, msg.shape[1]), -torch.inf)
        out = out.index_reduce_(0, dst, msg, "amax", include_self=True)
        x = torch.where(torch.isfinite(out), out, torch.zeros(()))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_gen_full_model_parity(rng, tmp_path):
    """graph_class_index=16 (GENConv) — the conv whose softmax-aggregation
    temperature was called out as a shared-misreading risk. PyG GENConv
    (aggr='softmax', t=1.0, learn_t=False): m_ij = ReLU(W x_j + W_e e_ij)+ε,
    x'_i = MLP(W x_i + Σ_j softmax_i(t·m_ij) ⊙ m_ij), per-channel softmax
    over incoming edges; GraphNet feeds normalized Cartesian edge attrs."""
    got, db, variables, n_ev = _run_jax(16, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src_a = db[f"edges_knn{K}"][0].astype(np.int64)
    dst_a = db[f"edges_knn{K}"][1].astype(np.int64)
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    # Cartesian edge attrs exactly as the model builds them: rel over ALL
    # edge slots (masked slots are (0,0) pairs → rel 0), one global max
    pos = np.asarray(db["coords"][:, :2], np.float32)
    rel = pos[dst_a] - pos[src_a]
    mv = max(np.abs(rel).max(), 1e-9)
    eattr = torch.from_numpy(rel / (2 * mv) + 0.5)
    src, dst = torch.from_numpy(src_a), torch.from_numpy(dst_a)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        h = x @ torch.from_numpy(lp["lin_in"]["kernel"]) \
            + torch.from_numpy(lp["lin_in"]["bias"])
        e = eattr @ torch.from_numpy(lp["edge_proj"]["kernel"]) \
            + torch.from_numpy(lp["edge_proj"]["bias"])
        msg = torch.relu(h[src] + e) + 1e-7
        # per-channel softmax over each dst's incoming live edges (t = 1)
        logit = torch.where(em.unsqueeze(1), msg, torch.full((), -torch.inf))
        mx = torch.full((n, msg.shape[1]), -torch.inf)
        mx = mx.index_reduce_(0, dst, logit, "amax", include_self=True)
        mx = torch.where(torch.isfinite(mx), mx, torch.zeros(()))
        ex = torch.where(em.unsqueeze(1), torch.exp(logit - mx[dst]),
                         torch.zeros(()))
        den = torch.zeros(n, msg.shape[1]).index_add_(0, dst, ex)
        alpha = ex / den.clamp(min=1e-16)[dst]
        agg = torch.zeros(n, msg.shape[1])
        agg.index_add_(0, dst, torch.where(em.unsqueeze(1), msg * alpha,
                                           torch.zeros(())))
        z = h + agg
        z = torch.relu(z @ torch.from_numpy(lp["mlp1"]["kernel"])
                       + torch.from_numpy(lp["mlp1"]["bias"]))
        x = z @ torch.from_numpy(lp["mlp2"]["kernel"]) \
            + torch.from_numpy(lp["mlp2"]["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_feast_full_model_parity(rng, tmp_path):
    """graph_class_index=13 (FeaStConv) — the conv whose attention
    normalization was called out as a shared-misreading risk. PyG FeaStConv
    (heads=4, add_self_loops=True): q(x_i, x_j) = softmax_h(u_h·(x_j − x_i)
    + c_h) — softmax over the HEADS axis per edge — and
    x'_i = 1/|N(i)| Σ_{j∈N(i)∪{i}} Σ_h q_h W_h x_j + b."""
    got, db, variables, n_ev = _run_jax(13, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em0 = db[f"edge_mask_knn{K}"]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)
    # live non-loop edges + exactly one self-loop per node (PyG semantics)
    keep = em0 & (src0 != dst0)
    src = torch.from_numpy(np.concatenate([src0[keep], np.arange(n)]))
    dst = torch.from_numpy(np.concatenate([dst0[keep], np.arange(n)]))
    H = 4
    for i in range(2):
        lp = p[f"gconv_{i}"]
        q = torch.softmax((x[src] - x[dst])
                          @ torch.from_numpy(lp["u"]["kernel"])
                          + torch.from_numpy(lp["u"]["bias"]), dim=-1)
        C = lp["lin"]["kernel"].shape[1] // H
        h = (x @ torch.from_numpy(lp["lin"]["kernel"])).reshape(n, H, C)
        msg = (h[src] * q.unsqueeze(-1)).sum(1)
        s = torch.zeros(n, C).index_add_(0, dst, msg)
        cnt = torch.zeros(n, 1).index_add_(0, dst,
                                           torch.ones(len(src), 1))
        x = s / cnt.clamp(min=1) + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _live_edges(db):
    """(src, dst, torch mask) of the padded edge table."""
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    src = torch.from_numpy(db[f"edges_knn{K}"][0].astype(np.int64))
    dst = torch.from_numpy(db[f"edges_knn{K}"][1].astype(np.int64))
    return src, dst, em


def _with_self_loops(db, n):
    """Live non-loop edges + exactly one (i, i) per node (PyG
    add_self_loops semantics, matching graph_layers.add_self_loops)."""
    em0 = db[f"edge_mask_knn{K}"]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)
    keep = em0 & (src0 != dst0)
    src = np.concatenate([src0[keep], np.arange(n)])
    dst = np.concatenate([dst0[keep], np.arange(n)])
    return torch.from_numpy(src), torch.from_numpy(dst)


def _masked_mean(msg, dst, em, n):
    """Per-dst mean over live edges (count-clamped like segment_mean)."""
    wm = em.float().unsqueeze(1)
    s = torch.zeros(n, msg.shape[1]).index_add_(0, dst, msg * wm)
    cnt = torch.zeros(n, 1).index_add_(0, dst, wm)
    return s / cnt.clamp(min=1)


def test_graphnet_graphconv_full_model_parity(rng, tmp_path):
    """graph_class_index=2 (GraphConv): x'_i = W_root x_i +
    W_rel Σ_{j∈N(i)} x_j; lin_rel carries the bias, lin_root is bias-free
    (PyG GraphConv aggr='add')."""
    got, db, variables, n_ev = _run_jax(2, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst, em = _live_edges(db)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        wm = em.float().unsqueeze(1)
        agg = torch.zeros(n, x.shape[1]).index_add_(0, dst, x[src] * wm)
        x = (agg @ torch.from_numpy(lp["lin_rel"]["kernel"])
             + torch.from_numpy(lp["lin_rel"]["bias"])
             + x @ torch.from_numpy(lp["lin_root"]["kernel"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_tag_full_model_parity(rng, tmp_path):
    """graph_class_index=6 (TAGConv, K=3): x' = Σ_{k=0..3} W_k Â_norm^k x
    + b with NO self-loops (the k=0 term is the identity), bias-free W_k
    and one shared output bias (PyG TAGConv)."""
    got, db, variables, n_ev = _run_jax(6, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em0 = db[f"edge_mask_knn{K}"]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)[em0]
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)[em0]
    deg = np.bincount(dst0, minlength=n).astype(np.float32)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    coeff = torch.from_numpy(dinv[src0] * dinv[dst0]).unsqueeze(1)
    src, dst = torch.from_numpy(src0), torch.from_numpy(dst0)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        out = x @ torch.from_numpy(lp["lin_0"]["kernel"])
        h = x
        for k in range(1, 4):
            h = torch.zeros(n, h.shape[1]).index_add_(0, dst, h[src] * coeff)
            out = out + h @ torch.from_numpy(lp[f"lin_{k}"]["kernel"])
        x = out + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_gin_full_model_parity(rng, tmp_path):
    """graph_class_index=7 (GINConv, ε=0): x' = MLP((1+ε) x_i +
    Σ_{j∈N(i)} x_j), MLP = LinearPlanes (one Dense + ReLU)."""
    got, db, variables, n_ev = _run_jax(7, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst, em = _live_edges(db)
    for i in range(2):
        lp = p[f"gconv_{i}"]["net"]["LinearPlanes_0"]
        wm = em.float().unsqueeze(1)
        agg = torch.zeros(n, x.shape[1]).index_add_(0, dst, x[src] * wm)
        x = torch.relu((x + agg) @ torch.from_numpy(lp["dense_0"]["kernel"])
                       + torch.from_numpy(lp["dense_0"]["bias"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_sg_full_model_parity(rng, tmp_path):
    """graph_class_index=9 (SGConv, K=1): x' = W (D̂^-1/2 Â D̂^-1/2) x,
    Â = A + I (self-loops added, PyG default), W with bias."""
    got, db, variables, n_ev = _run_jax(9, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst = _with_self_loops(db, n)
    deg = np.bincount(dst.numpy(), minlength=n).astype(np.float32)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    coeff = torch.from_numpy(dinv[src.numpy()] * dinv[dst.numpy()]).unsqueeze(1)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        h = torch.zeros(n, x.shape[1]).index_add_(0, dst, x[src] * coeff)
        x = h @ torch.from_numpy(lp["lin"]["kernel"]) \
            + torch.from_numpy(lp["lin"]["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_le_full_model_parity(rng, tmp_path):
    """graph_class_index=14 (LEConv): x'_i = W1 x_i +
    Σ_{j∈N(i)} (W2 x_i − W3 x_j) — local-extremum scoring, unit edge
    weights (no edge_attr for this index)."""
    got, db, variables, n_ev = _run_jax(14, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst, em = _live_edges(db)
    for i in range(2):
        lp = p[f"gconv_{i}"]

        def lin(name, v):
            return v @ torch.from_numpy(lp[name]["kernel"]) \
                + torch.from_numpy(lp[name]["bias"])

        h2, h3 = lin("lin2", x), lin("lin3", x)
        msg = h2[dst] - h3[src]
        wm = em.float().unsqueeze(1)
        agg = torch.zeros(n, msg.shape[1]).index_add_(0, dst, msg * wm)
        x = agg + lin("lin1", x)
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_clustergcn_full_model_parity(rng, tmp_path):
    """graph_class_index=15 (ClusterGCNConv, λ=0.5): X' = (Ã + λ diag(Ã))
    X W with Ã = D̂^{-1}(A + I) — per-node mean over N(i) ∪ {i} plus the
    λ/deĝ_i-scaled root, then lin."""
    got, db, variables, n_ev = _run_jax(15, rng, tmp_path,
                                        graph_params={"diag_lambda": 0.5})
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst = _with_self_loops(db, n)
    deg = torch.zeros(n, 1).index_add_(0, dst, torch.ones(len(src), 1))
    for i in range(2):
        lp = p[f"gconv_{i}"]
        s = torch.zeros(n, x.shape[1]).index_add_(0, dst, x[src])
        agg = s / deg.clamp(min=1) + 0.5 * x / deg.clamp(min=1)
        x = agg @ torch.from_numpy(lp["lin"]["kernel"]) \
            + torch.from_numpy(lp["lin"]["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _gat_mirror(db, p, bs, H, n_ev):
    """Shared GAT/SuperGAT inference mirror (SuperGAT's propagation rule at
    inference equals GATConv)."""
    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst = _with_self_loops(db, n)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        C = lp["att_src"].shape[1]
        h = (x @ torch.from_numpy(lp["lin"]["kernel"])).reshape(n, H, C)
        alpha = ((h[src] * torch.from_numpy(lp["att_src"])).sum(-1)
                 + (h[dst] * torch.from_numpy(lp["att_dst"])).sum(-1))
        alpha = torch.nn.functional.leaky_relu(alpha, 0.2)
        mx = torch.full((n, H), -torch.inf)
        mx = mx.index_reduce_(0, dst, alpha, "amax", include_self=True)
        ex = torch.exp(alpha - mx[dst])
        den = torch.zeros(n, H).index_add_(0, dst, ex)
        w = ex / den.clamp(min=1e-38)[dst]
        msg = (h[src] * w.unsqueeze(-1)).reshape(-1, H * C)
        out_t = torch.zeros(n, H * C).index_add_(0, dst, msg)
        x = out_t + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    return _pool_and_head(x, db, p, n_ev)


def test_graphnet_supergat_full_model_parity(rng, tmp_path):
    """graph_class_index=17 (SuperGATConv, heads=2): the self-supervised
    attention loss is train-time only — inference propagation equals
    GATConv. Exercises the index-17 heads widening path the reference's
    nn_input_modifier special-cases (GraphNet.py:249-254)."""
    got, db, variables, n_ev = _run_jax(17, rng, tmp_path,
                                        graph_params={"heads": 2})
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])
    want = _gat_mirror(db, p, bs, 2, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_gatv2_full_model_parity(rng, tmp_path):
    """graph_class_index=4 (GATv2Conv, heads=2): attention AFTER the
    nonlinearity — α = softmax_i(a · LeakyReLU(W_l x_j + W_r x_i)), both
    linears biased (unlike GATConv), messages use W_l x_j."""
    got, db, variables, n_ev = _run_jax(4, rng, tmp_path,
                                        graph_params={"heads": 2})
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst = _with_self_loops(db, n)
    H = 2
    for i in range(2):
        lp = p[f"gconv_{i}"]
        C = lp["att"].shape[1]
        hl = (x @ torch.from_numpy(lp["lin_l"]["kernel"])
              + torch.from_numpy(lp["lin_l"]["bias"])).reshape(n, H, C)
        hr = (x @ torch.from_numpy(lp["lin_r"]["kernel"])
              + torch.from_numpy(lp["lin_r"]["bias"])).reshape(n, H, C)
        z = torch.nn.functional.leaky_relu(hl[src] + hr[dst], 0.2)
        alpha = (z * torch.from_numpy(lp["att"])).sum(-1)
        mx = torch.full((n, H), -torch.inf)
        mx = mx.index_reduce_(0, dst, alpha, "amax", include_self=True)
        ex = torch.exp(alpha - mx[dst])
        den = torch.zeros(n, H).index_add_(0, dst, ex)
        w = ex / den.clamp(min=1e-38)[dst]
        msg = (hl[src] * w.unsqueeze(-1)).reshape(-1, H * C)
        out_t = torch.zeros(n, H * C).index_add_(0, dst, msg)
        x = out_t + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphznet_full_model_parity(rng, tmp_path):
    """GraphZNet (the window-edge per-segment family, ref GraphBlocks.py):
    schedule [(16,13,w2), (13,7,w1), (7,1,knn1)] of distance-weighted
    GCNConvs (ew = 1 − |Δpos|/√(2·nb²), self-loop fill weight 1) with
    inter-layer masked BN and NO activation, scattered to a dense
    [B, 1, NX, NY] z grid. Torch mirror consumes the same host-built
    window/knn edge tables."""
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.models.graph_net import GraphZ

    NBRS = 2
    cfg = Config({
        "run_config": {"exp_name": "gz", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "gz", "n_samples": 8, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp_path),
                          "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_class": "GraphZNet",
                       "net_type": "graph", "algorithm": "conv",
                       "hparams": {"neighbors": NBRS, "n_conv": 2, "n_point": 1,
                                   "conv_position": 1, "graph_index": 0}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2DWithZ",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    # hand-computed expected schedule: independence guard against drift
    sched = [(16, 13, 2), (13, 7, 1), (7, 1, 0)]
    assert GraphZ.schedule(16, 1, NBRS, 2, 1, 1, 0.8) == sched

    task = LitZ(cfg)
    rows = []
    for e in range(8):
        for s in rng.choice(NX * NY, size=int(rng.integers(4, 8)),
                            replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], 16)).astype(np.float32)
    labels = rng.random(coords.shape[0]).astype(np.float32)  # per-row z
    block = FileBlock(coords, feats, labels, {})
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db = task.prepare_block(block, rb, eb)
    variables = _randomized_variables(task, db, rng)
    got, _ = task.apply_model(variables,
                              {k: jnp.asarray(v) for k, v in db.items()},
                              train=False)
    got = np.asarray(got)  # [B, 1, NX, NY]

    p = _np_tree(variables["params"])["model"]
    bs = _np_tree(variables["batch_stats"])["model"]
    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    pos = np.asarray(db["coords"][:, :2], np.float32)
    for i, (_nin, nout, nb) in enumerate(sched):
        key = f"edges_w{nb}" if nb else "edges_knn1"
        mkey = f"edge_mask_w{nb}" if nb else "edge_mask_knn1"
        em0 = db[mkey]
        src0 = db[key][0].astype(np.int64)
        dst0 = db[key][1].astype(np.int64)
        rel = pos[dst0] - pos[src0]
        ew0 = 1.0 - np.sqrt((rel ** 2).sum(-1)) / np.sqrt(2.0 * NBRS ** 2)
        keep = em0 & (src0 != dst0)  # GCN re-adds ONE loop per node, w=1
        src = np.concatenate([src0[keep], np.arange(n)])
        dst = np.concatenate([dst0[keep], np.arange(n)])
        w = np.concatenate([ew0[keep], np.ones(n, np.float32)]).astype(np.float32)
        deg = np.zeros(n, np.float32)
        np.add.at(deg, dst, w)
        dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        coeff = torch.from_numpy(w * dinv[src] * dinv[dst]).unsqueeze(1)
        lp = p[f"gconv_{i}"]
        h = x @ torch.from_numpy(lp["lin"]["kernel"])
        out = torch.zeros(n, nout)
        out.index_add_(0, torch.from_numpy(dst), h[torch.from_numpy(src)] * coeff)
        x = out + torch.from_numpy(lp["bias"])
        if i < len(sched) - 1:  # inter-layer BN, NO activation (ref quirk)
            x = _bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"])
    # dense scatter [B, 1, NX, NY]
    cj = db["coords"]
    mask = db["mask"]
    n_ev = db["labels"].shape[0]
    want = np.zeros((n_ev, 1, NX, NY), np.float32)
    xm = x.numpy()
    for r in range(n):
        if mask[r] and cj[r, 2] < n_ev:
            want[cj[r, 2], 0, cj[r, 0], cj[r, 1]] += xm[r, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pointnet_full_model_parity(rng, tmp_path):
    """PointNet family (ref GraphNet.py:318-445): per-layer
    x'_i = max_{j∈N(i)} ReLU(W [x_j ‖ p_j − p_i] + b) over the kNN graph,
    then masked global max pool + LinearBlock head."""
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _graph_cfg(0, str(tmp_path))
    cfg.net_config.net_class = "PointNet"
    cfg.net_config.hparams.n_graph = 2
    task = LitPSD(cfg)
    block = _block(rng)
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db = task.prepare_block(block, rb, eb)
    variables = _randomized_variables(task, db, rng)
    out, _ = task.apply_model(variables,
                              {k: jnp.asarray(v) for k, v in db.items()},
                              train=False)
    n_ev = block.labels.shape[0]
    got = np.asarray(out)[:n_ev]
    p = _np_tree(variables["params"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    src, dst, em = _live_edges(db)
    pos = torch.from_numpy(np.asarray(db["coords"][:, :2], np.float32))
    for i in range(2):
        lp = p[f"pconv_{i}"]["LinearPlanes_0"]["dense_0"]
        z = torch.cat([x[src], pos[src] - pos[dst]], dim=1)
        msg = torch.relu(z @ torch.from_numpy(lp["kernel"])
                         + torch.from_numpy(lp["bias"]))
        msg = torch.where(em.unsqueeze(1), msg, torch.full((), -torch.inf))
        out_t = torch.full((n, msg.shape[1]), -torch.inf)
        out_t = out_t.index_reduce_(0, dst, msg, "amax", include_self=True)
        x = torch.where(torch.isfinite(out_t), out_t, torch.zeros(()))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _cartesian_edge_attr(db):
    """Normalized Cartesian edge attrs exactly as GraphNet builds them:
    rel over ALL edge slots (masked slots are (0,0) pairs → rel 0), one
    global max (graph_net._cartesian, norm=True)."""
    src_a = db[f"edges_knn{K}"][0].astype(np.int64)
    dst_a = db[f"edges_knn{K}"][1].astype(np.int64)
    pos = np.asarray(db["coords"][:, :2], np.float32)
    rel = pos[dst_a] - pos[src_a]
    mv = max(np.abs(rel).max(), 1e-9)
    return torch.from_numpy(rel / (2 * mv) + 0.5), src_a, dst_a


def test_graphnet_transformer_full_model_parity(rng, tmp_path):
    """graph_class_index=5 (TransformerConv, heads=1): scaled-dot-product
    attention with Cartesian edge features added to keys AND values, plus a
    linear skip of the target (PyG root_weight=True)."""
    got, db, variables, n_ev = _run_jax(5, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    eattr, src_a, dst_a = _cartesian_edge_attr(db)
    src, dst = torch.from_numpy(src_a), torch.from_numpy(dst_a)

    def dense(name, lp, v):
        out = v @ torch.from_numpy(lp[name]["kernel"])
        if "bias" in lp[name]:
            out = out + torch.from_numpy(lp[name]["bias"])
        return out

    for i in range(2):
        lp = p[f"gconv_{i}"]
        C = lp["q"]["kernel"].shape[1]  # heads=1: [in, H*C] with H=1
        q, k, v = dense("q", lp, x), dense("k", lp, x), dense("v", lp, x)
        e = dense("edge", lp, eattr)
        ke, ve = k[src] + e, v[src] + e
        alpha = (q[dst] * ke).sum(-1, keepdim=True) / np.sqrt(C)
        logit = torch.where(em.unsqueeze(1), alpha,
                            torch.full((), -torch.inf))
        mx = torch.full((n, 1), -torch.inf)
        mx = mx.index_reduce_(0, dst, logit, "amax", include_self=True)
        mx = torch.where(torch.isfinite(mx), mx, torch.zeros(()))
        ex = torch.where(em.unsqueeze(1), torch.exp(logit - mx[dst]),
                         torch.zeros(()))
        den = torch.zeros(n, 1).index_add_(0, dst, ex)
        w = ex / den.clamp(min=1e-16)[dst]
        out_t = torch.zeros(n, C).index_add_(
            0, dst, torch.where(em.unsqueeze(1), ve * w, torch.zeros(())))
        x = out_t + dense("skip", lp, x)
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_gmm_full_model_parity(rng, tmp_path):
    """graph_class_index=10 (GMMConv over Cartesian pseudo-coordinates,
    kernel_size=3 gaussians): x'_i = mean_{j∈N(i)} Σ_k w_k(e_ij) ⊙ Θ_k x_j
    + W_root x_i + b, w_k(e) = exp(−0.5 Σ_d (e_d − μ_kd)²/σ_kd²)."""
    got, db, variables, n_ev = _run_jax(10, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    eattr, src_a, dst_a = _cartesian_edge_attr(db)
    src, dst = torch.from_numpy(src_a), torch.from_numpy(dst_a)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        mu = torch.from_numpy(lp["mu"])                       # [Kg, D]
        sig = torch.from_numpy(lp["sigma"]).abs().clamp(min=1e-6)
        Kg = mu.shape[0]
        diff = eattr.unsqueeze(1) - mu.unsqueeze(0)           # [E, Kg, D]
        w = torch.exp(-0.5 * ((diff / sig) ** 2).sum(-1))     # [E, Kg]
        C = lp["g"]["kernel"].shape[1] // Kg
        h = (x @ torch.from_numpy(lp["g"]["kernel"])).reshape(n, Kg, C)
        msg = (h[src] * w.unsqueeze(-1)).sum(1)               # [E, C]
        wm = em.float().unsqueeze(1)
        s = torch.zeros(n, C).index_add_(0, dst, msg * wm)
        cnt = torch.zeros(n, 1).index_add_(0, dst, wm)
        x = (s / cnt.clamp(min=1)
             + x @ torch.from_numpy(lp["root"]["kernel"])
             + torch.from_numpy(lp["bias"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_film_full_model_parity(rng, tmp_path):
    """graph_class_index=11 (FiLMConv, num_relations=1): messages are
    FiLM-modulated by the TARGET node — x'_i = σ(γ_s,i ⊙ W_s x_i + β_s,i) +
    mean_{j∈N(i)} σ(γ_i ⊙ W x_j + β_i), (β, γ) split order per PyG."""
    got, db, variables, n_ev = _run_jax(11, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    src = torch.from_numpy(db[f"edges_knn{K}"][0].astype(np.int64))
    dst = torch.from_numpy(db[f"edges_knn{K}"][1].astype(np.int64))
    for i in range(2):
        lp = p[f"gconv_{i}"]
        film = x @ torch.from_numpy(lp["film"]["kernel"]) \
            + torch.from_numpy(lp["film"]["bias"])
        C = film.shape[1] // 2
        beta, gamma = film[:, :C], film[:, C:]
        msg = x @ torch.from_numpy(lp["lin"]["kernel"])
        mod = torch.relu(gamma[dst] * msg[src] + beta[dst])
        wm = em.float().unsqueeze(1)
        s = torch.zeros(n, C).index_add_(0, dst, mod * wm)
        cnt = torch.zeros(n, 1).index_add_(0, dst, wm)
        film_s = x @ torch.from_numpy(lp["film_skip"]["kernel"]) \
            + torch.from_numpy(lp["film_skip"]["bias"])
        beta_s, gamma_s = film_s[:, :C], film_s[:, C:]
        skip = torch.relu(
            gamma_s * (x @ torch.from_numpy(lp["lin_skip"]["kernel"]))
            + beta_s)
        x = s / cnt.clamp(min=1) + skip
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graphnet_arma_full_model_parity(rng, tmp_path):
    """graph_class_index=8 (ARMAConv, one stack, one layer): x' =
    ReLU(V · (D̂^-1/2 A D̂^-1/2 x) + W x) with NO self-loops (PyG ARMA
    normalization) and in-degree from the live edges only."""
    got, db, variables, n_ev = _run_jax(8, rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em0 = db[f"edge_mask_knn{K}"]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)[em0]
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)[em0]
    deg = np.bincount(dst0, minlength=n).astype(np.float32)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    coeff = torch.from_numpy(dinv[src0] * dinv[dst0]).unsqueeze(1)
    src, dst = torch.from_numpy(src0), torch.from_numpy(dst0)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        prop = torch.zeros(n, x.shape[1]).index_add_(0, dst, x[src] * coeff)
        x = torch.relu(
            prop @ torch.from_numpy(lp["V_0"]["kernel"])
            + torch.from_numpy(lp["V_0"]["bias"])
            + x @ torch.from_numpy(lp["W_0"]["kernel"])
            + torch.from_numpy(lp["W_0"]["bias"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _stack_db(rng, tmp_path, n_in=16):
    """Prepared db (padded feats/coords/mask/labels + knn edge tables) for
    the hand-composed stacks below, via the same LitPSD prep path the
    GraphNet mirrors use."""
    from waveformml_tpu.engineering.tasks import LitPSD

    task = LitPSD(_graph_cfg(1, str(tmp_path)))
    block = _block(rng, n_in=n_in)
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    return task.prepare_block(block, rb, eb), block.labels.shape[0]


STACK_PLANES = (16, 11, 6)  # _graph_planes(16, 2, 0, 1.0, 6, 'linear')


class _GINEStack(fnn.Module):
    """GraphNet's layer loop with GINEConv convs (GINEConv is imported by
    the reference, GraphNet.py:7, but absent from its 0-17 selector — this
    composes it exactly as the selector would: conv + masked BN + ReLU ×2,
    Cartesian edge attrs, masked global max pool, LinearBlock head)."""

    planes: tuple = STACK_PLANES

    @fnn.compact
    def __call__(self, db, train: bool = False):
        from waveformml_tpu.models.blocks import LinearBlock, MaskedArrayBatchNorm
        from waveformml_tpu.models.graph_layers import GINEConv, global_max_pool
        from waveformml_tpu.models.graph_net import _cartesian, _GraphMLP

        x = db["feats"]
        coords = db["coords"]
        mask = db["mask"]
        edges = db[f"edges_knn{K}"]
        em = db[f"edge_mask_knn{K}"]
        eattr = _cartesian(coords[:, :2].astype(x.dtype), edges)
        for i in range(2):
            x = GINEConv(_GraphMLP((self.planes[i], self.planes[i + 1])),
                         name=f"gconv_{i}")(x, edges, em, edge_attr=eattr,
                                            train=train)
            x = MaskedArrayBatchNorm(self.planes[i + 1], name=f"norm_{i}")(
                x, mask=mask, train=train)
            x = jax.nn.relu(x)
        pooled = global_max_pool(x, coords[:, 2], db["labels"].shape[0], mask)
        return LinearBlock(self.planes[-1], 2, 2, name="linear")(pooled,
                                                                 train=train)


def test_gine_composed_full_model_parity(rng, tmp_path):
    """GINEConv composed stack vs torch mirror (PyG GINEConv: x'_i =
    h_Θ((1+ε) x_i + Σ_{j∈N(i)} ReLU(x_j + W_e e_ij)), ε=0, edge attrs
    projected to the node dim)."""
    db, n_ev = _stack_db(rng, tmp_path)
    model = _GINEStack()
    dbj = {k: jnp.asarray(v) for k, v in db.items()}
    variables = _randomize_tree(model.init(jax.random.PRNGKey(0), dbj), rng)
    got = np.asarray(model.apply(variables, dbj))[:n_ev]
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em = torch.from_numpy(db[f"edge_mask_knn{K}"])
    eattr, src_a, dst_a = _cartesian_edge_attr(db)
    src, dst = torch.from_numpy(src_a), torch.from_numpy(dst_a)
    for i in range(2):
        lp = p[f"gconv_{i}"]
        e = eattr @ torch.from_numpy(lp["edge_proj"]["kernel"]) \
            + torch.from_numpy(lp["edge_proj"]["bias"])
        msg = torch.relu(x[src] + e)
        wm = em.float().unsqueeze(1)
        agg = torch.zeros(n, x.shape[1]).index_add_(0, dst, msg * wm)
        # the _GraphMLP net is constructed in the stack's compact scope, so
        # flax hoists its params beside the conv (gconv_i holds edge_proj)
        mlp = p[f"_GraphMLP_{i}"]["LinearPlanes_0"]
        x = torch.relu((x + agg) @ torch.from_numpy(mlp["dense_0"]["kernel"])
                       + torch.from_numpy(mlp["dense_0"]["bias"]))
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _torch_feature_knn(x_t, batch_np, mask_np, k):
    """Torch-side feature-space kNN with the SAME distance formula as
    graph_layers.feature_knn (squared diffs summed in f32, self /
    cross-event / masked pairs at +inf). Returns (src, dst, live-mask)."""
    n = x_t.shape[0]
    d2 = ((x_t[:, None, :] - x_t[None, :, :]) ** 2).sum(-1)
    batch = torch.from_numpy(batch_np.astype(np.int64))
    mask = torch.from_numpy(mask_np)
    invalid = (batch[:, None] != batch[None, :]) \
        | ~mask[None, :] | ~mask[:, None] | torch.eye(n, dtype=torch.bool)
    d2 = torch.where(invalid, torch.inf, d2)
    # stable sort = lower index first on exact ties (ReLU-zeroed rows DO
    # collide exactly) — the tie-break lax.top_k documents; torch.topk's
    # tie order is unspecified
    idx = torch.argsort(d2, dim=1, stable=True)[:, :k]
    vals = torch.gather(d2, 1, idx)
    src = idx.reshape(-1)
    dst = torch.arange(n).repeat_interleave(k)
    return src, dst, torch.isfinite(vals).reshape(-1)


def _assert_knn_sets_match(x_np, batch_np, mask_np, k, src_t, dst_t, em_t):
    """The edge SETS (per-center live-neighbor sets) of the torch rebuild
    must equal feature_knn's on identical inputs, EXCEPT where the
    disagreement is a verified near-tie: after layer 1 the two frameworks'
    intermediates differ in low bits (XLA reduces tied sums in a different
    order than torch), so equidistant-within-float-rounding candidates may
    legitimately resolve differently — exactly as PyG's own CUDA knn_graph
    is nondeterministic on ties. Any set difference between candidates
    whose f64 distances differ beyond rounding is a REAL bug and fails.
    Returns the centers that hit a verified tie (their events are excluded
    from the value compare)."""
    from waveformml_tpu.models.graph_layers import feature_knn

    ej, mj = feature_knn(jnp.asarray(x_np), jnp.asarray(batch_np.astype(np.int32)),
                         jnp.asarray(mask_np), k)
    ej, mj = np.asarray(ej), np.asarray(mj)
    jax_sets = {}
    for s, d, m in zip(ej[0], ej[1], mj):
        if m:
            jax_sets.setdefault(int(d), set()).add(int(s))
    torch_sets = {}
    for s, d, m in zip(src_t.numpy(), dst_t.numpy(), em_t.numpy()):
        if m:
            torch_sets.setdefault(int(d), set()).add(int(s))
    x64 = x_np.astype(np.float64)
    tied_centers = []
    for c in set(jax_sets) | set(torch_sets):
        a, b = jax_sets.get(c, set()), torch_sets.get(c, set())
        if a == b:
            continue
        swapped = a ^ b
        d64 = {j: float(np.sum((x64[c] - x64[j]) ** 2)) for j in swapped}
        lo, hi = min(d64.values()), max(d64.values())
        assert hi - lo <= 1e-5 * max(hi, 1e-30), (
            f"center {c}: edge sets differ beyond near-tie tolerance "
            f"(jax {a} vs torch {b}, swapped d64 {d64})")
        tied_centers.append(c)
    return tied_centers


class _DynStack(fnn.Module):
    """Two Dynamic* layers (kNN REBUILT from the current features inside
    each layer, ref: GraphNet.py:24-41) + masked BN + pool + head.

    No inter-layer ReLU ON PURPOSE: ReLU-sparsified intermediates collide
    structurally (several rows land exactly equidistant from a center),
    and exact-tie kNN resolution across frameworks is implementation-
    defined — XLA's vectorized reduction rounds tied sums differently than
    torch's sequential one, so even a stable sort on both sides can pick
    different (equally valid) neighbor sets. BN without ReLU keeps the
    features generic, making ties measure-zero; the tie-break rule itself
    is unit-tested in test_feature_knn_masks_and_tiebreak."""

    conv: str = "edge"
    planes: tuple = STACK_PLANES
    k: int = 2  # < per-event multiplicity - 1: with k >= rows-1 every node in
    # an event shares the SAME full neighborhood and (root-term-free) GCN
    # collapses all of them to one vector -> guaranteed exact distance ties

    @fnn.compact
    def __call__(self, db, train: bool = False):
        from waveformml_tpu.models.blocks import LinearBlock, MaskedArrayBatchNorm
        from waveformml_tpu.models.graph_layers import global_max_pool
        from waveformml_tpu.models.graph_net import (DynamicEdgeConv,
                                                     DynamicGraphConv)

        x = db["feats"]
        coords = db["coords"]
        mask = db["mask"]
        batch = coords[:, 2]
        cls = DynamicEdgeConv if self.conv == "edge" else DynamicGraphConv
        for i in range(2):
            x = cls(self.planes[i], self.planes[i + 1], k=self.k,
                    name=f"gconv_{i}")(x, x, batch, mask, train=train)
            x = MaskedArrayBatchNorm(self.planes[i + 1], name=f"norm_{i}")(
                x, mask=mask, train=train)
        pooled = global_max_pool(x, batch, db["labels"].shape[0], mask)
        return LinearBlock(self.planes[-1], 2, 2, name="linear")(pooled,
                                                                 train=train)


DYN_K = _DynStack.k


def _events_to_compare(tied_centers, batch_np, n_ev):
    """Boolean mask over events excluding those touched by a verified
    near-tie (their graphs legitimately differ between frameworks, so the
    affected events' values may diverge); MOST events must remain."""
    keep = np.ones(n_ev, bool)
    for c in tied_centers:
        ev = int(batch_np[c])
        if ev < n_ev:
            keep[ev] = False
    assert keep.sum() >= max(1, n_ev - 3), \
        f"too many tie-affected events ({n_ev - keep.sum()}/{n_ev})"
    return keep


def _run_dyn_stack(conv, rng, tmp_path):
    db, n_ev = _stack_db(rng, tmp_path)
    model = _DynStack(conv=conv)
    dbj = {k: jnp.asarray(v) for k, v in db.items()}
    variables = _randomize_tree(model.init(jax.random.PRNGKey(0), dbj), rng)
    got = np.asarray(model.apply(variables, dbj))[:n_ev]
    return got, db, variables, n_ev


def test_dynamic_edgeconv_composed_full_model_parity(rng, tmp_path):
    """DynamicEdgeConv stack: per layer the kNN graph is rebuilt from the
    layer's INPUT features (DGCNN), then EdgeConv max-aggregates
    MLP([x_i ‖ x_j − x_i]). The torch mirror rebuilds kNN from its own
    intermediate features and each rebuild's edge set is asserted equal to
    feature_knn's on the same inputs."""
    got, db, variables, n_ev = _run_dyn_stack("edge", rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    batch_np = db["coords"][:, 2]
    mask_np = np.asarray(db["mask"])
    tied = []
    for i in range(2):
        src, dst, em = _torch_feature_knn(x, batch_np, mask_np, DYN_K)
        tied += _assert_knn_sets_match(x.numpy(), batch_np, mask_np, DYN_K,
                                       src, dst, em)
        lp = p[f"gconv_{i}"]["_GraphMLP_0"]["LinearPlanes_0"]
        z = torch.cat([x[dst], x[src] - x[dst]], dim=1)
        msg = torch.relu(z @ torch.from_numpy(lp["dense_0"]["kernel"])
                         + torch.from_numpy(lp["dense_0"]["bias"]))
        msg = torch.where(em.unsqueeze(1), msg, torch.full((), -torch.inf))
        out = torch.full((n, msg.shape[1]), -torch.inf)
        out = out.index_reduce_(0, dst, msg, "amax", include_self=True)
        x = torch.where(torch.isfinite(out), out, torch.zeros(()))
        x = _bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"])
    want = _pool_and_head(x, db, p, n_ev)
    keep = _events_to_compare(tied, batch_np, n_ev)
    np.testing.assert_allclose(got[keep], want[keep], rtol=1e-4, atol=1e-4)


def test_dynamic_graphconv_composed_full_model_parity(rng, tmp_path):
    """DynamicGraphConv stack: kNN rebuilt from features per layer, then
    GCNConv (self-loops re-added with fill weight 1, symmetric
    normalization). Edge sets asserted per rebuild as above."""
    got, db, variables, n_ev = _run_dyn_stack("gcn", rng, tmp_path)
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    batch_np = db["coords"][:, 2]
    mask_np = np.asarray(db["mask"])
    tied = []
    for i in range(2):
        src, dst, em = _torch_feature_knn(x, batch_np, mask_np, DYN_K)
        tied += _assert_knn_sets_match(x.numpy(), batch_np, mask_np, DYN_K,
                                       src, dst, em)
        live = em.numpy()
        src_l = src.numpy()[live]
        dst_l = dst.numpy()[live]
        # GCN re-adds one self-loop per node, weight 1 (feature_knn emits
        # no loops, so nothing to de-duplicate)
        src_a = np.concatenate([src_l, np.arange(n)])
        dst_a = np.concatenate([dst_l, np.arange(n)])
        deg = np.bincount(dst_a, minlength=n).astype(np.float32)
        norm = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        coeff = torch.from_numpy(norm[src_a] * norm[dst_a]).unsqueeze(1)
        lp = p[f"gconv_{i}"]["GCNConv_0"]
        h = x @ torch.from_numpy(lp["lin"]["kernel"])
        out = torch.zeros(n, h.shape[1])
        out.index_add_(0, torch.from_numpy(dst_a), h[torch.from_numpy(src_a)] * coeff)
        x = out + torch.from_numpy(lp["bias"])
        x = _bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"])
    want = _pool_and_head(x, db, p, n_ev)
    keep = _events_to_compare(tied, batch_np, n_ev)
    np.testing.assert_allclose(got[keep], want[keep], rtol=1e-4, atol=1e-4)


def test_graphnet_gat_multihead_full_model_parity(rng, tmp_path):
    """graph_class_index=3 (GATConv, heads=2): α_ij = softmax_i
    LeakyReLU(a_s·Θx_j + a_d·Θx_i) over j ∈ N(i) ∪ {i}, heads CONCAT
    (PyG concat=True default) — exercises the head-multiplier widening of
    the downstream layer, norms, and head that GraphNet applies."""
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _graph_cfg(3, str(tmp_path))
    cfg.net_config.hparams.graph_params = {"heads": 2}
    task = LitPSD(cfg)
    block = _block(rng)
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db = task.prepare_block(block, rb, eb)
    variables = _randomized_variables(task, db, rng)
    out, _ = task.apply_model(variables,
                              {k: jnp.asarray(v) for k, v in db.items()},
                              train=False)
    n_ev = block.labels.shape[0]
    got = np.asarray(out)[:n_ev]
    p = _np_tree(variables["params"])
    bs = _np_tree(variables["batch_stats"])

    x = torch.from_numpy(np.asarray(db["feats"], np.float32))
    n = x.shape[0]
    em0 = db[f"edge_mask_knn{K}"]
    src0 = db[f"edges_knn{K}"][0].astype(np.int64)[em0]
    dst0 = db[f"edges_knn{K}"][1].astype(np.int64)[em0]
    # PyG adds self-loops on every node
    src = torch.from_numpy(np.concatenate([src0, np.arange(n)]))
    dst = torch.from_numpy(np.concatenate([dst0, np.arange(n)]))
    H = 2
    for i in range(2):
        lp = p[f"gconv_{i}"]
        C = lp["att_src"].shape[1]
        h = (x @ torch.from_numpy(lp["lin"]["kernel"])).reshape(n, H, C)
        alpha = ((h[src] * torch.from_numpy(lp["att_src"])).sum(-1)
                 + (h[dst] * torch.from_numpy(lp["att_dst"])).sum(-1))
        alpha = torch.nn.functional.leaky_relu(alpha, 0.2)
        # softmax over incoming edges of each dst, per head
        mx = torch.full((n, H), -torch.inf)
        mx = mx.index_reduce_(0, dst, alpha, "amax", include_self=True)
        ex = torch.exp(alpha - mx[dst])
        den = torch.zeros(n, H).index_add_(0, dst, ex)
        w = ex / den.clamp(min=1e-38)[dst]
        msg = (h[src] * w.unsqueeze(-1)).reshape(-1, H * C)
        out_t = torch.zeros(n, H * C).index_add_(0, dst, msg)
        x = out_t + torch.from_numpy(lp["bias"])
        x = torch.relu(_bn_eval(x, p[f"norm_{i}"], bs[f"norm_{i}"]))
    want = _pool_and_head(x, db, p, n_ev)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
