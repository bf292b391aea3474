"""Prediction parity vs a torch reference stack (BASELINE.md hard gate).

Builds the same network in torch (CPU) and in this framework with IDENTICAL
weights, runs the same sparse events through both, and asserts per-event
outputs agree within fp32 tolerance. This pins the semantics our sparse-conv
paths claim: SubM conv == dense conv masked to input sites, torch (C, H, W)
flatten order, BatchNorm eval statistics.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse
from waveformml_tpu.ops.sparse_conv import SparseGrid, SubMConv2d

C_IN, C_MID, C_OUT = 10, 6, 3
K = 3


def _events(rng, n_events=6):
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(1, 5)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], C_IN)).astype(np.float32)
    return coords, feats


def _torch_forward(coords, feats, w1, b1, w2, b2, wl, bl, n_events):
    """Reference semantics: dense scatter → Conv2d → mask to input sites →
    ReLU → Conv2d → mask → flatten (C, H, W) → Linear."""
    dense = np.zeros((n_events, NX, NY, C_IN), np.float32)
    occ = np.zeros((n_events, NX, NY), bool)
    dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
    occ[coords[:, 2], coords[:, 0], coords[:, 1]] = True
    x = torch.from_numpy(dense).permute(0, 3, 1, 2)
    m = torch.from_numpy(occ)[:, None].float()
    conv1 = tnn.Conv2d(C_IN, C_MID, K, 1, K // 2)
    conv2 = tnn.Conv2d(C_MID, C_OUT, K, 1, K // 2)
    lin = tnn.Linear(C_OUT * NX * NY, 2)
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(w1))
        conv1.bias.copy_(torch.from_numpy(b1))
        conv2.weight.copy_(torch.from_numpy(w2))
        conv2.bias.copy_(torch.from_numpy(b2))
        lin.weight.copy_(torch.from_numpy(wl))
        lin.bias.copy_(torch.from_numpy(bl))
        h = torch.relu(conv1(x) * m)       # SubM: outputs only at input sites
        h = conv2(h) * m
        out = lin(h.flatten(1))
    return out.numpy()


@pytest.mark.parametrize("path", ["dense", "rows"])
def test_torch_prediction_parity(rng, path):
    n_events = 6
    coords, feats = _events(rng, n_events)

    # shared weights: torch OIHW → flax HWIO
    w1 = rng.normal(size=(C_MID, C_IN, K, K)).astype(np.float32) * 0.2
    b1 = rng.normal(size=(C_MID,)).astype(np.float32)
    w2 = rng.normal(size=(C_OUT, C_MID, K, K)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(C_OUT,)).astype(np.float32)
    wl = rng.normal(size=(2, C_OUT * NX * NY)).astype(np.float32) * 0.1
    bl = rng.normal(size=(2,)).astype(np.float32)

    want = _torch_forward(coords, feats, w1, b1, w2, b2, wl, bl, n_events)

    c, f, m = pad_sparse(coords, feats, 64)
    batch = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)

    hwio1 = jnp.asarray(w1.transpose(2, 3, 1, 0))
    hwio2 = jnp.asarray(w2.transpose(2, 3, 1, 0))

    if path == "dense":
        from waveformml_tpu.models.nets import batch_to_grid

        g = batch_to_grid(batch)
        l1 = SubMConv2d(C_IN, C_MID, K)
        l2 = SubMConv2d(C_MID, C_OUT, K)
        v1 = {"params": {"conv": {"kernel": hwio1, "bias": jnp.asarray(b1)}}}
        v2 = {"params": {"conv": {"kernel": hwio2, "bias": jnp.asarray(b2)}}}
        h = l1.apply(v1, g)
        h = h.with_features(jax.nn.relu(h.features))
        h = l2.apply(v2, h)
        dense = jnp.transpose(h.masked(), (0, 3, 1, 2)).reshape(n_events, -1)
        got = dense @ jnp.asarray(wl.T) + jnp.asarray(bl)
    else:
        from waveformml_tpu.ops.row_conv import (build_neighbor_plan,
                                                 subm_conv_rows)
        from waveformml_tpu.models.blocks import FoldedSiteLinear

        plan = build_neighbor_plan(batch, K)
        h = subm_conv_rows(batch.feats, plan,
                           hwio1.reshape(K * K, C_IN, C_MID),
                           jnp.asarray(b1), batch.mask)
        h = jnp.where(batch.mask[:, None], jax.nn.relu(h), 0)
        h = subm_conv_rows(h, plan, hwio2.reshape(K * K, C_MID, C_OUT),
                           jnp.asarray(b2), batch.mask)
        layer = FoldedSiteLinear(C_OUT, 2)
        v = {"params": {"kernel": jnp.asarray(wl.T), "bias": jnp.asarray(bl)}}
        got = layer.apply(v, h, batch)

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_full_flagship_model_parity(rng):
    """FULL-model prediction parity (BASELINE hard gate): the flagship
    SubMPSDNet (SubM stack + eval BatchNorm + pointwise + folded linear head)
    vs a weight-shared torch mirror of the reference compute pattern, with
    randomized parameters AND randomized BN running statistics."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = Config({
        "run_config": {"exp_name": "p", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "p", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"], "model_base_path": "/tmp/p",
                          "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 8, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    task = LitPSD(cfg)
    n_events, n_in = 10, 16
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(1, 5)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], n_in)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 64)
    batch = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)
    v = task.model.init(jax.random.PRNGKey(0), batch)

    def randomize(x):
        return jnp.asarray(rng.normal(size=np.shape(x)).astype(np.float32) * 0.2)

    params = jax.tree.map(randomize, v["params"])
    bstats = {"stack": {
        k: {"mean": randomize(v["batch_stats"]["stack"][k]["mean"]),
            "var": jnp.asarray(
                rng.uniform(0.5, 1.5, np.shape(v["batch_stats"]["stack"][k]["var"])
                            ).astype(np.float32))}
        for k in v["batch_stats"]["stack"]}}
    got = np.asarray(task.model.apply({"params": params, "batch_stats": bstats},
                                      batch))

    # torch mirror (eval mode, masked to active sites after every stage)
    p = jax.tree.map(np.asarray, params)
    bs = jax.tree.map(np.asarray, bstats)

    def conv(name, cin, cout, k, pd):
        layer = tnn.Conv2d(cin, cout, k, 1, pd)
        w = p["stack"][name]["kernel"].reshape(k, k, cin, cout).transpose(3, 2, 0, 1)
        with torch.no_grad():
            layer.weight.copy_(torch.from_numpy(np.ascontiguousarray(w)))
            layer.bias.copy_(torch.from_numpy(p["stack"][name]["bias"]))
        return layer

    def bn(name, nch):
        layer = tnn.BatchNorm2d(nch, eps=1e-5)
        with torch.no_grad():
            layer.weight.copy_(torch.from_numpy(p["stack"][name]["scale"]))
            layer.bias.copy_(torch.from_numpy(p["stack"][name]["bias"]))
            layer.running_mean.copy_(torch.from_numpy(bs["stack"][name]["mean"]))
            layer.running_var.copy_(torch.from_numpy(bs["stack"][name]["var"]))
        layer.eval()
        return layer

    dense = np.zeros((n_events, NX, NY, n_in), np.float32)
    occ = np.zeros((n_events, NX, NY), bool)
    dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
    occ[coords[:, 2], coords[:, 0], coords[:, 1]] = True
    x = torch.from_numpy(dense).permute(0, 3, 1, 2)
    tm = torch.from_numpy(occ)[:, None].float()
    l0 = conv("l0", 16, 13, 3, 1)
    l1 = bn("l1", 13)
    l3 = conv("l3", 13, 11, 3, 1)
    l4 = bn("l4", 11)
    l6 = conv("l6", 11, 8, 1, 0)
    lin0 = tnn.Linear(8 * NX * NY, 50)
    lin1 = tnn.Linear(50, 2)
    with torch.no_grad():
        lin0.weight.copy_(torch.from_numpy(p["head0"]["kernel"].T))
        lin0.bias.copy_(torch.from_numpy(p["head0"]["bias"]))
        lin1.weight.copy_(torch.from_numpy(p["linear"]["dense_0"]["kernel"].T))
        lin1.bias.copy_(torch.from_numpy(p["linear"]["dense_0"]["bias"]))
        h = torch.relu(l1(l0(x) * tm)) * tm
        h = torch.relu(l4(l3(h) * tm)) * tm
        h = torch.relu(l6(h)) * tm
        want = lin1(lin0(h.flatten(1))).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _dilate_occ_np(occ, k):
    """Pure-numpy occupancy dilation for a stride-1 SparseConv (spconv
    semantics: output sites wherever the kernel overlaps an input site)."""
    r = (k - 1) // 2
    if r == 0:
        return occ
    out = np.zeros_like(occ)
    B, H, W = occ.shape
    for b, i, j in zip(*np.nonzero(occ)):
        out[b, max(0, i - r):i + r + 1, max(0, j - r):j + r + 1] = True
    return out


def _torch_mirror_specs(specs, p, bs, x, occ):
    """Generic torch mirror of a _SpecNet spec list (subm/conv/bn/relu/
    todense): dense conv masked to the evolving active-site set — the
    reference's spconv semantics (SubM preserves occupancy; SparseConv
    dilates it)."""
    h = x
    tm = torch.from_numpy(occ)[:, None].float()
    for i, spec in enumerate(specs):
        nm = f"l{i}"
        if spec[0] in ("subm", "conv"):
            if spec[0] == "subm":
                _, cin, cout, k, pd, _key = spec
                kern = p[nm]["kernel"].reshape(k, k, cin, cout)
                bias = p[nm]["bias"]
            else:  # ('conv', cin, cout, k, stride, pad, dil), stride/dil 1
                _, cin, cout, k, st, pd, dil = spec
                assert st == 1 and dil == 1
                kern = p[nm]["conv"]["kernel"]
                bias = p[nm]["conv"]["bias"]
                occ = _dilate_occ_np(occ, k)
                tm = torch.from_numpy(occ)[:, None].float()
            layer = tnn.Conv2d(cin, cout, k, 1, pd)
            w = kern.transpose(3, 2, 0, 1)
            with torch.no_grad():
                layer.weight.copy_(torch.from_numpy(np.ascontiguousarray(w)))
                layer.bias.copy_(torch.from_numpy(bias))
                h = layer(h) * tm
        elif spec[0] == "bn":
            layer = tnn.BatchNorm2d(spec[1], eps=1e-5)
            with torch.no_grad():
                layer.weight.copy_(torch.from_numpy(p[nm]["scale"]))
                layer.bias.copy_(torch.from_numpy(p[nm]["bias"]))
                layer.running_mean.copy_(torch.from_numpy(bs[nm]["mean"]))
                layer.running_var.copy_(torch.from_numpy(bs[nm]["var"]))
            layer.eval()
            with torch.no_grad():
                h = layer(h) * tm
        elif spec[0] == "relu":
            h = torch.relu(h)
        elif spec[0] == "todense":
            pass
        else:  # pragma: no cover - no other kinds exist
            raise AssertionError(spec)
    return h


def test_full_z_model_parity(rng):
    """FULL-model parity for the Z-regression family: SingleEndedZConv
    (algorithm-conv SubM stack to a dense [B, 1, NX, NY] z map) vs the
    spec-driven torch mirror with shared randomized weights."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.models.sparse_blocks import SparseConv2DForZ

    n_samples = 8
    cfg = Config({
        "run_config": {"exp_name": "z", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "z", "n_samples": n_samples, "n_type": 2,
                          "type_names": ["a"], "model_base_path": "/tmp/zp",
                          "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_type": "2DConvolution",
                       "algorithm": "conv",
                       "hparams": {"conv": {"kernel_size": 3, "n_layers": 3},
                                   "point": {"pointwise_layers": 1}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPair",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    task = LitZ(cfg)
    n_events, n_in = 8, 2 * n_samples
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=int(rng.integers(1, 4)), replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], n_in)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 64)
    batch = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)
    v = task.model.init(jax.random.PRNGKey(1), batch)
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=np.shape(x)).astype(np.float32) * 0.3),
        v["params"])
    variables = {"params": params}
    if "batch_stats" in v:
        variables["batch_stats"] = v["batch_stats"]
    got = np.asarray(task.model.apply(variables, batch))  # [B, 1, NX, NY]

    specs = SparseConv2DForZ.schedule(n_in, kernel_size=3, n_layers=3)
    # the model wraps the spec net in a single scope
    p = jax.tree.map(np.asarray, params)
    inner = p[next(iter(p))] if len(p) == 1 and "l0" not in p else p
    bs = {}
    if "batch_stats" in v:
        b = jax.tree.map(np.asarray, v["batch_stats"])
        bs = b[next(iter(b))] if len(b) == 1 and "l0" not in b else b
    dense = np.zeros((n_events, NX, NY, n_in), np.float32)
    occ = np.zeros((n_events, NX, NY), bool)
    dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
    occ[coords[:, 2], coords[:, 0], coords[:, 1]] = True
    x = torch.from_numpy(dense).permute(0, 3, 1, 2)
    want = _torch_mirror_specs(specs, inner, bs, x, occ).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_waveform_conv1d_stack_torch_parity(rng):
    """The leading nn.Conv1d waveform stack (ref SCNet.py:69-72: reshape to
    (N, 2, nsamples), torch Conv1d, flatten back in (N, C, L) order) must
    match torch numerically with copied weights."""
    import torch.nn as tnn

    from waveformml_tpu.models.nets import _apply_waveform_layer
    from waveformml_tpu.registry import registry as _reg

    N, S = 6, 16
    feats = np.asarray(rng.normal(size=(N, 2 * S)), dtype=np.float32)

    tconv = tnn.Conv1d(2, 4, 3, 1, 1)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(feats).reshape(N, 2, S))
        ref = torch.relu(ref).reshape(N, -1).numpy()

    conv = _reg.retrieve_class("nn.Conv1d")(2, 4, 3, 1, 1, 1)
    relu = _reg.retrieve_class("nn.ReLU")()
    x0 = jnp.asarray(feats.reshape(N, 2, S).transpose(0, 2, 1))
    params = conv.init(jax.random.PRNGKey(0), x0)
    # torch kernel [out, in, k] -> flax [k, in, out]
    params = {"params": {"conv": {
        "kernel": jnp.asarray(
            tconv.weight.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy())}}}

    class _Bound:
        def __call__(self, x, train=False):
            return conv.apply(params, x, train=train)

    out = _apply_waveform_layer([_Bound(), lambda x, train=False: jax.nn.relu(x)],
                                jnp.asarray(feats), S, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------------
# end-to-end training-trajectory parity (BASELINE accuracy gate, composed)
# ---------------------------------------------------------------------------------

def _flagship_cfg(tmp="/tmp/traj"):
    from waveformml_tpu.config import Config

    return Config({
        "run_config": {"exp_name": "t", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "t", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"], "model_base_path": tmp,
                          "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 8, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })


class _TorchRowFlagship(torch.nn.Module):
    """Weight-shared torch mirror of SubMPSDNet operating in ROW space with
    the SAME neighbor plans: gather-GEMM SubM convs, BatchNorm1d over the
    ACTIVE rows only (the masked-BN semantics), folded (C, site) flatten
    head. Initialized FROM the flax init so both trajectories start at the
    identical point (ref hot loop: main.py:214, LitPSD.py:94-104)."""

    def __init__(self, params):
        super().__init__()
        p = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
        st = p["stack"]

        def t(x):
            return torch.nn.Parameter(torch.from_numpy(x.copy()))

        self.k0, self.b0 = t(st["l0"]["kernel"]), t(st["l0"]["bias"])
        self.k3, self.b3 = t(st["l3"]["kernel"]), t(st["l3"]["bias"])
        self.k6, self.b6 = t(st["l6"]["kernel"]), t(st["l6"]["bias"])
        self.bn1 = tnn.BatchNorm1d(st["l1"]["scale"].shape[0], momentum=0.1)
        self.bn4 = tnn.BatchNorm1d(st["l4"]["scale"].shape[0], momentum=0.1)
        with torch.no_grad():
            self.bn1.weight.copy_(torch.from_numpy(st["l1"]["scale"].copy()))
            self.bn1.bias.copy_(torch.from_numpy(st["l1"]["bias"].copy()))
            self.bn4.weight.copy_(torch.from_numpy(st["l4"]["scale"].copy()))
            self.bn4.bias.copy_(torch.from_numpy(st["l4"]["bias"].copy()))
        self.w_head, self.b_head = t(p["head0"]["kernel"]), t(p["head0"]["bias"])
        self.w_lin = t(p["linear"]["dense_0"]["kernel"])
        self.b_lin = t(p["linear"]["dense_0"]["bias"])

    @staticmethod
    def _subm(x, plan, kernel, bias, mask):
        n = x.shape[0]
        kk, cin, cout = kernel.shape
        gathered = x[plan.clamp(min=0)] * (plan >= 0).unsqueeze(-1)
        out = gathered.reshape(n, kk * cin) @ kernel.reshape(kk * cin, cout)
        out = out + bias
        return out * mask.unsqueeze(-1)

    def _masked_bn(self, bn, x, mask):
        out = torch.zeros_like(x)
        out[mask] = bn(x[mask])
        return out

    def forward(self, feats, plan3, plan1, mask, coords, n_events):
        h = self._subm(feats, plan3, self.k0, self.b0, mask)
        h = torch.relu(self._masked_bn(self.bn1, h, mask))
        h = self._subm(h, plan3, self.k3, self.b3, mask)
        h = torch.relu(self._masked_bn(self.bn4, h, mask))
        h = torch.relu(self._subm(h, plan1, self.k6, self.b6, mask))
        # FoldedSiteLinear: flatten order c*(NX*NY) + x*NY + y
        c = h.shape[1]
        dense = torch.zeros(n_events, c, NX * NY, dtype=h.dtype)
        site = (coords[:, 0] * NY + coords[:, 1]).long()
        ridx = torch.nonzero(mask, as_tuple=True)[0]
        dense[coords[ridx, 2].long(), :, site[ridx]] = h[ridx]
        x = dense.reshape(n_events, -1) @ self.w_head + self.b_head
        return x @ self.w_lin + self.b_lin


def test_training_trajectory_parity(rng, tmp_path):
    """Train the flagship SubMPSDNet 30 steps in BOTH frameworks from the
    identical init (SGD+momentum, shared synthetic batches, an LR decay step
    mid-run mirroring ExponentialLR) and assert the per-step train losses
    match to fp32 tolerance — the BASELINE accuracy-parity gate in one test
    (ref: main.py:214, LitPSD.py:94-104)."""
    from waveformml_tpu import optim as wopt
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = _flagship_cfg(str(tmp_path / "m"))
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)

    n_events, n_in = 12, 16
    blocks = []
    for bi in range(4):
        rows = []
        for e in range(n_events):
            for s in rng.choice(NX * NY, size=3, replace=False):
                rows.append([s % NX, s // NX, e])
        coords = np.asarray(rows, np.int32)
        feats = rng.normal(size=(coords.shape[0], n_in)).astype(np.float32)
        labels = (feats[::3, :8].sum(1) > 0).astype(np.int64)  # learnable
        blocks.append(FileBlock(coords, feats, labels, {}))

    trainer._ensure_state(blocks[0])
    dbs = [{k: jnp.asarray(v) for k, v in trainer._device_batch(b).items()}
           for b in blocks]

    # torch twin built FROM the jax init
    tmodel = _TorchRowFlagship(trainer.state.params)
    lr = cfg.optimize_config.lr
    topt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9)
    crit = tnn.CrossEntropyLoss()

    def torch_step(db):
        m = torch.from_numpy(np.asarray(db["mask"][0]))
        feats = torch.from_numpy(np.asarray(db["feats"][0]))
        plan3 = torch.from_numpy(np.asarray(db["plan_k3"][0]).astype(np.int64))
        plan1 = torch.from_numpy(np.asarray(db["plan_k1"][0]).astype(np.int64))
        coords = torch.from_numpy(np.asarray(db["coords"][0]))
        ymask = np.asarray(db["label_mask"][0])
        y = torch.from_numpy(np.asarray(db["labels"][0])[ymask].astype(np.int64))
        out = tmodel(feats, plan3, plan1, m, coords,
                     int(db["labels"].shape[-1]))
        loss = crit(out[torch.from_numpy(ymask)], y)
        topt.zero_grad()
        loss.backward()
        topt.step()
        return float(loss.detach())

    n_steps = 30
    jl, tl = [], []
    for i in range(n_steps):
        if i == 15:  # ExponentialLR-style decay, mirrored on both sides
            lr *= 0.5
            trainer.state.opt_state = wopt.set_learning_rate(
                trainer.state.opt_state, lr)
            for g in topt.param_groups:
                g["lr"] = lr
        db = dbs[i % len(dbs)]
        out = trainer._train_step_fn(trainer.state.params,
                                     trainer.state.batch_stats,
                                     trainer.state.opt_state,
                                     jax.random.PRNGKey(i), db)
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state) = out[0], out[1], out[2]
        jl.append(float(out[3]))
        tl.append(torch_step(db))

    np.testing.assert_allclose(jl, tl, rtol=2e-3, atol=2e-4)
    assert jl[-1] < jl[0], (jl[0], jl[-1])  # it actually trained
    # the final BN running stats must have tracked identically too
    bs = jax.tree.map(np.asarray, trainer.state.batch_stats)
    np.testing.assert_allclose(bs["stack"]["l1"]["mean"],
                               tmodel.bn1.running_mean.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(bs["stack"]["l4"]["var"],
                               tmodel.bn4.running_var.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_z_training_trajectory_parity(rng, tmp_path):
    """Segment-task trajectory parity: LitZ (SingleEndedZConv, pointwise →
    masked BN → dilating SparseConv → masked L1 segment loss) trains 24
    steps in both frameworks from the identical init with matching
    per-step losses — extends the composed accuracy gate to the
    regular-sparse-conv + segment-loss family
    (ref: LitZ.py:102-106, LitBase.py:124-174)."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.models.sparse_blocks import SparseConv2DForZ
    from waveformml_tpu.parallel.mesh import make_mesh

    n_in = 16
    cfg = Config({
        "run_config": {"exp_name": "z", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "z", "n_samples": n_in // 2,
                          "n_type": 2, "type_names": ["a"],
                          "model_base_path": str(tmp_path / "m"),
                          "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_type": "2DConvolution",
                       "algorithm": "conv",
                       "hparams": {"conv": {"kernel_size": 3,
                                            "n_layers": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPair",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    specs = SparseConv2DForZ.schedule(n_in, 3, 2)
    # pinned shape of the mirrored stack: dilating 3x3 regular sparse conv,
    # masked BN over the DILATED occupancy, relu, 1x1 conv (kernel decay
    # k -= 2 per layer, ref SPConvBlocks.py:261-313), relu, todense
    assert specs == [("conv", n_in, n_in // 2, 3, 1, 1, 1), ("bn", n_in // 2),
                     ("relu",), ("conv", n_in // 2, 1, 1, 1, 0, 1), ("relu",),
                     ("todense",)], specs
    out0 = specs[0][2]

    task = LitZ(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    n_events = 10
    blocks = []
    for _ in range(3):
        rows = []
        for e in range(n_events):
            for s in rng.choice(NX * NY, size=3, replace=False):
                rows.append([s % NX, s // NX, e])
        coords = np.asarray(rows, np.int32)
        feats = rng.normal(size=(coords.shape[0], n_in)).astype(np.float32)
        z = (feats[:, :4].mean(1) * 0.1 + 0.5).astype(np.float32)  # learnable
        blocks.append(FileBlock(coords, feats, z, {}))
    trainer._ensure_state(blocks[0])
    dbs = [{k: jnp.asarray(v) for k, v in trainer._device_batch(b).items()}
           for b in blocks]

    # torch twin from the jax init
    p = jax.tree.map(lambda x: np.asarray(x, np.float32).copy(),
                     trainer.state.params)
    st = {k.split("_", 1)[-1] if False else k: v for k, v in p.items()}
    stack = p[next(iter(p))] if len(p) == 1 else p  # SingleEndedZConv wraps
    # parameter tree: {"SparseConv2DForZ_0": {"l0": {...conv...}, "l1": bn, "l3": conv}}
    stack = p.get("SparseConv2DForZ_0", stack)

    def t(x):
        return torch.nn.Parameter(torch.from_numpy(x))

    # flax conv kernels are HWIO; torch conv2d wants OIHW
    k0 = t(np.ascontiguousarray(
        stack["l0"]["conv"]["kernel"].transpose(3, 2, 0, 1)))
    b0 = t(stack["l0"]["conv"]["bias"])
    k3 = t(np.ascontiguousarray(
        stack["l3"]["conv"]["kernel"].transpose(3, 2, 0, 1)))
    b3 = t(stack["l3"]["conv"]["bias"])
    tbn = tnn.BatchNorm1d(out0, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(stack["l1"]["scale"].copy()))
        tbn.bias.copy_(torch.from_numpy(stack["l1"]["bias"].copy()))
    topt = torch.optim.SGD([k0, b0, k3, b3, tbn.weight, tbn.bias],
                           lr=cfg.optimize_config.lr, momentum=0.9)

    import torch.nn.functional as F

    def torch_step(db, block):
        coords = block.coords
        feats = block.feats
        ne = int(db["labels"].shape[-1])
        dense = np.zeros((ne, NX, NY, n_in), np.float32)
        occ = np.zeros((ne, NX, NY), bool)
        dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
        occ[coords[:, 2], coords[:, 0], coords[:, 1]] = True
        x = torch.from_numpy(dense).permute(0, 3, 1, 2)
        m0 = torch.from_numpy(occ)[:, None].float()
        occ1 = _dilate_occ_np(occ, 3)
        m1 = torch.from_numpy(occ1)[:, None].float()
        # regular sparse conv: output at every site the 3x3 kernel overlaps
        h = F.conv2d(x, k0, b0, padding=1) * m1
        # masked BN (train): stats over the DILATED active pixels
        hp = h.permute(0, 2, 3, 1)[torch.from_numpy(occ1)]  # [P, C]
        hbn = torch.zeros_like(h.permute(0, 2, 3, 1))
        hbn[torch.from_numpy(occ1)] = tbn(hp)
        h = torch.relu(hbn.permute(0, 3, 1, 2))
        out = torch.relu(F.conv2d(h, k3, b3) * m1)            # [B,1,NX,NY]
        # segment L1 over ORIGINAL occupancy (LitBase._calc_segment_loss)
        tgt = np.zeros((ne, 1, NX, NY), np.float32)
        tgt[coords[:, 2], 0, coords[:, 0], coords[:, 1]] = block.labels
        loss = (torch.abs(out * m0 - torch.from_numpy(tgt) * 1.0) * m0).sum() \
            / m0.sum()
        topt.zero_grad()
        loss.backward()
        topt.step()
        return float(loss.detach())

    jl, tl = [], []
    for i in range(24):
        db = dbs[i % 3]
        out = trainer._train_step_fn(trainer.state.params,
                                     trainer.state.batch_stats,
                                     trainer.state.opt_state,
                                     jax.random.PRNGKey(i), db)
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state) = out[0], out[1], out[2]
        jl.append(float(out[3]))
        tl.append(torch_step(db, blocks[i % 3]))
    np.testing.assert_allclose(jl, tl, rtol=2e-3, atol=2e-4)
    assert jl[-1] < jl[0], (jl[0], jl[-1])
