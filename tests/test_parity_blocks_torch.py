"""Per-block torch parity matrix (BASELINE.md hard gate, VERDICT item 5).

Every block family gets a weight-shared parity test against a torch mirror
built to the reference's semantics:

  * LinearBlock / LinearPlanes geometric plane schedules (ref: ConvBlocks.py:49-102)
  * DilationBlock dilated Conv1d stack (ref: ConvBlocks.py:10-46)
  * Conv1DNet expand/contract 1D CNN (ref: ConvBlocks.py:176-217)
  * Conv2DBlock dense 2D stack incl. stride/dilation/pointwise (ref: :220-289)
  * TemporalConvNet with weight_norm + chomp (ref: ConvBlocks.py:105-173)
  * RecurrentNet vs torch nn.RNN (ref: RecurrentBlocks.py)
  * BatchNorm running-stats evolution over multiple TRAIN steps (torch updates
    running_var with the unbiased batch variance)
  * Masked sparse BatchNorm == torch BatchNorm1d over the active rows
  * Strided SparseConv2d → SubM → SparseInverseConv2d occupancy chain vs a
    torch mirror with explicit spconv occupancy algebra (ref: SPConvBlocks.py:730-948)
  * Graph convs (GCN / GAT / EdgeConv) vs hand-built torch message passing
    (ref: GraphNet.py:279-315)

Weight layout conversions: torch Conv [O,I,K...] → flax [K...,I,O]; torch
Linear [O,I] → flax [I,O]; torch BN (weight, bias, running_mean, running_var)
→ flax (scale, bias, batch_stats.mean, batch_stats.var).
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch.nn.utils import weight_norm as t_weight_norm

import jax
import jax.numpy as jnp

RTOL, ATOL = 1e-4, 1e-5


def t2f_conv1d(w):
    return jnp.asarray(w.transpose(2, 1, 0))


def t2f_conv2d(w):
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def t2f_lin(w):
    return jnp.asarray(w.T)


def _np(x):
    return x.detach().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)


def assert_close(got, want):
    np.testing.assert_allclose(_np(got), _np(want), rtol=RTOL, atol=ATOL)


def rand_state(mod, rng, scale=0.5):
    """Randomize a torch module's params (and BN running stats) in-place:
    running variances stay positive, running means keep their sign (so the
    parity tests exercise negative means too)."""
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(scale=scale, size=tuple(p.shape)).astype(np.float32)))
        for name, b in mod.named_buffers():
            if not b.dtype.is_floating_point:
                continue
            v = rng.normal(scale=scale, size=tuple(b.shape)).astype(np.float32)
            if "running_var" in name:
                v = np.abs(v) + 0.5
            b.copy_(torch.from_numpy(v))
    return mod


def bn_to_flax(bn):
    """torch BatchNorm → (params, batch_stats) dicts for the masked BNs."""
    return ({"scale": jnp.asarray(_np(bn.weight)), "bias": jnp.asarray(_np(bn.bias))},
            {"mean": jnp.asarray(_np(bn.running_mean)),
             "var": jnp.asarray(_np(bn.running_var))})


# ---------------------------------------------------------------------------------
# linear blocks
# ---------------------------------------------------------------------------------

def test_linear_block_schedule_parity(rng):
    """LinearBlock(nin,nout,n): plane i = round(nin·(nout/nin)^(i/n)), no
    inter-layer activation (ref: ConvBlocks.py:82-102)."""
    from waveformml_tpu.models.blocks import LinearBlock

    nin, nout, n = 37, 5, 3
    planes = [int(round(nin * (float(nout) / nin) ** (i / n))) for i in range(n + 1)]
    tlayers = [tnn.Linear(planes[i], planes[i + 1]) for i in range(n)]
    tmod = rand_state(tnn.Sequential(*tlayers), rng)

    x = rng.normal(size=(4, nin)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x))

    fparams = {f"dense_{i}": {"kernel": t2f_lin(_np(tlayers[i].weight)),
                              "bias": jnp.asarray(_np(tlayers[i].bias))}
               for i in range(n)}
    got = LinearBlock(nin, nout, n).apply({"params": fparams}, jnp.asarray(x))
    assert_close(got, want)


def test_linear_planes_activation_parity(rng):
    from waveformml_tpu.models.blocks import LinearPlanes

    planes = [8, 6, 3]
    tlayers = [tnn.Linear(planes[i], planes[i + 1]) for i in range(2)]
    tmod = rand_state(tnn.Sequential(
        tlayers[0], tnn.ReLU(), tlayers[1], tnn.ReLU()), rng)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x))
    fparams = {f"dense_{i}": {"kernel": t2f_lin(_np(tlayers[i].weight)),
                              "bias": jnp.asarray(_np(tlayers[i].bias))}
               for i in range(2)}
    got = LinearPlanes(planes, activation=jax.nn.relu).apply(
        {"params": fparams}, jnp.asarray(x))
    assert_close(got, want)


# ---------------------------------------------------------------------------------
# conv1d stacks (eval mode, shared running stats)
# ---------------------------------------------------------------------------------

def _conv_bn_stack_1d(schedule, rng, dilated=True):
    """torch Conv1d+BN1d+ReLU stack for a (cin,cout,fs,st,pd,dil) schedule."""
    layers = []
    for (cin, cout, fs, st, pd, *rest) in schedule:
        dil = rest[0] if (rest and dilated) else 1
        layers += [tnn.Conv1d(cin, cout, fs, st, pd, dil),
                   tnn.BatchNorm1d(cout), tnn.ReLU()]
    return rand_state(tnn.Sequential(*layers), rng).eval()


def _stack_params_to_flax(tmod, conv2d=False):
    """Extract {conv_i, bn_i} flax params + batch_stats from the torch stack."""
    params, stats = {}, {}
    i = 0
    for m in tmod:
        if isinstance(m, (tnn.Conv1d, tnn.Conv2d)):
            conv = m
        elif isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            w = _np(conv.weight)
            params[f"conv_{i}"] = {
                "kernel": t2f_conv2d(w) if conv2d else t2f_conv1d(w),
                "bias": jnp.asarray(_np(conv.bias))}
            p, s = bn_to_flax(m)
            params[f"bn_{i}"], stats[f"bn_{i}"] = p, s
            i += 1
    return params, stats


def test_dilation_block_parity(rng):
    from waveformml_tpu.models.blocks import DilationBlock

    nin, nout, n, length = 6, 3, 3, 32
    blk = DilationBlock(nin, nout, n, length, size_factor=5, pad_factor=1.0,
                        stride_factor=2, dil_factor=2.0)
    sched = blk.schedule(nin, nout, n, 5, 1.0, 2, 2.0)
    # independent oracle, hand-derived from ref ConvBlocks.py:25-38 — the
    # torch mirror below is built FROM the schedule, so this is the only
    # check that the schedule itself matches the reference formulas
    assert sched == [(6, 5, 5, 1, 8, 1), (5, 4, 3, 2, 4, 2), (4, 3, 3, 2, 4, 4)]
    tmod = _conv_bn_stack_1d(sched, rng)
    x = rng.normal(size=(4, length, nin)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    params, stats = _stack_params_to_flax(tmod)
    got = blk.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                    train=False)
    assert got.shape[1] == blk.out_length() == want.shape[1]
    assert_close(got, want)


def test_conv1dnet_parity(rng):
    from waveformml_tpu.models.blocks import Conv1DNet

    net = Conv1DNet(length=40, num_channels=4, out_size=6, num_expand=2,
                    num_contract=2, expand_factor=3.0, size_factor=5,
                    pad_factor=1, stride_factor=2)
    sched, out_len = net.schedule(40, 4, 6, 2, 2, 3.0, 5, 1, 2)
    # hand-derived from ref ConvBlocks.py:181-204 (planes [4,8,12,9,6];
    # decay/stride/kernel/pad per layer) — independent of the code under test
    assert sched == [(4, 8, 5, 1, 2), (8, 12, 4, 1, 1),
                     (12, 9, 2, 1, 0), (9, 6, 2, 2, 0)]
    assert out_len == 19
    tmod = _conv_bn_stack_1d([s + (1,) for s in sched], rng, dilated=False)
    x = rng.normal(size=(3, 40, 4)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    params, stats = _stack_params_to_flax(tmod)
    got = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                    train=False)
    assert got.shape[1:] == net.out_shape() == want.shape[1:]
    assert_close(got, want)


# ---------------------------------------------------------------------------------
# Conv2DBlock (dense 2D, the dense analog of SparseConv2DBlock)
# ---------------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(nin=5, nout=3, n=3, size_factor=3, pad_factor=1.0, stride_factor=1.0),
    dict(nin=5, nout=3, n=3, size_factor=4, pad_factor=0.5, stride_factor=2.0,
         dil_factor=2.0),
    dict(nin=6, nout=3, n=4, size_factor=3, pad_factor=1.0,
         pointwise_factor=0.5, n_expansion=1, expansion_factor=2.0),
])
def test_conv2dblock_parity(rng, kw):
    from waveformml_tpu.models.blocks import Conv2DBlock

    H, W = 14, 11
    blk = Conv2DBlock(size=[H, W, kw["nin"]], **kw)
    sched = blk.schedule(kw["nin"], kw["nout"], kw["n"], kw.get("size_factor", 3),
                         kw.get("pad_factor", 0.0), kw.get("stride_factor", 1.0),
                         kw.get("dil_factor", 1.0), kw.get("expansion_factor", 1.0),
                         kw.get("n_expansion", 0), kw.get("pointwise_factor", 0.0))
    layers = []
    for (cin, cout, fs, st, pd, dil) in sched:
        layers += [tnn.Conv2d(cin, cout, fs, st, pd, dil),
                   tnn.BatchNorm2d(cout), tnn.ReLU()]
    tmod = rand_state(tnn.Sequential(*layers), rng).eval()
    x = rng.normal(size=(2, H, W, kw["nin"])).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    params, stats = _stack_params_to_flax(tmod, conv2d=True)
    got = blk.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                    train=False)
    assert list(got.shape[1:]) == blk.out_size() == list(want.shape[1:])
    assert_close(got, want)


# ---------------------------------------------------------------------------------
# TCN with weight_norm (ref: ConvBlocks.py:105-173)
# ---------------------------------------------------------------------------------

class _TorchTemporalBlock(tnn.Module):
    """Reference TemporalBlock semantics: weight-normed dilated conv, chomp
    (drop the trailing pad), ReLU ×2, 1×1 downsample residual, final ReLU."""

    def __init__(self, nin, nout, k, dilation):
        super().__init__()
        pad = (k - 1) * dilation
        self.pad = pad
        self.conv1 = t_weight_norm(tnn.Conv1d(nin, nout, k, padding=pad,
                                              dilation=dilation))
        self.conv2 = t_weight_norm(tnn.Conv1d(nout, nout, k, padding=pad,
                                              dilation=dilation))
        self.downsample = tnn.Conv1d(nin, nout, 1) if nin != nout else None

    def forward(self, x):
        out = torch.relu(self.conv1(x)[:, :, :-self.pad])
        out = torch.relu(self.conv2(out)[:, :, :-self.pad])
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + res)


def _wn_to_flax(conv):
    """torch weight_norm(Conv1d) → flax {kernel(v), bias} + scale(g)."""
    v = _np(conv.weight_v)                       # [O, I, K]
    g = _np(conv.weight_g).reshape(-1)           # [O]
    return t2f_conv1d(v), jnp.asarray(_np(conv.bias)), jnp.asarray(g)


def test_tcn_weight_norm_parity(rng):
    from waveformml_tpu.models.blocks import TemporalConvNet

    nin, channels, k = 4, [6, 6, 3], 3
    tblocks = []
    for i, ch in enumerate(channels):
        cin = nin if i == 0 else channels[i - 1]
        tblocks.append(_TorchTemporalBlock(cin, ch, k, dilation=2 ** i))
    tmod = rand_state(tnn.Sequential(*tblocks), rng).eval()

    fparams = {}
    for i, tb in enumerate(tblocks):
        v1, b1, g1 = _wn_to_flax(tb.conv1)
        v2, b2, g2 = _wn_to_flax(tb.conv2)
        blk = {"conv1": {"kernel": v1, "bias": b1},
               "conv2": {"kernel": v2, "bias": b2},
               "WeightNorm_0": {"conv1/kernel/scale": g1},
               "WeightNorm_1": {"conv2/kernel/scale": g2}}
        if tb.downsample is not None:
            blk["downsample"] = {"kernel": t2f_conv1d(_np(tb.downsample.weight)),
                                 "bias": jnp.asarray(_np(tb.downsample.bias))}
        fparams[f"tblock_{i}"] = blk

    x = rng.normal(size=(2, 20, nin)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    net = TemporalConvNet(nin, channels, kernel_size=k, dropout=0.0)
    got = net.apply({"params": fparams}, jnp.asarray(x), train=False)
    assert_close(got, want)


# ---------------------------------------------------------------------------------
# RNN (ref: RecurrentBlocks.py)
# ---------------------------------------------------------------------------------

def test_recurrent_net_parity(rng):
    from waveformml_tpu.models.recurrent_blocks import RecurrentNet

    seq, nin, hidden, n_layers, n_lin, nout = 7, 3, 5, 2, 2, 4
    trnn = tnn.RNN(nin, hidden, n_layers, nonlinearity="relu", batch_first=True)
    planes = [int(round(hidden * seq * (float(nout) / (hidden * seq)) ** (i / n_lin)))
              for i in range(n_lin + 1)]
    tlin = tnn.Sequential(*[tnn.Linear(planes[i], planes[i + 1])
                            for i in range(n_lin)])
    tmod = rand_state(tnn.Sequential(), rng)  # seed torch params deterministically
    rand_state(trnn, rng)
    rand_state(tlin, rng)

    x = rng.normal(size=(3, seq, nin)).astype(np.float32)
    with torch.no_grad():
        out, _ = trnn(torch.from_numpy(x))
        want = tlin(out.flatten(1))

    cells = {}
    for l in range(n_layers):
        w_ih = _np(getattr(trnn, f"weight_ih_l{l}"))
        w_hh = _np(getattr(trnn, f"weight_hh_l{l}"))
        b = _np(getattr(trnn, f"bias_ih_l{l}")) + _np(getattr(trnn, f"bias_hh_l{l}"))
        cells[f"cell_{l}"] = {"i": {"kernel": jnp.asarray(w_ih.T),
                                    "bias": jnp.asarray(b)},
                              "h": {"kernel": jnp.asarray(w_hh.T)}}
    lin = {f"dense_{i}": {"kernel": t2f_lin(_np(tlin[i].weight)),
                          "bias": jnp.asarray(_np(tlin[i].bias))}
           for i in range(n_lin)}
    net = RecurrentNet(seq, nin, hidden, n_layers, n_lin, nout)
    got = net.apply({"params": {"rnn_block": cells, "linear": lin}},
                    jnp.asarray(x))
    assert_close(got, want)


# ---------------------------------------------------------------------------------
# BatchNorm running-stats evolution over TRAIN steps
# ---------------------------------------------------------------------------------

def test_batchnorm_running_stats_evolution(rng):
    """3 training steps: per-step outputs AND the running mean/var trajectory
    match torch BatchNorm1d (which normalizes with biased batch variance but
    updates running_var with the unbiased one)."""
    from waveformml_tpu.models.blocks import MaskedArrayBatchNorm

    C, L = 5, 12
    tbn = tnn.BatchNorm1d(C, momentum=0.1)
    tbn.train()
    bn = MaskedArrayBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((2, L, C)), train=True)
    state = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    for step in range(3):
        x = rng.normal(size=(4, L, C)).astype(np.float32) + step
        with torch.no_grad():
            want = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
        got, upd = bn.apply(state, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
        state["batch_stats"] = upd["batch_stats"]
        assert_close(got, want)
        np.testing.assert_allclose(_np(state["batch_stats"]["mean"]),
                                   _np(tbn.running_mean), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(_np(state["batch_stats"]["var"]),
                                   _np(tbn.running_var), rtol=1e-5, atol=1e-6)

    # and eval mode afterwards uses the accumulated stats identically
    x = rng.normal(size=(4, L, C)).astype(np.float32)
    tbn.eval()
    with torch.no_grad():
        want = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    got = bn.apply(state, jnp.asarray(x), train=False)
    assert_close(got, want)


def test_masked_batchnorm_matches_torch_on_active_rows(rng):
    """Sparse BN == torch BatchNorm1d applied to the active feature rows only
    (spconv applies BatchNorm1d to the gathered row matrix)."""
    from waveformml_tpu.ops.sparse_conv import MaskedBatchNorm, SparseGrid

    B, H, W, C = 3, 14, 11, 6
    occ = rng.random((B, H, W)) < 0.15
    occ[0, 0, 0] = True
    feats = np.where(occ[..., None],
                     rng.normal(size=(B, H, W, C)).astype(np.float32), 0)
    g = SparseGrid(jnp.asarray(feats), jnp.asarray(occ))

    tbn = tnn.BatchNorm1d(C, momentum=0.1)
    tbn.train()
    rows = feats[occ]                                     # [N_active, C]
    with torch.no_grad():
        want_rows = tbn(torch.from_numpy(rows))

    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), g, train=True)
    out, upd = bn.apply(variables, g, train=True, mutable=["batch_stats"])
    got_rows = _np(out.features)[occ]
    np.testing.assert_allclose(got_rows, _np(want_rows), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_np(upd["batch_stats"]["mean"]),
                               _np(tbn.running_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(_np(upd["batch_stats"]["var"]),
                               _np(tbn.running_var), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------------
# strided SparseConv2d → SubM → SparseInverseConv2d chain (spconv semantics)
# ---------------------------------------------------------------------------------

def test_sparse_strided_inverse_chain_parity(rng):
    """spconv occupancy algebra in torch: strided SparseConv2d dilates the
    occupancy (active iff window touches an active input), SubM preserves it,
    SparseInverseConv2d = ConvTranspose2d with the paired conv's geometry
    masked to the SAVED occupancy (ref: SPConvBlocks.py:806-811).
    Values and occupancies must match at every stage."""
    from waveformml_tpu.ops.sparse_conv import (
        SparseConv2d, SparseGrid, SparseInverseConv2d, SubMConv2d)

    B, H, W, C1, C2, C3 = 2, 14, 11, 4, 6, 5
    K, S, P = 3, 2, 1
    occ = rng.random((B, H, W)) < 0.12
    occ[:, 3, 4] = True
    feats = np.where(occ[..., None],
                     rng.normal(size=(B, H, W, C1)).astype(np.float32), 0)

    # torch weights
    w1 = rng.normal(size=(C2, C1, K, K)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(C2,)).astype(np.float32)
    w2 = rng.normal(size=(C3, C2, K, K)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(C3,)).astype(np.float32)
    wi = rng.normal(size=(C3, C3, K, K)).astype(np.float32) * 0.3  # [I,O,KH,KW]
    bi = rng.normal(size=(C3,)).astype(np.float32)

    # ---- torch mirror with explicit occupancy algebra ----
    x = torch.from_numpy(feats).permute(0, 3, 1, 2)
    m0 = torch.from_numpy(occ)
    conv = tnn.Conv2d(C1, C2, K, S, P)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w1))
        conv.bias.copy_(torch.from_numpy(b1))
        h = conv(x)
        # occupancy dilation: max-pool of the mask with the conv geometry
        m1 = tnn.functional.max_pool2d(m0[:, None].float(), K, S, P) > 0
        h = h * m1.float()

        subm = tnn.Conv2d(C2, C3, K, 1, (K - 1) // 2)
        subm.weight.copy_(torch.from_numpy(w2))
        subm.bias.copy_(torch.from_numpy(b2))
        h2 = subm(h) * m1.float()

        # the floor-cut tail ((i+2p-k) % s != 0) is expressed in torch via
        # output_padding, which restores the saved shape with REAL transposed
        # conv contributions at the tail sites
        op = (occ.shape[1] - ((h.shape[2] - 1) * S - 2 * P + K),
              occ.shape[2] - ((h.shape[3] - 1) * S - 2 * P + K))
        inv = tnn.ConvTranspose2d(C3, C3, K, S, P, output_padding=op)
        inv.weight.copy_(torch.from_numpy(wi))
        inv.bias.copy_(torch.from_numpy(bi))
        h3 = inv(h2 * m1.float())
        want = h3 * m0[:, None].float()

    # ---- this framework ----
    g = SparseGrid(jnp.asarray(feats), jnp.asarray(occ))
    l1 = SparseConv2d(C1, C2, K, S, P, indice_key="down")
    v1 = {"params": {"conv": {"kernel": t2f_conv2d(w1), "bias": jnp.asarray(b1)}}}
    g1 = l1.apply(v1, g)
    np.testing.assert_array_equal(_np(g1.occupancy), _np(m1[:, 0]))

    l2 = SubMConv2d(C2, C3, K)
    v2 = {"params": {"conv": {"kernel": t2f_conv2d(w2), "bias": jnp.asarray(b2)}}}
    g2 = l2.apply(v2, g1)
    np.testing.assert_array_equal(_np(g2.occupancy), _np(g1.occupancy))

    l3 = SparseInverseConv2d(C3, C3, K, indice_key="down")
    # torch ConvTranspose weight [I,O,KH,KW] → our inverse kernel [KH,KW,I,O]
    v3 = {"params": {"kernel": jnp.asarray(wi.transpose(2, 3, 0, 1)),
                     "bias": jnp.asarray(bi)}}
    g3 = l3.apply(v3, g2)
    np.testing.assert_array_equal(_np(g3.occupancy), occ)
    got = jnp.transpose(g3.features, (0, 3, 1, 2))
    assert_close(got, want)


def test_inverse_conv_requires_matching_kernel(rng):
    from waveformml_tpu.ops.sparse_conv import (
        SparseConv2d, SparseGrid, SparseInverseConv2d)

    occ = np.zeros((1, 14, 11), bool)
    occ[0, 5, 5] = True
    g = SparseGrid(jnp.asarray(np.where(occ[..., None], 1.0, 0.0).astype(np.float32)),
                   jnp.asarray(occ))
    g1 = SparseConv2d(1, 2, 3, 2, 1, indice_key="k").apply(
        {"params": {"conv": {"kernel": jnp.zeros((3, 3, 1, 2)),
                             "bias": jnp.zeros(2)}}}, g)
    bad = SparseInverseConv2d(2, 2, 5, indice_key="k")
    with pytest.raises(ValueError, match="paired conv kernel"):
        bad.init(jax.random.PRNGKey(0), g1)


# ---------------------------------------------------------------------------------
# graph convs vs hand-built torch message passing (ref: GraphNet.py:279-315)
# ---------------------------------------------------------------------------------

def _graph(rng, n=10, e=40, f=6):
    x = rng.normal(size=(n, f)).astype(np.float32)
    edges = rng.integers(0, n, size=(2, e)).astype(np.int32)
    mask = np.ones(e, bool)
    mask[-8:] = False                            # padded edges must be ignored
    edges[:, -8:] = rng.integers(0, n, size=(2, 8))  # garbage in padding
    return x, edges, mask


def test_gcn_parity(rng):
    from waveformml_tpu.models.graph_layers import GCNConv

    x, edges, mask = _graph(rng)
    n, f, out = x.shape[0], x.shape[1], 4
    W = rng.normal(size=(out, f)).astype(np.float32)
    b = rng.normal(size=(out,)).astype(np.float32)

    # torch mirror of PyG GCNConv: gcn_norm uses add_REMAINING_self_loops,
    # so a pre-existing (i, i) edge counts exactly once — drop chance loops
    # from the random graph before appending one per node (Â = A + I)
    tx = torch.from_numpy(x)
    h = tx @ torch.from_numpy(W.T)
    loops = torch.arange(n, dtype=torch.int64)
    s0 = torch.from_numpy(edges[0][mask].astype(np.int64))
    d0 = torch.from_numpy(edges[1][mask].astype(np.int64))
    keep = s0 != d0
    src = torch.cat([s0[keep], loops])
    dst = torch.cat([d0[keep], loops])
    deg = torch.zeros(n).index_add_(0, dst, torch.ones(len(dst)))
    dinv = deg.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0  # PyG masked_fill of inf
    coeff = dinv[src] * dinv[dst]
    want = torch.zeros(n, out).index_add_(0, dst, h[src] * coeff[:, None])
    want = want + torch.from_numpy(b)

    layer = GCNConv(f, out)
    got = layer.apply({"params": {"lin": {"kernel": t2f_lin(W)}, "bias": jnp.asarray(b)}},
                      jnp.asarray(x), jnp.asarray(edges), jnp.asarray(mask))
    assert_close(got, want)


def test_gat_parity(rng):
    from waveformml_tpu.models.graph_layers import GATConv

    x, edges, mask = _graph(rng)
    n, f, out = x.shape[0], x.shape[1], 4
    W = rng.normal(size=(out, f)).astype(np.float32)
    a_src = rng.normal(size=(1, out)).astype(np.float32)
    a_dst = rng.normal(size=(1, out)).astype(np.float32)

    # torch mirror of PyG GATConv: remove_self_loops + add_self_loops —
    # exactly one loop per node, so drop the random graph's chance loops
    tx = torch.from_numpy(x)
    h = tx @ torch.from_numpy(W.T)
    loops = torch.arange(n, dtype=torch.int64)
    s0 = torch.from_numpy(edges[0][mask].astype(np.int64))
    d0 = torch.from_numpy(edges[1][mask].astype(np.int64))
    keep = s0 != d0
    src = torch.cat([s0[keep], loops])
    dst = torch.cat([d0[keep], loops])
    logits = (h[src] * torch.from_numpy(a_src[0])).sum(-1) + \
             (h[dst] * torch.from_numpy(a_dst[0])).sum(-1)
    logits = tnn.functional.leaky_relu(logits, 0.2)
    # per-destination softmax over incoming edges (incl. the self-loop)
    alpha = torch.zeros(len(src))
    for j in range(n):
        sel = dst == j
        if sel.any():
            alpha[sel] = torch.softmax(logits[sel], dim=0)
    want = torch.zeros(n, out).index_add_(0, dst, h[src] * alpha[:, None])

    layer = GATConv(f, out, heads=1)
    got = layer.apply({"params": {"lin": {"kernel": t2f_lin(W)},
                                  "att_src": jnp.asarray(a_src),
                                  "att_dst": jnp.asarray(a_dst),
                                  "bias": jnp.zeros((out,))}},
                      jnp.asarray(x), jnp.asarray(edges), jnp.asarray(mask))
    assert_close(got, want)


def test_edgeconv_parity(rng):
    from waveformml_tpu.models.blocks import LinearPlanes
    from waveformml_tpu.models.graph_layers import EdgeConv

    x, edges, mask = _graph(rng)
    n, f, out = x.shape[0], x.shape[1], 4
    W = rng.normal(size=(out, 2 * f)).astype(np.float32)
    b = rng.normal(size=(out,)).astype(np.float32)

    tx = torch.from_numpy(x)
    src = torch.from_numpy(edges[0][mask].astype(np.int64))
    dst = torch.from_numpy(edges[1][mask].astype(np.int64))
    z = torch.cat([tx[dst], tx[src] - tx[dst]], dim=-1)
    msg = torch.relu(z @ torch.from_numpy(W.T) + torch.from_numpy(b))
    want = torch.zeros(n, out)
    for j in range(n):
        sel = dst == j
        if sel.any():
            want[j] = msg[sel].max(dim=0).values

    layer = EdgeConv(net=LinearPlanes([2 * f, out], activation=jax.nn.relu))
    got = layer.apply({"params": {"net": {"dense_0": {
        "kernel": t2f_lin(W), "bias": jnp.asarray(b)}}}},
        jnp.asarray(x), jnp.asarray(edges), jnp.asarray(mask))
    assert_close(got, want)


def test_masked_batchnorm_gradients_match_torch(rng):
    """TRAIN-mode masked-BN GRADIENTS == torch BatchNorm1d autodiff over the
    active rows: d_input, d_scale, d_bias under a random cotangent. The
    forward/running-stats parity above does not exercise the batch-stat
    dependence of the backward (d_out/d_in couples through mean and var)."""
    from waveformml_tpu.ops.sparse_conv import MaskedBatchNorm, SparseGrid

    B, H, W, C = 3, 14, 11, 6
    occ = rng.random((B, H, W)) < 0.15
    occ[0, 0, 0] = True
    feats = np.where(occ[..., None],
                     rng.normal(size=(B, H, W, C)).astype(np.float32), 0)
    probe = np.where(occ[..., None],
                     rng.normal(size=(B, H, W, C)).astype(np.float32), 0)
    scale = rng.uniform(0.5, 1.5, C).astype(np.float32)
    bias = rng.normal(size=C).astype(np.float32)

    # torch: BatchNorm1d over the gathered active rows, train mode
    tbn = tnn.BatchNorm1d(C, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
    tbn.train()
    rows_t = torch.from_numpy(feats[occ]).requires_grad_(True)
    out_t = tbn(rows_t)
    (out_t * torch.from_numpy(probe[occ])).sum().backward()

    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0),
                        SparseGrid(jnp.asarray(feats), jnp.asarray(occ)),
                        train=True)
    stats = variables.get("batch_stats")

    def loss(params, f):
        g = SparseGrid(f, jnp.asarray(occ))
        out, _ = bn.apply({"params": params, "batch_stats": stats}, g,
                          train=True, mutable=["batch_stats"])
        return jnp.sum(out.features * jnp.asarray(probe))

    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    d_params, d_feats = jax.grad(loss, argnums=(0, 1))(params,
                                                       jnp.asarray(feats))
    np.testing.assert_allclose(_np(d_feats)[occ], _np(rows_t.grad),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(_np(d_params["scale"]), _np(tbn.weight.grad),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(_np(d_params["bias"]), _np(tbn.bias.grad),
                               rtol=1e-3, atol=1e-4)
