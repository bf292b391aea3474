"""Row-space submanifold convolution: gather-GEMM on active sites only.

The dense-grid sparse conv (ops.sparse_conv) materializes [B, NX, NY, C]
tensors whose occupancy is ~2% — at large batch the HBM traffic of those
zeros dominates the step. For SubMConv stacks (output sites = input sites,
stride 1 — the LitZ/LitEZ/SegClassifier model families and any version-1/2
block) the TPU-native fast path works in ROW space:

  1. a tiny int32 scatter builds the site→row map [B·NX·NY] (the spconv
     "indice key" equivalent — built once per batch, shared by every layer),
  2. per-row neighbor indices come from coordinate arithmetic + gather,
  3. the conv is one MXU GEMM: gathered neighbor features [N, K²·C] times the
     kernel [K²·C, C_out], masked where neighbors are absent.

Per-event traffic drops ~20× vs the dense path; FLOPs drop by the occupancy
factor. Exact same numerics as the dense SubM conv (tests assert equality).
"""
from __future__ import annotations

import contextlib
from typing import Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch


def build_site_lookup(batch: SparseBatch) -> jax.Array:
    """site→row map [B·NX·NY] int32; -1 where no active row. Padding rows'
    flat_site() is out of bounds and dropped by the scatter."""
    n = batch.n_rows
    size = batch.n_events * NX * NY
    lut = jnp.full((size,), -1, jnp.int32)
    return lut.at[batch.flat_site()].set(jnp.arange(n, dtype=jnp.int32),
                                         mode="drop")


def build_neighbor_plan(batch: SparseBatch, kernel_size: int,
                        lut: Optional[jax.Array] = None) -> jax.Array:
    """Neighbor row indices [N, K²] for a centered K×K window; -1 where the
    neighbor site is inactive or out of bounds."""
    k = kernel_size
    if k % 2 != 1:
        # the custom VJP flips the kernel and reuses this plan for d_feats,
        # which is only valid for a negation-symmetric (odd-k) window;
        # even k would produce silently wrong input gradients
        raise ValueError(f"row-space SubM conv requires an odd kernel size, got {k}")
    if lut is None:
        lut = build_site_lookup(batch)
    half = (k - 1) // 2
    offs = [(dx, dy) for dx in range(-half, k - half) for dy in range(-half, k - half)]
    x, y, ev = batch.x, batch.y, batch.event
    size = batch.n_events * NX * NY
    rows = []
    for dx, dy in offs:
        nx_, ny_ = x + dx, y + dy
        valid = (nx_ >= 0) & (nx_ < NX) & (ny_ >= 0) & (ny_ < NY) & batch.mask
        site = ev * (NX * NY) + nx_ * NY + ny_
        site = jnp.clip(site, 0, size - 1)
        rows.append(jnp.where(valid, lut[site], -1))
    return jnp.stack(rows, axis=1)               # [N, K²], -1 where absent


def build_site_lookup_3d(batch: SparseBatch, n_t: int) -> jax.Array:
    """(x, y, t) site→row map [B·NX·NY·T] int32 for 4-column batches."""
    n = batch.n_rows
    size = batch.n_events * NX * NY * n_t
    lut = jnp.full((size,), -1, jnp.int32)
    return lut.at[batch.flat_site_3d(n_t)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


def build_neighbor_plan_3d(batch: SparseBatch, kernel_size: int, n_t: int,
                           lut: Optional[jax.Array] = None) -> jax.Array:
    """Neighbor row indices [N, K³] for a centered K×K×K window over
    (x, y, t); -1 where the neighbor site is inactive or out of bounds."""
    k = kernel_size
    if k % 2 != 1:
        # same constraint as the 2D plan: the custom VJP reuses a k-reversed
        # plan for d_feats, valid only for negation-symmetric (odd-k) windows
        raise ValueError(f"row-space SubM conv requires an odd kernel size, got {k}")
    if lut is None:
        lut = build_site_lookup_3d(batch, n_t)
    half = (k - 1) // 2
    offs = [(dx, dy, dt) for dx in range(-half, k - half)
            for dy in range(-half, k - half) for dt in range(-half, k - half)]
    x, y, t, ev = batch.x, batch.y, batch.t, batch.event
    size = batch.n_events * NX * NY * n_t
    rows = []
    for dx, dy, dt in offs:
        nx_, ny_, nt_ = x + dx, y + dy, t + dt
        valid = ((nx_ >= 0) & (nx_ < NX) & (ny_ >= 0) & (ny_ < NY)
                 & (nt_ >= 0) & (nt_ < n_t) & batch.mask)
        site = ev * (NX * NY * n_t) + nx_ * (NY * n_t) + ny_ * n_t + nt_
        site = jnp.clip(site, 0, size - 1)
        rows.append(jnp.where(valid, lut[site], -1))
    return jnp.stack(rows, axis=1)               # [N, K³], -1 where absent


# ---------------------------------------------------------------------------------
# host-side plan prefetch
#
# The neighbor plan depends only on the batch's coordinates, so it does not
# have to be rebuilt on device inside every train step (the site-LUT scatter
# over [B*NX*NY] plus K^n masked gathers measured ~3-4 ms of the 13.6 ms
# flagship step — docs/PERF_NOTES.md ablation). Instead the host builds the
# [N, K^n] int32 plan with numpy while the device runs the PREVIOUS step and
# ships it with the batch (the loader already prefetches on a thread), and
# the step consumes it via SparseBatch.plans. The numpy builders below are
# exact twins of the traced builders above; tests assert elementwise equality.
# ---------------------------------------------------------------------------------

#: while tracing a model (flax init), the row forward records every
#: (kernel_size, ndim, n_t) it had to build in-trace here, so the task's
#: prepare_block knows which plans to prefetch for subsequent batches
PLAN_RECORDER: Optional[Set[Tuple[int, int, Optional[int]]]] = None


@contextlib.contextmanager
def record_plan_requirements(into: Set[Tuple[int, int, Optional[int]]]):
    """Collect the row-conv plan requirements observed while tracing."""
    global PLAN_RECORDER
    prev = PLAN_RECORDER
    PLAN_RECORDER = into
    try:
        yield into
    finally:
        PLAN_RECORDER = prev


def _record_requirement(k: int, ndim: int, n_t: Optional[int]) -> None:
    if PLAN_RECORDER is not None:
        PLAN_RECORDER.add((k, ndim, n_t))


def host_neighbor_plan(coords: np.ndarray, mask: np.ndarray, n_events: int,
                       kernel_size: int, n_t: Optional[int] = None) -> np.ndarray:
    """Numpy twin of build_neighbor_plan / build_neighbor_plan_3d (pass n_t
    for the 3D K³ window): identical [N, K^n] int32 output, built on host."""
    k = int(kernel_size)
    if k % 2 != 1:
        raise ValueError(f"row-space SubM conv requires an odd kernel size, got {k}")
    is3d = n_t is not None
    # int32 index math throughout: the flat site index tops out at
    # n_events*NX*NY*n_t (< 2^31 for any realistic batch) and int32 halves
    # the gather/compare traffic on the host (this builder runs per batch)
    x = coords[:, 0].astype(np.int32)
    y = coords[:, 1].astype(np.int32)
    ev = coords[:, -1].astype(np.int32)
    m = np.asarray(mask, dtype=bool)
    if is3d:
        t = coords[:, 2].astype(np.int32)
        size = int(n_events) * NX * NY * int(n_t)
        flat = ev * (NX * NY * n_t) + x * (NY * n_t) + y * n_t + t
    else:
        size = int(n_events) * NX * NY
        flat = ev * (NX * NY) + x * NY + y
    assert size < 2 ** 31, "flat site index overflows int32"
    lut = np.full((size,), -1, np.int32)
    rows = np.arange(coords.shape[0], dtype=np.int32)
    in_range = m & (flat >= 0) & (flat < size)
    lut[flat[in_range]] = rows[in_range]
    half = (k - 1) // 2
    rng = range(-half, k - half)
    offs = np.asarray([(dx, dy, dt) for dx in rng for dy in rng for dt in rng]
                      if is3d else [(dx, dy) for dx in rng for dy in rng],
                      dtype=np.int32)
    # one broadcast pass over all K^n offsets: [N, K^n]
    nx_ = x[:, None] + offs[None, :, 0]
    ny_ = y[:, None] + offs[None, :, 1]
    valid = ((nx_ >= 0) & (nx_ < NX) & (ny_ >= 0) & (ny_ < NY)
             & m[:, None])
    if is3d:
        nt_ = t[:, None] + offs[None, :, 2]
        valid &= (nt_ >= 0) & (nt_ < n_t)
        site = (ev[:, None] * (NX * NY * n_t) + nx_ * (NY * n_t)
                + ny_ * n_t + nt_)
    else:
        site = ev[:, None] * (NX * NY) + nx_ * NY + ny_
    np.clip(site, 0, size - 1, out=site)
    plan = lut[site]
    plan[~valid] = -1
    return plan


def _masked_gather(feats: jax.Array, plan: jax.Array) -> jax.Array:
    """[N, K², C] neighbor operand with absent (-1) taps as zero rows.

    Absent taps index an appended all-zero row instead of select-masking
    the gathered values: the compiled TPU HLO for the select variant
    materialized a SECOND [N·K², C] operand (kLoop broadcast_select fusion,
    28 MB/conv at w128) between the gather and the GEMM — redirecting the
    index makes the gather itself produce the masked operand."""
    n, c = feats.shape
    fp = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)])
    return fp[jnp.where(plan >= 0, plan, n)]


def _gather_gemm(feats: jax.Array, plan: jax.Array, kernel: jax.Array) -> jax.Array:
    n, c = feats.shape
    kk, _, cout = kernel.shape
    gathered = _masked_gather(feats, plan)               # [N, K², C]
    # GEMM orientation is width-dependent (measured on v5e, same session):
    # with the gathered operand as LHS, XLA materializes a transposed
    # [K²C, N] copy of it (27 MB/conv at w128 in the compiled HLO); putting
    # the small kernel on the LHS avoids that copy and wins at narrow
    # output widths (heavy w64 step 4.70 -> 3.93 ms), but loses at wide
    # ones (w128 4.55 -> 4.97 ms — the [Cout, N]-major result orientation
    # costs more than the operand copy once Cout fills MXU tiles)
    if cout <= 96:
        out_t = jax.lax.dot_general(
            kernel.reshape(kk * c, cout), gathered.reshape(n, kk * c),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Cout, N]
        return out_t.T.astype(feats.dtype)
    return jax.lax.dot_general(
        gathered.reshape(n, kk * c), kernel.reshape(kk * c, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(feats.dtype)


@jax.custom_vjp
def subm_conv_rows(feats: jax.Array, plan: jax.Array, kernel: jax.Array,
                   bias: Optional[jax.Array], mask: jax.Array) -> jax.Array:
    """Row-space SubM conv: out[r] = Σ_k feats[plan[r, k]] @ kernel[k] + bias.

    feats [N, C]; plan [N, K²] (-1 absent); kernel [K², C, Cout] (flax HWIO
    kernel reshaped); returns [N, Cout], zero at padding rows.

    Custom VJP: the centered full-window offset set is symmetric
    (site_s = site_r + o_k ⟺ site_r = site_s + o_{K²-1-k}), so the
    input-gradient is itself a row conv with the k-reversed plan and
    transposed kernel — a GATHER-GEMM instead of the scatter-add XLA would
    otherwise emit (TPU scatters are the most expensive op in the step).
    """
    out = _gather_gemm(feats, plan, kernel)
    if bias is not None:
        out = out + bias
    return jnp.where(mask[:, None], out, 0)


def _subm_fwd(feats, plan, kernel, bias, mask):
    return subm_conv_rows(feats, plan, kernel, bias, mask), \
        (feats, plan, kernel, bias is not None, mask)


def _subm_bwd(res, g):
    feats, plan, kernel, has_bias, mask = res
    g = jnp.where(mask[:, None], g, 0).astype(feats.dtype)
    # d feats: reverse the window (k → K²-1-k), transpose Cin/Cout
    kernel_t = jnp.flip(kernel, axis=0).transpose(0, 2, 1)   # [K², Cout, C]
    d_feats = _gather_gemm(g, plan, kernel_t)
    d_feats = jnp.where(mask[:, None], d_feats, 0)
    # d kernel: same forward gather contracted against g
    n, c = feats.shape
    kk = plan.shape[1]
    gathered = _masked_gather(feats, plan)               # [N, K², C]
    # (orientation measured: putting g on the LHS here is neutral within
    # phase noise — unlike the forward, XLA already schedules this
    # contraction's layouts well — so the straightforward form stays)
    d_kernel = jax.lax.dot_general(
        gathered.reshape(n, kk * c), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(kk, c, -1).astype(kernel.dtype)
    d_bias = jnp.sum(g, axis=0).astype(kernel.dtype) if has_bias else None
    return d_feats, None, d_kernel, d_bias, None


subm_conv_rows.defvjp(_subm_fwd, _subm_bwd)


def rows_to_dense(rows: jax.Array, batch: SparseBatch) -> jax.Array:
    """Scatter final row outputs [N, C] to torch-layout dense [B, C, NX, NY]
    (the ToDense tail — only the small final channel count pays scatter cost)."""
    B = batch.n_events
    c = rows.shape[-1]
    flat = jnp.zeros((B * NX * NY, c), rows.dtype)
    flat = flat.at[batch.flat_site()].add(
        jnp.where(batch.mask[:, None], rows, 0), mode="drop")
    return jnp.transpose(flat.reshape(B, NX, NY, c), (0, 3, 1, 2))


def rows_to_dense_3d(rows: jax.Array, batch: SparseBatch, n_t: int) -> jax.Array:
    """Scatter row outputs [N, C] to torch-layout dense [B, C, NX, NY, T]."""
    B = batch.n_events
    c = rows.shape[-1]
    flat = jnp.zeros((B * NX * NY * n_t, c), rows.dtype)
    flat = flat.at[batch.flat_site_3d(n_t)].add(
        jnp.where(batch.mask[:, None], rows, 0), mode="drop")
    return jnp.transpose(flat.reshape(B, NX, NY, n_t, c), (0, 4, 1, 2, 3))
