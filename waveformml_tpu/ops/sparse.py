"""Static-shape sparse detector batches and dense-grid scatter/gather.

The reference moves ragged ``[coords(N,3), feats(N,F)]`` tensors around and
relies on spconv/SparseConvNet C++/CUDA machinery (ref:
src/models/SPConvNet.py:49-52 SparseConvTensor construction,
src/engineering/LitBase.py:124-174 sparse→dense masked losses). XLA wants
static shapes, and the detector grid is tiny (14×11 = 154 sites), so the
TPU-native representation is:

  * ``SparseBatch``: coords[N,3] int32 (x, y, event), feats[N,F], mask[N]
    padded to a static N per bucket — a registered pytree, jit-stable.
  * dense layout: feats scattered to [B, NX, NY, F] with an occupancy mask
    [B, NX, NY]; all convolutions become dense MXU work and sparse-conv
    semantics (SubM / regular / inverse) reduce to exact occupancy-mask
    algebra (see waveformml_tpu.ops.sparse_conv).

Host-side (numpy) helpers at the bottom serve the prediction writer
(ref: src/utils/SparseUtils.py:1459-1584 swap_sparse_from_dense /
gen_multiplicity_list / normalize_waveforms).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.detector import NX, NY


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseBatch:
    """A padded batch of sparse detector pulses.

    coords: [N, 3] int32 — (x, y, event_index), or [N, 4] (x, y, t, event)
            for 3D nets (ref PulseDataset3D batch_index=3, PulseDataset.py:585-625);
            the event index is always the LAST column. Padding rows have coords 0.
    feats:  [N, F] float — per-site features (waveform samples or phys features)
    mask:   [N] bool — True for real rows, False for padding
    n_events: static int — number of events B in the batch
    plans:  optional {"k<K>": [N, K^n] int32} host-prefetched neighbor plans
            for the row-space SubM fast path (ops.row_conv.host_neighbor_plan);
            when absent the plan is built in-trace on device instead
    """

    coords: jax.Array
    feats: jax.Array
    mask: jax.Array
    n_events: int = dataclasses.field(metadata=dict(static=True))
    plans: Optional[dict] = None

    @property
    def x(self) -> jax.Array:
        return self.coords[:, 0]

    @property
    def y(self) -> jax.Array:
        return self.coords[:, 1]

    @property
    def t(self) -> jax.Array:
        """Time-sample coordinate (3D batches only: coords [N, 4])."""
        assert self.coords.shape[1] == 4, "t requires 4-column (3D) coords"
        return self.coords[:, 2]

    @property
    def event(self) -> jax.Array:
        return self.coords[:, -1]

    @property
    def n_rows(self) -> int:
        return self.coords.shape[0]

    @property
    def n_features(self) -> int:
        return self.feats.shape[-1]

    def flat_site(self) -> jax.Array:
        """Flattened (event, x, y) index into a [B*NX*NY] dense grid; padding
        rows are pushed to an out-of-range slot handled by scatter 'drop' mode."""
        idx = (self.event * (NX * NY) + self.x * NY + self.y).astype(jnp.int32)
        return jnp.where(self.mask, idx, self.n_events * NX * NY)

    def flat_site_3d(self, n_t: int) -> jax.Array:
        """Flattened (event, x, y, t) index into a [B*NX*NY*T] dense grid."""
        idx = (self.event * (NX * NY * n_t) + self.x * (NY * n_t)
               + self.y * n_t + self.t).astype(jnp.int32)
        return jnp.where(self.mask, idx, self.n_events * NX * NY * n_t)


def bucket_size(n: int, buckets: Tuple[int, ...] = (
        256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288,
        16384, 24576, 32768, 49152, 65536)) -> int:
    """Smallest bucket ≥ n; limits the number of distinct compiled shapes.

    The table interleaves 3·2^k sizes between powers of two: worst-case
    padding waste drops from 50% to 25% at the cost of 2× as many potential
    compiled shapes (padding rows are pure wasted FLOPs/HBM on the conv path).
    """
    for b in buckets:
        if n <= b:
            return b
    # round up to next power of two beyond the table
    p = 1 << (int(n) - 1).bit_length()
    return p


def pad_sparse(coords: np.ndarray, feats: np.ndarray, n_rows: int,
               labels: Optional[np.ndarray] = None, label_pad: float = 0):
    """Host-side pad of ragged (coords, feats[, labels]) to static n_rows."""
    n = coords.shape[0]
    assert n <= n_rows, f"batch has {n} rows > bucket {n_rows}"
    mask = np.zeros(n_rows, dtype=bool)
    mask[:n] = True
    c = np.zeros((n_rows, coords.shape[1]), dtype=np.int32)
    c[:n] = coords
    f = np.zeros((n_rows, feats.shape[1]), dtype=feats.dtype)
    f[:n] = feats
    if labels is None:
        return c, f, mask
    if labels.ndim == 1:
        l = np.full((n_rows,), label_pad, dtype=labels.dtype)
    else:
        l = np.full((n_rows, labels.shape[1]), label_pad, dtype=labels.dtype)
    l[:n] = labels
    return c, f, mask, l


# ---------------------------------------------------------------------------------
# device scatter/gather between sparse rows and the dense [B, NX, NY, F] grid
# ---------------------------------------------------------------------------------

def scatter_to_dense(batch: SparseBatch, feats: Optional[jax.Array] = None) -> jax.Array:
    """Scatter sparse features onto the dense grid: [B, NX, NY, F].

    Padding rows are dropped (out-of-range scatter index). Equivalent of
    spconv.SparseConvTensor(...).dense() (ref: LitBase.py:124-174,
    AD1Evaluator.py:84-95 get_dense_matrix) but pure XLA scatter.
    """
    f = batch.feats if feats is None else feats
    B = batch.n_events
    flat = jnp.zeros((B * NX * NY, f.shape[-1]), dtype=f.dtype)
    flat = flat.at[batch.flat_site()].add(jnp.where(batch.mask[:, None], f, 0),
                                          mode="drop")
    return flat.reshape(B, NX, NY, f.shape[-1])


def occupancy_mask(batch: SparseBatch) -> jax.Array:
    """Dense occupancy: [B, NX, NY] bool, True where a real pulse exists."""
    B = batch.n_events
    flat = jnp.zeros((B * NX * NY,), dtype=jnp.bool_)
    flat = flat.at[batch.flat_site()].set(True, mode="drop")
    return flat.reshape(B, NX, NY)


def scatter_to_dense_3d(batch: SparseBatch, n_t: int,
                        feats: Optional[jax.Array] = None) -> jax.Array:
    """Scatter a 3D (x, y, t) sparse batch onto [B, NX, NY, T, F] — the
    spconv.SparseConvTensor equivalent for net_type 3DConvolution
    (ref: SPConvNet.py:47-49 spatial_size [14, 11, n_samples])."""
    f = batch.feats if feats is None else feats
    B = batch.n_events
    flat = jnp.zeros((B * NX * NY * n_t, f.shape[-1]), dtype=f.dtype)
    flat = flat.at[batch.flat_site_3d(n_t)].add(
        jnp.where(batch.mask[:, None], f, 0), mode="drop")
    return flat.reshape(B, NX, NY, n_t, f.shape[-1])


def occupancy_mask_3d(batch: SparseBatch, n_t: int) -> jax.Array:
    """Dense 3D occupancy: [B, NX, NY, T] bool."""
    B = batch.n_events
    flat = jnp.zeros((B * NX * NY * n_t,), dtype=jnp.bool_)
    flat = flat.at[batch.flat_site_3d(n_t)].set(True, mode="drop")
    return flat.reshape(B, NX, NY, n_t)


def gather_from_dense(dense: jax.Array, batch: SparseBatch) -> jax.Array:
    """Gather dense [B, NX, NY, F] values back at the batch's sparse sites →
    [N, F]; padding rows read site 0 of event 0 but are masked to zero."""
    B, _, _, F = dense.shape
    flat = dense.reshape(B * NX * NY, F)
    idx = jnp.where(batch.mask, batch.flat_site(), 0)
    out = flat[idx]
    return jnp.where(batch.mask[:, None], out, 0)


def event_multiplicity(batch: SparseBatch) -> jax.Array:
    """Pulses per event: [B] int32 (ref: SparseUtils.py:1503-1516
    gen_multiplicity_list)."""
    out = jnp.zeros((batch.n_events + 1,), dtype=jnp.int32)
    idx = jnp.where(batch.mask, batch.event, batch.n_events)
    out = out.at[idx].add(1, mode="drop")
    return out[: batch.n_events]


def segment_mean_loss(per_site_loss: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean over active sites — the sparse→dense masked segment loss
    divisor (ref: LitBase.py:124-174 _calc_segment_loss divides by site count)."""
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_site_loss, 0)) / count


# ---------------------------------------------------------------------------------
# host-side (numpy) utilities for the IO / prediction-writer path
# ---------------------------------------------------------------------------------

def consecutive_event_index(event_col: np.ndarray) -> np.ndarray:
    """Renumber an (arbitrary, possibly non-contiguous) event-id column into
    consecutive 0..B-1 dense indices by change detection — the reference's
    convention everywhere in the writer path (ref: SparseUtils.py:1459-1501)."""
    ev = np.asarray(event_col)
    if ev.size == 0:
        return ev.astype(np.int64)
    change = np.ones(ev.shape[0], dtype=np.int64)
    change[1:] = (ev[1:] != ev[:-1]).astype(np.int64)
    return np.cumsum(change) - 1


def swap_sparse_from_dense(sparse_out: np.ndarray, dense: np.ndarray,
                           coords: np.ndarray) -> None:
    """Write dense per-site predictions [B, NX, NY(, ...)] back into a sparse
    column in coordinate order, in place. The dense batch index is the count of
    *distinct consecutive* event ids, not the raw event number
    (ref: SparseUtils.py:1459-1475)."""
    b = consecutive_event_index(coords[:, -1])
    x = coords[:, 0].astype(np.int64)
    y = coords[:, 1].astype(np.int64)
    sparse_out[:] = dense[b, x, y]


def swap_sparse_from_event(sparse_out: np.ndarray, per_event: np.ndarray,
                           coords: np.ndarray) -> None:
    """Broadcast per-event values onto every pulse row of that event, with the
    same consecutive-event renumbering (ref: SparseUtils.py:1477-1501)."""
    sparse_out[:] = per_event[consecutive_event_index(coords[:, -1])]


def gen_multiplicity_list(event_col: np.ndarray) -> np.ndarray:
    """Per-ROW multiplicity: mult[i] = number of pulses in the event row i
    belongs to (ref: SparseUtils.py:1503-1516)."""
    dense = consecutive_event_index(event_col)
    counts = np.bincount(dense) if dense.size else np.zeros(0, dtype=np.int64)
    return counts[dense]


def retrieve_n_SE(coords: np.ndarray, seg_status: np.ndarray) -> np.ndarray:
    """Per-ROW count of single-ended segments in the row's event
    (ref: SparseUtils.py:1518-1537)."""
    dense = consecutive_event_index(coords[:, -1])
    is_se = (seg_status[coords[:, 0].astype(np.int64),
                        coords[:, 1].astype(np.int64)] == 0.5).astype(np.int64)
    counts = np.bincount(dense, weights=is_se).astype(np.int64) if dense.size else np.zeros(0, np.int64)
    return counts[dense]


def gen_SE_mask(coords: np.ndarray, seg_status: np.ndarray) -> np.ndarray:
    """Per-row mask: 1 where the segment is single-ended
    (ref: SparseUtils.py:1548-1562)."""
    return (seg_status[coords[:, 0].astype(np.int64),
                       coords[:, 1].astype(np.int64)] == 0.5).astype(np.int64)


def normalize_waveforms(coords: np.ndarray, waveforms: np.ndarray,
                        gain_factors: np.ndarray) -> np.ndarray:
    """ADC int16 waveform pairs → gain-corrected normalized f32, and renumber
    the event column in place to consecutive batch indices
    (ref: SparseUtils.py:1564-1584 normalize_waveforms).

    waveforms:    [N, 2*S] int16 (left samples then right samples)
    coords:       [N, 3] (x, y, event) — event column rewritten in place
    gain_factors: [NX, NY, 2] precomputed norm_factor / gain per PMT
    """
    n, two_s = waveforms.shape
    s = two_s // 2
    x = coords[:, 0].astype(np.int64)
    y = coords[:, 1].astype(np.int64)
    out = np.empty((n, two_s), dtype=np.float32)
    out[:, :s] = waveforms[:, :s] * gain_factors[x, y, 0][:, None]
    out[:, s:] = waveforms[:, s:] * gain_factors[x, y, 1][:, None]
    coords[:, -1] = consecutive_event_index(coords[:, -1])
    return out
