"""Site-grouped execution of the flatten-Linear head (grouped GEMM).

The reference's sparse nets end in ``Linear(flatten(dense([B, C, NX, NY])))``
(ref: src/models/SPConvNet.py:49-60 SparseToDense + flatten + linear;
src/models/ConvBlocks.py:82-102 LinearBlock). With multiplicity ~3 active
sites of NX*NY=154, that dense operand is ~98% zeros — the dense-mode GEMM
in ``FoldedSiteLinear`` burns MXU FLOPs and HBM traffic on padding.

This module is the sparse-optimal formulation, the MoE grouped-GEMM pattern
with detector sites as the "experts":

  * host: sort rows by site into a ``[G, MAX]`` slot grid (G = NX*NY groups,
    MAX = per-site capacity, bucketed to a power of two) — pure numpy,
    overlapped with the device's previous step exactly like the row-conv
    neighbor plans (ops/row_conv.py host_neighbor_plan).
  * device: one gather ``rows -> [G, MAX, C]``, one batched GEMM per site
    group ``[G, MAX, C] x [C, G, F] -> [G, MAX, F]``, and one event
    scatter-add. Arithmetic is ~S/mult (~50x) below the dense-mode GEMM and
    traffic is bounded by the row/rowlog arrays, not the [B*S, C] grid.
    Autodiff of this formulation is already the cheap backward: the VJP of
    the event scatter-add is a row gather ``d_out[ev]``, and the einsum VJPs
    are the same-sized batched GEMMs — no [B*S, C] cotangent anywhere.

Encoding (safety by construction): ``site_take``/``site_ev`` are 1-based
with 0 = empty slot, and ``site_s`` is the 1-based group->site map. All
multi-device batch plumbing (stack_shards, _agree_shapes, empty shards)
zero-pads, and a zero slot gathers the prepended zero row and scatters out
of bounds (dropped) — so any zero padding is semantically "empty".
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.detector import NX, NY

S = NX * NY

#: per-site capacity floor; real caps bucket to powers of two above this
MIN_CAP = 8


def host_site_layout(coords: np.ndarray, mask: np.ndarray,
                     min_cap: int = MIN_CAP) -> Dict[str, np.ndarray]:
    """Numpy site-grouped slot layout for one padded batch.

    coords: [N, >=3] int (x, y, ..., event); mask: [N] bool. Returns
    ``site_take`` [S, MAX] (1-based row index, 0 empty), ``site_ev`` [S, MAX]
    (1-based event index, 0 empty), ``site_s`` [S] (1-based site id). MAX is
    the smallest power of two >= max per-site occupancy (>= min_cap), so the
    jit shape only changes when occupancy crosses a bucket; callers keep a
    grow-only high-water mark to avoid flapping.
    """
    m = np.asarray(mask, bool)
    x = coords[:, 0].astype(np.int64)
    y = coords[:, 1].astype(np.int64)
    ev = coords[:, -1].astype(np.int64)
    site = x * NY + y
    s_eff = np.where(m, site, S)                 # padding rows sort last
    order = np.argsort(s_eff, kind="stable")
    n_real = int(m.sum())
    real = order[:n_real]
    s_sorted = s_eff[real]
    counts = np.bincount(s_sorted, minlength=S)[:S]
    cap = max(int(min_cap), int(counts.max()) if n_real else 1)
    max_slots = 1 << int(cap - 1).bit_length()
    starts = np.zeros(S, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(n_real, dtype=np.int64) - starts[s_sorted]
    slots = s_sorted * max_slots + rank
    take = np.zeros(S * max_slots, np.int32)
    take[slots] = real.astype(np.int32) + 1
    evs = np.zeros(S * max_slots, np.int32)
    evs[slots] = ev[real].astype(np.int32) + 1
    return {"site_take": take.reshape(S, max_slots),
            "site_ev": evs.reshape(S, max_slots),
            "site_s": np.arange(1, S + 1, dtype=np.int32)}


def site_grouped_matmul(rows: jax.Array, k3: jax.Array, take1: jax.Array,
                        ev1: jax.Array, site1: jax.Array,
                        n_events: int) -> jax.Array:
    """Event logits of the folded first linear layer, site-grouped.

    rows:  [N, C] (padding rows must already be zeroed)
    k3:    [C, S, F] — the flatten-order Linear kernel reshaped
    take1: [G, MAX] int 1-based row index per slot (0 = empty)
    ev1:   [G, MAX] int 1-based event index per slot (0 = empty)
    site1: [G] int 1-based site of each group (a group is one site locally;
           multi-host stitching concatenates groups, so G may exceed S)
    Returns [n_events, F] float32 (no bias).
    """
    g, max_slots = take1.shape
    c = rows.shape[1]
    f = k3.shape[2]
    rp = jnp.concatenate([jnp.zeros((1, c), rows.dtype), rows])
    rs = rp[take1.reshape(-1)].reshape(g, max_slots, c)
    sg = jnp.clip(site1.astype(jnp.int32) - 1, 0, k3.shape[1] - 1)
    kg = k3[:, sg, :]                                        # [C, G, F]
    rowlog = jnp.einsum("gmc,cgf->gmf", rs, kg,
                        preferred_element_type=jnp.float32)
    evs = ev1.reshape(-1).astype(jnp.int32)
    idx = jnp.where(evs > 0, evs - 1, n_events)              # OOB -> dropped
    return jnp.zeros((n_events, f), jnp.float32).at[idx].add(
        rowlog.reshape(g * max_slots, f), mode="drop")
