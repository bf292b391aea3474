"""Device mesh + SPMD data parallelism.

The reference's entire distributed scope is single-GPU DDP delegated to
Lightning (ref: src/utils/util.py:233-236, SURVEY §2.11). The TPU-native
replacement: a 1-D ``data`` mesh over all local devices, batches sharded by
event along the leading device axis, parameters replicated, gradient
all-reduce via ``lax.psum`` over ICI inside a ``shard_map``-wrapped train
step. Multi-host extension is the same spec over a global mesh
(``jax.distributed``) — nothing in the step function changes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from waveformml_tpu.datasets.hdf5_dataset import FileBlock

_MESH: Optional[Mesh] = None

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> Mesh:
    """Multi-host data parallelism: initialize jax.distributed (args default
    to the cluster env — TPU pods auto-discover), then build the global 1-D
    data mesh over all processes' devices. Batches stay event-sharded per
    local device; gradient psum rides ICI within a slice and DCN across
    hosts. The train step is unchanged (shard_map over the same axis)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    mesh = make_mesh(jax.devices())  # global: all processes' devices
    set_mesh(mesh)
    return mesh


def get_mesh() -> Mesh:
    """Process-wide default 1-D data mesh over all visible devices."""
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def set_mesh(mesh: Mesh) -> None:
    global _MESH
    _MESH = mesh


def data_parallel_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def split_block_for_devices(block: FileBlock, n_devices: int) -> List[FileBlock]:
    """Split a collated multi-event block into n_devices event-contiguous
    sub-blocks (the per-device shards of one global step).

    Events are renumbered 0..k-1 within each shard. Works for event-indexed
    coords ([N, 3]) and plain per-row data ([N] det ids / waveform tasks,
    which are split by rows).
    """
    if n_devices == 1:
        return [block]
    if block.coords.ndim == 2:
        ev = block.coords[:, -1]
        n_events = int(ev[-1]) + 1 if len(ev) else 0
        # balanced split: first (n % D) devices get one extra event. When
        # n_events < D the trailing devices necessarily get EMPTY shards —
        # safe, because BN and the loss aggregate mask-weighted SUMS via
        # psum (MaskedBatchNorm counts, loss_sum/weight), so an empty shard
        # contributes zeros, not a skewed per-shard mean
        base, extra = divmod(n_events, n_devices)
        bounds = [0]
        for d in range(n_devices):
            bounds.append(bounds[-1] + base + (1 if d < extra else 0))
        out = []
        for d in range(n_devices):
            lo, hi = bounds[d], bounds[d + 1]
            sel = (ev >= lo) & (ev < hi)
            c = block.coords[sel].copy()
            if len(c):
                # the event column is LAST — [x, y, event] or [x, y, t, event]
                # (column 2 on a 4-column 3D block is the TIME coordinate)
                c[:, -1] -= lo
            labels = block.labels
            if labels.shape[0] == n_events:      # event-level labels
                y = labels[lo:hi]
            else:                                # per-row labels
                y = labels[sel]
            extras = {}
            idx_map = None
            for k, v in block.extras.items():
                if k.startswith("edge_mask_"):
                    continue  # rebuilt with its edges_ twin below
                if k.startswith("edges_"):
                    # cached padded edge lists are [2, E] in PRE-SPLIT row
                    # indices — a row mask would raise (wrong length) or
                    # silently corrupt connectivity. Edges join same-event
                    # rows only and events split whole, so every edge lands
                    # entirely inside one shard: compact + remap exactly.
                    m = block.extras.get(f"edge_mask_{k[len('edges_'):]}")
                    if m is None:
                        continue  # no mask twin: drop, add_graph_edges rebuilds
                    e = np.asarray(v)[:, np.asarray(m, dtype=bool)]
                    keep = sel[e[0]] & sel[e[1]]
                    if idx_map is None:
                        idx_map = np.full(sel.shape[0], -1, dtype=np.int64)
                        idx_map[sel] = np.arange(int(sel.sum()))
                    e = idx_map[e[:, keep]]
                    extras[k] = e
                    extras[f"edge_mask_{k[len('edges_'):]}"] = \
                        np.ones(e.shape[1], dtype=bool)
                    continue
                extras[k] = v[sel]
            out.append(FileBlock(c, block.feats[sel], y, extras))
        return out
    # row-split (single-waveform datasets), balanced the same way
    n = block.coords.shape[0]
    base, extra = divmod(n, n_devices)
    bounds = [0]
    for d in range(n_devices):
        bounds.append(bounds[-1] + base + (1 if d < extra else 0))
    out = []
    for d in range(n_devices):
        lo, hi = bounds[d], bounds[d + 1]
        out.append(FileBlock(block.coords[lo:hi], block.feats[lo:hi],
                             block.labels[lo:hi],
                             {k: v[lo:hi] for k, v in block.extras.items()}))
    return out


def stack_shards(shards: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-device prepared dicts along a new leading device axis,
    zero-padding each array to the max shape across shards (safe for all our
    arrays: masks pad False, edges pad to node 0 with their mask False)."""
    out = {}
    for k in shards[0].keys():
        arrs = [np.asarray(s[k]) for s in shards]
        shapes = np.array([a.shape for a in arrs])
        target = tuple(shapes.max(axis=0))
        padded = []
        for a in arrs:
            if a.shape != target:
                pad = [(0, t - s) for s, t in zip(a.shape, target)]
                a = np.pad(a, pad)
            padded.append(a)
        out[k] = np.stack(padded)
    return out
