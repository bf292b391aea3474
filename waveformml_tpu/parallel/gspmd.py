"""GSPMD (jit + NamedSharding) parallelism: data x tensor parallel meshes.

The shard_map engine in ``engineering/trainer.py`` covers the reference's
real scope (single-device DDP -> pure data parallelism, SURVEY §2.11). This
module is the scaling extension the reference never had: a 2-D
``(data, model)`` mesh where large kernels are column-sharded over the
``model`` axis and XLA's GSPMD partitioner inserts every collective. The
train step is written as a GLOBAL program — no explicit psum — so the same
code runs on 1 chip or a pod slice; only the shardings change
(the "How to Scale Your Model" recipe: pick a mesh, annotate, let XLA
insert collectives).

Tensor-parallel rule: a kernel's LAST (output-feature) dimension is sharded
over ``model`` when it is divisible by the tp degree and wide enough that a
shard still tiles the MXU lane dimension; everything else (biases, BN
params/stats, small kernels) stays replicated. Column sharding composes with
the data-sharded activations as [B_dp, in] x [in, out_tp] -> [B_dp, out_tp]
with an all-gather only where a downstream op needs the full feature axis —
placement XLA chooses.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# a sharded kernel column block should still span an MXU lane tile
_MIN_SHARD_COLS = 8


def make_mesh_2d(devices: Optional[Sequence] = None, dp: Optional[int] = None,
                 tp: int = 1) -> Mesh:
    """(dp, tp) mesh over the given devices; dp defaults to n_devices // tp."""
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"{n} devices cannot form a ({dp}, {tp}) mesh"
    return Mesh(devs.reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))


def tp_spec_for(shape: Sequence[int], tp: int) -> P:
    """PartitionSpec for one parameter array under the tensor-parallel rule."""
    if tp > 1 and len(shape) >= 2 and shape[-1] % tp == 0 \
            and shape[-1] // tp >= _MIN_SHARD_COLS:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params: Any, mesh: Mesh, tp: int) -> Any:
    """Place a param pytree on the mesh: wide kernels column-sharded over
    ``model``, the rest replicated."""
    def place(x):
        spec = tp_spec_for(np.shape(x), tp)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    if tree is None:
        return None
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(db: Any, mesh: Mesh) -> Any:
    """Commit a host batch dict to the mesh, leading dim sharded over data."""
    def place(x, replicate_leaf=False):
        x = np.asarray(x)
        spec = P(DATA_AXIS) if not replicate_leaf and x.ndim >= 1 and \
            x.shape[0] % mesh.shape[DATA_AXIS] == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    if isinstance(db, dict):
        # site-grouped head layouts are [S, MAX] slot grids, not row-aligned:
        # their leading dim (the 154 sites) coincidentally divides some dp
        # degrees, and a data-sharded layout would turn every slot gather
        # into a cross-device access — keep them replicated
        return {k: place(v, replicate_leaf=k.startswith("plan_site_"))
                for k, v in db.items()}
    return jax.tree.map(place, db)
