"""Cross-device BatchNorm axis control.

The reference trains on a single GPU, so torch BatchNorm always sees the whole
batch (ref: util.py:233-236 — DDP never exercised beyond one device). Under
data-parallel SPMD the per-device shards are small; computing BN statistics
per shard diverges from reference numerics and destabilizes training. When
the train step runs inside shard_map over the data mesh, every BatchNorm in
the framework syncs its batch statistics across the axis set here — making
N-device training numerically identical to 1-device (and to the reference's
single-GPU batches).

The Trainer sets the axis before tracing its step functions; standalone
(non-shard_map) applications leave it None.
"""
from __future__ import annotations

from typing import Optional

_BN_AXIS: Optional[str] = None


def set_bn_axis(name: Optional[str]) -> None:
    global _BN_AXIS
    _BN_AXIS = name


def get_bn_axis() -> Optional[str]:
    return _BN_AXIS
