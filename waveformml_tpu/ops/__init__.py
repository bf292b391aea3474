from waveformml_tpu.ops.sparse import (
    SparseBatch,
    scatter_to_dense,
    gather_from_dense,
    occupancy_mask,
    pad_sparse,
    bucket_size,
)

__all__ = [
    "SparseBatch",
    "scatter_to_dense",
    "gather_from_dense",
    "occupancy_mask",
    "pad_sparse",
    "bucket_size",
]
