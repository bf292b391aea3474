from waveformml_tpu.parallel.gspmd import (
    MODEL_AXIS, make_mesh_2d, shard_batch, shard_params, tp_spec_for,
)
from waveformml_tpu.parallel.mesh import (
    DATA_AXIS, data_parallel_spec, get_mesh, initialize_distributed, make_mesh,
    replicated_spec, split_block_for_devices,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "get_mesh", "make_mesh", "make_mesh_2d",
           "data_parallel_spec", "replicated_spec", "split_block_for_devices",
           "initialize_distributed", "shard_batch", "shard_params",
           "tp_spec_for"]
