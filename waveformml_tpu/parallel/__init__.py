from waveformml_tpu.parallel.mesh import (
    get_mesh, make_mesh, data_parallel_spec, replicated_spec, split_block_for_devices,
)

__all__ = ["get_mesh", "make_mesh", "data_parallel_spec", "replicated_spec",
           "split_block_for_devices"]
