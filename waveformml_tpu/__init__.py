"""WaveformML-TPU: a TPU-native (JAX/XLA/Pallas) framework for scintillation-detector
waveform analysis, with the capabilities of BlaineHeffron/WaveformML.

Re-designed TPU-first: SPMD over device meshes, functional transforms, static-shape
sparse batches, dense-grid MXU convolutions with exact sparse-conv occupancy
semantics, and Pallas kernels for the hot ops.

Reference behavior surveyed in /root/repo/SURVEY.md; file:line citations throughout
point at the reference implementation whose behavior each component reproduces.
"""

__version__ = "0.1.0"

from waveformml_tpu.config import Config, load_config, validate_config, save_config
from waveformml_tpu.registry import registry, register

__all__ = [
    "Config",
    "load_config",
    "validate_config",
    "save_config",
    "registry",
    "register",
]
