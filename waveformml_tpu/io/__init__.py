from waveformml_tpu.io.compound_types import (
    H5CompoundType,
    DetPulseCoord,
    WaveformPairCal,
    WaveformPairNorm,
    WaveformNorm,
    PhysPulse,
    Waveform,
    extension_type_map,
)
from waveformml_tpu.io.hdf5 import H5Input, H5Output, P2XTableWriter, H5FileHandler

__all__ = [
    "H5CompoundType", "DetPulseCoord", "WaveformPairCal", "WaveformPairNorm",
    "WaveformNorm", "PhysPulse", "Waveform", "extension_type_map",
    "H5Input", "H5Output", "P2XTableWriter", "H5FileHandler",
]
