from waveformml_tpu.datasets.hdf5_dataset import FileBlock, HDF5Dataset
from waveformml_tpu.datasets.pulse_dataset import (
    PulseDataset, PulseDataset2D, PulseDataset3D, PulseDatasetPMT,
    PulseDatasetDet, PulseDataset2DWithZ, PulseDataset2DWithEZ,
    PulseDatasetDetWithZ, PulseDatasetDetWithEZ, PulseDatasetWFPair,
    PulseDatasetWFPairEZ, PulseDatasetRealWFPair, PulseDatasetWFPairNorm,
    PulseDatasetWaveformNorm, PulseDatasetNormFeatures, dataset_class_type_map,
)
from waveformml_tpu.datasets.data_module import (
    PSDDataModule, DataLoaderLite, collate_blocks,
)

__all__ = [
    "FileBlock", "HDF5Dataset", "PulseDataset", "PulseDataset2D",
    "PulseDataset3D", "PulseDatasetPMT", "PulseDatasetDet",
    "PulseDataset2DWithZ", "PulseDataset2DWithEZ", "PulseDatasetDetWithZ",
    "PulseDatasetDetWithEZ", "PulseDatasetWFPair", "PulseDatasetWFPairEZ",
    "PulseDatasetRealWFPair", "PulseDatasetWFPairNorm",
    "PulseDatasetWaveformNorm", "PulseDatasetNormFeatures",
    "dataset_class_type_map", "PSDDataModule", "DataLoaderLite", "collate_blocks",
]
