"""HDF5 compound record types matching the experiment's tables.

Field schemas reproduce the reference's src/datasets/H5CompoundTypes.py:
DetPulseCoord (:61-63), WaveformPairNorm (:66-85), WaveformNorm (:88-101),
WaveformPairCal (:105-120), PhysPulse (:122-137), Waveform (:140-146), and the
file-suffix→type map (:8-14). The field names, dtypes, and per-field lengths
are the experiment's on-disk contract and must match exactly; the class design
here (declarative FIELDS spec) is our own.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class H5CompoundType:
    """A named numpy structured dtype with per-field lengths, plus synthetic
    record generation for hermetic tests (ref: H5CompoundTypes.py:40-46)."""

    NAME: str = "H5CompoundType"
    #: (field_name, base_dtype, length) — length 1 means scalar field
    FIELDS: Sequence[Tuple[str, type, int]] = ()
    #: which field carries the event index, and which sub-index within it
    EVENT_INDEX_NAME: Optional[str] = None
    EVENT_INDEX_COORD: Optional[int] = None

    def __init__(self):
        self.name = self.NAME
        self.names = [f[0] for f in self.FIELDS]
        self.types = [f[1] for f in self.FIELDS]
        self.lengths = [f[2] for f in self.FIELDS]
        self.event_index_name = self.EVENT_INDEX_NAME
        self.event_index_coord = self.EVENT_INDEX_COORD
        self.type = np.dtype(
            [(n, t, (l,)) if l > 1 else (n, t) for n, t, l in self.FIELDS]
        )
        self.size = self.type.itemsize
        offs, tot = [], 0
        for t, l in zip(self.types, self.lengths):
            offs.append(tot)
            tot += np.dtype(t).itemsize * l
        self.offsets = offs

    # -- synthetic data -----------------------------------------------------------
    def generate_random_data(self, length: int, rng: Optional[np.random.Generator] = None,
                             high: int = 5) -> np.ndarray:
        """Random records with small-integer values in every field
        (ref: H5CompoundTypes.py:40-46). Deterministic when given an rng."""
        rng = rng or np.random.default_rng()
        out = np.zeros(length, dtype=self.type)
        for n, t, l in self.FIELDS:
            shape = (length, l) if l > 1 else (length,)
            out[n] = rng.integers(0, high, size=shape).astype(t)
        return out

    def event_ids(self, records: np.ndarray) -> np.ndarray:
        """Extract the per-record event index from the designated field."""
        if self.event_index_name is None:
            raise ValueError(f"{self.name} has no event index field")
        col = records[self.event_index_name]
        if self.event_index_coord is not None and col.ndim > 1:
            col = col[:, self.event_index_coord]
        return np.asarray(col)


class DetPulseCoord(H5CompoundType):
    """coord[3]i32 + pulse[7]f32 (ref: H5CompoundTypes.py:61-63)."""

    NAME = "DetPulseCoord"
    FIELDS = [("coord", np.int32, 3), ("pulse", np.float32, 7)]
    EVENT_INDEX_NAME = "coord"
    EVENT_INDEX_COORD = 2


class Waveform3DPair(H5CompoundType):
    """Per-(segment, sample) 3D pulse rows consumed by PulseDataset3D
    (ref: PulseDataset.py:585-625 — table "Waveform3DPairs", coord with the
    event index at column 3, 2-PMT samples per row; the schema itself is not
    shipped with the reference, so this declares the minimal contract the
    dataset reads: coord[4]=(x, y, t, event) i32 + waveform[2] f32)."""

    NAME = "Waveform3DPairs"
    FIELDS = [("coord", np.int32, 4), ("waveform", np.float32, 2)]
    EVENT_INDEX_NAME = "coord"
    EVENT_INDEX_COORD = 3


class WaveformPairNorm(H5CompoundType):
    """Normalized waveform pair records (ref: H5CompoundTypes.py:66-85)."""

    NAME = "WaveformPairNorm"
    FIELDS = [
        ("t", np.float64, 1),
        ("coord", np.int32, 3),
        ("pulse", np.float32, 130),
        ("phys", np.float32, 7),
        ("EZ", np.float32, 2),
        ("PID", np.int32, 1),
    ]
    EVENT_INDEX_NAME = "coord"
    EVENT_INDEX_COORD = 2


class WaveformNorm(H5CompoundType):
    """Single-waveform normalized records (ref: H5CompoundTypes.py:88-101)."""

    NAME = "WaveformNorm"
    FIELDS = [
        ("t", np.float64, 1),
        ("evt", np.int64, 1),
        ("det", np.int32, 1),
        ("pulse", np.float32, 130),
        ("phys", np.float32, 7),
        ("EZ", np.float32, 2),
        ("PID", np.int32, 1),
    ]
    EVENT_INDEX_NAME = "evt"
    EVENT_INDEX_COORD = None


class WaveformPairCal(H5CompoundType):
    """Calibrated raw ADC waveform pairs (ref: H5CompoundTypes.py:105-120)."""

    NAME = "WaveformPairCal"
    FIELDS = [
        ("evt", np.int64, 1),
        ("t", np.float64, 1),
        ("dt", np.float32, 1),
        ("z", np.float32, 1),
        ("E", np.float32, 1),
        ("PSD", np.float32, 1),
        ("PE", np.float32, 2),
        ("coord", np.int32, 3),
        ("waveform", np.int16, 130),
        ("EZ", np.float32, 2),
        ("PID", np.int32, 1),
    ]
    EVENT_INDEX_NAME = "coord"
    EVENT_INDEX_COORD = 2


class PhysPulse(H5CompoundType):
    """Physics-feature pulse records incl. SE variants
    (ref: H5CompoundTypes.py:122-137)."""

    NAME = "PhysPulse"
    FIELDS = [
        ("evt", np.int64, 1),
        ("seg", np.int32, 1),
        ("E", np.float32, 1),
        ("rand", np.float32, 1),
        ("t", np.float64, 1),
        ("dt", np.float32, 1),
        ("PE", np.float32, 2),
        ("y", np.float32, 1),
        ("PSD", np.float32, 1),
        ("PID", np.int32, 1),
        ("E_SE", np.float32, 2),
        ("Esmear_SE", np.float32, 2),
        ("y_SE", np.float32, 1),
        ("PSD_SE", np.float32, 2),
    ]
    EVENT_INDEX_NAME = "evt"
    EVENT_INDEX_COORD = None


class Waveform(H5CompoundType):
    """Single raw waveform records (ref: H5CompoundTypes.py:140-146)."""

    NAME = "Waveforms"
    FIELDS = [
        ("evt", np.int64, 1),
        ("det", np.int32, 1),
        ("t", np.float64, 1),
        ("a", np.float32, 1),
        ("PSD", np.float32, 1),
        ("waveform", np.int16, 59),
        ("PID", np.int32, 1),
        ("true_E", np.float32, 1),
        ("true_Z", np.float32, 1),
    ]
    EVENT_INDEX_NAME = "evt"
    EVENT_INDEX_COORD = None


def extension_type_map(path: str) -> H5CompoundType:
    """File-suffix → compound type (ref: H5CompoundTypes.py:8-14)."""
    if path.endswith("WFNorm.h5"):
        return WaveformPairNorm()
    if path.endswith("Phys.h5"):
        return PhysPulse()
    return WaveformPairCal()


ALL_TYPES: Dict[str, type] = {
    c.NAME: c
    for c in (DetPulseCoord, Waveform3DPair, WaveformPairNorm, WaveformNorm,
              WaveformPairCal, PhysPulse, Waveform)
}
