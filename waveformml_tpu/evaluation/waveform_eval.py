"""Waveform-shape evaluator (ref: src/evaluation/WaveformEvaluator.py, 148 LoC).

Peak-aligned average waveforms and first-samples metrics binned by z
(ref :16-148); ``z_E_from_cal`` wraps the classical reconstruction (ref :69-76).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.evaluation.ad1 import SingleEndedEvaluator
from waveformml_tpu.ops.calibration import calc_calib_z_E
from waveformml_tpu.ops.dsp import align_wfs, calc_arrival_batch
from waveformml_tpu.ops.sparse import consecutive_event_index
from waveformml_tpu.utils.plot import plot_waveforms
from waveformml_tpu.utils.util import get_bins

N_Z_BINS = 10
N_FIRST = 5


class WaveformEvaluator(SingleEndedEvaluator):
    def __init__(self, logger=None, calgroup=None, align_target: int = 10, **kwargs):
        super().__init__(logger, calgroup=calgroup, **kwargs)
        self.align_target = align_target
        self.z_edges = get_bins(-self.z_scale / 2, self.z_scale / 2, N_Z_BINS)
        self._wf_sum: Optional[np.ndarray] = None
        self._wf_n = np.zeros(N_Z_BINS)
        self.first_sum = np.zeros((N_Z_BINS, N_FIRST))
        self.first_n = np.zeros(N_Z_BINS)

    def add(self, wfs: np.ndarray, z_mm: np.ndarray) -> None:
        """wfs: [N, 2S] normalized pairs; z_mm: true z [mm] per row."""
        n_samples = wfs.shape[1] // 2
        left = np.asarray(wfs[:, :n_samples], dtype=np.float64)
        arrivals = calc_arrival_batch(left)
        aligned = align_wfs(left, arrivals, self.align_target)
        if self._wf_sum is None:
            self._wf_sum = np.zeros((N_Z_BINS, n_samples))
        zi = np.clip(np.searchsorted(self.z_edges, z_mm) - 1, 0, N_Z_BINS - 1)
        np.add.at(self._wf_sum, zi, aligned)
        np.add.at(self._wf_n, zi, 1)
        first = aligned[:, self.align_target:self.align_target + N_FIRST]
        tot = aligned.sum(axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(tot > 0, first / np.maximum(tot, 1e-12), 0.0)
        np.add.at(self.first_sum, zi, frac)
        np.add.at(self.first_n, zi, 1)

    def z_E_from_cal(self, c: np.ndarray, f: np.ndarray):
        """Classical (z, E) maps for a sparse batch (ref :69-76)."""
        if not self.hascal:
            return None, None
        n_samples = f.shape[1] // 2
        b = consecutive_event_index(c[:, 2])
        B = int(b[-1]) + 1 if len(b) else 0
        z_out = np.zeros((B, NX, NY))
        E_out = np.zeros((B, NX, NY))
        coords = np.stack([c[:, 0], c[:, 1], b], axis=1).astype(np.int64)
        calc_calib_z_E(coords, np.asarray(f, dtype=np.float64), z_out, E_out,
                       self.calibrator.tables(), self.z_scale, n_samples)
        return z_out, E_out

    def dump(self) -> None:
        if self.logger is None or self._wf_sum is None:
            return
        present = self._wf_n > 0
        if present.any():
            wfs = [self._wf_sum[i] / self._wf_n[i]
                   for i in range(N_Z_BINS) if present[i]]
            labels = [f"z∈[{self.z_edges[i]:.0f},{self.z_edges[i + 1]:.0f})"
                      for i in range(N_Z_BINS) if present[i]]
            self.logger.log_figure(self.namespace + "aligned_waveforms_by_z",
                                   plot_waveforms(wfs, labels))
