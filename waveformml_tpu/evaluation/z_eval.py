"""Per-segment Z evaluators (ref: src/evaluation/ZEvaluator.py, 754 LoC).

MAE binned by (segment, multiplicity), z, and E; single- vs double-ended
split; per-sample error histograms; and the classical-calibration baseline
(``*_cal`` metrics via ops.calibration.calc_calib_z_E) computed alongside the
NN predictions when a calgroup is available (ref :126-139, :414-451, :502-526).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.evaluation.ad1 import SingleEndedEvaluator
from waveformml_tpu.evaluation.metric_agg import MetricAggregator
from waveformml_tpu.evaluation.stats import ErrorAggregator
from waveformml_tpu.ops.calibration import calc_calib_z_E
from waveformml_tpu.ops.sparse import consecutive_event_index

N_MULT = 5  # multiplicity categories 1..4 and 5+ (ref: _init_results)


class ZEvaluatorBase(SingleEndedEvaluator):
    """Common accumulators + dump (ref: ZEvaluator.py:24-424)."""

    def __init__(self, logger=None, calgroup: Optional[str] = None,
                 e_scale=None, **kwargs):
        super().__init__(logger, calgroup=calgroup, e_scale=e_scale, **kwargs)
        cats = ["single ended", "double ended"]
        zb = self.default_bins[self.z_index]
        eb = self.default_bins[self.E_index]
        self.z_mae = MetricAggregator("true_z", zb[0], zb[1], 50, cats,
                                      metric_name="z MAE", metric_unit="mm",
                                      parameter_unit="mm", scale_factor=self.z_scale)
        self.E_mae = MetricAggregator("energy", eb[0], eb[1], 50, cats,
                                      metric_name="z MAE", metric_unit="mm",
                                      parameter_unit="MeV", scale_factor=self.z_scale)
        self.mult_mae = MetricAggregator("multiplicity", 0.5, N_MULT + 0.5, N_MULT,
                                         cats, metric_name="z MAE",
                                         metric_unit="mm",
                                         scale_factor=self.z_scale)
        self.error = ErrorAggregator("z", 0.0, 1.0, 50, cats, metric_name="z",
                                     metric_unit="mm", scale_factor=self.z_scale)
        self.register_segment_metric("seg_mae", "z MAE", "mm",
                                     n_extra=N_MULT, extra_bins=(0.5, N_MULT + 0.5, N_MULT))
        self._has_cal_metrics = False
        if self.hascal:
            self.z_mae_cal = MetricAggregator(
                "true_z_cal", zb[0], zb[1], 50, cats, metric_name="z MAE (cal)",
                metric_unit="mm", parameter_unit="mm", scale_factor=self.z_scale)
            self._has_cal_metrics = True

    # -- core accumulation ---------------------------------------------------------
    def add(self, predictions: np.ndarray, target: np.ndarray, c: np.ndarray,
            f: Optional[np.ndarray] = None, E: Optional[np.ndarray] = None,
            additional_fields=None, target_is_cal: bool = False) -> None:
        """predictions/target: dense [B, 1, NX, NY] normalized z; c: [N, 3]."""
        x = c[:, 0].astype(np.int64)
        y = c[:, 1].astype(np.int64)
        b = consecutive_event_index(c[:, 2])
        pred = predictions[b, 0, x, y]
        targ = target[b, 0, x, y]
        err = np.abs(pred - targ)
        is_se = self.seg_status[x, y] == 0.5
        mult = np.bincount(b)[b]
        mult_cat = np.clip(mult, 1, N_MULT).astype(np.float64)
        z_true = (targ - 0.5) * self.z_scale
        for se_val, cat in ((True, "single ended"), (False, "double ended")):
            sel = is_se == se_val
            if not sel.any():
                continue
            self.z_mae.add(err[sel], z_true[sel], cat)
            self.mult_mae.add(err[sel], mult_cat[sel], cat)
            if E is not None:
                self.E_mae.add(err[sel], E[sel], cat)
            self.error.add_norm(pred[sel], targ[sel], cat)
        self.accumulate("seg_mae", err, (x, y, mult_cat))
        if self._has_cal_metrics and f is not None:
            cal = self.z_from_cal(c, f, target)
            if cal is not None:
                cal_pred = cal[b, x, y]
                cal_err = np.abs(cal_pred - targ)
                for se_val, cat in ((True, "single ended"), (False, "double ended")):
                    sel = is_se == se_val
                    if sel.any():
                        self.z_mae_cal.add(cal_err[sel], z_true[sel], cat)

    def z_from_cal(self, c, f, targ, E=None):
        return None

    # -- trainer adapter -----------------------------------------------------------
    def add_batch(self, block, db, test_out) -> None:
        for d in range(test_out["predictions"].shape[0]):
            mask = np.asarray(db["mask"][d], dtype=bool)
            if not mask.any():
                continue
            coords = np.asarray(db["coords"][d])[mask]
            feats = np.asarray(db["feats"][d])[mask]
            self.add(np.asarray(test_out["predictions"][d]),
                     np.asarray(test_out["target"][d]), coords, feats)

    def dump(self) -> None:
        if self.logger is None:
            return
        self.z_mae.plot(self.logger)
        self.E_mae.plot(self.logger)
        self.mult_mae.plot(self.logger)
        self.error.plot(self.logger)
        self.log_segment_metric("seg_mae", "z_mae_segment", "z MAE by segment")
        if self._has_cal_metrics:
            self.z_mae_cal.plot(self.logger)

    def metrics(self) -> Dict[str, float]:
        """Summary numbers (MAE in mm per SE/DE)."""
        out = {}
        for ci, cat in enumerate(self.z_mae.class_names):
            cnt = self.z_mae.count[ci].sum()
            if cnt > 0:
                out[f"z_mae_{cat.replace(' ', '_')}"] = float(
                    (self.z_mae.mean[ci] * self.z_mae.count[ci]).sum() / cnt
                    * self.z_scale)
        return out


class ZEvaluatorWF(ZEvaluatorBase):
    """Waveform-input variant: classical baseline runs the full peak chain
    (ref :486-563)."""

    def __init__(self, logger=None, calgroup=None, **kwargs):
        super().__init__(logger, calgroup=calgroup, **kwargs)
        self.n_samples: Optional[int] = None

    def z_from_cal(self, c, f, targ, E=None):
        if not self.hascal:
            return None
        n_samples = f.shape[1] // 2
        b = consecutive_event_index(c[:, 2])
        B = int(b[-1]) + 1 if len(b) else 0
        z_out = np.full((B, NX, NY), 0.0)
        E_out = np.zeros((B, NX, NY))
        coords = np.stack([c[:, 0], c[:, 1], b], axis=1).astype(np.int64)
        calc_calib_z_E(coords, np.asarray(f, dtype=np.float64), z_out, E_out,
                       self.calibrator.tables(), self.z_scale, n_samples)
        return z_out


class ZEvaluatorPhys(ZEvaluatorBase):
    """Phys-feature variant: baseline z is the calibration z feature itself
    (ref :426-484)."""

    def z_from_cal(self, c, f, targ, E=None):
        b = consecutive_event_index(c[:, 2])
        B = int(b[-1]) + 1 if len(b) else 0
        out = np.zeros((B, NX, NY))
        out[b, c[:, 0].astype(np.int64), c[:, 1].astype(np.int64)] = \
            np.asarray(f)[:, self.z_index]
        return out

    def add_batch(self, block, db, test_out) -> None:
        for d in range(test_out["predictions"].shape[0]):
            mask = np.asarray(db["mask"][d], dtype=bool)
            if not mask.any():
                continue
            coords = np.asarray(db["coords"][d])[mask]
            feats = np.asarray(db["feats"][d])[mask]
            E = feats[:, self.E_index] * self.E_scale if feats.shape[1] >= 7 else None
            self.add(np.asarray(test_out["predictions"][d]),
                     np.asarray(test_out["target"][d]), coords, feats, E=E)


class ZEvaluatorRealWFNorm(ZEvaluatorWF):
    """Real-data variant over WaveformNorm records (ref :565-754): targets are
    themselves calibration values; detector ids may replace pair coords."""

    def __init__(self, logger=None, calgroup=None, namespace=None, e_scale=None,
                 additional_field_names=None, **kwargs):
        super().__init__(logger, calgroup=calgroup, e_scale=e_scale, **kwargs)
        self.additional_field_names = additional_field_names or []

    def add(self, predictions, target, c, f=None, E=None, additional_fields=None,
            target_is_cal: bool = True) -> None:
        super().add(predictions, target, c, f, E=E,
                    additional_fields=additional_fields,
                    target_is_cal=target_is_cal)
