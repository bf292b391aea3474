"""Training tasks — functional equivalents of the reference's Lit* modules.

LitPSD (src/engineering/LitPSD.py): event classification, LogSoftmax+argmax
accuracy, confusion accumulation. LitWaveform (LitWaveform.py): per-waveform
regression/classification with detector-number coords. LitZ (LitZ.py):
per-segment Z with optional rFFT preprocessing. LitEZ (LitEZ.py): joint (E,Z)
segment losses sharing the sparse mask. LitSegClassifier / LitSegQuantifier
(LitSegClassifier.py / LitSegQuantifier.py): per-site classification /
regression with SE-only options.

Each task provides pure device-side loss/metric functions returning
(loss_sum, weight, metric_sums) so data-parallel shards psum exactly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.config import to_dict
from waveformml_tpu.datasets.hdf5_dataset import FileBlock
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.engineering.base import TaskBase
from waveformml_tpu.engineering.se_mask import seg_status_maps
from waveformml_tpu.ops.sparse import bucket_size, gather_from_dense
from waveformml_tpu.registry import registry


def _masked_sum(x, mask):
    if x.ndim > mask.ndim:  # multi-output rows: mask [N] over elem [N, K]
        mask = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
    return jnp.sum(jnp.where(mask, x, 0))


def _mean_denominator(criterion, labels):
    """Per-sample denominator terms for torch 'mean' semantics, or None for
    the plain count. Tolerates user-registered criteria that implement only
    the elementwise()/reduction interface without the _Criterion base."""
    fn = getattr(criterion, "mean_denominator", None)
    return fn(labels) if fn is not None else None


@registry.register("LitPSD", aliases=("src.engineering.LitPSD.LitPSD", "LitPSD.LitPSD"))
class LitPSD(TaskBase):
    """Event classification (pulse-shape discrimination)
    (ref: src/engineering/LitPSD.py)."""

    event_predictions = True

    def __init__(self, config, trial=None):
        super().__init__(config, trial)
        self.n_type = getattr(config.system_config, "n_type",
                              len(config.system_config.type_names))

    def make_evaluator(self, logger=None):
        """Evaluator selection by dataset class (ref: LitPSD.py:35-46)."""
        from waveformml_tpu.evaluation.psd_eval import PhysEvaluator, PSDEvaluator

        dc = self.config.dataset_config
        calgroup = getattr(dc, "calgroup", None)
        names = list(self.config.system_config.type_names)
        eval_params = {}
        if hasattr(self.config, "evaluation_config"):
            from waveformml_tpu.config import to_dict

            eval_params = to_dict(self.config.evaluation_config)
        if dc.dataset_class in ("PulseDatasetDet", "PulseDatasetDetWithZ",
                                "PulseDatasetDetWithEZ"):
            return PhysEvaluator(names, logger, calgroup=calgroup, **eval_params)
        return PSDEvaluator(names, logger, calgroup=calgroup, **eval_params)

    def loss_and_metrics(self, outputs, db):
        labels = db["labels"]
        ymask = db["label_mask"]
        elem = self.criterion.elementwise(outputs, labels)
        loss_sum = _masked_sum(elem, ymask)
        # RAW shard weight: the clamp to >=1 happens at the global
        # (psum'd) denominator in the trainer — clamping per shard would
        # inflate the denominator whenever a padded device shard is empty.
        # For a per-class-weighted criterion the torch 'mean' denominator is
        # Σ w[y] over the selected samples, not the sample count.
        den = _mean_denominator(self.criterion, labels)
        weight = jnp.sum(ymask if den is None else den * ymask)
        pred = jnp.argmax(outputs, axis=-1)
        correct = _masked_sum((pred == labels).astype(jnp.float32), ymask)
        # confusion matrix sums [C, C]: rows = target, cols = prediction
        onehot_t = jax.nn.one_hot(labels, self.n_type) * ymask[:, None]
        onehot_p = jax.nn.one_hot(pred, self.n_type)
        confusion = jnp.einsum("nt,np->tp", onehot_t, onehot_p)
        return loss_sum, weight, {"accuracy_sum": correct, "accuracy_count": jnp.sum(ymask),
                                  "confusion": confusion}

    def test_outputs(self, outputs, db):
        return {"logits": outputs,
                "pred": jnp.argmax(outputs, axis=-1),
                "logprob": jax.nn.log_softmax(outputs, axis=-1)}


@registry.register("LitWaveform", aliases=("src.engineering.LitWaveform.LitWaveform",
                                           "LitWaveform.LitWaveform"))
class LitWaveform(TaskBase):
    """Single-waveform regression/classification (ref: src/engineering/LitWaveform.py).

    When net_config.use_detector_number is set, n_samples has been extended by
    3 and normalized (x, y, side) detector coordinates are appended to the
    features (ref :14-27, :70-74)."""

    event_predictions = True
    labels_per_row = True

    def __init__(self, config, trial=None):
        self.use_detector_number = bool(getattr(config.net_config, "use_detector_number", False))
        if self.use_detector_number:
            if not hasattr(config.net_config, "num_detectors"):
                raise IOError("net config must contain 'num_detectors' if "
                              "'use_detector_number' set to true")
            # the reference mutates the live config (ref LitWaveform.py:22),
            # which grows n_samples by 3 on EVERY task construction — an HPO
            # study rebuilding the task per trial from the same config would
            # corrupt the model geometry from trial 2 on. Apply once.
            if not getattr(config.system_config, "_det_coords_applied", False):
                config.system_config.n_samples = config.system_config.n_samples + 3
                config.system_config["_det_coords_applied"] = True
            if config.net_config.num_detectors != 308:
                raise IOError(f"num detectors {config.net_config.num_detectors} not supported")
            self.detector_num_factor_x = 1.0 / (NX - 1)
            self.detector_num_factor_y = 1.0 / (NY - 1)
        super().__init__(config, trial)
        self.target_index = getattr(config.dataset_config.dataset_params, "label_index", None) \
            if hasattr(config.dataset_config, "dataset_params") else None
        cc = config.net_config.criterion_class
        self.use_accuracy = cc.startswith("BCE") or cc.startswith("CrossEntropy")

    def make_evaluator(self, logger=None):
        """(ref: LitWaveform.py:39-66)"""
        from waveformml_tpu.config import to_dict
        from waveformml_tpu.evaluation.tensor_eval import TensorEvaluator

        cc = self.config.net_config.criterion_class
        if cc == "L1Loss":
            metric_name = "mean absolute error"
        elif cc == "MSELoss":
            metric_name = "mean squared error"
        elif self.use_accuracy:
            metric_name = "Accuracy"
        else:
            metric_name = "?"
        dc = self.config.dataset_config
        calgroup = getattr(dc, "calgroup", None)
        tp = getattr(dc, "test_dataset_params", None)
        test_has_phys = (tp is not None and getattr(tp, "label_name", None) == "phys"
                         and not hasattr(tp, "label_index"))
        eval_params = {}
        if hasattr(self.config, "evaluation_config"):
            eval_params = to_dict(self.config.evaluation_config)
        eval_params.pop("additional_field_names", None)
        return TensorEvaluator(logger, calgroup=calgroup,
                               target_has_phys=test_has_phys,
                               target_index=self.target_index,
                               metric_name=metric_name, **eval_params)

    def event_bucket(self, block: FileBlock) -> int:
        return self.row_bucket(block)  # per-row labels

    def prepare_block(self, block, row_bucket, event_bucket):
        n = block.coords.shape[0]
        dets = block.coords.reshape(n, -1)[:, 0].astype(np.int32)
        feats = block.feats
        if self.use_detector_number:
            seg = dets // 2
            coords = np.stack([
                (seg % NX) * self.detector_num_factor_x,
                (seg // NX) * self.detector_num_factor_y,
                (dets % 2).astype(np.float32),
            ], axis=1).astype(feats.dtype)
            feats = np.concatenate([feats, coords], axis=1)
        out_feats = np.zeros((row_bucket, feats.shape[1]), dtype=feats.dtype)
        out_feats[:n] = feats
        out_det = np.zeros((row_bucket,), dtype=np.int32)
        out_det[:n] = dets
        mask = np.zeros((row_bucket,), dtype=bool)
        mask[:n] = True
        labels = block.labels
        y = np.zeros((row_bucket,) + labels.shape[1:], dtype=labels.dtype)
        y[:n] = labels
        return {"det": out_det, "feats": out_feats, "mask": mask, "labels": y,
                "label_mask": mask}

    def model_inputs(self, db):
        # _features handles occlusion AND the half_precision bf16 cast
        return self._features(db)

    def _predictions(self, outputs, labels):
        p = outputs
        if p.ndim == 2 and labels.ndim == 1 and p.shape[1] == 1:
            p = p[:, 0]
        return p

    def loss_and_metrics(self, outputs, db):
        labels = db["labels"]
        if self.target_index is not None and labels.ndim == 2:
            labels = labels[:, self.target_index]
        p = self._predictions(outputs, labels)
        mask = db["mask"]
        elem = self.criterion.elementwise(p, labels)
        loss_sum = _masked_sum(elem, mask)
        # torch criterion 'mean' reduction averages over every element, so for
        # multi-output regression ([N, K] elem vs [N] row mask) the weight is
        # rows × K, not rows
        n_out = 1
        for d in elem.shape[len(mask.shape):]:
            n_out *= d
        # raw; clamped globally in the trainer. Weighted classification
        # criteria divide torch's 'mean' by Σ w[y], not the count.
        den = _mean_denominator(self.criterion, labels)
        weight = jnp.sum(mask if den is None else den * mask) * n_out
        metrics = {}
        if self.use_accuracy and p.ndim == 2:
            pred = jnp.argmax(jax.nn.softmax(p, axis=1), axis=1)
            metrics["accuracy_sum"] = _masked_sum((pred == labels).astype(jnp.float32), mask)
            metrics["accuracy_count"] = jnp.sum(mask)
        return loss_sum, weight, metrics

    def test_outputs(self, outputs, db):
        labels = db["labels"]
        if self.target_index is not None and labels.ndim == 2:
            labels = labels[:, self.target_index]
        p = self._predictions(outputs, labels)
        return {"predictions": p,
                "loss_no_reduce": self.criterion.elementwise(p, labels)}


@registry.register("LitZ", aliases=("src.engineering.LitZ.LitZ", "LitZ.LitZ"))
class LitZ(TaskBase):
    """Per-segment Z regression (ref: src/engineering/LitZ.py)."""

    event_predictions = False
    labels_per_row = True

    def __init__(self, config, trial=None):
        super().__init__(config, trial)
        if self.model is None:
            from waveformml_tpu.models.nets import SingleEndedZConv
            self.model = SingleEndedZConv(config)
        self.use_fft = bool(getattr(config.net_config, "UseFFT", False))
        self.z_index = 4  # phys z index (ref: AD1Evaluator.py:52)

    def make_evaluator(self, logger=None):
        """Evaluator choice (ref: LitZ.py:49-60)."""
        from waveformml_tpu.config import to_dict
        from waveformml_tpu.evaluation.z_eval import (
            ZEvaluatorPhys, ZEvaluatorRealWFNorm, ZEvaluatorWF)

        dc = self.config.dataset_config
        calgroup = getattr(dc, "calgroup", None)
        eval_params = {}
        if hasattr(self.config, "evaluation_config"):
            eval_params = to_dict(self.config.evaluation_config)
        tp = getattr(dc, "test_dataset_params", None)
        test_has_phys = (tp is not None and getattr(tp, "label_name", None) == "phys"
                         and not hasattr(tp, "label_index"))
        if tp is not None and hasattr(tp, "additional_fields"):
            eval_params["additional_field_names"] = list(tp.additional_fields)
        if test_has_phys:
            return ZEvaluatorRealWFNorm(logger, calgroup=calgroup, **eval_params)
        if getattr(self.config.net_config, "algorithm", None) == "features":
            eval_params.pop("additional_field_names", None)
            return ZEvaluatorPhys(logger, calgroup=calgroup, **eval_params)
        eval_params.pop("additional_field_names", None)
        return ZEvaluatorWF(logger, calgroup=calgroup, **eval_params)

    def _build_model(self):
        # explicit base call: these methods are shared by assignment into
        # sibling tasks (LitEZ etc.), where zero-arg super() would mis-bind
        if hasattr(self.config.net_config, "net_class"):
            return TaskBase._build_model(self)
        return None

    def event_bucket(self, block: FileBlock) -> int:
        if block.coords.ndim == 2 and block.coords.shape[0]:
            return TaskBase.event_bucket(self, block)
        return bucket_size(max(1, block.labels.shape[0]))

    def prepare_block(self, block, row_bucket, event_bucket):
        # per-row labels aligned with coords
        from waveformml_tpu.ops.sparse import pad_sparse
        coords, feats, mask, y = pad_sparse(block.coords, block.feats, row_bucket,
                                            labels=block.labels)
        n_ev = event_bucket
        out = {"coords": coords, "feats": feats, "mask": mask, "labels_rows": y,
               # labels key fixes the static event count for sparse_batch
               "labels": np.zeros((n_ev,), dtype=np.float32),
               "label_mask": np.zeros((n_ev,), dtype=bool)}
        for k, v in block.extras.items():
            if k.startswith(("edges_", "edge_mask_")):
                continue  # consumed by add_graph_edges, not row-shaped
            pad = np.zeros((row_bucket,) + v.shape[1:], dtype=v.dtype)
            pad[: v.shape[0]] = v
            out[f"extra_{k}"] = pad
        self.add_graph_edges(block, out)
        self.add_row_plans(out, event_bucket)
        return out

    def _features(self, db):
        f = super()._features(db)
        if self.use_fft:
            # rFFT preprocessing (ref: LitZ.py:96-97); complex split into
            # (real ‖ imag) channels for the conv stack
            z = jnp.fft.rfft(f, axis=-1)
            f = jnp.concatenate([z.real, z.imag], axis=-1).astype(f.dtype)
        return f

    def loss_and_metrics(self, outputs, db):
        target_has_phys = db["labels_rows"].ndim == 2 and db["labels_rows"].shape[1] > 2
        loss_sum, weight, _, _ = self.segment_loss(
            outputs, db, db["labels_rows"],
            target_index=self.z_index if target_has_phys else None)
        return loss_sum, weight, {}

    def test_outputs(self, outputs, db):
        _, _, target_dense, preds = self.segment_loss(outputs, db, db["labels_rows"])
        return {"predictions": preds, "target": target_dense}


@registry.register("LitEZ", aliases=("src.engineering.LitEZ.LitEZ", "LitEZ.LitEZ"))
class LitEZ(TaskBase):
    """Joint (E,Z) per-segment regression (ref: src/engineering/LitEZ.py):
    channel 0 vs target[:,0] and channel 1 vs target[:,1], losses summed."""

    event_predictions = False
    labels_per_row = True

    def __init__(self, config, trial=None):
        super().__init__(config, trial)
        if self.model is None:
            from waveformml_tpu.models.nets import SingleEndedEZConv
            self.model = SingleEndedEZConv(config)
        nc = config.net_config
        self.zscale = getattr(nc, "zscale", 1200.0)
        self.escale = getattr(nc, "escale", 12.0)
        self.e_adjust = getattr(nc, "e_adjust", 12.0)
        self.e_factor = self.escale / self.e_adjust
        self.phys_coord = getattr(nc, "algorithm", "conv") == "features"

    def make_evaluator(self, logger=None):
        """(ref: LitEZ.py:26-35)"""
        from waveformml_tpu.evaluation.ez_eval import EZEvaluatorPhys, EZEvaluatorWF

        calgroup = getattr(self.config.dataset_config, "calgroup", None)
        cls = EZEvaluatorPhys if self.phys_coord else EZEvaluatorWF
        return cls(logger, calgroup=calgroup, e_scale=self.e_adjust)

    def _build_model(self):
        if hasattr(self.config.net_config, "net_class"):
            return super()._build_model()
        return None

    prepare_block = LitZ.prepare_block
    event_bucket = LitZ.event_bucket

    def _features(self, db):
        f = super()._features(db)
        if self.phys_coord and self.e_factor != 1.0:
            # rescale E-like phys features (ref: LitEZ.py:57-60)
            for idx in (0, 2, 3):
                f = f.at[:, idx].multiply(self.e_factor)
        return f

    def loss_and_metrics(self, outputs, db):
        # channel/label order follows the on-disk EZ layout (E, z) — the
        # reference's PredictionWriter writes z into EZ[:, 1]
        # (PredictionWriter.py:161-177) while its LitEZ training code reads
        # the components swapped (LitEZ.py:66-67); we keep the disk layout
        # so metric names match what the field actually holds.
        t = db["labels_rows"]
        e_sum, e_w, _, _ = self.segment_loss(outputs[:, 0:1], db, t[:, 0])
        z_sum, z_w, _, _ = self.segment_loss(outputs[:, 1:2], db, t[:, 1])
        loss_sum = z_sum + e_sum
        # both losses share the site count; report each normalized
        return loss_sum, z_w, {"MAE_z_sum": z_sum, "MAE_z_count": z_w,
                               "MAE_E_sum": e_sum, "MAE_E_count": e_w}

    def test_outputs(self, outputs, db):
        t = db["labels_rows"]
        _, _, te, pe = self.segment_loss(outputs[:, 0:1], db, t[:, 0])
        _, _, tz, pz = self.segment_loss(outputs[:, 1:2], db, t[:, 1])
        return {"predictions": jnp.concatenate([pe, pz], axis=1),
                "target": jnp.concatenate([te, tz], axis=1)}


@registry.register("LitSegClassifier",
                   aliases=("src.engineering.LitSegClassifier.LitSegClassifier",
                            "LitSegClassifier.LitSegClassifier"))
class LitSegClassifier(TaskBase):
    """Per-segment classification (PID) over site-preserving nets
    (ref: src/engineering/LitSegClassifier.py)."""

    event_predictions = False
    labels_per_row = True

    def __init__(self, config, trial=None):
        super().__init__(config, trial)
        self.n_type = config.system_config.n_type
        self.seg_status = jnp.asarray(seg_status_maps()[0])

    def make_evaluator(self, logger=None):
        from waveformml_tpu.evaluation.pid_eval import PIDEvaluator

        calgroup = getattr(self.config.dataset_config, "calgroup", None)
        return PIDEvaluator(logger, calgroup=calgroup, SE_only=self.SE_only)

    prepare_block = LitZ.prepare_block
    event_bucket = LitZ.event_bucket

    def loss_and_metrics(self, outputs, db):
        # outputs: per-row [N, n_type] (SPConvPreserveNet)
        labels = db["labels_rows"]
        if labels.ndim == 2:
            labels = labels[:, 0]
        labels = labels.astype(jnp.int32)
        mask = db["mask"]
        if self.SE_only:
            x, y = db["coords"][:, 0], db["coords"][:, 1]
            mask = mask & (self.seg_status[x, y] == 0.5)
        elem = self.criterion.elementwise(outputs, labels)
        loss_sum = _masked_sum(elem, mask)
        # raw; clamped globally in the trainer. Segment-level tasks mirror
        # torch reduction='sum' (LitBase.py:39-43) where class weights scale
        # the sum but never the denominator, so this stays the site count.
        weight = jnp.sum(mask)
        pred = jnp.argmax(outputs, axis=-1)
        correct = _masked_sum((pred == labels).astype(jnp.float32), mask)
        onehot_t = jax.nn.one_hot(labels, self.n_type) * mask[:, None]
        onehot_p = jax.nn.one_hot(pred, self.n_type)
        confusion = jnp.einsum("nt,np->tp", onehot_t, onehot_p)
        return loss_sum, weight, {"accuracy_sum": correct,
                                  "accuracy_count": jnp.sum(mask),
                                  "confusion": confusion}

    def test_outputs(self, outputs, db):
        return {"logits": outputs,
                "pred": jnp.argmax(outputs, axis=-1),
                "prob": jax.nn.softmax(outputs, axis=-1)}


@registry.register("LitSegQuantifier",
                   aliases=("src.engineering.LitSegQuantifier.LitSegQuantifier",
                            "LitSegQuantifier.LitSegQuantifier"))
class LitSegQuantifier(TaskBase):
    """Per-segment scalar regression (ref: src/engineering/LitSegQuantifier.py):
    target_index selection from multi-field labels, SE-only option, MSE metric."""

    event_predictions = False
    labels_per_row = True

    def __init__(self, config, trial=None):
        super().__init__(config, trial)
        self.target_index = getattr(config.net_config, "target_index", None)
        self.seg_status = jnp.asarray(seg_status_maps()[0])

    def make_evaluator(self, logger=None):
        from waveformml_tpu.evaluation.seg_eval import SegEvaluator

        calgroup = getattr(self.config.dataset_config, "calgroup", None)
        return SegEvaluator(logger, calgroup=calgroup,
                            target_index=self.target_index, SE_only=self.SE_only)

    prepare_block = LitZ.prepare_block
    event_bucket = LitZ.event_bucket

    def loss_and_metrics(self, outputs, db):
        labels = db["labels_rows"]
        if self.target_index is not None and labels.ndim == 2:
            labels = labels[:, self.target_index]
        elif labels.ndim == 2:
            labels = labels[:, 0]
        p = outputs[:, 0] if outputs.ndim == 2 and outputs.shape[1] == 1 else outputs
        mask = db["mask"]
        if self.SE_only:
            x, y = db["coords"][:, 0], db["coords"][:, 1]
            mask = mask & (self.seg_status[x, y] == 0.5)
        elem = self.criterion.elementwise(p, labels)
        loss_sum = _masked_sum(elem, mask)
        weight = jnp.sum(mask)  # raw; clamped globally in the trainer
        mse = _masked_sum((p - labels) ** 2, mask)
        return loss_sum, weight, {"mse_sum": mse, "mse_count": jnp.sum(mask)}

    def test_outputs(self, outputs, db):
        return {"predictions": outputs}
