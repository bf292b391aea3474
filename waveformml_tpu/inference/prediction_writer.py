"""Batch-inference HDF5 writers: stream a file through a trained model and
write a new HDF5 with predictions swapped into place.

Equivalent of src/datasets/PredictionWriter.py (362 LoC):
``PredictionWriter.write_predictions`` streams event-preserving chunks
(ref :73-104), ``ZPredictionWriter`` swaps the NN z into EZ[:,1] after
gain-normalizing raw ADC waveform pairs (ref :134-176), ``IRNPredictionWriter``
swaps per-event phys outputs (ref :180-195), ``IRNIMPredictionWriter``
converts classifier scores into PhysPulse records via
convert_wf_phys_SE_classifier (ref :198-275), and ``ZAndClassWriter`` runs a
z model and a classifier in one pass (ref :277-362). XML provenance sidecars
written after (ref :125-130).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from waveformml_tpu.config import load_config
from waveformml_tpu.detector import MAX_RANGE, NX, NY
from waveformml_tpu.engineering.se_mask import seg_status_maps
from waveformml_tpu.evaluation.ad1 import Z_NORMALIZATION_FACTOR
from waveformml_tpu.inference.model import InferenceModel
from waveformml_tpu.io.compound_types import (
    PhysPulse, WaveformPairCal, extension_type_map)
from waveformml_tpu.io.hdf5 import H5Input, P2XTableWriter
from waveformml_tpu.io.sql import get_gains
from waveformml_tpu.io.xml import XMLWriter
from waveformml_tpu.datasets.pulse_dataset import dataset_class_type_map
from waveformml_tpu.ops.calibration import convert_wf_phys_SE_classifier
from waveformml_tpu.ops.sparse import (
    normalize_waveforms, swap_sparse_from_dense, swap_sparse_from_event)
from waveformml_tpu.utils.util import get_file_md5

log = logging.getLogger(__name__)


class PredictionWriter(P2XTableWriter):
    """Base writer; subclasses implement swap_values / convert_values
    (ref: PredictionWriter.py:17-130)."""

    def __init__(self, path: str, input_path: str, config: str, checkpoint: str,
                 **kwargs):
        super().__init__(path)
        self.XMLW = XMLWriter()
        self.checkpoint_path = checkpoint
        self.config_path = config
        self.config = load_config(config)
        self.input = H5Input(input_path)
        self.input_type = extension_type_map(input_path)
        self.n_buffer_rows = 1024 * 16
        self.n_rows_per_read = 2048
        # gzip level for the output table: the reference hardcodes 9
        # (HDF5IO.py:88-91), which measures 4x slower than level 4 for <2%
        # size difference on waveform records — identical on-disk format
        # (deflate), so downstream readers are unaffected
        self.output_compression = 4
        self.swap = True
        for key, val in kwargs.items():
            setattr(self, key, val)
        pre, post = self._model_transforms()
        self.model = InferenceModel(self.config, checkpoint,
                                    preprocess=pre, postprocess=post,
                                    output_unit=self._output_unit())
        if "datatype" in kwargs:
            if kwargs["datatype"] == "WaveformPairCal":
                self.data_type = WaveformPairCal()
            elif kwargs["datatype"] == "PhysPulse":
                self.data_type = PhysPulse()
            else:
                raise IOError(
                    f"unrecognized datatype: {kwargs['datatype']}, did you mean "
                    "'WaveformPairCal' or 'PhysPulse'?")
        else:
            self.data_type = dataset_class_type_map(
                self.config.dataset_config.dataset_class) or self.input_type

    def write_predictions(self) -> None:
        """(ref: PredictionWriter.py:73-104)"""
        if "Chanmap" in self.input.h5f:
            self.copy_chanmap(self.input)
        self.input.setup_table(self.input_type.name, self.input_type.type,
                               self.input_type.event_index_name,
                               event_index_coord=self.input_type.event_index_coord)
        nrows = self.input.h5f[self.input_type.name].shape[0]
        self.create_table(self.data_type.name, (nrows,), self.data_type.type,
                          compression_opts=int(self.output_compression))
        self.copy_p2x_attrs(self.input, self.data_type.name, self.input_type.name,
                            self.data_type.names)
        import queue
        import threading
        import time as _time

        from waveformml_tpu.utils.util import prefetch_iter

        # five-stage software pipeline over four threads (the reference
        # streams serially, PredictionWriter.py:73-104):
        #   A: HDF5 chunk decode (gzip inflate) on the prefetch thread
        #   B: host prep + async device dispatch of chunk k  (main thread)
        #   C: fetch + numpy post-process on the FETCH thread — the d2h
        #      payload is tiny ([N] z values) so this stage is pure RPC
        #      round-trip latency, which overlaps the next chunk's h2d
        #   D: gzip deflate + HDF5 write on the WRITER thread
        # Stages C and D used to run on the main thread, serializing the
        # fetch RPC and the output gzip against the device link; dedicated
        # threads with bounded FIFO queues overlap them (FIFO keeps output
        # rows in input order). Only the writer thread touches the output
        # table between here and the final join. Writers that don't
        # implement model_dispatch fall back to the synchronous
        # swap_values/convert_values path (still write-threaded).
        # A/D overlap caveat: stages A and D only truly run concurrently on
        # the direct-chunk gzip codec (io.hdf5 read/write_direct_chunk +
        # plain zlib, which drops the GIL outside h5py's global lock); a
        # dataset that falls back to h5py slicing (non-gzip filters, dtype
        # mismatch) runs its filter pipeline under that lock and the two
        # stages serialize there.
        self.stage_seconds = {"dispatch_s": 0.0, "fetch_post_s": 0.0,
                              "fetch_wait_s": 0.0, "write_wait_s": 0.0,
                              "writer_busy_s": 0.0, "fill_s": 0.0,
                              "drain_s": 0.0}
        # keep the model's dispatch sub-phase window aligned with
        # stage_seconds when a writer/model is reused across passes
        for attr in ("model", "class_model"):
            model = getattr(self, attr, None)
            if model is not None and hasattr(model, "dispatch_phases"):
                model.dispatch_phases = {k: 0.0
                                         for k in model.dispatch_phases}
        # depth bounds in-flight dispatch handles (each pins its ~1-2 MB
        # packed input buffer on device until fetched — ~10-15 MB at depth 8,
        # noise against HBM). Measured 2026-08-20: depth 3 backpressured the
        # main thread 0.26 s (fetch_wait) on a 7-chunk file while the link
        # still had work to ship; depth 8 keeps the launch stream ahead of
        # the fetch thread's per-chunk RPC round-trips.
        depth = max(1, int(getattr(self, "pipeline_depth", 8)))
        wq: "queue.Queue" = queue.Queue(maxsize=8)
        fq: "queue.Queue" = queue.Queue(maxsize=depth)
        errors = []

        def writer_loop():
            n_current_buffer = 0
            draining = False
            while True:
                rows = wq.get()
                if rows is None:
                    return
                if draining:
                    continue
                t0 = _time.perf_counter()
                try:
                    self.add_rows(self.data_type.name, rows)
                    n_current_buffer += rows.shape[0]
                    if n_current_buffer >= self.n_buffer_rows:
                        n_current_buffer = 0
                        self.flush(self.data_type.name)
                except BaseException as e:  # surfaced to the producer
                    errors.append(e)
                    draining = True  # keep consuming so producers never block
                finally:
                    self.stage_seconds["writer_busy_s"] += _time.perf_counter() - t0

        fetch_stat_lock = threading.Lock()

        def fetch_one(data, handle):
            # fetch_post_s = summed per-WORKER busy time (lock-guarded: '+='
            # from 3 pool threads would lose updates). Workers overlap, so
            # this legitimately exceeds wall time — it measures how much
            # serial RPC latency the pool absorbed, not an e2e component.
            t0 = _time.perf_counter()
            rows = self.apply_outputs(data, handle)
            dt = _time.perf_counter() - t0
            with fetch_stat_lock:
                self.stage_seconds["fetch_post_s"] += dt
            return rows

        def fetch_loop():
            # collector: consume fetch FUTURES in dispatch order (writes must
            # land in input order) while the pool's workers overlap the
            # per-fetch RPC round-trips (~0.08-0.16 s each through a remote
            # tunnel — serialized they form a second RPC stream as long as
            # the launch stream; measured 2026-08-20)
            draining = False
            while True:
                fut = fq.get()
                if fut is None:
                    return
                if draining:
                    fut.cancel()
                    continue
                try:
                    _write(fut.result())
                except BaseException as e:
                    errors.append(e)
                    draining = True

        def _write(rows):
            if errors:
                raise errors[0]
            t0 = _time.perf_counter()
            wq.put(rows)
            self.stage_seconds["write_wait_s"] += _time.perf_counter() - t0

        def _enqueue_fetch(data, handle):
            if errors:
                raise errors[0]
            t0 = _time.perf_counter()
            # bounded FIFO of futures: at most `depth` chunks in flight
            fq.put(fetch_pool.submit(fetch_one, data, handle))
            self.stage_seconds["fetch_wait_s"] += _time.perf_counter() - t0

        def _drain_threads():
            fq.put(None)
            fetcher.join()
            fetch_pool.shutdown(wait=True)
            wq.put(None)
            writer.join()

        def _close_quietly():
            for closer in (self.input.close, self.close):
                try:
                    closer()
                except Exception:
                    pass  # don't mask the original error

        from concurrent.futures import ThreadPoolExecutor

        fetch_pool = ThreadPoolExecutor(
            max_workers=max(1, int(getattr(self, "fetch_workers", 3))),
            thread_name_prefix="wfml-prediction-fetch")
        writer = threading.Thread(target=writer_loop, daemon=True,
                                  name="wfml-prediction-writer")
        fetcher = threading.Thread(target=fetch_loop, daemon=True,
                                   name="wfml-prediction-fetcher")
        writer.start()
        fetcher.start()

        t_loop = _time.perf_counter()
        first_dispatch = True
        try:
            # "truncate": chunks stay ≤ n_rows_per_read so the padded row
            # bucket is exactly n_rows_per_read — the reference's extend
            # semantics would push every chunk a few rows PAST the bucket
            # boundary (4097 → 6144-row bucket: 50% wasted h2d bytes+FLOPs)
            for data in prefetch_iter(self.input.iter_chunks(
                    self.n_rows_per_read, preserve_event="truncate")):
                t0 = _time.perf_counter()
                if first_dispatch:
                    # pipeline fill: first-chunk decode before any device
                    # work could start
                    self.stage_seconds["fill_s"] = t0 - t_loop
                    first_dispatch = False
                handle = self.model_dispatch(data)
                self.stage_seconds["dispatch_s"] += _time.perf_counter() - t0
                if handle is None:  # legacy synchronous path
                    if self.swap:
                        self.swap_values(data)
                    else:
                        data = self.convert_values(data)
                    _write(data)
                    continue
                _enqueue_fetch(data, handle)
        except BaseException:
            # producer-side error (or errors[0] re-raised by _write /
            # _enqueue_fetch): drain the threads, then release both HDF5
            # handles so a retrying caller never accumulates open files
            _drain_threads()
            _close_quietly()
            raise
        t_drain = _time.perf_counter()
        _drain_threads()
        if errors:
            _close_quietly()
            raise errors[0]
        try:
            t_flush = _time.perf_counter()
            self.stage_seconds["drain_fetch_s"] = t_flush - t_drain
            self.flush(self.data_type.name)
            self.input.close()
            self.close()
            # pipeline drain: last dispatch returned -> all fetches/writes
            # retired (drain_fetch_s) + final flush/close (the rest)
            self.stage_seconds["drain_s"] = _time.perf_counter() - t_drain
        except BaseException:
            # a failing final flush/close (e.g. disk full) must still
            # release both handles for retrying callers
            _close_quietly()
            raise

    # -- model input prep -----------------------------------------------------------
    def _coords_vals(self, data: np.ndarray):
        """Normalize raw ADC pairs (needs gains) or pass phys features through;
        event column renumbered consecutively (ref: ZPredictionWriter.swap_values)."""
        if "waveform" in (data.dtype.names or ()):
            if getattr(self, "gains", None) is None:
                raise IOError("Must pass calgroup argument in order to normalize "
                              "WaveformPairCal data before passing to model")
            coords = data["coord"].copy()
            vals = normalize_waveforms(coords, data["waveform"], self.gains)
        else:
            coords = data["coord"].copy()
            from waveformml_tpu.ops.sparse import consecutive_event_index

            coords[:, -1] = consecutive_event_index(coords[:, -1])
            vals = np.asarray(data["pulse"], dtype=np.float32)
        return coords, vals

    def swap_values(self, data: np.ndarray) -> None:
        # synchronous path: subclasses implementing model_dispatch /
        # apply_outputs get this for free
        self.apply_outputs(data, self.model_dispatch(data))

    def convert_values(self, data: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # -- pipelined path hooks --------------------------------------------------------
    def _output_unit(self) -> str:
        """Leading axis of the model output ("row"/"event"): lets
        InferenceModel.fetch un-pad correctly even when the padded row and
        event bucket sizes coincide (both tables contain 256, 512, 1024...)."""
        return "auto"

    def _model_transforms(self):
        """(preprocess, postprocess) jitted into the model's forward — see
        InferenceModel. Subclasses override to move host numpy pre/post work
        onto the device."""
        return None, None

    def model_dispatch(self, data: np.ndarray):
        """Async-dispatch this chunk's device work; return an opaque handle
        (or None to use the synchronous swap/convert path)."""
        return None

    def apply_outputs(self, data: np.ndarray, handle) -> np.ndarray:
        """Materialize a model_dispatch handle, post-process, and return the
        rows to write for this chunk."""
        raise NotImplementedError

    # -- provenance -----------------------------------------------------------------
    def set_xml(self) -> None:
        settings = {"model_checkpoint": self.checkpoint_path,
                    "model_config": self.config_path}
        # orbax checkpoints are DIRECTORIES (epoch=E-val_loss=V.ckpt);
        # get_file_md5 digests them file-by-file
        if os.path.exists(self.checkpoint_path):
            settings["model_checkpoint_hash"] = get_file_md5(self.checkpoint_path)
        if os.path.isfile(self.config_path):
            settings["model_config_hash"] = get_file_md5(self.config_path)
        self.XMLW.step_settings.update(settings)

    def write_XML(self, runtime: float) -> None:
        self.XMLW.input_file = self.input.path + ".xml"
        self.XMLW.output_file = self.path
        self.XMLW.step_name = type(self).__name__
        self.set_xml()
        self.XMLW.write_xml(self.path + ".xml", runtime)


def _device_gain_pre(gains_scaled: np.ndarray):
    """Device-side gain normalization of raw int16 ADC pairs (the host ships
    half the bytes; ref host kernel SparseUtils.py:1564-1584). One shared
    kernel for every writer — `gains_scaled` is [NX, NY, 2], already
    premultiplied by any writer-specific scale factor."""
    import jax.numpy as jnp

    gains = jnp.asarray(gains_scaled)

    def pre(coords, feats, mask):
        g = gains[coords[:, 0], coords[:, 1]]  # [N, 2]
        s = feats.shape[1] // 2
        f = feats.astype(jnp.float32)
        return jnp.concatenate([f[:, :s] * g[:, :1], f[:, s:] * g[:, 1:]],
                               axis=1)

    return pre


def _dense_to_row_post():
    """Gather per-row values from a dense [B, 1, NX, NY] model output (coords
    are renumbered consecutively on host before dispatch)."""
    def post(outputs, coords, mask):
        return outputs[coords[:, -1], 0, coords[:, 0], coords[:, 1]]

    return post


def _gain_factors(calgroup: str, scale_factor: Optional[float] = None) -> np.ndarray:
    """690/MAX_RANGE/gain factors (ref: ZPredictionWriter.__init__ :139-146)."""
    gains = get_gains(os.environ["PROSPECT_CALDB"], calgroup)
    num = (scale_factor or 1.0) * 690.0 / MAX_RANGE
    out = np.full((NX, NY, 2), num, dtype=np.float32)
    return np.divide(out, gains, out=np.zeros_like(out), where=gains != 0)


class ZPredictionWriter(PredictionWriter):
    """Swap the NN z prediction into EZ[:, 1] (ref :134-176).

    When the input carries raw ADC waveforms and a calgroup is given, the
    gain normalization and the dense-grid → per-row z gather run ON DEVICE
    inside the model's jit: the host ships int16 samples (half the bytes of
    f32) and fetches an [N] z vector instead of the [B, 1, NX, NY] grid —
    two orders of magnitude less device→host traffic per chunk."""

    def __init__(self, path, input_path, config, checkpoint, **kwargs):
        self.z_scale = Z_NORMALIZATION_FACTOR
        self.gains = None
        if kwargs.get("calgroup"):
            self.gains = _gain_factors(kwargs["calgroup"],
                                       kwargs.get("scale_factor"))
        self._device_norm = (self.gains is not None and
                             "waveform" in (extension_type_map(input_path).type.names or ()))
        super().__init__(path, input_path, config, checkpoint, **kwargs)

    def _output_unit(self) -> str:
        # device-norm post gathers per-row z [N]; otherwise the model emits
        # the dense [B, 1, NX, NY] grid (event-leading)
        return "row" if self._device_norm else "event"

    def _model_transforms(self):
        if not self._device_norm:
            return None, None
        # gains already carry the z scale factor (see __init__)
        return _device_gain_pre(self.gains), _dense_to_row_post()

    def model_dispatch(self, data: np.ndarray):
        if self._device_norm:
            from waveformml_tpu.ops.sparse import consecutive_event_index

            coords = data["coord"].copy()
            coords[:, -1] = consecutive_event_index(coords[:, -1])
            return self.model.dispatch(coords, data["waveform"])
        coords, vals = self._coords_vals(data)
        return self.model.dispatch(coords, vals)

    def apply_outputs(self, data: np.ndarray, handle) -> np.ndarray:
        out = self.model.fetch(handle)
        if self._device_norm:  # per-row z [N]
            data["EZ"][:, 1] = (out - 0.5) * self.z_scale
        else:                  # dense [B, 1, NX, NY]
            dense = (out[:, 0] - 0.5) * self.z_scale
            swap_sparse_from_dense(data["EZ"][:, 1], dense, data["coord"])
        return data

    def set_xml(self) -> None:
        super().set_xml()
        self.XMLW.step_settings["EZ_index_replaced"] = [1]


class IRNPredictionWriter(PredictionWriter):
    """Per-event phys outputs swapped into phys[:, 4:] (ref :180-195)."""

    def __init__(self, path, input_path, config, checkpoint, **kwargs):
        super().__init__(path, input_path, config, checkpoint, **kwargs)
        self.phys_index_replaced = 4

    def _output_unit(self) -> str:
        return "event"  # per-event phys outputs [B, F]

    def model_dispatch(self, data: np.ndarray):
        coords, vals = self._coords_vals(data)
        return self.model.dispatch(coords, vals)

    def apply_outputs(self, data: np.ndarray, handle) -> np.ndarray:
        output = self.model.fetch(handle)  # per-event [B, F]
        swap_sparse_from_event(data["phys"][:, self.phys_index_replaced:],
                               output, data["coord"])
        return data

    def set_xml(self) -> None:
        super().set_xml()
        self.XMLW.step_settings["phys_index_replaced"] = [4, 5, 6]


class IRNIMPredictionWriter(PredictionWriter):
    """Per-row classifier scores → phys columns, or full PhysPulse conversion
    when the output datatype is PhysPulse (ref :198-275)."""

    def __init__(self, path, input_path, config, checkpoint, **kwargs):
        super().__init__(path, input_path, config, checkpoint, **kwargs)
        self.phys_index_replaced = 2
        self.output_is_sparse = kwargs.get("output_is_sparse", True)
        self.seg_status, self.blind_detl, self.blind_detr = seg_status_maps(
            kwargs.get("excludes"))
        self.gains = None
        if kwargs.get("calgroup"):
            self.gains = _gain_factors(kwargs["calgroup"],
                                       kwargs.get("scale_factor"))
        if isinstance(self.data_type, PhysPulse):
            self.swap = False

    def _output_unit(self) -> str:
        # sparse classifier scores are per-row [N, 5]; the dense variant
        # emits [B, 5, NX, NY] (event-leading). output_is_sparse may arrive
        # via kwargs (set by the base setattr loop) before __init__ finishes.
        return "row" if getattr(self, "output_is_sparse", True) else "event"

    def model_dispatch(self, data: np.ndarray):
        coords, vals = self._coords_vals(data)
        return coords, self.model.dispatch(coords, vals)

    def apply_outputs(self, data: np.ndarray, handle) -> np.ndarray:
        coords, h = handle
        output = self.model.fetch(h)
        if self.swap:
            if self.output_is_sparse:
                data["phys"][:, self.phys_index_replaced:] = output
            else:
                # models emit the torch layout [B, C, NX, NY]; the swap kernel
                # indexes [B, NX, NY, ...] (channel-last)
                swap_sparse_from_dense(data["phys"][:, self.phys_index_replaced:],
                                       np.moveaxis(output, 1, -1), data["coord"])
            return data
        return self._convert(data, coords, output)

    def convert_values(self, data: np.ndarray) -> np.ndarray:
        coords, h = self.model_dispatch(data)
        return self._convert(data, coords, self.model.fetch(h))

    def _convert(self, data: np.ndarray, coords: np.ndarray,
                 output: np.ndarray) -> np.ndarray:
        # per-row class scores [N, 5]
        phys = np.zeros((coords.shape[0],), dtype=self.data_type.type)
        phys["evt"] = data["evt"]
        phys["t"] = data["t"]
        phys["PE"] = data["PE"]
        phys["seg"] = data["coord"][:, 0] + data["coord"][:, 1] * NX
        phys["PID"] = data["PID"]
        convert_wf_phys_SE_classifier(
            data["coord"], data["E"], phys["E"], phys["rand"], data["dt"],
            phys["dt"], data["z"], phys["y"], data["PSD"], phys["PSD"],
            phys["E_SE"], phys["y_SE"], phys["Esmear_SE"], phys["PSD_SE"],
            data["EZ"][:, 1], output, self.blind_detl, self.blind_detr)
        return phys

    def set_xml(self) -> None:
        super().set_xml()
        if self.swap:
            self.XMLW.step_settings["phys_index_replaced"] = [2, 3, 4, 5, 6]
        else:
            self.XMLW.step_settings.update({
                "classifier_score_ioni_placement": "E",
                "classifier_score_recoil_placement": "rand",
                "classifier_score_ncap_placement": "dt",
                "classifier_score_ingress_placement": "y",
                "classifier_score_muon_placement": "PSD"})


class ZAndClassWriter(PredictionWriter):
    """Two models (z + segment classifier), one pass → PhysPulse
    (ref :277-362; driven by scripts/WriteZAndClass.py)."""

    def __init__(self, path, input_path, zconfig, zcheckpoint, classconfig,
                 classcheckpoint, **kwargs):
        if kwargs.get("datatype", "PhysPulse") != "PhysPulse":
            raise IOError("datatype must be PhysPulse for ZAndClassWriter")
        kwargs["datatype"] = "PhysPulse"
        self.scale_factor_z = kwargs.pop("scale_factor_z", 1.0)
        self.scale_factor_class = kwargs.pop("scale_factor_class", 1.0)
        if "scale_factor" in kwargs:
            raise IOError("Must specify scale factor for z or classifier "
                          "(scale_factor_z or scale_factor_class)")
        self.z_scale = Z_NORMALIZATION_FACTOR
        self.gains = None
        if kwargs.get("calgroup"):
            self.gains = _gain_factors(kwargs["calgroup"])
        if self.gains is None:
            raise IOError("Must pass calgroup argument in order to normalize "
                          "WaveformPairCal data before passing to model")
        self._device_norm = True
        super().__init__(path, input_path, zconfig, zcheckpoint, **kwargs)
        self.swap = False
        self.seg_status, self.blind_detl, self.blind_detr = seg_status_maps(
            kwargs.get("excludes"))
        self.class_config_path = classconfig
        self.class_checkpoint_path = classcheckpoint
        self.class_config = load_config(classconfig)
        class_pre = (self._norm_pre(self.scale_factor_class)
                     if self._device_norm else None)
        self.class_model = InferenceModel(self.class_config, classcheckpoint,
                                          preprocess=class_pre,
                                          output_unit="row")  # [N, 5] scores

    def _output_unit(self) -> str:
        return "row" if self._device_norm else "event"

    def _norm_pre(self, scale_factor: float):
        return _device_gain_pre(self.gains * scale_factor)

    def _model_transforms(self):
        if not self._device_norm:
            return None, None
        return self._norm_pre(self.scale_factor_z), _dense_to_row_post()

    def convert_values(self, data: np.ndarray) -> np.ndarray:
        return self.apply_outputs(data, self.model_dispatch(data))

    def model_dispatch(self, data: np.ndarray):
        """Both models dispatched back-to-back — the classifier and z forward
        overlap on-device with the previous chunk's host post-processing.
        Raw int16 ADC ships once per model; normalization runs in each jit."""
        if self.gains is None:
            raise IOError("Must pass calgroup argument in order to normalize "
                          "WaveformPairCal data before passing to model")
        from waveformml_tpu.ops.sparse import consecutive_event_index

        coords = data["coord"].copy()
        coords[:, -1] = consecutive_event_index(coords[:, -1])
        class_h = self.class_model.dispatch(coords, data["waveform"])
        z_h = self.model.dispatch(coords, data["waveform"])
        return coords, class_h, z_h

    def apply_outputs(self, data: np.ndarray, handle) -> np.ndarray:
        coords, class_h, z_h = handle
        class_out = self.class_model.fetch(class_h)
        # z model post-gathers per-row z on device: [N]
        data["EZ"][:, 1] = (self.model.fetch(z_h) - 0.5) * self.z_scale
        phys = np.zeros((coords.shape[0],), dtype=self.data_type.type)
        phys["evt"] = data["evt"]
        phys["t"] = data["t"]
        phys["PE"] = data["PE"]
        phys["seg"] = data["coord"][:, 0] + data["coord"][:, 1] * NX
        phys["PID"] = data["PID"]
        convert_wf_phys_SE_classifier(
            data["coord"], data["E"], phys["E"], phys["rand"], data["dt"],
            phys["dt"], data["z"], phys["y"], data["PSD"], phys["PSD"],
            phys["E_SE"], phys["y_SE"], phys["Esmear_SE"], phys["PSD_SE"],
            data["EZ"][:, 1], class_out, self.blind_detl, self.blind_detr)
        return phys

    def set_xml(self) -> None:
        super().set_xml()
        self.XMLW.step_settings.update({
            "ML_z_placement": "y_SE",
            "classifier_score_ioni_placement": "E",
            "classifier_score_recoil_placement": "rand",
            "classifier_score_ncap_placement": "dt",
            "classifier_score_ingress_placement": "y",
            "classifier_score_muon_placement": "PSD",
            "model_z_checkpoint": self.checkpoint_path,
            "model_z_config": self.config_path,
            "model_classifier_checkpoint": self.class_checkpoint_path,
            "model_classifier_config": self.class_config_path,
            "scale_factor_z": self.scale_factor_z,
            "scale_factor_class": self.scale_factor_class})
