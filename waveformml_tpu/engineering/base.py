"""Task base: functional equivalent of the reference's LitBase Lightning module.

Reproduces src/engineering/LitBase.py behavior — reflective model/criterion
construction from config (:29-43), criterion reduction mean for event-level
vs sum-normalized-by-site-count for segment-level tasks (:39-43, :124-174),
SE-only masked losses (:111-122), occlusion-index zeroing (:46-49) — in a
functional form: the task owns a flax model + pure loss functions; the
Trainer jits them. Host-side ``prepare_block`` turns ragged FileBlocks into
padded static-shape device dicts (the XLA contract, SURVEY §7.3).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import waveformml_tpu.models  # noqa: F401  (registers model classes)
from waveformml_tpu.config import to_dict
from waveformml_tpu.datasets.hdf5_dataset import FileBlock
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.engineering.se_mask import se_loss_mask
from waveformml_tpu.nn.functional import build_criterion
from waveformml_tpu.ops.sparse import (
    SparseBatch, bucket_size, occupancy_mask, pad_sparse, scatter_to_dense)
from waveformml_tpu.registry import registry


class TaskBase:
    """Owns the flax model, criterion, and the pure loss/metric functions."""

    #: event-level (True) vs per-segment (False) predictions (ref: LitBase.py:39-43)
    event_predictions = True
    #: True when prepare_block pads labels alongside ROWS (coords), not
    #: events — independent of event_predictions (LitWaveform predicts per
    #: event but its labels are row-aligned)
    labels_per_row = False

    def __init__(self, config, trial=None):
        self.log = logging.getLogger(__name__)
        self.config = config
        self.trial = trial
        self.lr = config.optimize_config.lr
        self.needs_float = not getattr(config.system_config, "half_precision", 0)
        self.occlude_index = getattr(config.dataset_config, "occlude_index", None)
        self.SE_only = bool(getattr(config.net_config, "SELoss", False))
        self.se_mask = jnp.asarray(se_loss_mask()) if self.SE_only else None
        self.model = self._build_model()
        # elementwise criterion; reductions are explicit masked sums so padded
        # rows never contribute (ref reduction semantics: LitBase.py:39-43)
        self.criterion = build_criterion(
            config.net_config.criterion_class,
            getattr(config.net_config, "criterion_params", None),
            reduction="none")
        self.evaluator = None  # attached by subclasses / test path
        # row-conv plan requirements {(k, ndim, n_t)} recorded while tracing
        # init_variables; prepare_block prefetches these plans on host so the
        # train step skips the in-step site-LUT + neighbor-plan build
        self._plan_reqs: set = set()
        # grow-only per-site capacity high-water mark for the site-grouped
        # head layout (ops/site_head.py): keeps the [S, MAX] jit shape from
        # flapping between occupancy buckets across batches
        self._site_cap = 0

    # -- construction ---------------------------------------------------------------
    def _build_model(self):
        if hasattr(self.config.net_config, "net_class"):
            cls = registry.retrieve_class(self.config.net_config.net_class)
            kwargs = {}
            z_apply = self._build_frozen_z()
            if z_apply is not None:
                kwargs["z_apply"] = z_apply
            return cls(self.config, **kwargs)
        return None

    def _build_frozen_z(self):
        """Load a frozen pretrained Z model when net_config carries
        z_weights + z_config (ref: SingleEndedEZConv.py:23-31 loads a LitZ
        checkpoint and freezes it); returns apply(batch) -> [B, 1, NX, NY]
        with restored parameters closed over (gradients stopped by the
        consuming module)."""
        nc = self.config.net_config
        if not hasattr(nc, "z_weights"):
            return None
        if not hasattr(nc, "z_config"):
            raise ValueError(
                "if specifying z_weights, you must also specify z_config")
        from waveformml_tpu.config import load_config
        from waveformml_tpu.inference.model import InferenceModel

        z_cfg = load_config(nc.z_config)
        self.log.info("Using Z model from %s", nc.z_weights)
        inf = InferenceModel(z_cfg, nc.z_weights)

        def z_apply(batch):
            # pure flax apply over the restored (frozen) variables — traces
            # inside the training jit; the consumer stop-gradients the output
            return inf.task.model.apply(inf.variables, batch, train=False)

        return z_apply

    def init_variables(self, rng, device_batch: Dict[str, jnp.ndarray]):
        """Initialize flax variables from one (unstacked) prepared batch.
        Tracing init also records which row-conv neighbor plans the model
        builds, so every later prepare_block ships them host-built."""
        from waveformml_tpu.ops.row_conv import record_plan_requirements

        inputs = self.model_inputs({k: jnp.asarray(v) for k, v in device_batch.items()})
        with record_plan_requirements(self._plan_reqs):
            return self.model.init({"params": rng, "dropout": rng}, inputs,
                                   train=False)

    # -- host-side batch preparation -------------------------------------------------
    def row_bucket(self, block: FileBlock) -> int:
        return bucket_size(max(1, block.coords.shape[0]))

    _EVENT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
                      16384, 32768)

    def event_bucket(self, block: FileBlock) -> int:
        n = 1
        if block.coords.ndim == 2 and block.coords.shape[0]:
            n = int(block.coords[:, -1].max()) + 1
        if not self.labels_per_row:
            # trailing events can have zero pulse rows, so the coords-derived
            # count alone can undercount the event-level label vector and
            # prepare_block's y[:n_ev] = labels would fail to broadcast
            n = max(n, block.labels.shape[0])
        return bucket_size(max(1, n), buckets=self._EVENT_BUCKETS)

    def prepare_block(self, block: FileBlock, row_bucket: int,
                      event_bucket: int) -> Dict[str, np.ndarray]:
        """FileBlock → padded numpy dict. Default: sparse event batch with
        event-level labels."""
        coords, feats, mask, = pad_sparse(block.coords, block.feats, row_bucket)[:3]
        labels = block.labels
        n_ev = labels.shape[0]
        if labels.ndim == 1:
            y = np.zeros((event_bucket,), dtype=labels.dtype)
        else:
            y = np.zeros((event_bucket, labels.shape[1]), dtype=labels.dtype)
        y[:n_ev] = labels
        ymask = np.zeros((event_bucket,), dtype=bool)
        ymask[:n_ev] = True
        out = {"coords": coords, "feats": feats, "mask": mask,
               "labels": y, "label_mask": ymask}
        for k, v in block.extras.items():
            if k.startswith(("edges_", "edge_mask_")):
                continue  # consumed by add_graph_edges, not row-shaped
            pad = np.zeros((row_bucket,) + v.shape[1:], dtype=v.dtype)
            pad[: v.shape[0]] = v
            out[f"extra_{k}"] = pad
        self.add_graph_edges(block, out)
        self.add_row_plans(out, event_bucket)
        return out

    def add_row_plans(self, out: Dict[str, np.ndarray], n_events: int) -> None:
        """Host-build the row-conv neighbor plans recorded during init (they
        depend only on coords, so building them here overlaps the device's
        previous step instead of spending ~3-4 ms of every step on the
        in-trace site-LUT scatter + gathers; see ops.row_conv)."""
        if not self._plan_reqs:
            return
        from waveformml_tpu.ops.row_conv import host_neighbor_plan

        for k, ndim, n_t in self._plan_reqs:
            if k == "site":
                # site-grouped head layout (ops/site_head.py); grow-only MAX
                # so the jit shape is stable across batches
                from waveformml_tpu.ops.site_head import (MIN_CAP,
                                                          host_site_layout)

                lay = host_site_layout(out["coords"], out["mask"],
                                       min_cap=max(MIN_CAP, self._site_cap))
                self._site_cap = max(self._site_cap,
                                     lay["site_take"].shape[1])
                for kk, vv in lay.items():
                    out[f"plan_{kk}"] = vv
                continue
            out[f"plan_k{k}"] = host_neighbor_plan(
                out["coords"], out["mask"], n_events, k,
                n_t if ndim == 3 else None)

    # -- device-side pure functions --------------------------------------------------
    def sparse_batch(self, db: Dict[str, jnp.ndarray]) -> SparseBatch:
        plans = {k[len("plan_"):]: v for k, v in db.items()
                 if k.startswith("plan_")}
        return SparseBatch(db["coords"], self._features(db), db["mask"],
                           n_events=db["labels"].shape[0],
                           plans=plans or None)

    def _features(self, db: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        f = db["feats"]
        if self.occlude_index is not None:
            f = f.at[:, self.occlude_index].set(0)
        if not self.needs_float:
            # half_precision → bf16 compute (TPU-native mixed precision: the
            # conv stack runs bf16 on the MXU with fp32 accumulation and fp32
            # master params; the reference's PL precision=16 equivalent)
            f = f.astype(jnp.bfloat16)
        return f

    def model_inputs(self, db: Dict[str, jnp.ndarray]):
        """What gets passed to the model; sparse tasks pass a SparseBatch,
        graph models the whole prepared dict (with padded edge lists)."""
        if getattr(type(self.model), "is_graph", False):
            out = dict(db)
            out["feats"] = self._features(db)
            return out
        return self.sparse_batch(db)

    # -- graph edge preparation (host side) ------------------------------------------
    def add_graph_edges(self, block: FileBlock, out: Dict[str, np.ndarray]) -> None:
        """Build padded edge lists for graph models (C++ kernels in ops.graph;
        the reference builds these in-forward with PyG — GraphNet.py:222-243)."""
        if not getattr(type(self.model), "is_graph", False):
            return
        from waveformml_tpu.ops.graph import knn_graph, pad_edges, window_edges

        coords = block.coords
        n = coords.shape[0]
        pos = coords[:, :2].astype(np.float64)
        batch_col = coords[:, -1].astype(np.int64)
        extras = block.extras or {}
        seen = set()
        for req in self.model.edge_requirements():
            if req[0] == "knn":
                _, k, loop = req
                key = f"knn{k}"
            else:
                _, d, loops = req
                key = f"w{d}"
            if key in seen:
                continue
            seen.add(key)
            cached = extras.get(f"edges_{key}")
            cached_mask = extras.get(f"edge_mask_{key}")
            if cached is not None and cached_mask is not None:
                # precomputed padded edges (GraphDataset cache): compact the
                # live entries, then re-pad to this batch's bucket
                edges = np.asarray(cached)[:, np.asarray(cached_mask,
                                                         dtype=bool)]
            elif req[0] == "knn":
                edges = knn_graph(pos, k, batch_col, loop=loop) if n else \
                    np.zeros((2, 0), np.int64)
            else:
                edges = window_edges(coords[:, :2], batch_col, max_dist=d,
                                     self_loops=loops) if n else \
                    np.zeros((2, 0), np.int64)
            cap = bucket_size(max(1, edges.shape[1]))
            e, m = pad_edges(edges, cap)
            out[f"edges_{key}"], out[f"edge_mask_{key}"] = e, m

    def apply_model(self, variables, db: Dict[str, jnp.ndarray], train: bool,
                    rngs: Optional[Dict] = None):
        """Run the model; returns (outputs, mutated batch_stats or None).
        Outputs are upcast to fp32 so losses/metrics/evaluators always run in
        full precision regardless of the bf16 compute path."""
        inputs = self.model_inputs(db)
        if train:
            outputs, updates = self.model.apply(
                variables, inputs, train=True, rngs=rngs or {},
                mutable=["batch_stats"])
            return self._f32(outputs), updates.get("batch_stats")
        return self._f32(self.model.apply(variables, inputs, train=False)), None

    @staticmethod
    def _f32(outputs):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            outputs)

    def loss_and_metrics(self, outputs, db: Dict[str, jnp.ndarray]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Return (loss_sum, weight, metric_sums). The global loss is
        psum(loss_sum)/psum(weight) across data-parallel shards."""
        raise NotImplementedError

    # -- segment loss (ref: LitBase.py:124-174) --------------------------------------
    def segment_loss(self, outputs_dense: jnp.ndarray, db: Dict[str, jnp.ndarray],
                     targets_rows: jnp.ndarray, target_index: Optional[int] = None,
                     use_float: bool = True
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Masked dense per-segment loss.

        outputs_dense: [B, C, NX, NY] model output (ToDense torch layout)
        targets_rows:  [N] or [N, L] per-row targets (padded rows masked out)
        Returns (loss_sum, weight, target_dense, predictions_masked).
        """
        batch = self.sparse_batch(db)
        t = targets_rows[:, None] if targets_rows.ndim == 1 else targets_rows
        target_dense = scatter_to_dense(batch, t.astype(jnp.float32))  # [B,NX,NY,L]
        target_dense = jnp.transpose(target_dense, (0, 3, 1, 2))       # [B,L,NX,NY]
        occ = occupancy_mask(batch)[:, None, :, :]                     # [B,1,NX,NY]
        occf = occ.astype(outputs_dense.dtype)
        preds = outputs_dense * occf
        if target_index is not None:
            target_dense = target_dense[:, target_index:target_index + 1]
        if self.SE_only:
            m = self.se_mask[None, None, :, :]
            elem = self.criterion.elementwise(preds * m, target_dense * m)
            weight = jnp.sum(occf * m)
        else:
            elem = self.criterion.elementwise(preds, target_dense)
            weight = jnp.sum(occf) * 1.0
        # only occupied sites contribute (padding rows scattered nothing; dense
        # zeros at unoccupied sites would otherwise add criterion(0,0)=0 anyway
        # for L1/MSE, but mask explicitly for generality)
        loss_sum = jnp.sum(elem * occf)
        # raw weight: clamped at the global (psum'd) denominator so empty
        # padded shards contribute zeros, not phantom counts
        return loss_sum, weight, target_dense, preds

    # -- test-time host outputs ------------------------------------------------------
    def test_outputs(self, outputs, db: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        """Arrays the evaluator consumes (host side will np.asarray them)."""
        return {"predictions": outputs}
