"""Shared fixture builder for the multi-process distributed-training test
(imported by both the pytest process and the spawned workers)."""
import numpy as np

from waveformml_tpu.config import Config
from waveformml_tpu.datasets.hdf5_dataset import FileBlock


def make_cfg_block(rank=None, n_ranks=2):
    cfg = Config({
        "run_config": {"exp_name": "d", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "d", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"], "model_base_path": "/tmp/dd",
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 1,
                                   "conv_params": {"kernel_size": 3, "n_conv": 1,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    rng = np.random.default_rng(11)
    rows = []
    for e in range(8):  # 8 events -> 2 per device on the 4-device mesh
        for s in rng.choice(154, size=2, replace=False):
            rows.append([s % 14, s // 14, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], 16)).astype(np.float32)
    labels = rng.integers(0, 2, 8).astype(np.int64)
    if rank is not None:
        # this rank's event half, renumbered from 0 (the process-local block)
        per = 8 // n_ranks
        lo, hi = rank * per, (rank + 1) * per
        sel = (coords[:, 2] >= lo) & (coords[:, 2] < hi)
        c = coords[sel].copy()
        c[:, 2] -= lo
        return cfg, FileBlock(c, feats[sel], labels[lo:hi], {})
    return cfg, FileBlock(coords, feats, labels, {})


def make_graph_cfg_block(rank=None, n_ranks=2, cached_edges=False):
    """GraphNet classifier fixture with ASYMMETRIC event sizes: the first
    half of the events is sparse (2 nodes) and the second dense (12 nodes),
    so per-rank graph edge caps genuinely diverge and the cross-process
    shape agreement is exercised. cached_edges=True attaches GraphDataset-
    style padded edge extras built from the full block."""
    cfg = Config({
        "run_config": {"exp_name": "dg", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "dg", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"], "model_base_path": "/tmp/dg",
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "GraphNet", "net_type": "graph",
                       "hparams": {"n_graph": 2, "n_lin": 1, "graph_out": 8,
                                   "k": 3, "graph_class_index": 0}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    rng = np.random.default_rng(23)
    rows = []
    for e in range(8):
        n_nodes = 2 if e < 4 else 12
        for s in rng.choice(154, size=n_nodes, replace=False):
            rows.append([s % 14, s // 14, e])
    coords = np.asarray(rows, np.int32)
    feats = rng.normal(size=(coords.shape[0], 16)).astype(np.float32)
    labels = rng.integers(0, 2, 8).astype(np.int64)
    extras = {}
    if cached_edges:
        from waveformml_tpu.ops.graph import knn_graph, pad_edges
        from waveformml_tpu.ops.sparse import bucket_size

        edges = knn_graph(coords[:, :2].astype(np.float64), 3,
                          coords[:, 2].astype(np.int64), loop=False)
        e, m = pad_edges(edges, bucket_size(max(1, edges.shape[1])))
        extras = {"edges_knn3": e, "edge_mask_knn3": m}
    if rank is not None:
        per = 8 // n_ranks
        lo, hi = rank * per, (rank + 1) * per
        sel = (coords[:, 2] >= lo) & (coords[:, 2] < hi)
        c = coords[sel].copy()
        c[:, 2] -= lo
        return cfg, FileBlock(c, feats[sel], labels[lo:hi], {})
    return cfg, FileBlock(coords, feats, labels, extras)
