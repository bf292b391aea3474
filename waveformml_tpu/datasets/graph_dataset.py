"""Disk-cached graph dataset: per-file processed blocks with precomputed edges.

The reference's GraphDataset (ref: src/datasets/GraphDataset.py:16-61) wraps a
pulse dataset and materializes each file-block into a saved
``Data(x, pos, y)`` .pt under ``processed/`` so PyG loaders skip re-reading
HDF5 + re-building tensors; DataExtra carries additional_fields. The TPU-era
equivalent caches each block as an .npz (coords / feats / labels / extras) and
can optionally precompute and cache the padded edge lists (the C++
window/knn kernels in ops.graph) so repeated epochs skip graph construction
entirely.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from waveformml_tpu.datasets.hdf5_dataset import FileBlock
from waveformml_tpu.registry import registry


@registry.register("GraphDataset", aliases=("GraphDataset.GraphDataset",))
class GraphDataset:
    """Wrap any block dataset; cache processed blocks under <root>/processed.

    edge_specs: optional sequence of edge requirements to precompute, in the
    model ``edge_requirements()`` format: ("knn", k, loop) or
    ("window", dist, self_loops).
    """

    def __init__(self, dataset, file_list: Optional[List[str]] = None,
                 use_self_loops: bool = False,
                 edge_specs: Optional[Sequence[Tuple]] = None):
        self.raw_dataset = dataset
        ds_files = list(dataset.get_file_list())
        files = file_list if file_list is not None else ds_files
        self.source_files = list(files)
        # each source file maps to ITS block index in the wrapped dataset —
        # indexing the dataset by file_list POSITION would cache the wrong
        # file's data when the caller passes a subset/reorder
        if file_list is None:
            self._block_index = list(range(len(ds_files)))
        else:
            self._block_index = []
            for f in self.source_files:
                try:
                    self._block_index.append(ds_files.index(f))
                except ValueError:
                    raise ValueError(
                        f"{f} is not a file of the wrapped dataset") from None
        root = os.path.dirname(files[0]) if files else "."
        self.processed_dir = os.path.join(root, "processed")
        self.expected_file_names = [
            os.path.join(self.processed_dir,
                         os.path.basename(f)[:-3] + f"_{i}.npz")
            for i, f in enumerate(files)]
        self.use_self_loops = use_self_loops
        self.edge_specs = list(edge_specs) if edge_specs else []
        self.log = logging.getLogger(__name__)
        self.process()

    # -- reference-compatible surface ------------------------------------------------
    @property
    def processed_file_names(self) -> List[str]:
        return self.expected_file_names

    def _signature(self, idx: int) -> str:
        """Cache-validity key: source mtime + event range + edge config.
        PyG's processed/ convention reuses cached files unconditionally;
        keying on these instead means regenerated sources, grown event
        ranges, or changed edge specs rebuild the block instead of silently
        serving stale graphs."""
        src = self.source_files[idx]
        try:
            mtime = round(float(os.path.getmtime(src)), 6)
        except OSError:
            mtime = -1.0
        rng = None
        get_info = getattr(self.raw_dataset, "get_path_info", None)
        if callable(get_info):
            di = get_info(src)
            if di:
                rng = list(di.get("event_range") or [])
        return repr((mtime, rng, [tuple(s) for s in self.edge_specs],
                     bool(self.use_self_loops)))

    @staticmethod
    def _cached_signature(path: str) -> Optional[str]:
        try:
            with np.load(path, allow_pickle=False) as z:
                return str(z["_sig"])
        except Exception:
            # unreadable, truncated (zipfile.BadZipFile — NOT an OSError),
            # or pre-signature cache: rebuild
            return None

    def process(self) -> None:
        os.makedirs(self.processed_dir, exist_ok=True)
        for idx, out_path in enumerate(self.expected_file_names):
            sig = self._signature(idx)
            if os.path.exists(out_path) and self._cached_signature(out_path) == sig:
                continue
            self.log.info("creating graph data from block %d", idx)
            block = self.raw_dataset[self._block_index[idx]]
            payload = {"coords": block.coords, "feats": block.feats,
                       "labels": block.labels, "_sig": np.array(sig)}
            for k, v in (block.extras or {}).items():
                payload[f"extra_{k}"] = v
            for e_name, e_arr, m_name, m_arr in self._build_edges(block):
                payload[e_name], payload[m_name] = e_arr, m_arr
            # atomic: an interrupted savez must not leave a truncated npz
            # at the final path
            tmp = out_path + ".tmp.npz"
            np.savez(tmp, **payload)
            os.replace(tmp, out_path)
            self.log.info("created file %s", out_path)

    def _build_edges(self, block: FileBlock):
        if not self.edge_specs:
            return []
        from waveformml_tpu.ops.graph import knn_graph, pad_edges, window_edges
        from waveformml_tpu.ops.sparse import bucket_size

        coords = block.coords
        pos = coords[:, :2].astype(np.float64)
        batch_col = coords[:, -1].astype(np.int64)
        n = coords.shape[0]
        out = []
        for req in self.edge_specs:
            if req[0] == "knn":
                _, k, loop = req
                key = f"knn{k}"
                edges = (knn_graph(pos, k, batch_col, loop=loop) if n
                         else np.zeros((2, 0), np.int64))
            else:
                _, d, loops = req
                key = f"w{d}"  # matches TaskBase.add_graph_edges naming
                # self_loops must mirror TaskBase.add_graph_edges exactly or
                # cached and live graphs diverge
                edges = (window_edges(coords[:, :2], batch_col, max_dist=int(d),
                                      self_loops=bool(loops))
                         if n else np.zeros((2, 0), np.int64))
            cap = bucket_size(max(1, edges.shape[1]))
            e, m = pad_edges(edges, cap)
            out.append((f"edges_{key}", e, f"edge_mask_{key}", m))
        return out

    def __len__(self) -> int:
        return len(self.expected_file_names)

    # reference naming (PyG Dataset.len/get — ref :55-59)
    def len(self) -> int:
        return len(self)

    def get(self, idx: int) -> FileBlock:
        return self[idx]

    def __getitem__(self, idx: int) -> FileBlock:
        with np.load(self.expected_file_names[idx], allow_pickle=False) as z:
            extras = {}
            for k in z.files:
                if k.startswith("extra_"):
                    extras[k[len("extra_"):]] = z[k]
                elif k.startswith(("edges_", "edge_mask_")):
                    extras[k] = z[k]
            return FileBlock(coords=z["coords"], feats=z["feats"],
                             labels=z["labels"], extras=extras)

    def get_file_list(self) -> List[str]:
        return self.raw_dataset.get_file_list()
