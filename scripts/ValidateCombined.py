#!/usr/bin/env python
"""Data-integrity checker for the offline shuffle pipeline: assert that every
event in each Combined_*.h5 matches its source rows per class
(ref: scripts/ValidateCombined.py:15-140)."""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import h5py
import numpy as np


def _read_range(fdat, dataset_name, coord_name, feat_name, batch_index=2):
    with h5py.File(fdat[0], "r") as h5:
        ds = h5[dataset_name]
        if hasattr(ds, "dtype") and ds.dtype.names:
            rec = ds[()]
            coords, feats = rec[coord_name], rec[feat_name]
        else:
            coords, feats = ds[coord_name][()], ds[feat_name][()]
    sel = (coords[:, batch_index] >= fdat[1][0]) & (coords[:, batch_index] <= fdat[1][1])
    return coords[sel], feats[sel]


def check_file(sidecar: dict, merged_coords, merged_feats, labels, cat: int,
               path: Path, dataset_name: str, coord_name: str, feat_name: str) -> None:
    """Rows of class `cat` in the merged file must equal the concatenation of
    ALL source ranges of that class recorded in the sidecar (ref :39-72)."""
    chunks = [_read_range(fdat, dataset_name, coord_name, feat_name)
              for fdat in sidecar[str(cat)]]
    if not chunks:
        return
    src_coords = np.concatenate([c for c, _ in chunks])
    src_feats = np.concatenate([f for _, f in chunks])
    events_of_cat = np.flatnonzero(labels == cat)
    sel = np.isin(merged_coords[:, 2], events_of_cat)
    if not np.array_equal(src_coords[:, :2], merged_coords[sel, :2]):
        raise ValueError(f"File {path} contained incorrect coords")
    if not np.allclose(src_feats, merged_feats[sel]):
        raise ValueError(f"File {path} contained incorrect waveforms")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dir", help="directory of Combined_*.h5 files")
    parser.add_argument("--dataset", default="WaveformPairs")
    parser.add_argument("--coord", default="coord")
    parser.add_argument("--feat", default="waveform")
    args = parser.parse_args(argv)
    n_checked = 0
    for f in sorted(Path(args.dir).glob("Combined_*.h5")):
        sidecar_path = str(f)[:-3] + ".json"
        with open(sidecar_path) as jf:
            sidecar = json.load(jf)
        with h5py.File(f, "r") as h5:
            ds = h5[args.dataset]
            if hasattr(ds, "dtype") and ds.dtype.names:
                rec = ds[()]
                coords, feats = rec[args.coord], rec[args.feat]
                labels = rec["labels"] if "labels" in rec.dtype.names else None
            else:
                coords = ds[args.coord][()]
                feats = ds[args.feat][()]
                labels = ds["labels"][()]
        for cat in sorted(int(k) for k in sidecar.keys()):
            check_file(sidecar, coords, feats, labels, cat, f,
                       args.dataset, args.coord, args.feat)
        n_checked += 1
        print(f"{f.name}: OK")
    print(f"validated {n_checked} combined files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
