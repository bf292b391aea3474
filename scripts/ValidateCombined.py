#!/usr/bin/env python
"""Data-integrity checker for the offline shuffle pipeline: replay the
round-robin merge from each sidecar's source ranges and assert the
Combined_*.h5 contents match event-for-event
(ref: scripts/ValidateCombined.py:15-140 — the reference validates via the
per-event ``labels`` column, which only exists for the group layout; the
replay works for compound label-field files, e.g. WFPairEZ, too).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import h5py
import numpy as np


def _read_range(fdat, dataset_name, coord_name, feat_name, batch_index=-1,
                label_name=None):
    with h5py.File(fdat[0], "r") as h5:
        ds = h5[dataset_name]
        if hasattr(ds, "dtype") and ds.dtype.names:
            rec = ds[()]
            coords, feats = rec[coord_name], rec[feat_name]
            labels = (rec[label_name]
                      if label_name and label_name in rec.dtype.names else None)
        else:
            coords, feats = ds[coord_name][()], ds[feat_name][()]
            labels = (ds[label_name][()]
                      if label_name and label_name in ds else None)
    # the event id is the LAST coord column (3D combined files carry
    # [x, y, t, event] — column 2 there is the time coordinate)
    sel = (coords[:, batch_index] >= fdat[1][0]) & (coords[:, batch_index] <= fdat[1][1])
    return coords[sel], feats[sel], labels[sel] if labels is not None else None


def expected_merge(sidecar: dict, dataset_name: str, coord_name: str,
                   feat_name: str, label_name=None):
    """Replay _write_shuffled's round-robin (pulse_dataset.py:262-287):
    per-category per-event groups, one event per category per round.
    Returns (coords, feats, per_event_cat, per_row_labels_or_None,
    per_event_row_counts)."""
    cat_events = {}
    for cat in sorted(int(k) for k in sidecar):
        events = []
        for fdat in sidecar[str(cat)]:
            coords, feats, labels = _read_range(
                fdat, dataset_name, coord_name, feat_name,
                label_name=label_name)
            if coords.size == 0:
                continue
            ev = coords[:, -1]
            boundaries = np.flatnonzero(np.diff(ev)) + 1
            for rows in np.split(np.arange(ev.shape[0]), boundaries):
                events.append((coords[rows], feats[rows],
                               labels[rows] if labels is not None else None))
        cat_events[cat] = events
    out_c, out_f, out_l, cats = [], [], [], []
    pending = {c: iter(e) for c, e in cat_events.items()}
    while pending:
        done = []
        for c in list(pending):
            try:
                cc, ff, ll = next(pending[c])
            except StopIteration:
                done.append(c)
                continue
            out_c.append(cc)
            out_f.append(ff)
            if ll is not None:
                out_l.append(ll)
            cats.append(c)
        for c in done:
            pending.pop(c)
    if not out_c:
        return (np.zeros((0, 3), np.int64), np.zeros((0, 1), np.float32),
                [], None, [])
    rows = np.concatenate(out_l) if len(out_l) == len(out_c) else None
    ev_sizes = [c.shape[0] for c in out_c]
    return np.concatenate(out_c), np.concatenate(out_f), cats, rows, ev_sizes


def check_file(sidecar: dict, merged_coords, merged_feats, labels,
               path: Path, dataset_name: str, coord_name: str,
               feat_name: str, label_name=None, row_labels=None) -> None:
    src_coords, src_feats, cats, src_rows, ev_sizes = expected_merge(
        sidecar, dataset_name, coord_name, feat_name, label_name=label_name)
    if src_coords.shape[0] != merged_coords.shape[0]:
        raise ValueError(
            f"File {path} has {merged_coords.shape[0]} rows, sources have "
            f"{src_coords.shape[0]}")
    # every coordinate column except the (renumbered) event id must replay
    # exactly — [:, :-1] also covers the time column of 4-column 3D coords
    if not np.array_equal(src_coords[:, :-1], merged_coords[:, :-1]):
        raise ValueError(f"File {path} contained incorrect coords")
    if not np.allclose(src_feats, merged_feats):
        raise ValueError(f"File {path} contained incorrect waveforms")
    # merged event ids must be the replay's consecutive 0..n-1 renumbering
    # with the replay's per-event row counts (pulse_dataset.py:287-298):
    # duplicate / non-consecutive ids or a shifted boundary keep coords and
    # feats row-identical but assign rows to the wrong events
    if src_coords.shape[0]:
        expected_ids = np.repeat(np.arange(len(cats)), ev_sizes)
        if not np.array_equal(merged_coords[:, -1], expected_ids):
            bad = int(np.flatnonzero(
                merged_coords[:, -1] != expected_ids)[0])
            raise ValueError(
                f"File {path} row {bad} has event id "
                f"{int(merged_coords[bad, -1])}, replay expects "
                f"{int(expected_ids[bad])} — event boundaries are corrupted")
    # per-event labels (group layout): directory-index labels match the
    # replay's category sequence (label files may remap, so only check when
    # every label is a known category)
    if labels is not None and len(labels) == len(cats) and \
            set(np.unique(labels)).issubset(set(cats)):
        if not np.array_equal(np.asarray(labels), np.asarray(cats)):
            raise ValueError(f"File {path} labels do not interleave classes")
    # per-row label column (compound layout): must replay exactly — a
    # mis-ordered or corrupted label field is data corruption even when
    # coords/feats line up
    if row_labels is not None and src_rows is not None:
        a = np.asarray(row_labels).reshape(len(row_labels), -1)
        b = np.asarray(src_rows).reshape(len(src_rows), -1)
        if a.shape != b.shape or not np.allclose(a, b, equal_nan=True):
            raise ValueError(f"File {path} contained incorrect labels")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dir", help="directory of Combined_*.h5 files")
    parser.add_argument("--dataset", default="WaveformPairs")
    parser.add_argument("--coord", default="coord")
    parser.add_argument("--feat", default="waveform")
    parser.add_argument("--label", default=None,
                        help="per-row label field for compound layouts "
                             "(auto-detected as the remaining field)")
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
                labels = None  # per-event class labels: group layout only
                # compound layout: the label column is the third field
                # (_to_hdf writes exactly coord/feat/label)
                label_name = args.label or next(
                    (n for n in rec.dtype.names
                     if n not in (args.coord, args.feat)), None)
                row_labels = rec[label_name] if label_name else None
            else:
                coords = ds[args.coord][()]
                feats = ds[args.feat][()]
                labels = ds["labels"][()]
                label_name, row_labels = None, None
        check_file(sidecar, coords, feats, labels, f,
                   args.dataset, args.coord, args.feat,
                   label_name=label_name, row_labels=row_labels)
        n_checked += 1
        print(f"{f.name}: OK")
    print(f"validated {n_checked} combined files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
