#!/usr/bin/env python
"""Compare average PMT waveforms between two HDF5 files (e.g. sim vs real),
plotting per-channel overlays (ref: scripts/Compare_PMT_WF.py, 106 LoC)."""
from __future__ import annotations

import argparse
import sys

import h5py
import numpy as np


def average_waveforms(path: str, table: str, n_max: int, channels):
    from waveformml_tpu.io.compound_types import extension_type_map

    t = extension_type_map(path)
    with h5py.File(path, "r") as h5:
        rec = h5[t.name][:n_max] if t.name in h5 else h5[table][:n_max]
    wf_field = "waveform" if "waveform" in rec.dtype.names else "pulse"
    wfs = rec[wf_field].astype(np.float64)
    coords = rec["coord"]
    n_samples = wfs.shape[1] // 2
    out = {}
    from waveformml_tpu.detector import seg_to_xy

    for ch in channels:
        seg, side = ch // 2, ch % 2
        x, y = seg_to_xy(seg)
        sel = (coords[:, 0] == x) & (coords[:, 1] == y)
        if not sel.any():
            continue
        half = wfs[sel, side * n_samples:(side + 1) * n_samples]
        out[ch] = half.mean(axis=0)
    return out


def main(argv=None) -> int:
    from waveformml_tpu.utils.plot import plot_waveforms

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file1")
    parser.add_argument("file2")
    parser.add_argument("--channels", "-ch", type=int, nargs="*", default=[0])
    parser.add_argument("--table", default="WaveformPairCal")
    parser.add_argument("--n_max", type=int, default=10000)
    parser.add_argument("--out", "-o", default="compare_pmt_wf.png")
    args = parser.parse_args(argv)
    avg1 = average_waveforms(args.file1, args.table, args.n_max, args.channels)
    avg2 = average_waveforms(args.file2, args.table, args.n_max, args.channels)
    wfs, labels = [], []
    for ch in args.channels:
        if ch in avg1:
            wfs.append(avg1[ch])
            labels.append(f"{args.file1} ch{ch}")
        if ch in avg2:
            wfs.append(avg2[ch])
            labels.append(f"{args.file2} ch{ch}")
    if not wfs:
        print("no matching channels found")
        return 1
    fig = plot_waveforms(wfs, labels)
    fig.savefig(args.out)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
