#!/usr/bin/env python
"""Accumulate per-class average waveforms and DSP feature summaries from
directories of simulation files.

The reference's src/evaluation/AnalyzeWaveforms.py (:26-117) builds
WaveformAccumulators per class (mean = Σwf/n, err = sqrt(Σwf)) over pulse
datasets but never writes its results (the script is incomplete). This is the
working equivalent: per-directory (class) average waveforms with Poisson
errors, plus per-class mean arrival / PSD / total / peak computed with the
fused waveform_features op, written to an npz + PNG overlay under the
analysis output dir.

Usage: AnalyzeWaveforms.py DIR [DIR ...] [--type 2d|3d] [-o OUTDIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import h5py
import numpy as np

TYPE_INFO = {
    "2d": ("*WaveformPairSim.h5", "WaveformPairs", "waveform"),
    "3d": ("*Waveform3DPairSim.h5", "Waveform3DPairs", "waveform"),
    "pmt": ("*PMTCoordSim.h5", "DetPulseCoord", "pulse"),
    "det": ("*DetCoordSim.h5", "DetPulseCoord", "pulse"),
}


class WaveformAccumulator:
    """Σwf / n with Poisson error (ref: AnalyzeWaveforms.py:26-45, fixed:
    the reference's add() counted batches, not waveforms)."""

    def __init__(self, n_samples: int):
        self.n_samples = n_samples
        self.clear()

    def add(self, wfs: np.ndarray) -> None:
        self.wf += wfs.sum(axis=0)
        self.total += wfs.shape[0]

    def compute(self):
        if self.total == 0:
            return np.zeros(self.n_samples), np.zeros(self.n_samples)
        return self.wf / self.total, np.sqrt(np.clip(self.wf, 0, None)) / self.total

    def clear(self) -> None:
        self.wf = np.zeros((self.n_samples,), dtype=np.float64)
        self.total = 0


def analyze_dir(d: str, file_mask: str, table: str, field: str, n_max: int):
    """Average waveform + feature summary over all matching files in d."""
    files = sorted(glob.glob(os.path.join(d, file_mask)))
    if not files:
        raise IOError(f"no files matching {file_mask} under {d}")
    acc = None
    # feature means accumulate STREAMING (sum + count per chunk): retaining
    # every waveform for a single mean costs ~1 GB at the default n_max
    feat_sums = np.zeros(4)
    feat_n = 0
    seen = 0
    for fp in files:
        if seen >= n_max:
            break
        with h5py.File(fp, "r") as h5:
            if table not in h5:
                continue
            rec = h5[table][: max(0, n_max - seen)]
        wfs = np.asarray(rec[field], dtype=np.float64)
        if wfs.ndim == 1:
            wfs = wfs[:, None]
        if acc is None:
            acc = WaveformAccumulator(wfs.shape[1])
        acc.add(wfs)
        if wfs.shape[1] >= 8:  # per-waveform DSP features need a time axis
            from waveformml_tpu.ops.pallas_dsp import waveform_features

            half = wfs.shape[1] // 2 if wfs.shape[1] % 2 == 0 else wfs.shape[1]
            arr, psd, tot, peak = (np.asarray(x) for x in
                                   waveform_features(wfs[:, :half].astype(np.float32)))
            feat_sums += [arr.sum(), psd.sum(), tot.sum(), peak.sum()]
            feat_n += wfs.shape[0]
        seen += wfs.shape[0]
    if acc is None:
        raise IOError(
            f"no waveforms read: none of the matched files contain table "
            f"'{table}' (or n_max <= 0)")
    mean, err = acc.compute()
    features = {}
    if feat_n:
        means = feat_sums / feat_n
        features = {"arrival": float(means[0]), "psd": float(means[1]),
                    "total": float(means[2]), "peak": float(means[3])}
    return {"mean": mean, "err": err, "n": acc.total, "features": features}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dirs", nargs="+", help="directories of data (one per class)")
    parser.add_argument("--type", "-t", default="2d", choices=sorted(TYPE_INFO))
    parser.add_argument("--outdir", "-o", default=None,
                        help="output dir (default ./analysis/<combined name>)")
    parser.add_argument("--n_max", type=int, default=1_000_000)
    args = parser.parse_args(argv)

    dirs = [os.path.normpath(os.path.abspath(os.path.expanduser(p)))
            for p in args.dirs]
    for d in dirs:
        if not os.path.isdir(d):
            raise IOError(f"Invalid directory {d}")
    from waveformml_tpu.utils.util import unique_path_combine

    outdir = args.outdir or os.path.join("./analysis", unique_path_combine(dirs))
    os.makedirs(outdir, exist_ok=True)
    file_mask, table, field = TYPE_INFO[args.type]

    results = {}
    for d in dirs:
        name = os.path.basename(d)
        results[name] = analyze_dir(d, file_mask, table, field, args.n_max)
        feats = results[name]["features"]
        print(f"{name}: n={results[name]['n']}"
              + (f"  arrival={feats['arrival']:.2f} psd={feats['psd']:.4f}"
                 f" total={feats['total']:.1f} peak={feats['peak']:.1f}"
                 if feats else ""))

    np.savez(os.path.join(outdir, "average_waveforms.npz"),
             **{f"{k}_mean": v["mean"] for k, v in results.items()},
             **{f"{k}_err": v["err"] for k, v in results.items()})
    with open(os.path.join(outdir, "waveform_features.json"), "w") as f:
        json.dump({k: {"n": v["n"], **v["features"]} for k, v in results.items()},
                  f, indent=1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, r in results.items():
        ax.plot(r["mean"], label=f"{name} (n={r['n']})")
        ax.fill_between(np.arange(len(r["mean"])), r["mean"] - r["err"],
                        r["mean"] + r["err"], alpha=0.25)
    ax.set_xlabel("sample")
    ax.set_ylabel("amplitude")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "average_waveforms.png"), dpi=120)
    print(f"wrote {outdir}/average_waveforms.npz, waveform_features.json, "
          f"average_waveforms.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
