#!/usr/bin/env python
"""Regenerate the README performance-table rows from the bench record.

Single-source story: every `bench.py` run appends its measurements (with
`ts` + `source` fields) to `bench_history.jsonl` and merges the latest per
metric into `bench_results.json`. This script prints the README markdown
rows with min-max ranges computed over the whole history, so the table is
reproducible from the committed record instead of hand-edited.

Usage: python scripts/readme_bench_table.py [repo_root]
"""
import json
import os
import sys


def load_entries(root):
    entries = []
    hist = os.path.join(root, "bench_history.jsonl")
    if os.path.exists(hist):
        with open(hist) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        entries.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    # seed with the latest snapshot so pre-history runs still count
    try:
        with open(os.path.join(root, "bench_results.json")) as f:
            entries.extend(json.load(f))
    except (OSError, ValueError):
        pass
    return entries


ROWS = [
    ("sparse PSD train throughput",
     "Sparse PSD train step (4096 events × 3 pulses)", "waveforms/s"),
    ("WFParams regression train throughput",
     "WFParams regression train step", "waveforms/s"),
    ("dense Conv1d PSD train throughput",
     "Dense Conv1d PSD train step", "waveforms/s"),
    ("Z WritePredictions streaming throughput",
     "Streaming Z WritePredictions (end-to-end incl. HDF5 IO)", "events/s"),
    ("HPO sweep wall-clock",
     "HPO sweep (2 trials × 150 steps, TPE + MedianPruner)", "s wall"),
    ("compute-heavy bf16 sparse PSD train throughput w128",
     "Compute-heavy bf16 sparse PSD (128 planes, 4 convs)", "waveforms/s"),
    ("compute-heavy bf16 sparse PSD train throughput",
     "Compute-heavy bf16 sparse PSD (64 planes, 4 convs)", "waveforms/s"),
    ("sparse PSD batched inference throughput",
     "Batched inference (sparse PSD eval forward)", "waveforms/s"),
    ("graph train throughput",
     "Graph SAGE classifier train step (IoniClassifierGraph stack)",
     "waveforms/s"),
]


def fmt(v, unit):
    if unit == "s wall":
        return f"{v:.0f}"
    if v >= 1e6:
        return f"{v / 1e6:.2f}M".replace(".00M", "M")
    if v >= 1e3:
        return f"{v / 1e3:.1f}k".replace(".0k", "k")
    return f"{v:.3g}"


def fmt_ratio(v):
    if v >= 100:
        return f"{v:.0f}"
    if v >= 10:
        return f"{v:.1f}"
    return f"{v:.2g}"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entries = load_entries(root)
    print("| Workload | Throughput | vs torch-CPU reference stack |")
    print("|---|---|---|")
    for prefix, label, unit in ROWS:
        vals, ratios = [], []
        for e in entries:
            m = e.get("metric", "")
            # the published table is TPU-only: a local JAX_PLATFORMS=cpu run
            # (or a cpu-fallback child) appends "... (cpu)" entries to the
            # append-only history, and folding those into min-max would
            # collapse the ranges
            if not m.endswith("(tpu)"):
                continue
            if m.startswith(prefix) and \
                    not any(m.startswith(p) and len(p) > len(prefix)
                            for p, _, _ in ROWS if p != prefix):
                vals.append(float(e["value"]))
                if e.get("vs_baseline"):
                    ratios.append(float(e["vs_baseline"]))
        if not vals:
            continue
        lo, hi = min(vals), max(vals)
        vtxt = fmt(lo, unit) if fmt(lo, unit) == fmt(hi, unit) \
            else f"{fmt(lo, unit)}–{fmt(hi, unit)}"
        rtxt = ""
        if ratios:
            rl, rh = min(ratios), max(ratios)
            rtxt = (f"{fmt_ratio(rl)}×" if rl == rh
                    else f"{fmt_ratio(rl)}–{fmt_ratio(rh)}×")
        print(f"| {label} | {vtxt} {unit} | {rtxt} |")


if __name__ == "__main__":
    main()
