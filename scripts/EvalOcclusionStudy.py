#!/usr/bin/env python
"""Collect occlusion-study results: read each occlude_<n> dir's tfevents, take
the best test_loss, and plot loss vs occluded index
(ref: scripts/EvalOcclusionStudy.py:11-69)."""
from __future__ import annotations

import argparse
import sys
from os.path import join
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    from waveformml_tpu.utils.plot import plot_scatter
    from waveformml_tpu.utils.tb import TBHelper, find_tfevents

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dir", help="directory of occlude_<n> folders")
    parser.add_argument("n", type=int, help="number of features occluded")
    parser.add_argument("--metric", default="test_loss")
    parser.add_argument("--split", "-s", action="store_true",
                        help="split the features in half and plot both halves")
    args = parser.parse_args(argv)
    results = np.full(args.n, np.nan)
    tbh = TBHelper()
    for d in Path(args.dir).glob("occlude_*"):
        if not d.is_dir():
            continue
        try:
            idx = int(d.name.split("_")[-1])
        except ValueError:
            continue
        if idx >= args.n:
            continue
        best = np.inf
        for f in find_tfevents(str(d)):
            tbh.set_path(f)
            v = tbh.get_best_value(args.metric)
            if v is not None and v < best:
                best = v
        results[idx] = best
        print(f"{args.metric} for ind {idx} is {best}")
    valid = np.isfinite(results)
    if not valid.any():
        print(f"error: no occlude_<n> results with metric '{args.metric}' "
              f"found under {args.dir}", file=sys.stderr)
        return 1
    xs = np.arange(args.n)

    def _save(sel, suffix):
        fig = plot_scatter(xs[sel], results[sel], xlabel="occluded index",
                           ylabel=args.metric, title="occlusion study")
        out = join(args.dir, f"occlude_results_{args.metric}{suffix}.png")
        fig.savefig(out)
        print("wrote", out)

    if args.split:
        half = args.n // 2
        _save(valid & (xs < half), "_det0")
        _save(valid & (xs >= half), "_det1")
    else:
        _save(valid, "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
