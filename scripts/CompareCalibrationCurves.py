#!/usr/bin/env python
"""Compare calibration curves (attenuation / timing / light-sum) between two
calibration groups or databases, plotting per-channel overlays
(ref: scripts/CompareCalibrationCurves.py, 170 LoC)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    from waveformml_tpu.evaluation.calibrator import Calibrator
    from waveformml_tpu.io.sql import CalibrationDB
    from waveformml_tpu.utils.plot import plot_lines

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("cal1", help="calibration db path 1")
    parser.add_argument("calname1", help="calibration group 1")
    parser.add_argument("cal2", help="calibration db path 2")
    parser.add_argument("calname2", help="calibration group 2")
    parser.add_argument("--channels", "-ch", type=int, nargs="*", default=[0, 1],
                        help="PMT channels to plot")
    parser.add_argument("--curve", default="atten",
                        choices=["atten", "time", "lsum"])
    parser.add_argument("--out_dir", "-o", default=".")
    args = parser.parse_args(argv)
    c1 = Calibrator(CalibrationDB(args.cal1, args.calname1))
    c2 = Calibrator(CalibrationDB(args.cal2, args.calname2))
    curves1 = {"atten": c1.atten_curves, "time": c1.time_curves,
               "lsum": c1.lsum_curves}[args.curve]
    curves2 = {"atten": c2.atten_curves, "time": c2.time_curves,
               "lsum": c2.lsum_curves}[args.curve]
    os.makedirs(args.out_dir, exist_ok=True)
    for ch in args.channels:
        a, b = curves1.get(ch), curves2.get(ch)
        if not a or not b:
            print(f"channel {ch}: missing curve, skipping")
            continue
        a.sort()
        b.sort()
        xs = np.linspace(max(a.xs[0], b.xs[0]), min(a.xs[-1], b.xs[-1]), 100)
        fig = plot_lines(xs, [np.asarray(a.eval(xs)), np.asarray(b.eval(xs))],
                         [args.calname1, args.calname2],
                         xlabel="z [mm]", ylabel=args.curve,
                         title=f"{args.curve} channel {ch}")
        out = os.path.join(args.out_dir, f"compare_{args.curve}_ch{ch}.png")
        fig.savefig(out)
        print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
