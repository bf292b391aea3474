#!/usr/bin/env python
"""Occlusion study: run Evaluate.py once per occluded feature index
(ref: scripts/RunOcclusionStudy.py:11-35)."""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from os.path import dirname, join, realpath

REPO = dirname(dirname(realpath(__file__)))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="path to config file")
    parser.add_argument("checkpoint", help="path to checkpoint")
    parser.add_argument("n_features", type=int, help="number of features to occlude")
    parser.add_argument("--calgroup", "-c", type=str)
    parser.add_argument("--verbosity", "-v", type=int, default=2)
    args, extra = parser.parse_known_args(argv)
    for n in range(args.n_features):
        argl = [sys.executable, join(REPO, "Evaluate.py"), args.config,
                args.checkpoint, "-oc", str(n), "-v", str(args.verbosity)]
        if args.calgroup:
            argl += ["-c", args.calgroup]
        argl += list(extra)
        print(" ".join(argl))
        subprocess.call(argl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
