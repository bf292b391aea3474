#!/usr/bin/env python
"""Run WritePredictions.py over every .h5 file in a directory
(ref: scripts/WritePredictionBatch.py:10-34)."""
from __future__ import annotations

import argparse
import subprocess
import sys
from os.path import dirname, join, realpath
from pathlib import Path

REPO = dirname(dirname(realpath(__file__)))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_dir", help="directory of input hdf5 files")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--pattern", default="*.h5")
    args, extra = parser.parse_known_args(argv)
    files = sorted(Path(args.input_dir).glob(args.pattern))
    # outputs land next to their inputs: never re-ingest a previous run's
    # *ModelOut.h5 / *_Phys.h5 (a rerun would write predictions-of-predictions)
    files = [f for f in files
             if not (f.name.endswith("ModelOut.h5") or f.name.endswith("_Phys.h5"))]
    for f in files:
        argl = [sys.executable, join(REPO, "WritePredictions.py"),
                str(f.resolve()), args.config, args.checkpoint] + list(extra)
        print(" ".join(argl))
        subprocess.call(argl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
