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
    for f in sorted(Path(args.input_dir).glob(args.pattern)):
        argl = [sys.executable, join(REPO, "WritePredictions.py"),
                str(f.resolve()), args.config, args.checkpoint] + list(extra)
        print(" ".join(argl))
        subprocess.call(argl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
