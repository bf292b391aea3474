#!/usr/bin/env python
"""Copy the runtime attribute from a reference HDF5 file onto another
(ref: scripts/AddAttr.py:1-19)."""
from __future__ import annotations

import argparse
import sys

import h5py


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ref_file", help="file with the correct runtime")
    parser.add_argument("file", help="file to add it to")
    parser.add_argument("--table", default="PhysPulse")
    parser.add_argument("--attr", default="runtime")
    args = parser.parse_args(argv)
    with h5py.File(args.ref_file, "r") as ref, h5py.File(args.file, "r+") as f:
        f[args.table].attrs.create(args.attr, ref[args.table].attrs[args.attr])
        f.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
