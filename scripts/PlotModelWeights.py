#!/usr/bin/env python
"""Plot the weight matrices of a trained checkpoint as heatmaps
(ref: scripts/PlotModelWeights.py, 136 LoC)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import orbax.checkpoint as ocp

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", help="orbax checkpoint directory")
    parser.add_argument("--out_dir", "-o", default="weight_plots")
    parser.add_argument("--max_plots", type=int, default=24)
    args = parser.parse_args(argv)
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.checkpoint))
    params = restored["params"]
    os.makedirs(args.out_dir, exist_ok=True)

    count = 0

    def walk(tree, prefix=""):
        nonlocal count
        if count >= args.max_plots:
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
            return
        arr = np.asarray(tree)
        if arr.ndim < 2:
            return
        mat = arr.reshape(arr.shape[0], -1) if arr.ndim > 2 else arr
        fig, ax = plt.subplots()
        im = ax.imshow(mat, aspect="auto", cmap="RdBu_r")
        fig.colorbar(im, ax=ax)
        ax.set_title(prefix)
        name = prefix.replace("/", "_") + ".png"
        fig.savefig(os.path.join(args.out_dir, name))
        plt.close(fig)
        print("wrote", name)
        count += 1

    walk(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
