#!/usr/bin/env python
"""Evaluate the best HPO trials: read the study.db, rank completed trials, and
run Evaluate.py on each trial's best checkpoint
(ref: scripts/EvalBestTrials.py:45-92 + src/utils/SQLUtils.py:67-81)."""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from os.path import dirname, join, realpath
from pathlib import Path

REPO = dirname(dirname(realpath(__file__)))


def main(argv=None) -> int:
    from waveformml_tpu.config import load_config
    from waveformml_tpu.optimization.hpo import OptunaDB
    from waveformml_tpu.utils.util import get_model_folder, retrieve_best_checkpoint

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="config used for the study")
    parser.add_argument("--n_trials", "-n", type=int, default=3,
                        help="number of top trials to evaluate")
    parser.add_argument("--calgroup", "-c", type=str)
    args, extra = parser.parse_known_args(argv)
    config = load_config(args.config)
    model_folder = get_model_folder(config)
    study_dir = join(model_folder, "studies", config.run_config.exp_name)
    db = OptunaDB(join(study_dir, "study.db"))
    top = db.get_top_trials(args.n_trials)
    db.close()
    print("top trials:", top)
    for number, value in top:
        trial_dir = join(study_dir, f"trial_{number}")
        ckpt = retrieve_best_checkpoint(trial_dir)
        trial_config = join(trial_dir, "config.json")
        if ckpt is None or not os.path.exists(trial_config):
            print(f"trial {number}: no checkpoint/config found, skipping")
            continue
        argl = [sys.executable, join(REPO, "Evaluate.py"), trial_config, ckpt]
        if args.calgroup:
            argl += ["-c", args.calgroup]
        argl += list(extra)
        print(" ".join(argl))
        subprocess.call(argl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
