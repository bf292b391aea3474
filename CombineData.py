#!/usr/bin/env python
"""Offline data prep: instantiate a PulseDataset over raw directories and run
the class-interleaved shuffle (ref: CombineData.py:6-110).

``python CombineData.py dir1 dir2 -t 2d [--base_path ...] [-n N]``
"""
from __future__ import annotations

import argparse
import os
import sys

#: type-name → dataset class (ref: CombineData.py:6)
TYPE_MAP = {
    "2d": "PulseDataset2D",
    "3d": "PulseDataset3D",
    "pmt": "PulseDatasetPMT",
    "det": "PulseDatasetDet",
    "detz": "PulseDatasetDetWithZ",
    "detez": "PulseDatasetDetWithEZ",
    "2dz": "PulseDataset2DWithZ",
    "2dez": "PulseDataset2DWithEZ",
    "wfpair": "PulseDatasetWFPair",
    "wfpairez": "PulseDatasetWFPairEZ",
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dirs", nargs="+", help="data directories (one per class)")
    parser.add_argument("--type", "-t", default="2d", choices=sorted(TYPE_MAP),
                        help="dataset type")
    parser.add_argument("--base_path", "-b", default="",
                        help="base path the directories are relative to")
    parser.add_argument("--num_events", "-n", type=float, default=1e9,
                        help="events per directory")
    parser.add_argument("--shuffled_size", "-s", type=int, default=16384,
                        help="events per combined output file")
    parser.add_argument("--out_dir", "-o", default=None,
                        help="output directory for Combined_* files")
    parser.add_argument("--verbosity", "-v", type=int, default=3)
    parser.add_argument("--config", "-c", type=str, default=None,
                        help="config file overriding chunk_size / shuffled_size "
                             "(ref: CombineData.py:30-31)")
    args = parser.parse_args(argv)

    from waveformml_tpu.config import Config
    from waveformml_tpu.registry import retrieve_class
    from waveformml_tpu.utils.util import setup_logger

    setup_logger(args.verbosity)
    shuffled_size = args.shuffled_size
    chunk_size = None
    if args.config:
        from waveformml_tpu.config import load_config

        dc = load_config(args.config, validate=False).dataset_config
        shuffled_size = int(getattr(dc, "shuffled_size", shuffled_size))
        chunk_size = getattr(dc, "chunk_size", None)  # documented override
    dataset_config = {"base_path": args.base_path, "paths": list(args.dirs),
                      "data_prep": "shuffle",
                      "shuffled_size": shuffled_size,
                      "dataset_params": {}}
    if chunk_size is not None:
        dataset_config["chunk_size"] = int(chunk_size)
    config = Config({
        "system_config": {"model_name": "combine", "model_base_path": "./model",
                          "n_samples": 0, "type_names": [os.path.basename(d) for d in args.dirs]},
        "dataset_config": dataset_config,
    })
    cls = retrieve_class(TYPE_MAP[args.type])
    kwargs = {}
    if args.out_dir:
        kwargs["data_dir"] = args.out_dir
    dataset = cls(config, "train", int(args.num_events), **kwargs)
    dataset.write_shuffled()
    print(f"Combined files written to {dataset.data_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
