#!/usr/bin/env python
"""Test-only driver: load a checkpoint and run the evaluation pass
(ref: Evaluate.py:31-84): re-uses the checkpoint's tfevents version dir,
--calgroup override, --occlude feature occlusion, model export via --script.

``python Evaluate.py config.json checkpoint_dir [-c calgroup] [-oc n]``
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    # --num_threads must hit the env BEFORE anything imports jax (the
    # int_or_float import below pulls the trainer in)
    argv = sys.argv[1:] if argv is None else list(argv)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--num_threads", "-nt", type=int, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    from waveformml_tpu.utils.util import apply_num_threads
    apply_num_threads(pre_args.num_threads)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="config file for the model")
    parser.add_argument("checkpoint", help="checkpoint path")
    parser.add_argument("--calgroup", "-c", type=str,
                        help="calibration group override for evaluation")
    parser.add_argument("--occlude", "-oc", type=int, default=None,
                        help="feature index to occlude (zero) at test time")
    parser.add_argument("--script", "-s", action="store_true",
                        help="export the jitted model alongside the logs")
    parser.add_argument("--verbosity", "-v", type=int, default=3)
    parser.add_argument("--num_threads", "-nt", type=int)
    from waveformml_tpu.engineering.trainer import int_or_float

    # int = batch count, float<=1 = fraction (see main.py: plain float turns
    # `--limit_test_batches 1` into the whole loader)
    parser.add_argument("--limit_test_batches", type=int_or_float, default=None)
    args = parser.parse_args(argv)

    from main import choose_data_module
    from waveformml_tpu.config import load_config
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.registry import retrieve_class
    from waveformml_tpu.utils.tb import TBLogger
    from waveformml_tpu.utils.util import setup_logger

    log = setup_logger(args.verbosity)
    from waveformml_tpu.utils.util import enable_compilation_cache
    enable_compilation_cache()
    config = load_config(args.config)
    if args.calgroup:
        config.dataset_config["calgroup"] = args.calgroup
    if args.occlude is not None:
        config.dataset_config["occlude_index"] = args.occlude

    # reuse the version dir the checkpoint lives in (ref: Evaluate.py:52-68)
    ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    has_events = any("tfevents" in f for f in os.listdir(ckpt_dir)) \
        if os.path.isdir(ckpt_dir) else False
    log_dir = ckpt_dir if has_events else os.path.join(ckpt_dir, "evaluate")
    if args.occlude is not None:
        # per-index subdir so EvalOcclusionStudy can collect results
        # (ref: Evaluate.py:56-57 TB sub_dir="occlude_<n>")
        log_dir = os.path.join(log_dir, f"occlude_{args.occlude}")
    logger = TBLogger(log_dir)
    log.info("logging evaluation to %s", log_dir)

    task_cls = retrieve_class(config.run_config.run_class)
    task = task_cls(config)
    trainer = Trainer(config, task, logger=logger,
                      limit_test_batches=args.limit_test_batches)
    data_module = choose_data_module(config)
    data_module.setup("test")
    first = next(iter(data_module.test_dataloader()))
    trainer.load_checkpoint(args.checkpoint, sample_block=first)
    if args.script:
        # StableHLO serialization — the TorchScript-export equivalent
        # (ref: LitBase.py:103-109, Evaluate.py:23)
        export_path = os.path.join(log_dir, "model.stablehlo")
        trainer.export_model(export_path, first)
        log.info("exported StableHLO model to %s", export_path)
    metrics = trainer.test(data_module)
    # flush the event file so downstream collectors (EvalOcclusionStudy)
    # can read test_loss immediately (PL finalizes its logger; ours must too)
    logger.close()
    print("test:", {k: round(v, 5) for k, v in metrics.items()
                    if isinstance(v, (int, float))})
    return 0


if __name__ == "__main__":
    sys.exit(main())
