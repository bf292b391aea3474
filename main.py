#!/usr/bin/env python
"""Train driver: ``python main.py <config.json> [options]``.

Mirrors the reference's main.py surface (ref: main.py:36-222): JSON config
load + validation, model-folder / experiment-name auto-increment (:99-109),
TensorBoard logger versioning + run-info provenance (:144-168), checkpoint
resume via --load_checkpoint / --load_best / --restore_training (:150-175),
LR finder (--auto_lr_find, :207-213), static model validation (--validate,
:120-121), HPO dispatch (-oc/--optuna_config, :126-142), trainer debug flags
(--overfit_batches / --limit_*_batches / --profiler), then fit + optional
test (-t).
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="path to the experiment config JSON/YAML")
    p.add_argument("--name", "-n", type=str, default=None,
                   help="override run_config.exp_name for this run")
    p.add_argument("--config_validation", "-cv", type=str, default=None,
                   help="path to a custom config-requirements JSON")
    p.add_argument("--test", "-t", action="store_true",
                   help="run the test pass after training")
    p.add_argument("--verbosity", "-v", type=int, default=3,
                   help="log verbosity 0-5")
    p.add_argument("--logfile", "-l", default=None)
    p.add_argument("--load_checkpoint", "-lc", default=None,
                   help="checkpoint path to start from")
    p.add_argument("--load_best", "-lb", action="store_true",
                   help="find and load the best checkpoint in the model folder")
    p.add_argument("--restore_training", "-r", action="store_true",
                   help="resume optimizer/scheduler/epoch state as well")
    p.add_argument("--num_threads", "-nt", type=int, default=None)
    p.add_argument("--optuna_config", "-oc", default=None,
                   help="hyperparameter-optimization config (dispatches to HPO)")
    p.add_argument("--pruning", "-p", action="store_true",
                   help="enable trial pruning during HPO")
    p.add_argument("--auto_lr_find", action="store_true")
    p.add_argument("--validate", action="store_true",
                   help="statically validate the algorithm DSL before training")
    p.add_argument("--profiler", action="store_true")
    from waveformml_tpu.engineering.trainer import int_or_float

    # int = batch count, float<=1 = fraction (Lightning semantics; a plain
    # float type would turn `--limit_val_batches 1` into the whole loader)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--overfit_batches", type=int_or_float, default=None)
    p.add_argument("--limit_train_batches", type=int_or_float, default=None)
    p.add_argument("--limit_val_batches", type=int_or_float, default=None)
    p.add_argument("--limit_test_batches", type=int_or_float, default=None)
    p.add_argument("--gradient_clip_val", type=float, default=None,
                   help="clip gradients to this global norm (PL Trainer flag)")
    p.add_argument("--accumulate_grad_batches", type=int, default=1,
                   help="apply the optimizer every k batches (PL Trainer flag)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed for multi-host training "
                        "(TPU pods auto-discover; or pass --coordinator)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multi-host)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # merge the full Trainer kwarg surface, the reference's
    # `Trainer.add_argparse_args(parser)` (ref: main.py:74) — adds
    # --terminate_on_nan/--early_stopping_patience/--steps_per_dispatch/
    # --parallel/--tp and any future Trainer kwargs automatically
    from waveformml_tpu.engineering.trainer import Trainer
    Trainer.add_argparse_args(p)
    return p


def choose_data_module(config):
    """Pick the data module from config (ref: main.py:21-33)."""
    from waveformml_tpu.registry import retrieve_class

    name = getattr(config.dataset_config, "data_module", None) or "PSDDataModule"
    return retrieve_class(name)(config)


def main(argv=None) -> int:
    # --num_threads must hit the environment BEFORE anything imports jax,
    # and build_parser() imports the Trainer for its argparse bridge — so
    # pre-scan just that flag first
    argv = sys.argv[1:] if argv is None else list(argv)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--num_threads", "-nt", type=int, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    from waveformml_tpu.utils.util import apply_num_threads
    apply_num_threads(pre_args.num_threads)
    args = build_parser().parse_args(argv)

    from waveformml_tpu.config import load_config
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.registry import retrieve_class
    from waveformml_tpu.utils.model_validation import ModelValidation
    from waveformml_tpu.utils.tb import TBLogger
    from waveformml_tpu.utils.util import (
        get_model_folder, next_experiment_name, next_version_dir,
        retrieve_best_checkpoint, setup_logger, write_run_info)

    config = load_config(args.config, validate=args.config_validation is None)
    if args.config_validation:
        import json as _json

        from waveformml_tpu.config import validate_config

        with open(args.config_validation) as f:
            validate_config(config, _json.load(f))
    if args.name:
        config.run_config.exp_name = args.name
    log = setup_logger(args.verbosity, args.logfile)
    if args.distributed:
        from waveformml_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    from waveformml_tpu.utils.util import enable_compilation_cache
    enable_compilation_cache()

    model_folder = get_model_folder(config)
    if args.validate:
        ModelValidation.validate(config)
        log.info("model validation passed")

    if args.optuna_config:
        if args.distributed:
            raise SystemExit(
                "HPO studies are single-host (each trial already uses every "
                "local device); drop --distributed for -oc runs")
        from waveformml_tpu.config import load_config as _lc
        from waveformml_tpu.optimization.hpo import ModelOptimization

        opt_config = _lc(args.optuna_config, validate=False)
        mo = ModelOptimization(opt_config, config, model_folder,
                               trainer_args=Trainer.kwargs_from_args(args))
        mo.run_study(pruning=args.pruning)
        return 0

    import jax as _jax

    multihost = _jax.process_count() > 1
    rank0 = _jax.process_index() == 0
    exp_name = config.run_config.exp_name
    # -r only resumes when a checkpoint source is given (reference parity:
    # main.py:155 gates on `restore_training and load_checkpoint`) — without
    # one, reusing the old run dir would silently train from random init
    # into an existing experiment
    resuming = args.restore_training and (args.load_checkpoint or args.load_best)
    if args.restore_training and not resuming:
        log.warning("--restore_training ignored: no --load_checkpoint/"
                    "--load_best given, starting a fresh run")
    if not resuming and rank0:
        exp_name = next_experiment_name(model_folder, exp_name)
    run_dir = os.path.join(model_folder, "runs", exp_name)
    if rank0:
        log_dir = next_version_dir(run_dir)
    else:
        log_dir = run_dir  # placeholder; replaced by the broadcast below
    if multihost:
        # every rank needs the SAME run dir (checkpoints are an all-rank
        # orbax protocol); rank 0 picks it and broadcasts the string
        import numpy as _np
        from jax.experimental import multihost_utils as _mh

        buf = _np.zeros(4096, _np.uint8)
        if rank0:
            raw = log_dir.encode()
            if len(raw) > buf.size:  # never truncate silently: a clipped
                # path would send every rank to a different directory
                raise IOError(
                    f"run directory path is {len(raw)} bytes, exceeding the "
                    f"{buf.size}-byte multihost broadcast buffer: {log_dir}")
            buf[:len(raw)] = _np.frombuffer(raw, _np.uint8)
        buf = _np.asarray(_mh.broadcast_one_to_all(buf))
        log_dir = bytes(buf[buf != 0]).decode()
    logger = TBLogger(log_dir) if rank0 else None
    if rank0:
        write_run_info(log_dir)
    log.info("logging to %s", log_dir)

    task_cls = retrieve_class(config.run_config.run_class)
    task = task_cls(config)
    trainer = Trainer(config, task, logger=logger, checkpoint_dir=log_dir,
                      **Trainer.kwargs_from_args(args))
    data_module = choose_data_module(config)

    ckpt = args.load_checkpoint
    if args.load_best and not ckpt:
        ckpt = retrieve_best_checkpoint(model_folder)
        if ckpt is None:  # an explicit load request must not silently
            # fall through to training from random init
            raise IOError(
                f"--load_best: no checkpoint found under {model_folder}")
        log.info("best checkpoint: %s", ckpt)
    if ckpt:
        data_module.setup("fit")
        first = next(iter(data_module.train_dataloader()))
        trainer.load_checkpoint(ckpt, sample_block=first,
                                restore_training=args.restore_training)

    if args.auto_lr_find:
        new_lr = trainer.lr_find(data_module)
        task.lr = new_lr
        from waveformml_tpu import optim as wopt

        trainer.state.opt_state = wopt.set_learning_rate(trainer.state.opt_state, new_lr)
        if trainer.scheduler:
            trainer.scheduler.base_lr = new_lr

    fit_metrics = trainer.fit(data_module)
    print("fit:", {k: round(v, 5) for k, v in fit_metrics.items()
                   if isinstance(v, (int, float))})
    if args.test:
        test_metrics = trainer.test(data_module)
        print("test:", {k: round(v, 5) for k, v in test_metrics.items()
                        if isinstance(v, (int, float))})
    return 0


if __name__ == "__main__":
    sys.exit(main())
