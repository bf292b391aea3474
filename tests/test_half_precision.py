"""half_precision → bf16 compute path (fp32 master params, fp32 losses)."""
import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.config import Config, validate_config
from waveformml_tpu.datasets.synthetic import write_classification_dirs
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse


def _cfg(tmp_path, half):
    return Config({
        "run_config": {"exp_name": "h", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "half", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "model"),
                          "half_precision": half},
        "net_config": {"net_type": "2DConvolution", "net_class": "SubMPSDNet",
                       "criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [],
                       "hparams": {"out_planes": 4, "n_lin": 1,
                                   "conv_params": {"kernel_size": 3, "n_conv": 1,
                                                   "n_point": 1, "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["a", "b"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 6, "n_validate": 6,
                           "dataloader_params": {"batch_size": 1, "num_workers": 0}},
    })


def test_bf16_features_and_f32_outputs(tmp_path, rng):
    """_features casts to bf16 under half_precision; apply_model returns f32."""
    from waveformml_tpu.engineering.tasks import LitPSD

    write_classification_dirs(str(tmp_path / "data"), ["a", "b"], n_files=1,
                              events_per_file=4, n_samples=8, seed=0)
    cfg = _cfg(tmp_path, half=1)
    validate_config(cfg)
    task = LitPSD(cfg)
    rows = np.array([[1, 2, 0], [3, 4, 1], [5, 6, 2], [0, 0, 3]], np.int32)
    feats = rng.normal(size=(4, 16)).astype(np.float32)
    c, f, m = pad_sparse(rows, feats, 16)
    db = {"coords": jnp.asarray(c), "feats": jnp.asarray(f),
          "mask": jnp.asarray(m), "labels": jnp.zeros(4, jnp.int32)}
    batch = task.sparse_batch(db)
    assert batch.feats.dtype == jnp.bfloat16
    variables = task.model.init(jax.random.PRNGKey(0), batch)
    # master params stay fp32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    # the conv trunk computes in bf16 (row-space gather-GEMM preserves the
    # input dtype; fp32 MXU accumulation via preferred_element_type)
    from waveformml_tpu.ops.row_conv import (build_neighbor_plan, subm_conv_rows)
    plan = build_neighbor_plan(batch, 3)
    kern = jnp.zeros((9, 16, 4), jnp.float32)
    y = subm_conv_rows(batch.feats, plan, kern, None, batch.mask)
    assert y.dtype == jnp.bfloat16
    # the task boundary yields fp32 for losses/metrics (the linear head
    # promotes to fp32 params dtype; apply_model guarantees it regardless)
    out, _ = task.apply_model(variables, db, train=False)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_half_precision_training_step(tmp_path, rng):
    """Full SPMD train step under half_precision: finite loss, close to the
    fp32 loss on the same batch/params."""
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    write_classification_dirs(str(tmp_path / "data"), ["a", "b"], n_files=2,
                              events_per_file=6, n_samples=8, seed=3)
    losses = {}
    for half in (0, 1):
        cfg = _cfg(tmp_path, half=half)
        validate_config(cfg)
        task = LitPSD(cfg)
        dm = PSDDataModule(cfg)
        dm.gen_train_dataset()
        trainer = Trainer(cfg, task, seed=0)
        block = next(iter(dm.train_dataloader()))
        trainer._ensure_state(block)
        db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
        *_, loss, _m = trainer._train_step_fn(
            trainer.state.params, trainer.state.batch_stats,
            trainer.state.opt_state, jax.random.PRNGKey(0), db)
        losses[half] = float(loss)
    assert np.isfinite(losses[0]) and np.isfinite(losses[1])
    # bf16 has ~3 decimal digits; init losses should agree loosely
    assert abs(losses[0] - losses[1]) < 0.05, losses
