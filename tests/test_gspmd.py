"""GSPMD (jit + NamedSharding) engine: data x tensor parallel on the virtual
8-device CPU mesh — numerics parity with the shard_map DP engine, and an
end-to-end fit with column-sharded kernels (parallel/gspmd.py)."""
import math
import os

import numpy as np
import pytest

from waveformml_tpu.config import Config
from waveformml_tpu.datasets.data_module import PSDDataModule
from waveformml_tpu.datasets.synthetic import write_classification_dirs
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

N_SAMPLES = 16


@pytest.fixture(scope="module")
def psd_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("gspmd")
    write_classification_dirs(
        str(tmp_path / "data"), ["TypeA", "TypeB"], n_files=4,
        events_per_file=40, n_samples=N_SAMPLES, seed=5)
    cfg = Config({
        "run_config": {"exp_name": "g", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "g", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["TypeA", "TypeB"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 16, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 3, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9, "nesterov": True}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["TypeA", "TypeB"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 100, "n_validate": 60,
                           "data_prep": "shuffle", "shuffled_size": 40,
                           "dataloader_params": {"batch_size": 2, "num_workers": 0}},
    })
    return tmp_path, cfg


def _one_step(trainer, block, srng):
    import jax

    trainer._ensure_state(block)
    db = trainer._to_device(trainer._device_batch(block))
    new_p, _, _, loss, _ = trainer._train_step_fn(
        trainer.state.params, trainer.state.batch_stats,
        trainer.state.opt_state, srng, db)
    return float(loss), jax.tree.map(np.asarray, new_p)


def test_gspmd_dp_tp_matches_shard_map(psd_setup):
    """One train step under gspmd on a (4 data x 2 model) mesh reproduces the
    shard_map 8-way DP step bit-for-bit-ish: same global batch, same seed —
    the mesh/sharding choice must not change numerics."""
    import jax

    tmp_path, cfg = psd_setup
    assert jax.device_count() == 8
    dm = PSDDataModule(cfg)
    dm.setup("fit")
    block = next(iter(dm.train_dataloader()))
    srng = jax.random.PRNGKey(7)

    outs = {}
    for mode, kwargs in (("shard_map", {}), ("gspmd", {"tp": 2})):
        trainer = Trainer(cfg, LitPSD(cfg), seed=0, **kwargs)
        outs[mode] = _one_step(trainer, block, srng)
        if mode == "gspmd":
            assert trainer.mesh.shape == {"data": 4, "model": 2}
            # at least one kernel actually column-sharded over the model axis
            from jax.sharding import PartitionSpec as P

            specs = [x.sharding.spec for x in jax.tree.leaves(trainer.state.params)
                     if hasattr(x, "sharding")]
            assert any(len(spec) and spec[-1] == "model" for spec in specs), specs

    assert abs(outs["shard_map"][0] - outs["gspmd"][0]) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                         outs["shard_map"][1], outs["gspmd"][1])
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_gspmd_fit_and_test_end_to_end(psd_setup):
    """Full fit + test under gspmd dp4 x tp2: finite losses, learning happens,
    the evaluator collect path ([1, ...] leading axis) works."""
    tmp_path, cfg = psd_setup
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, tp=2, max_epochs=3, seed=0,
                      early_stopping_patience=20)
    dm = PSDDataModule(cfg)
    metrics = trainer.fit(dm)
    assert math.isfinite(metrics["train_loss"])
    assert "val_accuracy" in metrics
    test_metrics = trainer.test(dm)
    assert math.isfinite(test_metrics["test_loss"])
    assert "test_accuracy" in test_metrics


def test_gspmd_checkpoint_roundtrip(psd_setup, tmp_path):
    """gspmd-sharded state saves topology-free and restores onto the mesh."""
    import jax

    _, cfg = psd_setup
    dm = PSDDataModule(cfg)
    dm.setup("fit")
    block = next(iter(dm.train_dataloader()))
    trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
    trainer._ensure_state(block)
    ckpt = str(tmp_path / "g.ckpt")
    trainer.save_checkpoint(ckpt)

    trainer2 = Trainer(cfg, LitPSD(cfg), tp=2, seed=1)
    trainer2.load_checkpoint(ckpt, sample_block=block)
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                        trainer.state.params, trainer2.state.params)
    assert all(jax.tree.leaves(same))
    # restored params are re-placed on the 2-D mesh (sharded where the rule says)
    from jax.sharding import PartitionSpec as P

    specs = [x.sharding.spec for x in jax.tree.leaves(trainer2.state.params)
             if hasattr(x, "sharding")]
    assert any(len(spec) and spec[-1] == "model" for spec in specs)


def test_gspmd_row_label_task(psd_setup):
    """Row-label tasks (LitZ prepare_block: labels_rows aligned to rows) also
    shard on the 2-D mesh — every leading dim divides the data axis."""
    import jax
    import numpy as np

    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ

    tmp_path, _ = psd_setup
    cfg = Config({
        "run_config": {"exp_name": "gz", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "gz", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp_path / "m2"),
                          "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_type": "2DConvolution",
                       "algorithm": "conv",
                       "hparams": {"conv": {"kernel_size": 3, "n_layers": 2},
                                   "point": {"pointwise_layers": 1}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPair",
                           "dataset_params": {}, "n_train": 8, "n_validate": 4},
    })
    rng = np.random.default_rng(0)
    n = 24
    coords = np.stack([rng.integers(0, 14, n), rng.integers(0, 11, n),
                       np.sort(rng.integers(0, 12, n))], axis=1).astype(np.int32)
    feats = rng.random((n, 2 * N_SAMPLES)).astype(np.float32)
    labels = rng.random(n).astype(np.float32)
    block = FileBlock(coords, feats, labels, {})
    trainer = Trainer(cfg, LitZ(cfg), tp=2, seed=0)
    loss, _ = _one_step(trainer, block, jax.random.PRNGKey(0))
    assert math.isfinite(loss)


def test_gspmd_bf16_step(psd_setup):
    """half_precision (bf16 compute, fp32 params) under the gspmd engine."""
    import jax

    from waveformml_tpu.config import to_dict

    tmp_path, cfg = psd_setup
    d = {k: to_dict(getattr(cfg, k)) for k in
         ("run_config", "system_config", "net_config", "optimize_config",
          "dataset_config")}
    d["system_config"]["half_precision"] = 1
    cfg_bf16 = Config(d)
    dm = PSDDataModule(cfg_bf16)
    dm.setup("fit")
    block = next(iter(dm.train_dataloader()))
    trainer = Trainer(cfg_bf16, LitPSD(cfg_bf16), tp=2, seed=0)
    loss, new_p = _one_step(trainer, block, jax.random.PRNGKey(3))
    assert math.isfinite(loss)
    # master params stay fp32
    assert all(np.asarray(x).dtype == np.float32
               for x in jax.tree.leaves(new_p)
               if np.asarray(x).dtype.kind == "f")


def test_gspmd_checkpoint_serves_single_chip(psd_setup, tmp_path):
    """Train-on-pod / serve-on-one-chip: a tp-sharded checkpoint restores
    into the single-device InferenceModel and runs a forward."""
    import numpy as np

    import jax

    from waveformml_tpu.config import save_config
    from waveformml_tpu.inference.model import InferenceModel

    _, cfg = psd_setup
    dm = PSDDataModule(cfg)
    dm.setup("fit")
    block = next(iter(dm.train_dataloader()))
    trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
    trainer._ensure_state(block)
    ckpt = str(tmp_path / "serve.ckpt")
    trainer.save_checkpoint(ckpt)
    cfg_path = str(tmp_path / "serve.json")
    save_config(cfg, cfg_path)

    from waveformml_tpu.config import load_config

    model = InferenceModel(load_config(cfg_path), ckpt)
    rng = np.random.default_rng(2)
    coords = np.array([[1, 1, 0], [3, 4, 0], [5, 5, 1]], dtype=np.int32)
    vals = rng.random((3, 2 * N_SAMPLES)).astype(np.float32)
    out = model(coords, vals)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


GSPMD_MH_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from waveformml_tpu.parallel.mesh import initialize_distributed
initialize_distributed(f"localhost:{port}", 2, pid)
from _dist_train_common import make_cfg_block
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

cfg, block = make_cfg_block(rank=pid)      # this rank's event half
trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
assert trainer.mesh.shape == {"data": 2, "model": 2}, trainer.mesh.shape
trainer._build_steps()
db = trainer._device_batch(block)
gdb = trainer._to_device(db)
one = {k: jnp.asarray(v) for k, v in db.items()}
variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
from waveformml_tpu.parallel.gspmd import replicate, shard_params
# numpy snapshot: device_put may return the init arrays uncopied, and the
# donating train step would delete them before the second shard_params below
variables = jax.tree_util.tree_map(np.asarray, variables)
params = shard_params(variables["params"], trainer.mesh, trainer.tp)
bstats = replicate(variables.get("batch_stats"), trainer.mesh)
opt_state = trainer.optimizer.init(params)
out = trainer._train_step_fn(params, bstats, opt_state, jax.random.PRNGKey(2), gdb)
loss = float(out[3])
from jax.experimental import multihost_utils
losses = np.asarray(multihost_utils.process_allgather(np.array([loss])))
assert np.allclose(losses, losses.ravel()[0]), losses
# regression: after init, prepare_block ships host-prefetched row plans
# whose indices are PROCESS-LOCAL; _device_batch must shift them into this
# rank's global [P*rb] row slot or rank 1 gathers rank 0's features
db2 = trainer._device_batch(block)
assert any(k.startswith("plan_") for k in db2), sorted(db2)
gdb2 = trainer._to_device(db2)
params2 = shard_params(variables["params"], trainer.mesh, trainer.tp)
bstats2 = replicate(variables.get("batch_stats"), trainer.mesh)
out2 = trainer._train_step_fn(params2, bstats2, trainer.optimizer.init(params2),
                              jax.random.PRNGKey(2), gdb2)
loss2 = float(out2[3])
assert abs(loss2 - loss) < 1e-6, (loss, loss2)
if pid == 0:
    with open(os.path.join(outdir, "gspmd_loss.txt"), "w") as f:
        f.write(repr(loss))
print("GSPMD_MH_OK", pid, loss, flush=True)
"""


def test_gspmd_two_process_dp_tp_step(tmp_path):
    """GSPMD dp x tp ACROSS HOSTS: 2 processes x 2 devices form a (2, 2)
    (data, model) mesh; each rank contributes its event half of the global
    flat batch and the XLA-partitioned train step's loss matches the
    single-process gspmd run (masked losses are padding-invariant)."""
    import subprocess
    import sys as _sys

    import jax

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_train_common import make_cfg_block

    # single-process reference: gspmd tp=2 over 4 local devices, full block
    cfg, block = make_cfg_block()
    trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
    import jax.numpy as jnp

    trainer._build_steps()
    db = trainer._device_batch(block)
    one = {k: jnp.asarray(v) for k, v in db.items()}
    variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
    from waveformml_tpu.parallel.gspmd import replicate, shard_params

    params = shard_params(variables["params"], trainer.mesh, trainer.tp)
    bstats = replicate(variables.get("batch_stats"), trainer.mesh)
    out = trainer._train_step_fn(params, bstats,
                                 trainer.optimizer.init(params),
                                 jax.random.PRNGKey(2),
                                 trainer._to_device(db))
    want = float(out[3])

    import socket

    s = socket.socket(); s.bind(("localhost", 0))
    port = s.getsockname()[1]; s.close()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [_sys.executable, "-u", "-c", GSPMD_MH_WORKER, str(i), str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for i in range(2)]
    for p in procs:
        try:
            out_s, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err + out_s
        assert "GSPMD_MH_OK" in out_s, out_s
    got = float(open(os.path.join(str(tmp_path), "gspmd_loss.txt")).read())
    assert abs(got - want) < 1e-5, (got, want)


GSPMD_MH_EVAL_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from waveformml_tpu.parallel.mesh import initialize_distributed
initialize_distributed(f"localhost:{port}", 2, pid)
from _dist_train_common import make_cfg_block
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer


class CountingLogger:
    def __init__(self):
        self.figures = {}
        self.log_dir = outdir

    def log_figure(self, tag, fig, step=0, close=True):
        self.figures[tag] = True
        import matplotlib.pyplot as plt
        plt.close(fig)

    def log_scalar(self, tag, value, step=0):
        pass

    def log_scalars(self, values, step=0):
        pass

    def log_histogram(self, tag, values, step=0):
        self.figures[tag] = True

    def flush(self):
        pass


class DM:
    def __init__(self, block):
        self.block = block

    def setup(self, stage=None):
        pass

    def test_dataloader(self):
        return [self.block]


cfg, block = make_cfg_block(rank=pid)
logger = CountingLogger() if pid == 0 else None
trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0, logger=logger)
assert trainer.mesh.shape == {"data": 2, "model": 2}, trainer.mesh.shape
metrics = trainer.test(DM(block))
assert np.isfinite(metrics["test_loss"]), metrics
ev = trainer.task.evaluator
assert ev is not None
if pid == 0:
    with open(os.path.join(outdir, "figcount.txt"), "w") as f:
        f.write(str(len(logger.figures)))
print("GSPMD_MH_EVAL_OK", pid, metrics["test_loss"], flush=True)
"""


def test_gspmd_two_process_evaluator_figures(tmp_path):
    """trainer.test under --distributed + tp=2 must COLLECT evaluator inputs
    (per-process addressable slices of the gspmd outputs) and emit figures on
    rank 0 — the silent-skip this replaces dropped all figures."""
    import socket
    import subprocess
    import sys as _sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [_sys.executable, "-u", "-c", GSPMD_MH_EVAL_WORKER, str(i), str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for i in range(2)]
    for p in procs:
        try:
            out_s, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err + out_s
        assert "GSPMD_MH_EVAL_OK" in out_s, out_s
    n_figures = int(open(os.path.join(str(tmp_path), "figcount.txt")).read())
    assert n_figures > 0, "no evaluator figures emitted on rank 0"


GSPMD_GRAPH_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from waveformml_tpu.parallel.mesh import initialize_distributed
initialize_distributed(f"localhost:{port}", 2, pid)
from _dist_train_common import make_graph_cfg_block
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

cfg, block = make_graph_cfg_block(rank=pid)  # rank 0 sparse, rank 1 dense
trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
trainer._build_steps()
db = trainer._device_batch(block)  # shifts edge indices into the rank slot
gdb = trainer._to_device(db)       # stitches edges along the edge axis
one = {k: jnp.asarray(v) for k, v in db.items()}
variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
from waveformml_tpu.parallel.gspmd import replicate, shard_params
variables = jax.tree_util.tree_map(np.asarray, variables)
params = shard_params(variables["params"], trainer.mesh, trainer.tp)
bstats = replicate(variables.get("batch_stats"), trainer.mesh)
out = trainer._train_step_fn(params, bstats, trainer.optimizer.init(params),
                             jax.random.PRNGKey(2), gdb)
loss = float(out[3])
from jax.experimental import multihost_utils
losses = np.asarray(multihost_utils.process_allgather(np.array([loss])))
assert np.allclose(losses, losses.ravel()[0]), losses
if pid == 0:
    with open(os.path.join(outdir, "gspmd_graph_loss.txt"), "w") as f:
        f.write(repr(loss))
print("GSPMD_GRAPH_OK", pid, loss, flush=True)
"""


def test_gspmd_two_process_graph_step(tmp_path):
    """Graph model under GSPMD ACROSS HOSTS: each rank's edge lists carry
    process-local row indices and per-rank edge caps diverge (rank 0 sparse,
    rank 1 dense). The stitched global batch must shift the indices into
    each rank's row slot and concatenate along the EDGE axis; the loss must
    match the single-process gspmd run on the full block."""
    import subprocess
    import sys as _sys

    import jax
    import jax.numpy as jnp

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_train_common import make_graph_cfg_block

    cfg, block = make_graph_cfg_block()
    trainer = Trainer(cfg, LitPSD(cfg), tp=2, seed=0)
    trainer._build_steps()
    db = trainer._device_batch(block)
    one = {k: jnp.asarray(v) for k, v in db.items()}
    variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
    from waveformml_tpu.parallel.gspmd import replicate, shard_params

    params = shard_params(variables["params"], trainer.mesh, trainer.tp)
    bstats = replicate(variables.get("batch_stats"), trainer.mesh)
    out = trainer._train_step_fn(params, bstats, trainer.optimizer.init(params),
                                 jax.random.PRNGKey(2), trainer._to_device(db))
    want = float(out[3])

    import socket

    s = socket.socket(); s.bind(("localhost", 0))
    port = s.getsockname()[1]; s.close()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [_sys.executable, "-u", "-c", GSPMD_GRAPH_WORKER, str(i), str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for i in range(2)]
    for p in procs:
        try:
            out_s, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err + out_s
        assert "GSPMD_GRAPH_OK" in out_s, out_s
    got = float(open(os.path.join(str(tmp_path), "gspmd_graph_loss.txt")).read())
    assert abs(got - want) < 1e-5, (got, want)
