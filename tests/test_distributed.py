"""Multi-host (DCN) data-parallel initialization — VERDICT #8.

Two real OS processes, each with 2 virtual CPU devices, form a 4-device
global data mesh via ``initialize_distributed`` and run a cross-process
psum through the same ``shard_map`` spec the Trainer uses. This proves the
documented multi-host extension (parallel/mesh.py:31-46) actually
initializes and reduces across process boundaries, not just within one.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map
from waveformml_tpu.parallel.mesh import DATA_AXIS, initialize_distributed

mesh = initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

# cross-process allgather of the process ids
from jax.experimental import multihost_utils
ids = multihost_utils.process_allgather(np.array([pid], np.int32))
assert sorted(np.asarray(ids).ravel().tolist()) == [0, 1], ids

# global data-sharded array -> psum over the SAME axis spec the Trainer uses
sharding = NamedSharding(mesh, P(DATA_AXIS))
local = np.full((2, 3), float(pid + 1), np.float32)  # 2 rows per process
garr = jax.make_array_from_process_local_data(sharding, local, (4, 3))

def step(x):
    return jax.lax.psum(jnp.sum(x), DATA_AXIS)

fn = jax.jit(shard_map(step, mesh=mesh, in_specs=(P(DATA_AXIS),),
                       out_specs=P(), check_vma=False))
total = float(fn(garr))
assert total == 2 * 3 * 1 + 2 * 3 * 2, total  # both processes' rows reduced
print("DIST_OK", pid, total, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_init(tmp_path):
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err + out
        assert "DIST_OK" in out, out


TRAIN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from waveformml_tpu.parallel.mesh import DATA_AXIS, initialize_distributed, make_mesh
from _dist_train_common import make_cfg_block

mesh = initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.device_count() == 4

from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

cfg, block = make_cfg_block(rank=pid)   # this process's event half
trainer = Trainer(cfg, LitPSD(cfg), mesh=mesh, seed=0)
trainer._build_steps()
db = trainer._device_batch(block)       # local [2, ...] shard stack
gdb = trainer._to_device(db)            # -> global [4, ...] dp-sharded arrays
one = {k: jnp.asarray(v[0]) for k, v in db.items()}
variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
params = variables["params"]
batch_stats = variables.get("batch_stats")
opt_state = trainer.optimizer.init(params)
out = trainer._train_step_fn(params, batch_stats, opt_state,
                             jax.random.PRNGKey(2), gdb)
loss = float(out[3])
# losses must agree across processes (fully-replicated output)
from jax.experimental import multihost_utils
losses = np.asarray(multihost_utils.process_allgather(np.array([loss])))
assert np.allclose(losses, losses.ravel()[0]), losses
if pid == 0:
    with open(os.path.join(outdir, "loss.txt"), "w") as f:
        f.write(repr(loss))
print("TRAIN_DIST_OK", pid, loss, flush=True)
"""


def test_two_process_train_step_matches_single_process(tmp_path):
    """A REAL multi-host train step: two OS processes run the Trainer's
    compiled shard_map step over a 4-device global mesh (gradient psum over
    DCN), and the resulting loss equals the single-process 4-device run."""
    import jax

    # single-process reference on a local 4-device mesh
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_train_common import make_cfg_block

    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg, block = make_cfg_block()
    trainer = Trainer(cfg, LitPSD(cfg), mesh=make_mesh(jax.devices()[:4]),
                      seed=0)
    trainer._build_steps()
    db = trainer._device_batch(block)
    one = {k: jnp.asarray(v[0]) for k, v in db.items()}
    variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
    out = trainer._train_step_fn(
        variables["params"], variables.get("batch_stats"),
        trainer.optimizer.init(variables["params"]), jax.random.PRNGKey(2),
        {k: jnp.asarray(v) for k, v in db.items()})
    want = float(out[3])

    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", TRAIN_WORKER, str(i), str(port), str(tmp_path)],
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
        assert "TRAIN_DIST_OK" in out_s, out_s
    got = float(open(os.path.join(str(tmp_path), "loss.txt")).read())
    assert abs(got - want) < 1e-5, (got, want)


FIT_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, outdir, datadir = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from waveformml_tpu.parallel.mesh import initialize_distributed

mesh = initialize_distributed(f"localhost:{port}", 2, pid)

from waveformml_tpu.config import Config
from waveformml_tpu.datasets.data_module import PSDDataModule
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

cfg = Config({
    "run_config": {"exp_name": "mh", "run_class": "LitPSD", "imports": []},
    "system_config": {"model_name": "mh", "n_samples": 8, "n_type": 2,
                      "type_names": ["A", "B"],
                      "model_base_path": os.path.join(outdir, "model"),
                      "gpu_enabled": False, "half_precision": 0},
    "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                   "imports": [], "net_class": "SubMPSDNet",
                   "net_type": "2DConvolution",
                   "hparams": {"out_planes": 4, "n_lin": 1,
                               "conv_params": {"kernel_size": 3, "n_conv": 1,
                                               "n_point": 1, "conv_position": 1,
                                               "version": 2}}},
    "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                        "imports": [], "optimizer_class": "optim.SGD",
                        "optimizer_params": {"momentum": 0.9}},
    "dataset_config": {"mode": "path", "imports": [], "base_path": datadir,
                       "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                       "dataset_params": {}, "n_train": 40, "n_validate": 40,
                       "data_prep": "shuffle", "shuffled_size": 20,
                       "dataloader_params": {"batch_size": 1, "num_workers": 0}},
})
ckpt_dir = os.path.join(outdir, f"ckpt")
trainer = Trainer(cfg, LitPSD(cfg), mesh=mesh, checkpoint_dir=ckpt_dir, seed=0,
                  early_stopping_patience=10)
assert trainer._multihost and trainer.n_devices == 4
metrics = trainer.fit(PSDDataModule(cfg))
import math
assert math.isfinite(metrics["train_loss"]) and "val_loss" in metrics
from jax.experimental import multihost_utils
vals = np.asarray(multihost_utils.process_allgather(
    np.array([metrics["train_loss"], metrics["val_loss"]])))
assert np.allclose(vals.reshape(-1, 2), vals.reshape(-1, 2)[0], atol=1e-6), vals
if pid == 0:
    with open(os.path.join(outdir, "fit.txt"), "w") as f:
        f.write(repr(metrics["val_loss"]))
print("FIT_DIST_OK", pid, metrics["train_loss"], metrics["val_loss"], flush=True)
"""


def test_two_process_fit_end_to_end(tmp_path):
    """FULL multi-host training: two processes run Trainer.fit over the
    4-device global mesh — round-robin batch sharding, cross-process bucket
    sync, DCN gradient psum, rank-0 checkpointing — with identical metrics
    on both ranks and a checkpoint written once."""
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    datadir = str(tmp_path / "data")
    write_classification_dirs(datadir, ["A", "B"], n_files=4,
                              events_per_file=20, n_samples=8, seed=3)
    # offline shuffle prep is a single-writer step (CombineData in
    # production) — run it once before the ranks start
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D

    prep_cfg = Config({
        "system_config": {"model_name": "mh", "n_samples": 8,
                          "model_base_path": str(tmp_path / "model"),
                          "type_names": ["A", "B"]},
        "dataset_config": {"base_path": datadir, "paths": ["A", "B"],
                           "data_prep": "shuffle", "shuffled_size": 20,
                           "dataset_params": {}},
    })
    PulseDataset2D(prep_cfg, "train", 80).write_shuffled()
    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", FIT_WORKER, str(i), str(port), str(tmp_path),
         datadir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for i in range(2)]
    for p in procs:
        try:
            out_s, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err + out_s
        assert "FIT_DIST_OK" in out_s, out_s
    # rank 0 wrote the best checkpoint exactly once
    import glob
    cks = glob.glob(os.path.join(str(tmp_path), "ckpt", "*.ckpt"))
    assert cks, "no checkpoint written by rank 0"


CLI_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
pid, port, cfg_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import main
rc = main.main([cfg_path, "-t", "--max_epochs", "2", "-v", "2",
                "--distributed", "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid)])
assert rc == 0
print("CLI_DIST_OK", pid, flush=True)
"""


def test_two_process_main_cli(tmp_path):
    """The full main.py CLI under --distributed: 2 processes, rank-0 run-dir
    broadcast, fit + test, one TB run dir and one checkpoint set."""
    import glob

    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    datadir = str(tmp_path / "data")
    write_classification_dirs(datadir, ["A", "B"], n_files=4,
                              events_per_file=20, n_samples=8, seed=5)
    cfg = Config({
        "run_config": {"exp_name": "mhcli", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "mhcli", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 1,
                                   "conv_params": {"kernel_size": 3, "n_conv": 1,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "base_path": datadir,
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 40, "n_validate": 20,
                           "n_test": 20,
                           "data_prep": "shuffle", "shuffled_size": 20,
                           "dataloader_params": {"batch_size": 1,
                                                 "num_workers": 0}},
    })
    # single-writer offline shuffle prep
    prep_cfg = Config({
        "system_config": {"model_name": "mhcli", "n_samples": 8,
                          "model_base_path": str(tmp_path / "model"),
                          "type_names": ["A", "B"]},
        "dataset_config": {"base_path": datadir, "paths": ["A", "B"],
                           "data_prep": "shuffle", "shuffled_size": 20,
                           "dataset_params": {}},
    })
    PulseDataset2D(prep_cfg, "train", 80).write_shuffled()
    cfg_path = str(tmp_path / "cfg.json")
    save_config(cfg, cfg_path)

    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-u", "-c", CLI_WORKER, str(i), str(port), cfg_path],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for i in range(2)]
    for p in procs:
        try:
            out_s, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err + out_s
        assert "CLI_DIST_OK" in out_s, out_s
    run_dir = os.path.join(str(tmp_path), "model", "mhcli", "runs", "mhcli",
                           "version_0")
    assert glob.glob(os.path.join(run_dir, "*tfevents*"))
    assert glob.glob(os.path.join(run_dir, "*.ckpt"))


def test_shard_loader_pads_remainder():
    """len(loader) % P trailing batches must NOT be dropped: the round-robin
    sharding pads by wrapping to the head (torch DistributedSampler
    semantics), every rank yields ceil(len/P) batches, and the union of all
    ranks covers every batch."""
    from waveformml_tpu.engineering.trainer import shard_loader_round_robin

    # (1,3)/(2,5)/(1,8) exercise pad > len(loader): the wraparound head must
    # CYCLE (a single replay runs dry and trailing ranks hang in lockstep)
    for total, P in ((7, 2), (8, 3), (5, 4), (4, 4), (1, 2),
                     (1, 3), (2, 5), (1, 8), (3, 8)):
        loader = list(range(total))
        per_rank = [list(shard_loader_round_robin(loader, P, p))
                    for p in range(P)]
        want_len = -(-total // P)
        for p, got in enumerate(per_rank):
            assert len(got) == want_len, (total, P, p, got)
            assert len(shard_loader_round_robin(loader, P, p)) == want_len
        seen = set()
        for got in per_rank:
            seen.update(got)
        assert seen == set(range(total)), (total, P, per_rank)
        # lockstep: at step t the ranks consume P distinct padded slots
        reps = -(-(want_len * P) // total)
        padded = (loader * reps)[:want_len * P]
        for t in range(want_len):
            slot = {per_rank[p][t] for p in range(P)}
            assert slot == {padded[t * P + p] for p in range(P)}


GRAPH_TRAIN_WORKER = r"""
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

mesh = initialize_distributed(f"localhost:{port}", 2, pid)
from _dist_train_common import make_graph_cfg_block
from waveformml_tpu.engineering.tasks import LitPSD
from waveformml_tpu.engineering.trainer import Trainer

cfg, block = make_graph_cfg_block(rank=pid)  # rank 0 sparse, rank 1 dense
trainer = Trainer(cfg, LitPSD(cfg), mesh=mesh, seed=0)
trainer._build_steps()
db = trainer._device_batch(block)  # includes cross-process edge-cap agreement
gdb = trainer._to_device(db)
one = {k: jnp.asarray(v[0]) for k, v in db.items()}
variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
out = trainer._train_step_fn(variables["params"], variables.get("batch_stats"),
                             trainer.optimizer.init(variables["params"]),
                             jax.random.PRNGKey(2), gdb)
loss = float(out[3])
from jax.experimental import multihost_utils
losses = np.asarray(multihost_utils.process_allgather(np.array([loss])))
assert np.allclose(losses, losses.ravel()[0]), losses
if pid == 0:
    with open(os.path.join(outdir, "graph_loss.txt"), "w") as f:
        f.write(repr(loss))
print("GRAPH_DIST_OK", pid, loss, flush=True)
"""


def test_two_process_graph_step_matches_single_process(tmp_path):
    """Graph model across hosts with ASYMMETRIC per-rank edge caps (rank 0's
    events are sparse, rank 1's dense): the caps must be agreed globally
    before stitching, and the loss must match the single-process 4-device
    run — both with live-built edges and with GraphDataset-style cached
    edges (which split_block_for_devices must remap, not row-mask)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_train_common import make_graph_cfg_block

    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    def single_loss(cached_edges):
        cfg, block = make_graph_cfg_block(cached_edges=cached_edges)
        trainer = Trainer(cfg, LitPSD(cfg), mesh=make_mesh(jax.devices()[:4]),
                          seed=0)
        trainer._build_steps()
        db = trainer._device_batch(block)
        one = {k: jnp.asarray(v[0]) for k, v in db.items()}
        variables = trainer.task.init_variables(jax.random.PRNGKey(1), one)
        out = trainer._train_step_fn(
            variables["params"], variables.get("batch_stats"),
            trainer.optimizer.init(variables["params"]), jax.random.PRNGKey(2),
            {k: jnp.asarray(v) for k, v in db.items()})
        return float(out[3])

    want = single_loss(cached_edges=False)
    got_cached = single_loss(cached_edges=True)
    assert abs(got_cached - want) < 1e-5, (got_cached, want)

    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": REPO + ":" + os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", GRAPH_TRAIN_WORKER, str(i), str(port),
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
        assert "GRAPH_DIST_OK" in out_s, out_s
    got = float(open(os.path.join(str(tmp_path), "graph_loss.txt")).read())
    assert abs(got - want) < 1e-5, (got, want)
