import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.config import Config
from waveformml_tpu.detector import NX, NY

N_SAMPLES = 8


def _graph_inputs(rng, n_nodes=12, n_feat=6, n_events=3):
    x = jnp.asarray(rng.normal(size=(n_nodes, n_feat)).astype(np.float32))
    edges = []
    for i in range(n_nodes):
        edges.append((i, (i + 1) % n_nodes))
        edges.append(((i + 1) % n_nodes, i))
    edges = jnp.asarray(np.array(edges).T)
    edge_mask = jnp.ones(edges.shape[1], dtype=bool)
    edge_attr = jnp.asarray(rng.random((edges.shape[1], 2)).astype(np.float32))
    return x, edges, edge_mask, edge_attr


@pytest.mark.parametrize("index", list(range(18)))
def test_all_graph_conv_types_forward(rng, index):
    from waveformml_tpu.models.graph_net import _make_conv

    x, edges, edge_mask, edge_attr = _graph_inputs(rng)
    layer = _make_conv(index, 6, 4, {}, kernel=3)
    variables = layer.init(jax.random.PRNGKey(0), x, edges, edge_mask,
                           edge_attr=edge_attr)
    out = layer.apply(variables, x, edges, edge_mask, edge_attr=edge_attr)
    assert out.shape == (12, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_masked_edges_do_not_contribute(rng):
    """Padded edges must not change aggregation results."""
    from waveformml_tpu.models.graph_net import _make_conv

    x, edges, edge_mask, _ = _graph_inputs(rng)
    layer = _make_conv(0, 6, 4, {})
    variables = layer.init(jax.random.PRNGKey(0), x, edges, edge_mask)
    out1 = layer.apply(variables, x, edges, edge_mask)
    # append junk edges with mask False
    junk = jnp.array([[0, 0, 0], [5, 7, 9]])
    edges2 = jnp.concatenate([edges, junk], axis=1)
    mask2 = jnp.concatenate([edge_mask, jnp.zeros(3, bool)])
    out2 = layer.apply(variables, x, edges2, mask2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def _graph_cfg(tmp_path, graph_index=0, net_class="GraphNet"):
    return Config({
        "run_config": {"exp_name": "g", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "g", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": net_class,
                       "net_type": "graph",
                       "hparams": {"n_graph": 2, "n_lin": 2, "graph_out": 8,
                                   "k": 4, "graph_class_index": graph_index}},
        "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9, "nesterov": True}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "data_prep": "shuffle", "shuffled_size": 20,
                           "dataset_params": {}, "dataloader_params": {"batch_size": 1},
                           "n_train": 40, "n_validate": 20, "n_test": 20},
    })


def test_graphnet_trains_end_to_end(rng, tmp_path):
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=4,
                              events_per_file=20, n_samples=N_SAMPLES, seed=21)
    cfg = _graph_cfg(tmp_path)
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, seed=0)
    dm = PSDDataModule(cfg)
    metrics = trainer.fit(dm)
    assert np.isfinite(metrics["train_loss"])
    assert "val_accuracy" in metrics


def test_graphznet_in_litz(rng, tmp_path):
    """Graph per-segment Z model through the LitZ segment-loss path."""
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = Config({
        "run_config": {"exp_name": "gz", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "gz", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_class": "GraphZNet", "net_type": "graph",
                       "algorithm": "conv",
                       "hparams": {"neighbors": 1, "n_conv": 1, "n_point": 1,
                                   "conv_position": 1, "graph_index": 0}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2DWithZ",
                           "dataset_params": {}, "n_train": 4, "n_validate": 2},
    })
    task = LitZ(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:2]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1], [6, 6, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((4, 2 * N_SAMPLES)), dtype=np.float32)
    labels = np.asarray(rng.random(4), dtype=np.float32)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    srng = jax.random.PRNGKey(0)
    (trainer.state.params, trainer.state.batch_stats, trainer.state.opt_state,
     loss, _) = trainer._train_step_fn(trainer.state.params,
                                       trainer.state.batch_stats,
                                       trainer.state.opt_state, srng, db)
    assert np.isfinite(float(loss))


def test_pointnet_forward(rng, tmp_path):
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh
    import jax as _jax

    cfg = _graph_cfg(tmp_path, net_class="PointNet")
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(_jax.devices()[:1]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((3, 2 * N_SAMPLES)), dtype=np.float32)
    labels = np.array([0, 1], dtype=np.int64)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    srng = _jax.random.PRNGKey(0)
    out = trainer._train_step_fn(trainer.state.params, trainer.state.batch_stats,
                                 trainer.state.opt_state, srng, db)
    assert np.isfinite(float(out[3]))


def test_graph3dnet_forward(rng, tmp_path):
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh
    import jax as _jax

    cfg = _graph_cfg(tmp_path, net_class="Graph3DNet")
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(_jax.devices()[:1]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((3, 2 * N_SAMPLES)), dtype=np.float32)
    labels = np.array([0, 1], dtype=np.int64)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    out = trainer._train_step_fn(trainer.state.params, trainer.state.batch_stats,
                                 trainer.state.opt_state, _jax.random.PRNGKey(0), db)
    assert np.isfinite(float(out[3]))


def test_dynamic_conv_variants_forward(rng):
    """DynamicEdgeConv / DynamicGraphConv (ref: GraphNet.py:24-41) — the
    in-forward kNN-rebuild wrappers around EdgeConv / GCNConv. The graph is
    rebuilt from the second argument on device (feature_knn)."""
    from waveformml_tpu.models.graph_net import DynamicEdgeConv, DynamicGraphConv

    x, _edges, _edge_mask, _ = _graph_inputs(rng)
    batch = jnp.asarray(np.repeat(np.arange(3), 4).astype(np.int32))
    node_mask = jnp.ones(12, bool)
    for cls in (DynamicEdgeConv, DynamicGraphConv):
        layer = cls(in_channels=6, out_channels=4, k=2)
        variables = layer.init(jax.random.PRNGKey(0), x, x, batch, node_mask)
        out = layer.apply(variables, x, x, batch, node_mask)
        assert out.shape == (12, 4)
        assert np.isfinite(np.asarray(out)).all()


def test_feature_knn_masks_and_tiebreak():
    """feature_knn: self/cross-event/masked pairs excluded; deficit centers
    get masked tail slots; exact ties prefer the lower row index (the
    documented tie-break the torch mirrors share)."""
    from waveformml_tpu.models.graph_layers import feature_knn

    x = np.array([[0.0], [1.0], [1.0], [5.0],    # event 0 (row 3 masked)
                  [0.0], [2.0]], np.float32)     # event 1 (one neighbor each)
    batch = jnp.asarray(np.array([0, 0, 0, 0, 1, 1], np.int32))
    mask = jnp.asarray(np.array([1, 1, 1, 0, 1, 1], bool))
    edges, em = feature_knn(jnp.asarray(x), batch, mask, k=2)
    edges, em = np.asarray(edges), np.asarray(em)
    nb = {i: [int(s) for s, d, m in zip(edges[0], edges[1], em)
              if d == i and m] for i in range(6)}
    # row 0: rows 1 and 2 are equidistant (d²=1) — lower index first
    assert nb[0] == [1, 2]
    # rows 1, 2: nearest is the OTHER tied row (d²=0), then row 0; row 3
    # (masked) never appears
    assert nb[1] == [2, 0] and nb[2] == [1, 0]
    assert nb[3] == []                      # masked center: all slots dead
    assert nb[4] == [5] and nb[5] == [4]    # k=2 but only 1 valid neighbor


def test_make_conv_transformer_params_propagate():
    """graph_params must reach TransformerConv (index 5) — heads was
    silently dropped before."""
    from waveformml_tpu.models.graph_net import _make_conv

    c = _make_conv(5, 4, 8, {"heads": 4})
    assert c.heads == 4 and c.edge_dim == 2


def test_graphnet_multi_head_attention_builds_and_runs(rng, tmp_path):
    """graph_params heads>1: attention convs output heads*C (PyG
    concat=True); the norm widths, next-layer inputs, and the pooled linear
    head must all follow (the reference's nn_input_modifier corrects only
    SuperGAT; this generalizes it)."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=2,
                              events_per_file=20, n_samples=N_SAMPLES, seed=5)
    cfg = _graph_cfg(tmp_path, graph_index=3)  # GATConv
    cfg.net_config.hparams["graph_params"] = {"heads": 2}
    task = LitPSD(cfg)
    dm = PSDDataModule(cfg)
    dm.setup("fit")
    block = next(iter(dm.train_dataloader()))
    rb, eb = task.row_bucket(block), task.event_bucket(block)
    db = {k: jnp.asarray(v)
          for k, v in task.prepare_block(block, rb, eb).items()}
    variables = task.model.init(jax.random.PRNGKey(0), db)
    out = task.model.apply(variables, db)
    assert out.shape == (eb, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_self_loops_not_doubled():
    """An input graph that ALREADY contains (i, i) edges must produce the
    same GCN output as one without them: the layer masks pre-existing loops
    before appending its own (PyG add_remaining_self_loops semantics — a
    naive append computes A + 2I)."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.models.graph_layers import GCNConv

    x = np.array([[1.0, 2.0], [3.0, -1.0], [0.5, 0.5]], np.float32)
    plain = np.array([[0, 1, 1, 2], [1, 0, 2, 1]], np.int32)
    with_loops = np.concatenate(
        [plain, np.array([[0, 1, 2], [0, 1, 2]], np.int32)], axis=1)
    layer = GCNConv(2, 2)
    v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(plain),
                   jnp.ones(plain.shape[1], bool))
    a = layer.apply(v, jnp.asarray(x), jnp.asarray(plain),
                    jnp.ones(plain.shape[1], bool))
    b = layer.apply(v, jnp.asarray(x), jnp.asarray(with_loops),
                    jnp.ones(with_loops.shape[1], bool))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_graphznet_accepts_out_planes_hparam(tmp_path):
    # out_planes is a declared GraphZ field passed explicitly by the wrapper;
    # a config that also sets it must not raise a duplicate-kwarg TypeError
    cfg = _graph_cfg(tmp_path, net_class="GraphZNet")
    cfg.net_config.hparams = Config({"neighbors": 1, "n_conv": 1, "n_point": 1,
                                     "conv_position": 1, "graph_index": 0,
                                     "out_planes": 1})
    from waveformml_tpu.models.graph_net import GraphZNet

    reqs = GraphZNet(cfg).edge_requirements()
    assert len(reqs) == 2


def test_graph3dnet_consumes_trailing_samples(rng, tmp_path):
    """2S not divisible by n_windows: the tail samples must still enter the
    model (the reference makes one 3D point per sample, GraphNet.py:572-577,
    so a truncating window split would silently lose signal)."""
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = _graph_cfg(tmp_path, net_class="Graph3DNet")
    cfg.system_config.n_samples = 9          # 2S = 18, n_windows = 8
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((3, 18)), dtype=np.float32)
    labels = np.array([0, 1], dtype=np.int64)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}

    def loss_for(f):
        d = dict(db)
        d["feats"] = jnp.asarray(f)
        # the step donates params/opt_state buffers — copy per call so both
        # evaluations see identical weights
        out = trainer._train_step_fn(
            jax.tree.map(jnp.copy, trainer.state.params),
            trainer.state.batch_stats,
            jax.tree.map(jnp.copy, trainer.state.opt_state),
            jax.random.PRNGKey(0), d)
        return float(out[3])

    base = loss_for(db["feats"])
    assert np.isfinite(base)
    # perturb ONLY the trailing two samples (beyond the old floor-div cut of
    # 8 * (18 // 8) = 16): the loss must respond
    bumped = np.asarray(db["feats"]).copy()
    bumped[..., 16:] += 3.0
    assert loss_for(bumped) != base
