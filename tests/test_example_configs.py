"""Every shipped example config must validate and build an initializable
model (the examples are the public API surface users copy from)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.config import load_config, validate_config
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse
from waveformml_tpu.registry import retrieve_class

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = [p for p in
            sorted(glob.glob(os.path.join(REPO, "config", "examples", "*.json")))
            # WFParams.json is a GenWFParamConfig sweep input, not a train config
            if os.path.basename(p) != "WFParams.json"]


def _sparse_batch(rng, cfg, n_events=3):
    n3d = getattr(cfg.net_config, "net_type", "") == "3DConvolution"
    n_samples = cfg.system_config.n_samples
    rows, feats = [], []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=2, replace=False):
            if n3d:
                for t in range(0, n_samples, 3):
                    rows.append([s % NX, s // NX, t, e])
                    feats.append(rng.normal(size=2))
            else:
                rows.append([s % NX, s // NX, e])
                feats.append(rng.normal(size=2 * n_samples))
    coords = np.asarray(rows, np.int32)
    f = np.asarray(feats, np.float32)
    c, f, m = pad_sparse(coords, f, 256)
    return SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_config_builds(path, rng):
    cfg = load_config(path)
    validate_config(cfg)
    run_class = retrieve_class(cfg.run_config.run_class)
    assert run_class is not None

    net_type = getattr(cfg.net_config, "net_type", "")
    task = run_class(cfg)
    model = task.model
    assert model is not None

    if net_type in ("2DConvolution", "3DConvolution"):
        b = _sparse_batch(rng, cfg)
        variables = model.init(jax.random.PRNGKey(0), b)
        out = model.apply(variables, b)
        assert bool(jnp.isfinite(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0])).all())
    elif net_type in ("TemporalConvolution", "Recurrent", "RNN", "Linear",
                      "1DConvolution"):
        x = jnp.asarray(rng.normal(size=(4, cfg.system_config.n_samples))
                        .astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert bool(jnp.isfinite(out).all())
    elif net_type == "Graph":
        pass  # graph models need edge inputs; construction above suffices
