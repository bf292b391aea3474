import numpy as np
import pytest

from waveformml_tpu.ops.graph import (
    _knn_numpy, _window_edges_numpy, cartesian_edge_attr, knn_graph, pad_edges,
    window_edges)


def _edge_set(edges):
    return set(map(tuple, edges.T.tolist()))


def test_window_edges_matches_numpy_fallback(rng):
    # without the native lib, window_edges IS the numpy fallback and this
    # comparison is f(x) == f(x) — fail loudly instead of reporting
    # C-kernel parity that never ran
    from waveformml_tpu.ops import graph as graph_mod

    assert graph_mod._get_lib() is not None, \
        "native window_edges kernel failed to build; parity test is vacuous"
    n = 200
    x = rng.integers(0, 14, n).astype(np.int64)
    y = rng.integers(0, 11, n).astype(np.int64)
    b = np.sort(rng.integers(0, 40, n)).astype(np.int64)
    coo = np.stack([x, y], axis=1)
    fast = window_edges(coo, b, max_dist=1, self_loops=True)
    slow = _window_edges_numpy(x, y, b, 2, True)
    assert _edge_set(fast) == _edge_set(slow)
    assert fast.shape == slow.shape


def test_window_edges_semantics():
    # two rows adjacent within one event, one far row, one other-event row
    coo = np.array([[1, 1], [2, 2], [9, 9], [1, 1]])
    b = np.array([0, 0, 0, 1])
    edges = window_edges(coo, b, max_dist=1, self_loops=False)
    es = _edge_set(edges)
    assert (0, 1) in es and (1, 0) in es
    assert not any(2 in e for e in es)           # far row isolated
    assert not any(3 in e for e in es)           # other event isolated
    edges_sl = window_edges(coo, b, max_dist=1, self_loops=True)
    assert (3, 3) in _edge_set(edges_sl)


def test_knn_graph_matches_numpy(rng):
    from waveformml_tpu.ops import graph as graph_mod

    assert graph_mod._get_lib() is not None, \
        "native kNN kernel failed to build; parity test is vacuous"
    n = 80
    pos = rng.random((n, 2)) * 10
    b = np.sort(rng.integers(0, 8, n)).astype(np.int64)
    fast = knn_graph(pos, 3, b)
    slow = _knn_numpy(np.ascontiguousarray(pos[:, 0]),
                      np.ascontiguousarray(pos[:, 1]), b, 3, False)
    assert _edge_set(fast) == _edge_set(slow)


def test_knn_graph_small_events():
    pos = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([0, 0])
    edges = knn_graph(pos, 6, b)  # k > available neighbors
    assert _edge_set(edges) == {(1, 0), (0, 1)}


def test_pad_edges():
    edges = np.array([[0, 1], [1, 0]])
    padded, mask = pad_edges(edges, 8)
    assert padded.shape == (2, 8)
    assert mask.sum() == 2
    assert not mask[2:].any()


def test_cartesian_edge_attr():
    pos = np.array([[0.0, 0.0], [1.0, 2.0]])
    edges = np.array([[0], [1]])
    attr = cartesian_edge_attr(pos, edges, norm=False)
    np.testing.assert_allclose(attr, [[1.0, 2.0]])
    attr_n = cartesian_edge_attr(pos, edges, norm=True, max_value=2.0)
    np.testing.assert_allclose(attr_n, [[0.75, 1.0]])


def test_local_cartesian_per_target_node_scaling():
    """PyG LocalCartesian scales each edge by the max |rel| over its TARGET
    node's incoming edges (scalar per node), not a batch-global max."""
    pos = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 1.0], [0.5, 1.0]])
    # node 1 has a far neighbor (|rel|=4); node 3 a near one (|rel|=0.5)
    edges = np.array([[0, 2], [1, 3]])
    attr = cartesian_edge_attr(pos, edges, local=True)
    # edge 0 -> node 1: rel (4, 0), node-1 max 4 -> (4/8+0.5, 0+0.5)
    np.testing.assert_allclose(attr[0], [1.0, 0.5])
    # edge 2 -> node 3: rel (0.5, 0), node-3 max 0.5 -> (0.5/1+0.5, 0.5)
    np.testing.assert_allclose(attr[1], [1.0, 0.5])
    # global scaling would have squashed the near edge to (0.5625, 0.5)


def test_window_edges_falls_back_when_source_missing(rng, monkeypatch):
    # a pip-installed package may not ship csrc/ — the documented numpy
    # fallback must engage instead of crashing on FileNotFoundError
    from waveformml_tpu.ops import graph as graph_mod

    monkeypatch.setattr(graph_mod, "_SRC", "/nonexistent/window_edges.cpp")
    monkeypatch.setattr(graph_mod, "_LIB", None)
    monkeypatch.setattr(graph_mod, "_LIB_FAILED", False)
    n = 40
    x = rng.integers(0, 14, n).astype(np.int64)
    y = rng.integers(0, 11, n).astype(np.int64)
    b = np.sort(rng.integers(0, 8, n)).astype(np.int64)
    edges = graph_mod.window_edges(np.stack([x, y], axis=1), b)
    assert graph_mod._LIB_FAILED and graph_mod._LIB is None
    want = _window_edges_numpy(x, y, b, 2, True)
    assert _edge_set(edges) == _edge_set(want)
