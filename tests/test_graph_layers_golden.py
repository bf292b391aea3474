"""Golden-value tests for the graph convolutions the reference's configs
select (ref: src/models/GraphNet.py:279-315 conv-index table;
config/examples/IoniClassifierGraph.json).

Each test pins every parameter to deterministic values, computes the expected
output with an INDEPENDENT numpy oracle implementing the torch_geometric
formula exactly as documented (formula cited per test), and asserts the flax
layer matches to 1e-5. A masked junk edge is always present so the padded-
edge path is covered by the golden values too.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# -- fixed 4-node graph --------------------------------------------------------------
# directed edges (source -> target); includes an asymmetric edge (0 -> 2) and
# node degrees 1..3 so normalizations are non-trivial
EDGES = np.array([[0, 1, 1, 2, 2, 3, 0],
                  [1, 0, 2, 1, 3, 2, 2]], dtype=np.int32)
N = 4
F_IN, F_OUT = 3, 2

X = np.array([[0.5, -1.0, 2.0],
              [1.5, 0.25, -0.5],
              [-2.0, 1.0, 0.75],
              [0.1, -0.3, 1.2]], dtype=np.float32)
EDGE_ATTR = np.array([[0.2, -0.1], [0.9, 0.4], [-0.3, 0.7], [0.5, 0.5],
                      [-0.8, 0.1], [0.0, -0.6], [0.25, 0.35]], dtype=np.float32)


def _with_junk(edges, attr=None):
    """Append one masked (padding) edge that must not affect results."""
    e = np.concatenate([edges, np.array([[3], [0]], np.int32)], axis=1)
    mask = np.concatenate([np.ones(edges.shape[1], bool), [False]])
    a = None if attr is None else np.concatenate(
        [attr, np.full((1, attr.shape[1]), 99.0, np.float32)])
    return e, mask, a


def _pin(variables, seed=11):
    """Replace every param leaf with deterministic uniform(-1, 1) values."""
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    pinned = [jnp.asarray(rng.uniform(-1, 1, np.shape(v)).astype(np.float32))
              for v in leaves]
    return jax.tree_util.tree_unflatten(treedef, pinned)


def _apply(layer, variables, x, edges, mask, attr=None):
    out = layer.apply(variables, jnp.asarray(x), jnp.asarray(edges),
                      jnp.asarray(mask),
                      edge_attr=None if attr is None else jnp.asarray(attr))
    return np.asarray(out)


def _incoming(i, edges):
    return [int(edges[0, k]) for k in range(edges.shape[1])
            if int(edges[1, k]) == i]


def test_gcn_golden():
    """PyG GCNConv docs: X' = D̂^{-1/2} Â D̂^{-1/2} X Θ + b with Â = A + I
    (add_self_loops=True default) and D̂_ii = 1 + Σ_j A_ij."""
    from waveformml_tpu.models.graph_layers import GCNConv

    layer = GCNConv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["lin"]["kernel"])
    b = np.asarray(v["params"]["bias"])

    h = X @ W
    # self-loops appended, all weights 1
    src = list(EDGES[0]) + list(range(N))
    dst = list(EDGES[1]) + list(range(N))
    deg = np.zeros(N)
    for s, d in zip(src, dst):
        deg[d] += 1.0
    expect = np.zeros((N, F_OUT))
    for s, d in zip(src, dst):
        expect[d] += h[s] / np.sqrt(deg[s] * deg[d])
    expect += b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_sage_golden():
    """PyG SAGEConv docs: x'_i = W_2 x_i + W_1 · mean_{j∈N(i)} x_j (aggr
    'mean'; lin_l carries the bias, the root lin_r has bias=False)."""
    from waveformml_tpu.models.graph_layers import SAGEConv

    layer = SAGEConv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    Wl = np.asarray(v["params"]["lin_l"]["kernel"])
    bl = np.asarray(v["params"]["lin_l"]["bias"])
    Wr = np.asarray(v["params"]["lin_r"]["kernel"])

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES)
        agg = np.mean(X[nbrs], axis=0) if nbrs else np.zeros(F_IN)
        expect[i] = agg @ Wl + bl + X[i] @ Wr

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_gat_golden():
    """PyG GATConv docs (heads=1): self-loops added by default;
    α_ij = softmax over j ∈ N(i) ∪ {i} of LeakyReLU(a_s^T Θx_j + a_d^T Θx_i)
    with negative_slope 0.2; x'_i = Σ_j α_ij Θ x_j + b."""
    from waveformml_tpu.models.graph_layers import GATConv

    layer = GATConv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["lin"]["kernel"])
    a_src = np.asarray(v["params"]["att_src"])[0]
    a_dst = np.asarray(v["params"]["att_dst"])[0]
    b = np.asarray(v["params"]["bias"])

    h = X @ W

    def lrelu(z):
        return np.where(z >= 0, z, 0.2 * z)

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        js = _incoming(i, EDGES) + [i]  # + self-loop
        logits = np.array([lrelu(h[j] @ a_src + h[i] @ a_dst) for j in js])
        alpha = np.exp(logits - logits.max())
        alpha /= alpha.sum()
        expect[i] = sum(a * h[j] for a, j in zip(alpha, js)) + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_gmm_golden():
    """PyG GMMConv docs: x'_i = mean_{j∈N(i)} Σ_k w_k(e_ij) ⊙ (Θ_k x_j)
    with w_k(e) = exp(-0.5 Σ_d (e_d − μ_kd)²/σ_kd²), plus W_root x_i + b
    (root_weight=True, bias=True, aggr='mean')."""
    from waveformml_tpu.models.graph_layers import GMMConv

    K, D = 3, 2
    layer = GMMConv(F_IN, F_OUT, dim=D, kernel_size=K)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    mu = np.asarray(v["params"]["mu"])          # [K, D]
    sigma = np.asarray(v["params"]["sigma"])    # [K, D]
    G = np.asarray(v["params"]["g"]["kernel"]).reshape(F_IN, K, F_OUT)
    Wroot = np.asarray(v["params"]["root"]["kernel"])
    b = np.asarray(v["params"]["bias"])

    def w(eattr):  # [K]
        return np.exp(-0.5 * (((eattr[None] - mu) / np.abs(sigma)) ** 2).sum(-1))

    msgs = {i: [] for i in range(N)}
    for k in range(EDGES.shape[1]):
        s, d = int(EDGES[0, k]), int(EDGES[1, k])
        hk = np.einsum("f,fkc->kc", X[s], G)          # [K, C]
        msgs[d].append((w(EDGE_ATTR[k])[:, None] * hk).sum(0))
    expect = np.zeros((N, F_OUT))
    for i in range(N):
        agg = np.mean(msgs[i], axis=0) if msgs[i] else np.zeros(F_OUT)
        expect[i] = agg + X[i] @ Wroot + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_gen_golden():
    """GENConv (DeeperGCN, arXiv:2006.07739 eqs. 4-7, PyG GENConv defaults):
    messages m_ji = ReLU(h_j + e_ji) + ε (ε=1e-7), SoftMax aggregation
    agg_i = Σ_j softmax_j(β·m_ji) ⊙ m_ji per channel (β=1), update
    x'_i = MLP(h_i + agg_i) with a 2-layer MLP (C → 2C → C, ReLU)."""
    from waveformml_tpu.models.graph_layers import GENConv

    layer = GENConv(F_IN, F_OUT)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    p = v["params"]
    Win, bin_ = np.asarray(p["lin_in"]["kernel"]), np.asarray(p["lin_in"]["bias"])
    We, be = np.asarray(p["edge_proj"]["kernel"]), np.asarray(p["edge_proj"]["bias"])
    W1, b1 = np.asarray(p["mlp1"]["kernel"]), np.asarray(p["mlp1"]["bias"])
    W2, b2 = np.asarray(p["mlp2"]["kernel"]), np.asarray(p["mlp2"]["bias"])

    h = X @ Win + bin_
    msgs = {i: [] for i in range(N)}
    for k in range(EDGES.shape[1]):
        s, d = int(EDGES[0, k]), int(EDGES[1, k])
        m = np.maximum(h[s] + (EDGE_ATTR[k] @ We + be), 0) + 1e-7
        msgs[d].append(m)
    expect = np.zeros((N, F_OUT))
    for i in range(N):
        if msgs[i]:
            m = np.stack(msgs[i])                       # [deg, C]
            alpha = np.exp(m - m.max(0))                # per-channel softmax
            alpha /= alpha.sum(0)
            agg = (alpha * m).sum(0)
        else:
            agg = np.zeros(F_OUT)
        z = h[i] + agg
        expect[i] = np.maximum(z @ W1 + b1, 0) @ W2 + b2

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_edgeconv_golden():
    """PyG EdgeConv docs (DGCNN): x'_i = max_{j∈N(i)} h_Θ(x_i ‖ x_j − x_i),
    aggr='max'."""
    from waveformml_tpu.models.graph_layers import EdgeConv

    class _Lin(nn.Module):
        feat: int

        @nn.compact
        def __call__(self, z, train=False):
            return nn.Dense(self.feat, name="d")(z)

    layer = EdgeConv(net=_Lin(F_OUT))
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    leaves = jax.tree_util.tree_leaves_with_path(v)
    W = b = None
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        if name.endswith("['kernel']"):
            W = np.asarray(leaf)
        elif name.endswith("['bias']"):
            b = np.asarray(leaf)
    assert W is not None and b is not None

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES)
        if not nbrs:
            continue
        msgs = [np.concatenate([X[i], X[j] - X[i]]) @ W + b for j in nbrs]
        expect[i] = np.max(msgs, axis=0)

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_sgconv_golden():
    """PyG SGConv docs: X' = (D̂^{-1/2} Â D̂^{-1/2})^K X Θ with Â = A + I
    (add_self_loops default), K=1 default; Θ carries the bias."""
    from waveformml_tpu.models.graph_layers import SGConv

    layer = SGConv(F_IN, F_OUT, K=2)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["lin"]["kernel"])
    b = np.asarray(v["params"]["lin"]["bias"])

    src = list(EDGES[0]) + list(range(N))
    dst = list(EDGES[1]) + list(range(N))
    A = np.zeros((N, N))
    for s, d in zip(src, dst):
        A[d, s] += 1.0
    deg = A.sum(1)
    norm = A / np.sqrt(deg[:, None] * deg[None, :])
    expect = (norm @ (norm @ X)) @ W + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


# -- round-3 extension: golden tests for the REMAINING conv indices ------------------
# (ref: src/models/GraphNet.py:279-315 — indices 2,4,5,6,7,8,11,13,14,15,17
# plus GINE; every selectable conv type now has a pinned-value oracle)


def _leaky(v, slope=0.2):
    return np.where(v > 0, v, slope * v)


def test_graphconv_golden():
    """PyG GraphConv docs: x'_i = W1 x_i + W2 Σ_{j∈N(i)} e_ji · x_j
    (aggr='add'; lin_rel carries the bias, lin_root is bias-free)."""
    from waveformml_tpu.models.graph_layers import GraphConv

    layer = GraphConv(F_IN, F_OUT)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    Wrel = np.asarray(v["params"]["lin_rel"]["kernel"])
    brel = np.asarray(v["params"]["lin_rel"]["bias"])
    Wroot = np.asarray(v["params"]["lin_root"]["kernel"])

    w = EDGE_ATTR[:, 0]
    expect = np.zeros((N, F_OUT))
    for i in range(N):
        agg = np.zeros(F_IN)
        for k in range(EDGES.shape[1]):
            if int(EDGES[1, k]) == i:
                agg += w[k] * X[int(EDGES[0, k])]
        expect[i] = agg @ Wrel + brel + X[i] @ Wroot

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_gatv2_golden():
    """PyG GATv2Conv docs (heads=1): self-loops by default,
    α_ij = softmax_j a·LeakyReLU(W_l x_j + W_r x_i),
    x'_i = Σ_{j∈N(i)∪{i}} α_ij W_l x_j + b; unlike GAT, the linears carry
    biases and the attention vector is applied AFTER the nonlinearity."""
    from waveformml_tpu.models.graph_layers import GATv2Conv

    layer = GATv2Conv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    Wl = np.asarray(v["params"]["lin_l"]["kernel"])
    bl = np.asarray(v["params"]["lin_l"]["bias"])
    Wr = np.asarray(v["params"]["lin_r"]["kernel"])
    br = np.asarray(v["params"]["lin_r"]["bias"])
    att = np.asarray(v["params"]["att"]).reshape(F_OUT)
    bias = np.asarray(v["params"]["bias"])

    hl = X @ Wl + bl
    hr = X @ Wr + br
    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES) + [i]  # self-loop
        logits = np.array([_leaky(hl[j] + hr[i]) @ att for j in nbrs])
        alpha = np.exp(logits - logits.max())
        alpha /= alpha.sum()
        expect[i] = sum(a * hl[j] for a, j in zip(alpha, nbrs)) + bias

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_transformer_golden():
    """PyG TransformerConv docs (heads=1): α_ij = softmax_j
    (W_q x_i)·(W_k x_j + W_e e_ij)/√d, x'_i = W_skip x_i +
    Σ_j α_ij (W_v x_j + W_e e_ij) (root_weight=True default; edge
    projection added to BOTH key and value)."""
    from waveformml_tpu.models.graph_layers import TransformerConv

    layer = TransformerConv(F_IN, F_OUT, edge_dim=2)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    P = v["params"]
    q = X @ np.asarray(P["q"]["kernel"]) + np.asarray(P["q"]["bias"])
    k = X @ np.asarray(P["k"]["kernel"]) + np.asarray(P["k"]["bias"])
    val = X @ np.asarray(P["v"]["kernel"]) + np.asarray(P["v"]["bias"])
    eproj = EDGE_ATTR @ np.asarray(P["edge"]["kernel"]) + \
        np.asarray(P["edge"]["bias"])
    skip = X @ np.asarray(P["skip"]["kernel"]) + np.asarray(P["skip"]["bias"])

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        eids = [kk for kk in range(EDGES.shape[1]) if int(EDGES[1, kk]) == i]
        if not eids:
            expect[i] = skip[i]
            continue
        logits = np.array([q[i] @ (k[int(EDGES[0, kk])] + eproj[kk])
                           for kk in eids]) / np.sqrt(F_OUT)
        alpha = np.exp(logits - logits.max())
        alpha /= alpha.sum()
        expect[i] = skip[i] + sum(
            a * (val[int(EDGES[0, kk])] + eproj[kk])
            for a, kk in zip(alpha, eids))

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_tag_golden():
    """PyG TAGConv docs: X' = Σ_{k=0}^K (D^{-1/2} A D^{-1/2})^k X Θ_k + b
    (gcn_norm WITHOUT self-loops — the k=0 term is the identity; bias-free
    per-hop linears plus one shared bias)."""
    from waveformml_tpu.models.graph_layers import TAGConv

    layer = TAGConv(F_IN, F_OUT, K=2)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    P = v["params"]

    A = np.zeros((N, N))
    for s, d in zip(EDGES[0], EDGES[1]):
        A[int(d), int(s)] += 1.0
    deg = A.sum(1)  # in-degree, the impl's segment_sum over targets
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    norm = A * dinv[:, None] * dinv[None, :]
    expect = X @ np.asarray(P["lin_0"]["kernel"])
    h = X
    for kk in (1, 2):
        h = norm @ h
        expect = expect + h @ np.asarray(P[f"lin_{kk}"]["kernel"])
    expect = expect + np.asarray(P["bias"])

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


class _Lin2(nn.Module):
    feat: int

    @nn.compact
    def __call__(self, z, train=False):
        return nn.Dense(self.feat, name="d")(z)


def test_gin_golden():
    """PyG GINConv docs: x'_i = h_Θ((1 + ε) x_i + Σ_{j∈N(i)} x_j)."""
    from waveformml_tpu.models.graph_layers import GINConv

    layer = GINConv(net=_Lin2(F_OUT), eps=0.3)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["net"]["d"]["kernel"])
    b = np.asarray(v["params"]["net"]["d"]["bias"])

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        agg = sum((X[j] for j in _incoming(i, EDGES)), np.zeros(F_IN))
        expect[i] = (1.3 * X[i] + agg) @ W + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_gine_golden():
    """PyG GINEConv docs: x'_i = h_Θ((1 + ε) x_i +
    Σ_{j∈N(i)} ReLU(x_j + W_e e_ij)) — edge attrs projected to the node
    width then added before the ReLU."""
    from waveformml_tpu.models.graph_layers import GINEConv

    layer = GINEConv(net=_Lin2(F_OUT), edge_dim=2, eps=0.1)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    We = np.asarray(v["params"]["edge_proj"]["kernel"])
    be = np.asarray(v["params"]["edge_proj"]["bias"])
    W = np.asarray(v["params"]["net"]["d"]["kernel"])
    b = np.asarray(v["params"]["net"]["d"]["bias"])

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        agg = np.zeros(F_IN)
        for kk in range(EDGES.shape[1]):
            if int(EDGES[1, kk]) == i:
                agg += np.maximum(X[int(EDGES[0, kk])]
                                  + EDGE_ATTR[kk] @ We + be, 0)
        expect[i] = (1.1 * X[i] + agg) @ W + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_arma_golden():
    """PyG ARMAConv docs (num_stacks=1, num_layers=1): x' =
    σ(L̂ x V + x W) with L̂ = D^{-1/2} A D^{-1/2} (no self-loops),
    σ = ReLU default."""
    from waveformml_tpu.models.graph_layers import ARMAConv

    layer = ARMAConv(F_IN, F_OUT, num_layers=1)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    P = v["params"]
    A = np.zeros((N, N))
    for s, d in zip(EDGES[0], EDGES[1]):
        A[int(d), int(s)] += 1.0
    deg = A.sum(1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    norm = A * dinv[:, None] * dinv[None, :]
    prop = norm @ X
    expect = np.maximum(
        prop @ np.asarray(P["V_0"]["kernel"]) + np.asarray(P["V_0"]["bias"])
        + X @ np.asarray(P["W_0"]["kernel"]) + np.asarray(P["W_0"]["bias"]),
        0)

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_film_golden():
    """PyG FiLMConv docs (num_relations=1): x'_i =
    σ(γ_s,i ⊙ W_s x_i + β_s,i) + mean_{j∈N(i)} σ(γ_i ⊙ W x_j + β_i)
    with (β, γ) = g(x_i) split in that order, σ = ReLU, bias-free W."""
    from waveformml_tpu.models.graph_layers import FiLMConv

    layer = FiLMConv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    P = v["params"]
    fb = X @ np.asarray(P["film"]["kernel"]) + np.asarray(P["film"]["bias"])
    beta, gamma = fb[:, :F_OUT], fb[:, F_OUT:]
    msg = X @ np.asarray(P["lin"]["kernel"])
    fs = X @ np.asarray(P["film_skip"]["kernel"]) + \
        np.asarray(P["film_skip"]["bias"])
    beta_s, gamma_s = fs[:, :F_OUT], fs[:, F_OUT:]
    skip = np.maximum(gamma_s * (X @ np.asarray(P["lin_skip"]["kernel"]))
                      + beta_s, 0)

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES)
        mod = [np.maximum(gamma[i] * msg[j] + beta[i], 0) for j in nbrs]
        expect[i] = (np.mean(mod, axis=0) if mod else 0) + skip[i]

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_feast_golden():
    """PyG FeaStConv docs: x'_i = 1/|N(i)| Σ_{j∈N(i)} Σ_h q_h W_h x_j with
    q = softmax(u(x_j − x_i) + c), self-loops added by default
    (add_self_loops=True; for them q = softmax(c))."""
    from waveformml_tpu.models.graph_layers import FeaStConv

    H = 2
    layer = FeaStConv(F_IN, F_OUT, heads=H)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    P = v["params"]
    Wu = np.asarray(P["u"]["kernel"])
    bu = np.asarray(P["u"]["bias"])
    Wl = np.asarray(P["lin"]["kernel"]).reshape(F_IN, H, F_OUT)
    bias = np.asarray(P["bias"])

    def softmax(z):
        z = np.exp(z - z.max())
        return z / z.sum()

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES) + [i]  # self-loop
        acc = np.zeros(F_OUT)
        for j in nbrs:
            q = softmax((X[j] - X[i]) @ Wu + bu)
            hj = np.einsum("f,fhc->hc", X[j], Wl)
            acc += (q[:, None] * hj).sum(0)
        expect[i] = acc / len(nbrs) + bias

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_le_golden():
    """PyG LEConv docs: x'_i = W1 x_i + Σ_{j∈N(i)} e_ji (W2 x_i − W3 x_j)
    (aggr='add')."""
    from waveformml_tpu.models.graph_layers import LEConv

    layer = LEConv(F_IN, F_OUT)
    e, mask, attr = _with_junk(EDGES, EDGE_ATTR)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask),
                        edge_attr=jnp.asarray(attr)))
    P = v["params"]
    h1 = X @ np.asarray(P["lin1"]["kernel"]) + np.asarray(P["lin1"]["bias"])
    h2 = X @ np.asarray(P["lin2"]["kernel"]) + np.asarray(P["lin2"]["bias"])
    h3 = X @ np.asarray(P["lin3"]["kernel"]) + np.asarray(P["lin3"]["bias"])

    w = EDGE_ATTR[:, 0]
    expect = h1.copy()
    for kk in range(EDGES.shape[1]):
        s, d = int(EDGES[0, kk]), int(EDGES[1, kk])
        expect[d] += w[kk] * (h2[d] - h3[s])

    np.testing.assert_allclose(_apply(layer, v, X, e, mask, attr), expect,
                               rtol=0, atol=1e-5)


def test_clustergcn_golden():
    """PyG ClusterGCNConv docs: X' = (Ã + λ diag(Ã)) X W, Ã = D̂^{-1} Â,
    Â = A + I — out_i = [Σ_{j∈N(i)} x_j + (1 + λ) x_i] / (deg_i + 1)."""
    from waveformml_tpu.models.graph_layers import ClusterGCNConv

    lam = 0.7
    layer = ClusterGCNConv(F_IN, F_OUT, diag_lambda=lam)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["lin"]["kernel"])
    b = np.asarray(v["params"]["lin"]["bias"])

    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES)
        agg = (sum((X[j] for j in nbrs), np.zeros(F_IN))
               + (1 + lam) * X[i]) / (len(nbrs) + 1)
        expect[i] = agg @ W + b

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)


def test_supergat_inference_golden():
    """PyG SuperGATConv: the self-supervised attention loss only exists at
    training; at inference the propagation is GAT's — so the same
    INDEPENDENT numpy oracle as test_gat_golden must reproduce it
    (comparing against GATConv itself would be tautological: SuperGATConv
    subclasses it)."""
    from waveformml_tpu.models.graph_layers import SuperGATConv

    layer = SuperGATConv(F_IN, F_OUT)
    e, mask, _ = _with_junk(EDGES)
    v = _pin(layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                        jnp.asarray(e), jnp.asarray(mask)))
    W = np.asarray(v["params"]["lin"]["kernel"])
    a_src = np.asarray(v["params"]["att_src"]).reshape(F_OUT)
    a_dst = np.asarray(v["params"]["att_dst"]).reshape(F_OUT)
    bias = np.asarray(v["params"]["bias"])

    h = X @ W
    expect = np.zeros((N, F_OUT))
    for i in range(N):
        nbrs = _incoming(i, EDGES) + [i]  # self-loop
        logits = np.array([_leaky(h[j] @ a_src + h[i] @ a_dst) for j in nbrs])
        alpha = np.exp(logits - logits.max())
        alpha /= alpha.sum()
        expect[i] = sum(a * h[j] for a, j in zip(alpha, nbrs)) + bias

    np.testing.assert_allclose(_apply(layer, v, X, e, mask), expect,
                               rtol=0, atol=1e-5)
