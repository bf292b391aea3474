"""Message-passing graph convolutions in JAX/flax over padded edge lists.

TPU-native equivalents of the 18 torch-geometric conv types the reference
selects by index (ref: src/models/GraphNet.py:279-315 retrieve_class,
src/models/GraphBlocks.py:107-143 choose_network). All layers operate on
static shapes: x [N, F], edges [2, E] (source, target), edge_mask [E], and
optional edge_attr [E, D]; padded edges are masked out of the segment-sum /
softmax aggregations. Semantics follow each PyG layer's inference-time math.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def segment_sum(messages: jax.Array, targets: jax.Array, n_nodes: int,
                edge_mask: Optional[jax.Array] = None) -> jax.Array:
    if edge_mask is not None:
        messages = jnp.where(edge_mask[:, None], messages, 0)
    return jax.ops.segment_sum(messages, targets, num_segments=n_nodes)


def segment_mean(messages, targets, n_nodes, edge_mask=None):
    s = segment_sum(messages, targets, n_nodes, edge_mask)
    ones = jnp.ones((messages.shape[0], 1), messages.dtype)
    cnt = segment_sum(ones, targets, n_nodes, edge_mask)
    return s / jnp.maximum(cnt, 1)


def segment_max(messages, targets, n_nodes, edge_mask=None):
    if edge_mask is not None:
        messages = jnp.where(edge_mask[:, None], messages, -jnp.inf)
    out = jax.ops.segment_max(messages, targets, num_segments=n_nodes)
    return jnp.where(jnp.isfinite(out), out, 0)


def edge_softmax(logits: jax.Array, targets: jax.Array, n_nodes: int,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
    """Softmax over incoming edges of each target node. logits [E, H]."""
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None], logits, -jnp.inf)
    maxes = jax.ops.segment_max(logits, targets, num_segments=n_nodes)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0)
    exp = jnp.exp(logits - maxes[targets])
    if edge_mask is not None:
        exp = jnp.where(edge_mask[:, None], exp, 0)
    denom = jax.ops.segment_sum(exp, targets, num_segments=n_nodes)
    return exp / jnp.maximum(denom[targets], 1e-16)


def feature_knn(x: jax.Array, batch: jax.Array, node_mask: jax.Array,
                k: int, block: int = 1024):
    """Device-side kNN graph rebuilt from FEATURES — the dynamic-graph
    primitive (ref: GraphNet.py:24-41 calls PyG ``knn_graph(x, k, batch,
    loop=False)`` inside every Dynamic* forward). Returns
    (edges [2, N·k] int32 in (source=neighbor, target=center) convention,
    edge_mask [N·k]).

    Tie-break rule (shared with the torch mirrors in
    tests/test_parity_graph_torch.py): squared distances are computed as
    sum((x_i − x_j)²) in f32 and selected with a STABLE argsort — the
    lower row index wins exact ties (ReLU-zeroed rows do collide exactly;
    ``lax.top_k``'s tie order is not stable across lowering contexts, so
    it is not used). Masked rows, cross-event pairs, and self-pairs are
    pushed to +inf; a center with fewer than k valid neighbors gets its
    tail slots masked out.

    FLOPs are O(N²·F) (all-pairs — the per-event mask is applied after),
    but peak memory is bounded by computing center rows in ``block``-sized
    strips via ``lax.map``: the live tensor is [block, N] per strip, never
    the full [N, N] distance matrix (which at the standard 12288-row batch
    would be ~600 MB per layer per direction)."""
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    blk = max(1, min(int(block), n))
    n_blocks = -(-n // blk)
    n_pad = n_blocks * blk
    # pad the CENTER axis only; padded centers use batch -1 / mask False so
    # every candidate is invalid and their output slots are masked + sliced
    xp = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
    bp = jnp.pad(batch.astype(jnp.int32), (0, n_pad - n),
                 constant_values=-1)
    mp = jnp.pad(node_mask, (0, n_pad - n), constant_values=False)
    row_ids = jnp.arange(n_pad)

    def one_strip(args):
        xb, bb, mb, rb = args                       # [blk, ...] centers
        d2 = jnp.sum((xb[:, None, :] - xf[None, :, :]) ** 2, axis=-1)
        invalid = (bb[:, None] != batch[None, :]) \
            | ~node_mask[None, :] | ~mb[:, None] \
            | (rb[:, None] == jnp.arange(n)[None, :])   # self-pairs
        d2 = jnp.where(invalid, jnp.inf, d2)
        order = jnp.argsort(d2, axis=1, stable=True)[:, :k]
        return jnp.take_along_axis(d2, order, axis=1), order

    vals, idx = jax.lax.map(one_strip, (
        xp.reshape(n_blocks, blk, -1), bp.reshape(n_blocks, blk),
        mp.reshape(n_blocks, blk), row_ids.reshape(n_blocks, blk)))
    vals = vals.reshape(n_pad, k)[:n]
    idx = idx.reshape(n_pad, k)[:n]
    src = idx.reshape(-1)
    dst = jnp.repeat(jnp.arange(n), k)
    edges = jnp.stack([src, dst]).astype(jnp.int32)
    return edges, jnp.isfinite(vals).reshape(-1)


def _sym_norm(edges, edge_mask, n_nodes, edge_weight=None):
    """D^-1/2 A D^-1/2 edge coefficients (GCN normalization)."""
    w = edge_weight if edge_weight is not None else \
        jnp.ones(edges.shape[1], jnp.float32)
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0)
    deg = jax.ops.segment_sum(w, edges[1], num_segments=n_nodes)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return w * dinv[edges[0]] * dinv[edges[1]]


def add_self_loops(edges, edge_mask, n_nodes, edge_weight=None,
                   fill_value: float = 1.0):
    """Append exactly ONE live (i, i) edge per node. Pre-existing self-loops
    in the input are masked out first, so graphs built with self_loop=True
    on the host do not end up with doubled loops (A + 2I) — matching PyG's
    remove_self_loops + add_self_loops (GAT) / add_remaining_self_loops
    (gcn_norm) semantics, which guarantee one loop per node. (Unlike
    add_remaining_self_loops, a pre-existing loop's edge weight is replaced
    by fill_value — host-built loops here always carry the fill weight
    anyway.) Static-shape friendly: always appends exactly n_nodes edges."""
    loop_free = edges[0] != edges[1]
    edge_mask = loop_free if edge_mask is None else (edge_mask & loop_free)
    loops = jnp.arange(n_nodes, dtype=edges.dtype)
    edges = jnp.concatenate([edges, jnp.stack([loops, loops])], axis=1)
    edge_mask = jnp.concatenate(
        [edge_mask, jnp.ones(n_nodes, edge_mask.dtype)])
    if edge_weight is not None:
        edge_weight = jnp.concatenate(
            [edge_weight, jnp.full(n_nodes, fill_value, edge_weight.dtype)])
    return edges, edge_mask, edge_weight


class GCNConv(nn.Module):
    """(index 0) PyG GCNConv: X' = D̂^-1/2 Â D̂^-1/2 X Θ + b with
    Â = A + I (self-loops added by default, fill weight 1)."""

    in_channels: int
    out_channels: int
    with_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        h = nn.Dense(self.out_channels, use_bias=False, name="lin")(x)
        ew = edge_attr[:, 0] if edge_attr is not None and edge_attr.ndim == 2 \
            else edge_attr
        if ew is None:
            ew = jnp.ones(edges.shape[1], x.dtype)
        if self.with_self_loops:
            edges, edge_mask, ew = add_self_loops(edges, edge_mask, n, ew)
        coeff = _sym_norm(edges, edge_mask, n, ew)
        out = segment_sum(h[edges[0]] * coeff[:, None], edges[1], n, edge_mask)
        return out + self.param("bias", nn.initializers.zeros, (self.out_channels,))


class SAGEConv(nn.Module):
    """(index 1) W1 x + W2 · mean_agg(x_src)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        agg = segment_mean(x[edges[0]], edges[1], n, edge_mask)
        # PyG: lin_l (aggregated neighbors) carries the bias, lin_r (root)
        # has bias=False
        return nn.Dense(self.out_channels, name="lin_l")(agg) + \
            nn.Dense(self.out_channels, use_bias=False, name="lin_r")(x)


class GraphConv(nn.Module):
    """(index 2) W1 x + W2 · sum_agg(e_w · x_src)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        msg = x[edges[0]]
        if edge_attr is not None:
            ew = edge_attr if edge_attr.ndim == 1 else edge_attr[:, 0]
            msg = msg * ew[:, None]
        agg = segment_sum(msg, edges[1], n, edge_mask)
        # PyG GraphConv: lin_rel (neighbors) carries the bias, lin_root is
        # bias-free
        return nn.Dense(self.out_channels, name="lin_rel")(agg) + \
            nn.Dense(self.out_channels, use_bias=False, name="lin_root")(x)


class GATConv(nn.Module):
    """(index 3) graph attention (PyG GATConv): self-loops added by
    default, α_ij = softmax_j LeakyReLU(a_s·Θx_j + a_d·Θx_i) over
    j ∈ N(i) ∪ {i}, x'_i = Σ_j α_ij Θx_j + b."""

    in_channels: int
    out_channels: int
    heads: int = 1
    negative_slope: float = 0.2
    with_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        h = nn.Dense(H * C, use_bias=False, name="lin")(x).reshape(n, H, C)
        if self.with_self_loops:
            edges, edge_mask, _ = add_self_loops(edges, edge_mask, n)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(), (H, C))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (H, C))
        alpha = (h[edges[0]] * a_src).sum(-1) + (h[edges[1]] * a_dst).sum(-1)
        alpha = jax.nn.leaky_relu(alpha, self.negative_slope)
        alpha = edge_softmax(alpha, edges[1], n, edge_mask)
        out = segment_sum((h[edges[0]] * alpha[..., None]).reshape(-1, H * C),
                          edges[1], n, edge_mask)
        return out + self.param("bias", nn.initializers.zeros, (H * C,))


class GATv2Conv(nn.Module):
    """(index 4) GATv2: attention after the nonlinearity (self-loops added
    by default, like PyG)."""

    in_channels: int
    out_channels: int
    heads: int = 1
    negative_slope: float = 0.2
    with_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        # unlike GATConv, PyG's GATv2Conv linear layers carry biases
        hl = nn.Dense(H * C, name="lin_l")(x).reshape(n, H, C)
        hr = nn.Dense(H * C, name="lin_r")(x).reshape(n, H, C)
        if self.with_self_loops:
            edges, edge_mask, _ = add_self_loops(edges, edge_mask, n)
        att = self.param("att", nn.initializers.glorot_uniform(), (H, C))
        z = jax.nn.leaky_relu(hl[edges[0]] + hr[edges[1]], self.negative_slope)
        alpha = (z * att).sum(-1)
        alpha = edge_softmax(alpha, edges[1], n, edge_mask)
        out = segment_sum((hl[edges[0]] * alpha[..., None]).reshape(-1, H * C),
                          edges[1], n, edge_mask)
        return out + self.param("bias", nn.initializers.zeros, (H * C,))


class TransformerConv(nn.Module):
    """(index 5) scaled-dot-product attention with optional edge features."""

    in_channels: int
    out_channels: int
    heads: int = 1
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        q = nn.Dense(H * C, name="q")(x).reshape(n, H, C)
        k = nn.Dense(H * C, name="k")(x).reshape(n, H, C)
        v = nn.Dense(H * C, name="v")(x).reshape(n, H, C)
        ke = k[edges[0]]
        ve = v[edges[0]]
        if edge_attr is not None:
            e = nn.Dense(H * C, name="edge")(edge_attr).reshape(-1, H, C)
            ke = ke + e
            ve = ve + e
        alpha = (q[edges[1]] * ke).sum(-1) / jnp.sqrt(C)
        alpha = edge_softmax(alpha, edges[1], n, edge_mask)
        out = segment_sum((ve * alpha[..., None]).reshape(-1, H * C),
                          edges[1], n, edge_mask)
        return out + nn.Dense(H * C, name="skip")(x)


class TAGConv(nn.Module):
    """(index 6) topology-adaptive: Σ_k W_k (norm-A)^k x, K=3."""

    in_channels: int
    out_channels: int
    K: int = 3

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        # PyG TAGConv applies edge_weight inside gcn_norm — GraphZ feeds
        # distance weights through edge_attr
        ew = edge_attr[:, 0] if edge_attr is not None and edge_attr.ndim == 2 \
            else edge_attr
        coeff = _sym_norm(edges, edge_mask, n, ew)
        # PyG TAGConv: K+1 bias-free linears over the powers of the
        # normalized adjacency (no self-loops: the k=0 term is the
        # identity), plus ONE shared output bias
        out = nn.Dense(self.out_channels, use_bias=False, name="lin_0")(x)
        h = x
        for k in range(1, self.K + 1):
            h = segment_sum(h[edges[0]] * coeff[:, None], edges[1], n, edge_mask)
            out = out + nn.Dense(self.out_channels, use_bias=False,
                                 name=f"lin_{k}")(h)
        return out + self.param("bias", nn.initializers.zeros,
                                (self.out_channels,))


class GINConv(nn.Module):
    """(index 7) nn((1 + ε)x + sum_agg(x_src)); nn supplied as a submodule."""

    net: Any
    eps: float = 0.0

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        agg = segment_sum(x[edges[0]], edges[1], n, edge_mask)
        return self.net((1 + self.eps) * x + agg, train=train)


class GINEConv(nn.Module):
    """GINE: edge features added to messages before ReLU."""

    net: Any
    edge_dim: Optional[int] = None
    eps: float = 0.0

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        msg = x[edges[0]]
        if edge_attr is not None:
            e = nn.Dense(x.shape[-1], name="edge_proj")(edge_attr)
            msg = jax.nn.relu(msg + e)
        agg = segment_sum(msg, edges[1], n, edge_mask)
        return self.net((1 + self.eps) * x + agg, train=train)


class ARMAConv(nn.Module):
    """(index 8) one-stack ARMA filter: act(norm-A x V + x_init W)."""

    in_channels: int
    out_channels: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        # PyG ARMAConv normalizes with edge_weight (GraphZ distance weights)
        ew = edge_attr[:, 0] if edge_attr is not None and edge_attr.ndim == 2 \
            else edge_attr
        coeff = _sym_norm(edges, edge_mask, n, ew)
        h = x
        for layer in range(self.num_layers):
            prop = segment_sum(h[edges[0]] * coeff[:, None], edges[1], n, edge_mask)
            h = jax.nn.relu(nn.Dense(self.out_channels, name=f"V_{layer}")(prop)
                            + nn.Dense(self.out_channels, name=f"W_{layer}")(x))
        return h


class SGConv(nn.Module):
    """(index 9) simplified GCN: W (D̂^-1/2 Â D̂^-1/2)^K x, Â = A + I
    (PyG adds self-loops by default)."""

    in_channels: int
    out_channels: int
    K: int = 1
    with_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        ew = edge_attr[:, 0] if edge_attr is not None and edge_attr.ndim == 2 \
            else edge_attr
        if ew is None:
            ew = jnp.ones(edges.shape[1], x.dtype)
        if self.with_self_loops:
            edges, edge_mask, ew = add_self_loops(edges, edge_mask, n, ew)
        coeff = _sym_norm(edges, edge_mask, n, ew)
        h = x
        for _ in range(self.K):
            h = segment_sum(h[edges[0]] * coeff[:, None], edges[1], n, edge_mask)
        return nn.Dense(self.out_channels, name="lin")(h)


class GMMConv(nn.Module):
    """(index 10) gaussian-mixture conv over pseudo-coordinates
    (edge_attr [E, dim], `kernel_size` gaussians). PyG GMMConv:
    x'_i = mean_{j∈N(i)} Σ_k w_k(e_ij) ⊙ (Θ_k x_j) + W_root x_i + b,
    w_k(e) = exp(-0.5 Σ_d (e_d − μ_kd)² / σ_kd²), root_weight=True."""

    in_channels: int
    out_channels: int
    dim: int = 2
    kernel_size: int = 3
    root_weight: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        K = self.kernel_size
        if edge_attr is None:
            edge_attr = jnp.zeros((edges.shape[1], self.dim), x.dtype)
        mu = self.param("mu", nn.initializers.normal(0.1), (K, self.dim))
        sigma = self.param("sigma", nn.initializers.ones, (K, self.dim))
        diff = edge_attr[:, None, :] - mu[None]                  # [E, K, D]
        w = jnp.exp(-0.5 * ((diff / jnp.maximum(jnp.abs(sigma), 1e-6)) ** 2)
                    .sum(-1))                                     # [E, K]
        h = nn.Dense(K * self.out_channels, use_bias=False,
                     name="g")(x).reshape(n, K, self.out_channels)
        msg = (h[edges[0]] * w[..., None]).sum(1)                 # [E, C]
        out = segment_mean(msg, edges[1], n, edge_mask)
        if self.root_weight:
            out = out + nn.Dense(self.out_channels, use_bias=False,
                                 name="root")(x)
        return out + self.param("bias", nn.initializers.zeros, (self.out_channels,))


class FiLMConv(nn.Module):
    """(index 11) PyG FiLMConv (num_relations=1): messages are FiLM-modulated
    by the target, x'_i = σ(γ_s,i ⊙ W_s x_i + β_s,i)
    + mean_{j∈N(i)} σ(γ_i ⊙ W x_j + β_i), where (β, γ) = g(x_i) and the skip
    ("self") relation is modulated by its own film_skip — not a plain linear.
    σ = ReLU (PyG default act); film splits (β, γ) in PyG's order."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        beta, gamma = jnp.split(
            nn.Dense(2 * self.out_channels, name="film")(x), 2, axis=-1)
        msg = nn.Dense(self.out_channels, use_bias=False, name="lin")(x)
        mod = jax.nn.relu(gamma[edges[1]] * msg[edges[0]] + beta[edges[1]])
        agg = segment_mean(mod, edges[1], n, edge_mask)
        beta_s, gamma_s = jnp.split(
            nn.Dense(2 * self.out_channels, name="film_skip")(x), 2, axis=-1)
        skip = jax.nn.relu(
            gamma_s * nn.Dense(self.out_channels, use_bias=False,
                               name="lin_skip")(x) + beta_s)
        return agg + skip


class EdgeConv(nn.Module):
    """(index 12) max-agg of nn([x_i ‖ x_j − x_i]) (DGCNN edge conv)."""

    net: Any

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        src, dst = edges[0], edges[1]
        z = jnp.concatenate([x[dst], x[src] - x[dst]], axis=-1)
        msg = self.net(z, train=train)
        return segment_max(msg, dst, n, edge_mask)


class FeaStConv(nn.Module):
    """(index 13) PyG FeaStConv: x'_i = 1/|N(i)| Σ_{j∈N(i)} Σ_h
    q_h(x_i, x_j) W_h x_j with q = softmax(u(x_j − x_i) + c); self-loops
    added by default (add_self_loops=True), where q reduces to softmax(c)."""

    in_channels: int
    out_channels: int
    heads: int = 4
    with_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        H = self.heads
        if self.with_self_loops:
            edges, edge_mask, _ = add_self_loops(edges, edge_mask, n)
        u = nn.Dense(H, name="u")
        q = jax.nn.softmax(u(x[edges[0]] - x[edges[1]]), axis=-1)     # [E, H]
        h = nn.Dense(H * self.out_channels, use_bias=False,
                     name="lin")(x).reshape(n, H, self.out_channels)
        msg = (h[edges[0]] * q[..., None]).sum(1)
        out = segment_mean(msg, edges[1], n, edge_mask)
        return out + self.param("bias", nn.initializers.zeros, (self.out_channels,))


class LEConv(nn.Module):
    """(index 14) local-extremum conv: Σ_j e_w (W2 x_i − W3 x_j) + W1 x_i."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        h2 = nn.Dense(self.out_channels, name="lin2")(x)
        h3 = nn.Dense(self.out_channels, name="lin3")(x)
        ew = jnp.ones(edges.shape[1], x.dtype)
        if edge_attr is not None:
            ew = edge_attr if edge_attr.ndim == 1 else edge_attr[:, 0]
        msg = ew[:, None] * (h2[edges[1]] - h3[edges[0]])
        agg = segment_sum(msg, edges[1], n, edge_mask)
        return agg + nn.Dense(self.out_channels, name="lin1")(x)


class ClusterGCNConv(nn.Module):
    """(index 15) Cluster-GCN normalization (PyG ClusterGCNConv):
    X' = (Ã + λ diag(Ã)) X W with Ã = D̂^{-1} Â, Â = A + I — i.e.
    out_i = [Σ_{j∈N(i)} x_j + (1 + λ) x_i] / (deg_i + 1), then lin."""

    in_channels: int
    out_channels: int
    diag_lambda: float = 0.0

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        edges, edge_mask, _ = add_self_loops(edges, edge_mask, n)
        agg = segment_mean(x[edges[0]], edges[1], n, edge_mask)
        # diag(Ã)_ii = 1/deĝ_i: recover it from the mean's own denominator
        deg = segment_sum(jnp.ones((edges.shape[1], 1), x.dtype), edges[1],
                          n, edge_mask)
        agg = agg + self.diag_lambda * x / jnp.maximum(deg, 1)
        return nn.Dense(self.out_channels, name="lin")(agg)


class GENConv(nn.Module):
    """(index 16) softmax aggregation of relu(x_j + e) + MLP."""

    in_channels: int
    out_channels: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, x, edges, edge_mask, edge_attr=None, train=False):
        n = x.shape[0]
        h = nn.Dense(self.out_channels, name="lin_in")(x)
        msg = h[edges[0]]
        if edge_attr is not None:
            e = nn.Dense(self.out_channels, name="edge_proj")(edge_attr)
            msg = msg + e
        msg = jax.nn.relu(msg) + 1e-7
        alpha = edge_softmax(msg * self.beta, edges[1], n, edge_mask)
        agg = segment_sum(msg * alpha, edges[1], n, edge_mask)
        z = h + agg
        z = nn.Dense(2 * self.out_channels, name="mlp1")(z)
        z = jax.nn.relu(z)
        return nn.Dense(self.out_channels, name="mlp2")(z)


class SuperGATConv(GATConv):
    """(index 17) SuperGAT — self-supervised attention at train time; the
    propagation rule at inference matches GATConv."""


GRAPH_CONV_BY_INDEX = [
    GCNConv, SAGEConv, GraphConv, GATConv, GATv2Conv, TransformerConv,
    TAGConv, GINConv, ARMAConv, SGConv, GMMConv, FiLMConv, EdgeConv,
    FeaStConv, LEConv, ClusterGCNConv, GENConv, SuperGATConv,
]


def class_needs_nn(index: int) -> bool:
    """(ref: GraphNet.py:256-260)"""
    return index in (7, 12)


def needs_edge_attr(index: int) -> bool:
    """(ref: GraphNet.py:276-277)"""
    return index in (5, 10, 16)


def nn_input_modifier(index: int, num_layer: int, graph_params=None) -> int:
    """(ref: GraphNet.py:249-254)"""
    if index == 12:
        return 2
    if graph_params and "heads" in graph_params and num_layer > 0 and index == 17:
        return graph_params["heads"]
    return 1


def global_max_pool(x: jax.Array, batch: jax.Array, n_events: int,
                    node_mask: Optional[jax.Array] = None) -> jax.Array:
    return segment_max(x, batch, n_events, node_mask)


def global_mean_pool(x: jax.Array, batch: jax.Array, n_events: int,
                     node_mask: Optional[jax.Array] = None) -> jax.Array:
    return segment_mean(x, batch, n_events, node_mask)
