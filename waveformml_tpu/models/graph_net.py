"""Graph network models over detector pulse graphs.

TPU-native equivalents of src/models/GraphNet.py (621 LoC) and
src/models/GraphBlocks.py (143 LoC): ``GraphNet`` (kNN graph built per batch,
18 selectable conv types, Cartesian/LocalCartesian edge transforms,
linear/geometric plane schedules, global_max_pool + LinearBlock head,
ref: GraphNet.py:86-315), ``GraphZ`` (window-edge per-segment stack,
ref: GraphBlocks.py:19-143), ``PointNet`` (PointConv stack, ref :318-445),
``Graph3DNet`` (waveform samples as 3D points, ref :448-594), and
``SingleEndedEZGraph`` (ref :597-621).

Graphs are built HOST-side (C++ window/kNN kernels in ops.graph) during batch
preparation and shipped as padded static edge lists; the device side is pure
segment-op message passing. Models declare their edge needs via
``edge_requirements()``.
"""
from __future__ import annotations

from copy import copy
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.config import to_dict
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.models.blocks import LinearBlock, LinearPlanes, MaskedArrayBatchNorm
from waveformml_tpu.models.graph_layers import (
    GRAPH_CONV_BY_INDEX, class_needs_nn, global_max_pool, needs_edge_attr,
    nn_input_modifier, segment_max)
from waveformml_tpu.registry import registry


class _GraphMLP(nn.Module):
    """LinearPlanes with ReLU used inside GIN/EdgeConv (ref: LinearPlanes)."""

    planes: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        return LinearPlanes(self.planes, activation=jax.nn.relu)(x, train=train)


def _make_conv(index: int, nin: int, nout: int, graph_params: Dict,
               kernel: int = 3, name: str = "conv"):
    cls = GRAPH_CONV_BY_INDEX[index]
    params = dict(graph_params)
    if class_needs_nn(index):
        mod = nn_input_modifier(index, 0, params)
        return cls(_GraphMLP((mod * nin, nout)), name=name)
    if index == 10:  # GMMConv (dim, kernel_size) (ref: GraphNet.py:262-267);
        # graph_params may override both
        known = {k: v for k, v in params.items()
                 if k in cls.__dataclass_fields__}
        known.setdefault("dim", 2)
        known.setdefault("kernel_size", kernel)
        return cls(nin, nout, name=name, **known)
    if index == 5:  # TransformerConv: window rel-coord attrs are 2-dim
        params.setdefault("edge_dim", 2)
    known = {k: v for k, v in params.items() if k in cls.__dataclass_fields__}
    return cls(nin, nout, name=name, **known)


def _cartesian(pos, edges, local: bool = False, norm: bool = True,
               max_value: Optional[float] = None):
    """Device-side Cartesian edge attributes (ref: GraphNet.py:148-158)."""
    rel = pos[edges[1]] - pos[edges[0]]
    if local:
        # PyG LocalCartesian: each edge is scaled by the max |rel| over its
        # TARGET node's incoming edges (scalar per node), not a global max
        amax = jnp.abs(rel).max(axis=1)
        per_node = segment_max(amax[:, None], edges[1], pos.shape[0])[:, 0]
        scale = jnp.maximum(per_node[edges[1]], 1e-9)[:, None]
        return rel / (2 * scale) + 0.5
    if norm:
        mv = max_value if max_value is not None else \
            jnp.maximum(jnp.abs(rel).max(), 1e-9)
        return rel / (2 * mv) + 0.5
    return rel


def _graph_planes(feat_size, n_graph, n_expansion, expansion_factor, graph_out,
                  reduction_type: str) -> List[int]:
    """Plane schedule (ref: GraphNet.py:162-192)."""
    planes = [feat_size]
    n_contract = n_graph - n_expansion
    if reduction_type == "linear":
        if n_expansion > 0:
            exp = int((planes[0] * expansion_factor - planes[0]) / n_expansion)
            for _ in range(n_expansion):
                planes.append(planes[-1] + exp)
            if n_contract > 0:
                red = int((planes[-1] - graph_out) / n_contract)
                for _ in range(n_contract):
                    planes.append(planes[-1] - red)
        else:
            red = int((planes[0] - graph_out) / n_graph)
            for _ in range(n_graph):
                planes.append(planes[-1] - red)
    elif reduction_type == "geometric":
        if n_expansion > 0:
            exp = float(expansion_factor) ** (1.0 / n_expansion)
            for _ in range(n_expansion):
                planes.append(int(planes[-1] * exp))
            if n_contract > 0:
                red = float(graph_out / planes[-1]) ** (1.0 / n_contract)
                for _ in range(n_contract):
                    planes.append(int(planes[-1] * red))
        else:
            red = float(graph_out / planes[0]) ** (1.0 / n_graph)
            for _ in range(n_graph):
                planes.append(int(planes[-1] * red))
    else:
        raise IOError("net_config.hparams.reduction_type must be either "
                      "linear or geometric")
    planes[-1] = int(graph_out)
    return planes


@registry.register("GraphNet", aliases=("GraphNet.GraphNet",))
class GraphNet(nn.Module):
    """Event classifier over a kNN pulse graph (ref: GraphNet.py:86-247)."""

    config: Any
    is_graph = True

    def setup(self):
        hp = self.config.net_config.hparams
        self.feat_size = self.config.system_config.n_samples * 2
        if hasattr(hp, "n_graph"):
            self.n_graph = hp.n_graph
        elif hasattr(hp, "n_contract") and hasattr(hp, "n_expand"):
            self.n_graph = hp.n_contract + hp.n_expand
        else:
            raise IOError("if net_config.hparams.n_graph not specified, must "
                          "specify n_expand and n_contract")
        self.n_expansion = getattr(hp, "n_expand", 0)
        self.expansion_factor = getattr(hp, "expansion_factor", 1.0)
        self.graph_index = hp.graph_class_index
        self.k = getattr(hp, "k", 6)
        self.graph_out = getattr(hp, "graph_out", 10)
        self.use_self_loops = bool(getattr(hp, "self_loop", False))
        self.final_norm = bool(getattr(hp, "final_norm", True))
        self.graph_params = to_dict(getattr(hp, "graph_params", {}) or {})
        self.local_cartesian = getattr(hp, "edge_transform", "cartesian") == "localcartesian"
        reduction = getattr(hp, "reduction_type", "linear")
        planes = _graph_planes(self.feat_size, self.n_graph, self.n_expansion,
                               self.expansion_factor, self.graph_out, reduction)
        self.uses_edge_attr = needs_edge_attr(self.graph_index)
        # multi-head attention convs (GAT/GATv2/Transformer/SuperGAT) output
        # heads*C (PyG concat=True default): widen the next layer's input and
        # the norm accordingly (superset of the reference's nn_input_modifier,
        # which corrects only index 17, GraphNet.py:249-254)
        heads = int(self.graph_params.get("heads", 1) or 1)
        hmul = heads if self.graph_index in (3, 4, 5, 17) else 1
        layers, norms = [], []
        for i in range(self.n_graph):
            nin = planes[i] if i == 0 else planes[i] * hmul
            layers.append(_make_conv(self.graph_index, nin, planes[i + 1],
                                     self.graph_params, name=f"gconv_{i}"))
            if self.final_norm:
                norms.append(MaskedArrayBatchNorm(planes[i + 1] * hmul,
                                                  name=f"norm_{i}"))
        self.head_multiplier = hmul
        self.layers = layers
        self.norms = norms
        n_lin = getattr(hp, "n_lin", 0)
        self.n_lin = n_lin
        if n_lin > 0:
            sc = self.config.system_config
            lin_outputs = getattr(sc, "n_type", None) or \
                getattr(self.config.net_config, "n_out", None)
            if lin_outputs is None:
                raise IOError("Need system_config.n_type or net_config.n_out")
            self.linear = LinearBlock(self.graph_out * hmul, lin_outputs, n_lin)

    @nn.nowrap
    def edge_requirements(self) -> List[Tuple]:
        # reads config only (usable on an unbound module, before setup)
        hp = self.config.net_config.hparams
        return [("knn", getattr(hp, "k", 6), bool(getattr(hp, "self_loop", False)))]

    def __call__(self, db: Dict[str, jax.Array], train: bool = False):
        x = db["feats"]
        coords = db["coords"]
        node_mask = db["mask"]
        edges = db[f"edges_knn{self.k}"]
        edge_mask = db[f"edge_mask_knn{self.k}"]
        pos = coords[:, :2].astype(x.dtype)
        edge_attr = None
        if self.uses_edge_attr:
            edge_attr = _cartesian(pos, edges, local=self.local_cartesian)
        for i, layer in enumerate(self.layers):
            x = layer(x, edges, edge_mask, edge_attr=edge_attr, train=train)
            if self.final_norm:
                x = self.norms[i](x, mask=node_mask, train=train)
            x = jax.nn.relu(x)
        if self.n_lin > 0:
            n_events = db["labels"].shape[0]
            pooled = global_max_pool(x, coords[:, 2], n_events, node_mask)
            return self.linear(pooled, train=train)
        return x


@registry.register("GraphZ", aliases=("GraphBlocks.GraphZ",))
class GraphZ(nn.Module):
    """Per-segment graph stack over window-edge neighborhoods
    (ref: GraphBlocks.py:19-143). Returns per-row features [N, out_planes]."""

    in_planes: int
    out_planes: int = 1
    neighbors: int = 1
    kernel: int = 3
    n_conv: int = 1
    n_point: int = 3
    conv_position: int = 3
    pointwise_factor: float = 0.8
    batchnorm: bool = True
    self_loops: bool = True
    graph_index: int = 0

    @staticmethod
    def schedule(in_planes, out_planes, neighbors, n_conv, n_point,
                 conv_position, pointwise_factor):
        """Channel/neighbor schedule (ref: GraphBlocks.py:33-77)."""
        n_layers = n_conv + n_point
        if n_conv > 0 and conv_position < 1:
            raise ValueError("conv position must be >= 1 if n_conv > 0")
        if n_point > 0:
            if n_layers == 1:
                raise ValueError("n_layers must be > 1 if using pointwise convolution")
            increment = int(round(int(round(in_planes * pointwise_factor - out_planes))
                                  / float(n_layers - 1)))
        else:
            increment = int(round(float(in_planes - out_planes) / float(n_layers)))
        conv_positions = list(range(conv_position - 1, conv_position - 1 + n_conv)) \
            if n_conv > 0 else []
        out, inp = in_planes, in_planes
        layers = []
        for i in range(n_layers):
            if i == n_layers - 1:
                out = out_planes
            else:
                out -= increment
                if i == 0 and n_point > 0 and pointwise_factor > 0:
                    out = int(round(pointwise_factor * in_planes))
            if i in conv_positions:
                curr_neighbors = max(1, neighbors - int(i + 1 - conv_position))
            else:
                curr_neighbors = 0
            layers.append((inp, out, curr_neighbors))
            inp = out
        return layers

    @nn.nowrap
    def edge_requirements(self) -> List[Tuple]:
        reqs = []
        for (_, _, nb) in self.schedule(self.in_planes, self.out_planes,
                                        self.neighbors, self.n_conv, self.n_point,
                                        self.conv_position, self.pointwise_factor):
            reqs.append(("knn", 1, True) if nb == 0
                        else ("window", nb, self.self_loops))
        return reqs

    @nn.nowrap
    def _uses_edge_weights(self) -> bool:
        return self.graph_index in (0, 2, 5, 6, 8, 9, 10, 14)

    @nn.nowrap
    def _edge_attr_2d(self) -> bool:
        # parity: index 3 (GAT) is in the reference's use_edge_attr list but
        # absent from its check_edge_weights gate, so the 2-D branch is
        # equally unreachable for GAT upstream (GraphBlocks.py:79-107)
        return self.graph_index in (3, 5, 10)

    @nn.compact
    def __call__(self, db: Dict[str, jax.Array], train: bool = False):
        x = db["feats"]
        coords = db["coords"]
        node_mask = db["mask"]
        pos = coords[:, :2].astype(x.dtype)
        sched = self.schedule(self.in_planes, self.out_planes, self.neighbors,
                              self.n_conv, self.n_point, self.conv_position,
                              self.pointwise_factor)
        n_layers = len(sched)
        # consecutive layers often share an edge set (all pointwise layers
        # use edges_knn1, conv layers with equal windows share edges_w{nb});
        # the derived weights depend only on (pos, edges) — compute once each
        attr_cache: Dict[str, Any] = {}
        for i, (nin, nout, nb) in enumerate(sched):
            key = "knn1" if nb == 0 else f"w{nb}"
            edges = db[f"edges_{key}"]
            edge_mask = db[f"edge_mask_{key}"]
            edge_attr = None
            if self._uses_edge_weights():
                if key not in attr_cache:
                    rel = _cartesian(pos, edges, norm=False)
                    if self._edge_attr_2d():
                        attr_cache[key] = 1.0 - jnp.abs(rel) / (self.neighbors + 1)
                    else:
                        attr_cache[key] = 1.0 - jnp.sqrt((rel ** 2).sum(-1)) / \
                            ((2 * self.neighbors ** 2) ** 0.5)
                edge_attr = attr_cache[key]
            layer = _make_conv(self.graph_index, nin, nout, {},
                               kernel=self.kernel, name=f"gconv_{i}")
            x = layer(x, edges, edge_mask, edge_attr=edge_attr, train=train)
            if i < n_layers - 1 and self.batchnorm:
                x = MaskedArrayBatchNorm(nout, name=f"norm_{i}")(
                    x, mask=node_mask, train=train)
        return x


@registry.register("GraphZNet", aliases=("GraphNet.GraphZNet",))
class GraphZNet(nn.Module):
    """Per-segment Z regressor over GraphZ returning dense [B, 1, NX, NY]
    (graph analog of SingleEndedZConv)."""

    config: Any
    is_graph = True

    def setup(self):
        hp = to_dict(self.config.net_config.hparams)
        n_in = self.config.system_config.n_samples * 2
        self.model = GraphZ(n_in, out_planes=1, **{
            k: v for k, v in hp.items()
            if k in GraphZ.__dataclass_fields__
            and k not in ("in_planes", "out_planes")})

    @nn.nowrap
    def edge_requirements(self):
        hp = to_dict(self.config.net_config.hparams)
        kw = {k: v for k, v in hp.items()
              if k in GraphZ.__dataclass_fields__
              and k not in ("in_planes", "out_planes")}
        n_in = self.config.system_config.n_samples * 2
        return GraphZ(n_in, out_planes=1, **kw).edge_requirements()

    def __call__(self, db, train: bool = False):
        out = self.model(db, train=train)  # [N, 1]
        coords = db["coords"]
        mask = db["mask"]
        n_events = db["labels"].shape[0]
        flat = jnp.zeros((n_events * NX * NY, out.shape[-1]), out.dtype)
        idx = coords[:, 2] * (NX * NY) + coords[:, 0] * NY + coords[:, 1]
        idx = jnp.where(mask, idx, n_events * NX * NY)
        flat = flat.at[idx].add(jnp.where(mask[:, None], out, 0), mode="drop")
        dense = flat.reshape(n_events, NX, NY, -1)
        return jnp.transpose(dense, (0, 3, 1, 2))


@registry.register("SingleEndedEZGraph", aliases=("GraphNet.SingleEndedEZGraph",))
class SingleEndedEZGraph(GraphZNet):
    """(E, Z) graph head → dense [B, 2, NX, NY] (ref: GraphNet.py:597-621)."""

    def setup(self):
        hp = to_dict(self.config.net_config.hparams)
        n_in = self.config.system_config.n_samples * 2
        self.model = GraphZ(n_in, out_planes=2, **{
            k: v for k, v in hp.items()
            if k in GraphZ.__dataclass_fields__
            and k not in ("in_planes", "out_planes")})


class PointNetConv(nn.Module):
    """PointConv-style layer: max_j mlp([x_j ‖ p_j − p_i])
    (ref: GraphNet.py PointNet :318-445)."""

    planes: Sequence[int]

    @nn.compact
    def __call__(self, x, pos, edges, edge_mask, train: bool = False):
        n = x.shape[0]
        src, dst = edges[0], edges[1]
        z = jnp.concatenate([x[src], pos[src] - pos[dst]], axis=-1)
        msg = LinearPlanes(self.planes, activation=jax.nn.relu)(z, train=train)
        return segment_max(msg, dst, n, edge_mask)


@registry.register("PointNet", aliases=("GraphNet.PointNet",))
class PointNet(nn.Module):
    """PointNet-style classifier over the pulse point cloud
    (ref: GraphNet.py:318-445)."""

    config: Any
    is_graph = True

    def setup(self):
        hp = self.config.net_config.hparams
        self.k = getattr(hp, "k", 6)
        feat = self.config.system_config.n_samples * 2
        n_graph = getattr(hp, "n_graph", 3)
        graph_out = getattr(hp, "graph_out", 32)
        planes = _graph_planes(feat, n_graph, getattr(hp, "n_expand", 0),
                               getattr(hp, "expansion_factor", 1.0), graph_out,
                               getattr(hp, "reduction_type", "linear"))
        self.convs = [PointNetConv((planes[i] + 2, planes[i + 1]),
                                   name=f"pconv_{i}") for i in range(n_graph)]
        n_lin = getattr(hp, "n_lin", 2)
        lin_outputs = getattr(self.config.system_config, "n_type", 2)
        self.linear = LinearBlock(graph_out, lin_outputs, n_lin)

    @nn.nowrap
    def edge_requirements(self):
        return [("knn", getattr(self.config.net_config.hparams, "k", 6), False)]

    def __call__(self, db, train: bool = False):
        x = db["feats"]
        coords = db["coords"]
        node_mask = db["mask"]
        pos = coords[:, :2].astype(x.dtype)
        edges = db[f"edges_knn{self.k}"]
        edge_mask = db[f"edge_mask_knn{self.k}"]
        for conv in self.convs:
            x = conv(x, pos, edges, edge_mask, train=train)
        n_events = db["labels"].shape[0]
        pooled = global_max_pool(x, coords[:, 2], n_events, node_mask)
        return self.linear(pooled, train=train)


@registry.register("Graph3DNet", aliases=("GraphNet.Graph3DNet",))
class Graph3DNet(nn.Module):
    """3D-point variant: each (site, time-window) becomes a 3D point whose
    features are the window's samples; kNN graph in (x, y, t)
    (ref: GraphNet.py:448-594, which expands waveform samples into 3D points).

    Simplification vs the reference: points are fixed time windows of the
    waveform (static shape) rather than per-sample thresholded points — the
    zero-amplitude windows are masked out of the pooling instead.
    """

    config: Any
    is_graph = True
    n_windows: int = 8

    def setup(self):
        hp = self.config.net_config.hparams
        self.k = getattr(hp, "k", 6)
        n_samples = self.config.system_config.n_samples
        # ceil-div: every sample must land in a window (the reference makes
        # one 3D point per sample, GraphNet.py:572-577, so dropping the tail
        # when 2S % n_windows != 0 would silently lose signal); the last
        # window is zero-padded in __call__ instead
        self.window = max(1, -((-2 * n_samples) // self.n_windows))
        n_graph = getattr(hp, "n_graph", 3)
        graph_out = getattr(hp, "graph_out", 16)
        planes = _graph_planes(self.window, n_graph, getattr(hp, "n_expand", 0),
                               getattr(hp, "expansion_factor", 1.0), graph_out,
                               getattr(hp, "reduction_type", "linear"))
        self.convs = [PointNetConv((planes[i] + 3, planes[i + 1]),
                                   name=f"pconv_{i}") for i in range(n_graph)]
        n_lin = getattr(hp, "n_lin", 2)
        lin_outputs = getattr(self.config.system_config, "n_type", 2)
        self.linear = LinearBlock(graph_out, lin_outputs, n_lin)

    @nn.nowrap
    def edge_requirements(self):
        return [("knn", getattr(self.config.net_config.hparams, "k", 6), False)]

    def __call__(self, db, train: bool = False):
        x = db["feats"]                      # [N, 2S]
        coords = db["coords"]
        node_mask = db["mask"]
        N = x.shape[0]
        W = self.n_windows
        L = self.window
        if W * L > x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, W * L - x.shape[1])))
        feats3d = x[:, : W * L].reshape(N * W, L)
        t = jnp.tile(jnp.arange(W, dtype=x.dtype), (N,))
        pos3 = jnp.concatenate([
            jnp.repeat(coords[:, :2].astype(x.dtype), W, axis=0),
            t[:, None]], axis=1)                               # [N*W, 3]
        batch3 = jnp.repeat(coords[:, 2], W)
        mask3 = jnp.repeat(node_mask, W) & (jnp.abs(feats3d).sum(-1) > 0)
        # use the 2D knn edges lifted onto the first window of each node pair,
        # plus intra-node window chains (static construction)
        edges2 = db[f"edges_knn{self.k}"]
        edge_mask2 = db[f"edge_mask_knn{self.k}"]
        lifted = edges2 * W                                     # window 0 ↔ window 0
        # bidirectional chains (the reference's 3D kNN graph is symmetric):
        # one-way w→w+1 links would strand late-window signal on the
        # zero-padded tail windows, which the amplitude mask drops from
        # pooling — so later windows could never influence the output
        chain_src = jnp.arange(N * W - 1)
        chain_ok = (chain_src % W) != (W - 1)
        chains = jnp.stack([chain_src, chain_src + 1])
        rev = jnp.stack([chain_src + 1, chain_src])
        edges = jnp.concatenate([lifted, chains, rev], axis=1)
        edge_mask = jnp.concatenate([edge_mask2, chain_ok, chain_ok])
        h = feats3d
        for conv in self.convs:
            h = conv(h, pos3, edges, edge_mask, train=train)
        n_events = db["labels"].shape[0]
        pooled = global_max_pool(h, batch3, n_events, mask3)
        return self.linear(pooled, train=train)


class DynamicEdgeConv(nn.Module):
    """EdgeConv over a kNN graph REBUILT in-forward — the reference's dynamic
    variant (ref: GraphNet.py:24-32: ``knn_graph(x, self.k, batch,
    loop=False)`` then ``EdgeConv.forward(feat, edge_index)``). ``feat``
    carries the convolved features; ``x`` is what the graph is rebuilt from
    (DGCNN passes the current features for both). The kNN runs ON DEVICE
    (graph_layers.feature_knn) so the rebuilt graph stays inside the jit."""

    in_channels: int
    out_channels: int
    k: int = 6

    @nn.compact
    def __call__(self, feat, x, batch, node_mask, train: bool = False):
        from waveformml_tpu.models.graph_layers import EdgeConv, feature_knn

        edges, edge_mask = feature_knn(x, batch, node_mask, self.k)
        return EdgeConv(_GraphMLP((2 * self.in_channels, self.out_channels)))(
            feat, edges, edge_mask, train=train)


class DynamicGraphConv(nn.Module):
    """GCNConv over a kNN graph REBUILT in-forward — the reference defines
    this beside DynamicEdgeConv (ref: GraphNet.py:34-41: ``knn_graph(x,
    self.k, batch, loop=False)`` then ``GCNConv.forward(feat, edge_index)``)
    though no shipped config instantiates it; kept for API parity. Same
    (feat, x, batch) convention and on-device feature_knn as
    DynamicEdgeConv."""

    in_channels: int
    out_channels: int
    k: int = 6

    @nn.compact
    def __call__(self, feat, x, batch, node_mask, train: bool = False):
        from waveformml_tpu.models.graph_layers import GCNConv, feature_knn

        edges, edge_mask = feature_knn(x, batch, node_mask, self.k)
        return GCNConv(self.in_channels, self.out_channels)(
            feat, edges, edge_mask, train=train)
