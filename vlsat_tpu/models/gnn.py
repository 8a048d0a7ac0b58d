"""Graph edge-attention network ("fat" attention GCN).

Counterpart of the reference's ``MultiHeadedEdgeAttention`` +
``GraphEdgeAttenNetwork`` (src/model/model_utils/network_MMG.py:12-112),
re-designed for padded per-scene edge tensors.

Faithfulness notes:
  * 'fat' attention is NOT softmax over neighbors — it is a per-edge
    feature-dim softmax gate (``prob.softmax(1)`` in the reference,
    network_MMG.py:100-104).  Easy to "fix" by accident; don't.
  * The reference splits the 512-d query/edge vectors into heads with
    ``view(b, d, heads)`` — heads interleaved along the feature axis
    (stride-1 head index), and flattens the (d_o, heads) gate the same
    way before multiplying with the projected value.  We reproduce that
    layout exactly so ported weights behave identically.
  * Message aggregation lands on the *subject* node (edge_index[..., 0]),
    the reference's ``target_to_source`` flow.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlsat_tpu.models.layers import DenseStack, HeadMLP, MaskedBatchNorm
from vlsat_tpu.ops.graph import gather_edge_endpoints, scatter_edges_to_nodes


class FatEdgeAttention(nn.Module):
    """Edge update + feature-gated message for one edge-attention layer."""

    num_heads: int
    dim_node: int
    dim_edge: int
    dim_atten: int
    dropout_atten: float | None = 0.5
    use_edge: bool = True
    # gate-path tensor layout (same math + SAME parameter tree either way):
    #   "channel":    (..., C, H) tensors, ChannelDense in-place contraction
    #                 over axis -2 (round-2b design).
    #   "head_major": one explicit (..., C, H) <-> (..., H, C) transpose on
    #                 each side of the gate MLP, which then runs as plain
    #                 last-axis Dense layers with softmax on the MINOR axis
    #                 — trades 2 transposes for the layout copies XLA
    #                 inserts around the axis(-2) dot_generals.
    gate_layout: str = "channel"

    @nn.compact
    def __call__(self, x_i, edge, x_j, *, deterministic: bool = True,
                 nn_edge_nodes=None):
        """``nn_edge_nodes``: optional (proj_i, proj_j) — the first nn_edge
        layer applied at NODE level and gathered by the caller (see
        GraphEdgeAttenNetwork); falls back to per-edge projection here."""
        h = self.num_heads
        d_n = self.dim_node // h
        d_e = self.dim_edge // h
        d_o = self.dim_atten // h
        hid = self.dim_node + self.dim_edge

        # Edge feature update: MLP([x_i, e, x_j]) (network_MMG.py:87-93),
        # with the concat-then-matmul split by linearity into three
        # projections — the caller (GraphEdgeAttenNetwork) supplies the
        # node-side parts, either per edge or gathered from node level.
        assert nn_edge_nodes is not None, "caller must supply nn_edge node projections"
        pi, pj = nn_edge_nodes
        edge_part = nn.Dense(hid, name="nn_edge_fc0_edge")(edge)
        edge_new = nn.Dense(self.dim_edge, name="nn_edge_fc1")(
            nn.relu(pi + edge_part + pj))

        value = DenseStack([self.dim_atten], name="proj_value")(x_j)
        query = DenseStack([self.dim_node], name="proj_query")(x_i)
        edge_p = DenseStack([self.dim_edge], name="proj_edge")(edge)

        # interleaved head split: (..., D) -> (..., D//H, H)
        q = query.reshape(*query.shape[:-1], d_n, h)
        e = edge_p.reshape(*edge_p.shape[:-1], d_e, h)
        if self.use_edge:
            gate_in = jnp.concatenate([q, e], axis=-2)  # (..., d_n+d_e, H)
            feats = [d_n + d_e, d_o]
        else:
            gate_in = q
            feats = [2 * d_n, d_o]
        if self.gate_layout == "head_major":
            gi = jnp.swapaxes(gate_in, -1, -2)           # (..., H, C)
            prob = HeadMLP(feats, dropout=self.dropout_atten,
                           head_major=True, name="nn")(
                gi, deterministic=deterministic)         # (..., H, d_o)
            prob = nn.softmax(prob, axis=-1)  # feature dim (now minor)
            prob = jnp.swapaxes(prob, -1, -2)            # (..., d_o, H)
        else:
            prob = HeadMLP(feats, dropout=self.dropout_atten, name="nn")(
                gate_in, deterministic=deterministic
            )  # (..., d_o, H)
            prob = nn.softmax(prob, axis=-2)  # softmax over the feature dim
        gate = prob.reshape(*prob.shape[:-2], d_o * h)
        return gate * value, edge_new


class GraphEdgeAttenNetwork(nn.Module):
    """One GCN layer: gather -> fat edge attention -> scatter -> residual MLP.

    x: (B, N, D); edge_feature: (B, E, D); returns updated (x, edge_feature).
    """

    num_heads: int
    dim_node: int
    dim_edge: int
    dim_atten: int
    aggr: str = "max"
    dropout_atten: float | None = 0.5
    use_edge: bool = True
    # Where the nn_edge first-layer node projections are computed.  All
    # three modes are algebraically identical (params too); they differ
    # only in FLOPs and memory traffic — E = N(N-1) edges reuse each
    # node's projection ~N times, so projecting per NODE does ~N/2x fewer
    # matmul FLOPs on the dominant 512->1024 projections:
    #   "edge":   project the gathered per-edge copies (E x 512 x 1024).
    #   "gather": project per node, take_along_axis-gather the 1024-wide
    #             rows per edge.  Measured SLOWER than "edge" on v5e — the
    #             elementwise gather's HBM traffic exceeds the FLOPs saved
    #             (PERFORMANCE.md).
    #   "onehot": project per node, gather via a one-hot (B, E, N) matmul
    #             — the "gather" FLOP saving with MXU-friendly access.
    nn_edge_mode: str = "edge"
    gate_layout: str = "channel"  # see FatEdgeAttention.gate_layout

    @nn.compact
    def __call__(self, x, edge_feature, edge_index, edge_mask, *,
                 deterministic: bool = True):
        x_i, x_j = gather_edge_endpoints(x, edge_index)
        ea = FatEdgeAttention(
            num_heads=self.num_heads,
            dim_node=self.dim_node,
            dim_edge=self.dim_edge,
            dim_atten=self.dim_atten,
            dropout_atten=self.dropout_atten,
            use_edge=self.use_edge,
            gate_layout=self.gate_layout,
            name="edgeatten",
        )
        hid = self.dim_node + self.dim_edge
        # The Dense modules exist in every mode so params are identical.
        dense_i = nn.Dense(hid, use_bias=False, name="edgeatten_nn_edge_fc0_node_i")
        dense_j = nn.Dense(hid, use_bias=False, name="edgeatten_nn_edge_fc0_node_j")
        if self.nn_edge_mode == "gather":
            pi, pj = gather_edge_endpoints(
                jnp.concatenate([dense_i(x), dense_j(x)], axis=-1), edge_index)
            nodes = (pi[..., :hid], pj[..., hid:])
        elif self.nn_edge_mode == "onehot":
            n = x.shape[1]
            oh_i = jax.nn.one_hot(edge_index[..., 0], n, dtype=x.dtype)
            oh_j = jax.nn.one_hot(edge_index[..., 1], n, dtype=x.dtype)
            nodes = (jnp.einsum("ben,bnh->beh", oh_i, dense_i(x)),
                     jnp.einsum("ben,bnh->beh", oh_j, dense_j(x)))
        elif self.nn_edge_mode == "edge":
            nodes = (dense_i(x_i), dense_j(x_j))
        else:
            raise ValueError(f"unknown nn_edge_mode {self.nn_edge_mode!r}")
        msg, edge_new = ea(
            x_i, edge_feature, x_j, deterministic=deterministic,
            nn_edge_nodes=nodes)
        # deterministic == inference: the forward is never differentiated
        # there, so the Pallas segment-max fast path is safe to enable
        agg = scatter_edges_to_nodes(
            msg, edge_index, edge_mask, num_nodes=x.shape[1], aggr=self.aggr,
            use_pallas=deterministic,
        )
        x_new = DenseStack(
            [self.dim_node + self.dim_atten, self.dim_node], name="prop"
        )(jnp.concatenate([x, agg], axis=-1))
        return x_new, edge_new


class TripletGCN(nn.Module):
    """Graph-triple convolution (reference network_TripletGCN.py:43-71).

    message = nn1([x_i, e, x_j]) split into (new_i | new_e | new_j);
    node update = x + nn2(scatter_add(new_i + new_j, target)); under the
    default source_to_target flow x_i is the *target* (edge[..., 1]) and
    aggregation lands there.  nn1 has BatchNorm+ReLU on every layer
    (on_last=True), nn2 between layers only.
    """

    dim_node: int
    dim_edge: int
    dim_hidden: int
    aggr: str = "add"
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, edge_feature, edge_index, edge_mask, *,
                 deterministic: bool = True):
        dh, de = self.dim_hidden, self.dim_edge
        x_j, x_i = gather_edge_endpoints(x, edge_index)  # j=edge[0], i=edge[1]
        h = jnp.concatenate([x_i, edge_feature, x_j], axis=-1)
        # nn1: [in -> dh -> 2dh+de], BN+ReLU after each (on_last=True)
        h = nn.Dense(dh, name="nn1_fc0")(h)
        if self.use_bn:
            h = MaskedBatchNorm(dh, name="nn1_bn0")(h, edge_mask,
                                                    use_running_average=deterministic)
        h = nn.relu(h)
        h = nn.Dense(2 * dh + de, name="nn1_fc1")(h)
        if self.use_bn:
            h = MaskedBatchNorm(2 * dh + de, name="nn1_bn1")(
                h, edge_mask, use_running_average=deterministic)
        h = nn.relu(h)
        new_i = h[..., :dh]
        new_e = h[..., dh:dh + de]
        new_j = h[..., dh + de:]
        msg = new_i + new_j
        agg = scatter_edges_to_nodes(msg, edge_index, edge_mask,
                                     num_nodes=x.shape[1], aggr=self.aggr,
                                     target=1)
        # nn2: [dh -> dh -> dim_node], BN+ReLU between only
        g = nn.Dense(dh, name="nn2_fc0")(agg)
        if self.use_bn:
            g = MaskedBatchNorm(dh, name="nn2_bn0")(
                g, jnp.ones(g.shape[:-1], bool), use_running_average=deterministic)
        g = nn.relu(g)
        g = nn.Dense(self.dim_node, name="nn2_fc1")(g)
        return x + g, new_e


class TripletGCNModel(nn.Module):
    """Stack of TripletGCN layers (network_TripletGCN.py:73-91)."""

    num_layers: int
    dim_node: int
    dim_edge: int
    dim_hidden: int
    aggr: str = "add"
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, e, edge_index, edge_mask, *, deterministic: bool = True):
        for i in range(self.num_layers):
            x, e = TripletGCN(self.dim_node, self.dim_edge, self.dim_hidden,
                              aggr=self.aggr, use_bn=self.use_bn,
                              name=f"gconv_{i}")(x, e, edge_index, edge_mask,
                                                 deterministic=deterministic)
            if i < self.num_layers - 1:
                x, e = nn.relu(x), nn.relu(e)
        return x, e
