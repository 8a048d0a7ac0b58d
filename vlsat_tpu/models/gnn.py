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
import jax.numpy as jnp

from vlsat_tpu.models.layers import DenseStack, HeadMLP
from vlsat_tpu.ops.graph import gather_edge_endpoints, scatter_edges_to_nodes


class FatEdgeAttention(nn.Module):
    """Edge update + feature-gated message for one edge-attention layer."""

    num_heads: int
    dim_node: int
    dim_edge: int
    dim_atten: int
    dropout_atten: float | None = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, x_i, edge, x_j, *, deterministic: bool = True):
        h = self.num_heads
        d_n = self.dim_node // h
        d_e = self.dim_edge // h
        d_o = self.dim_atten // h

        # edge feature update: MLP([x_i, e, x_j]) (network_MMG.py:87-93)
        edge_new = DenseStack(
            [self.dim_node + self.dim_edge, self.dim_edge], name="nn_edge"
        )(jnp.concatenate([x_i, edge, x_j], axis=-1))

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

    @nn.compact
    def __call__(self, x, edge_feature, edge_index, edge_mask, *,
                 deterministic: bool = True):
        x_i, x_j = gather_edge_endpoints(x, edge_index)
        msg, edge_new = FatEdgeAttention(
            num_heads=self.num_heads,
            dim_node=self.dim_node,
            dim_edge=self.dim_edge,
            dim_atten=self.dim_atten,
            dropout_atten=self.dropout_atten,
            use_edge=self.use_edge,
            name="edgeatten",
        )(x_i, edge_feature, x_j, deterministic=deterministic)
        agg = scatter_edges_to_nodes(
            msg, edge_index, edge_mask, num_nodes=x.shape[1], aggr=self.aggr
        )
        x_new = DenseStack(
            [self.dim_node + self.dim_atten, self.dim_node], name="prop"
        )(jnp.concatenate([x, agg], axis=-1))
        return x_new, edge_new
