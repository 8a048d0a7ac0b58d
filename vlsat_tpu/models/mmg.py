"""MMG: the dual-branch (3D / 2D) graph network at the heart of VL-SAT.

Counterpart of the reference's ``MMG`` / ``MMG_single``
(src/model/model_utils/network_MMG.py:115-295).  Re-design highlights:

  * the reference builds per-scene block-diagonal masks and distance-bias
    matrices in a Python loop over the batch every forward
    (network_MMG.py:180-209, with hard-coded ``.cuda()``); here scenes are
    a batch axis, so the mask is the node-padding mask and the distance
    bias is one batched pairwise op + MLP;
  * the per-layer structure is faithful: 3D self-attention (distance-bias,
    'add'), 2D cross-attention (query=2D, key/value = *updated* 3D), one
    GCN per branch, then 2D edge features cross-attend to 3D edges, with
    ReLU+dropout between layers (and after the last when depth == 1);
  * divergence (documented): the reference's edge-level cross-attention
    carries no mask, so at train time 2D edges attend across *all* scenes
    in the concatenated batch (network_MMG.py:231).  We restrict it to
    valid edges of the same scene — identical at eval (batch size 1) and
    strictly more sensible at train.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlsat_tpu.models.gnn import GraphEdgeAttenNetwork
from vlsat_tpu.models.transformer import DistanceBiasMLP, MultiHeadAttention
from vlsat_tpu.ops.attention import pairwise_distance_bias


class MMG(nn.Module):
    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    aggr: str = "max"
    dropout_atten: float = 0.5
    use_edge: bool = True
    nn_edge_mode: str = "edge"
    gate_layout: str = "channel"

    def _gcn(self, name):
        return GraphEdgeAttenNetwork(
            num_heads=self.num_heads,
            dim_node=self.dim_node,
            dim_edge=self.dim_edge,
            dim_atten=self.dim_atten,
            aggr=self.aggr,
            dropout_atten=self.dropout_atten,
            use_edge=self.use_edge,
            nn_edge_mode=self.nn_edge_mode,
            gate_layout=self.gate_layout,
            name=name,
        )

    @nn.compact
    def __call__(self, f3d, f2d, e3d, e2d, edge_index, obj_mask, edge_mask,
                 obj_center, *, deterministic: bool = True,
                 with_2d: bool = True):
        """``with_2d=False`` runs the 3D path alone (f2d/e2d may be None,
        the 3D outputs are bit-identical): the 2D branch only ever READS
        the 3D stream (cross-attention q=2D k/v=3D, network_MMG.py:218,231)
        — at deployment the 3D branch runs by itself (paper protocol),
        skipping half the edge-GEMM FLOPs."""
        node_mask = (obj_mask[:, None, None, :] & obj_mask[:, None, :, None])
        # the edge-level mask stays FACTORED (q_mask/k_mask into the
        # attention core): its dense product is (B, 1, E, E) bool — 520 MB
        # at bucket 64, B=32 — while the node-level one is (B, 1, N, N)
        # with N <= 64 and rides next to an equally-dense distance bias
        bias = DistanceBiasMLP(self.num_heads, name="self_attn_fc")(
            pairwise_distance_bias(jax.lax.stop_gradient(obj_center))
        )
        drop = lambda x: nn.Dropout(self.dropout_atten, deterministic=deterministic)(x)

        for i in range(self.depth):
            f3d = MultiHeadAttention(self.num_heads, self.dim_node, name=f"self_attn_{i}")(
                f3d, f3d, f3d, mask=node_mask, bias=bias, deterministic=deterministic)
            if with_2d:
                f2d = MultiHeadAttention(self.num_heads, self.dim_node, name=f"cross_attn_{i}")(
                    f2d, f3d, f3d, mask=node_mask, bias=bias, deterministic=deterministic)

            f3d, e3d = self._gcn(f"gcn_3d_{i}")(
                f3d, e3d, edge_index, edge_mask, deterministic=deterministic)
            if with_2d:
                f2d, e2d = self._gcn(f"gcn_2d_{i}")(
                    f2d, e2d, edge_index, edge_mask, deterministic=deterministic)

                e2d = MultiHeadAttention(self.num_heads, self.dim_edge, name=f"cross_attn_rel_{i}")(
                    e2d, e3d, e3d, q_mask=edge_mask, k_mask=edge_mask,
                    deterministic=deterministic)

            if i < self.depth - 1 or self.depth == 1:
                # keep the f3d, f2d, e3d, e2d call ORDER of the dual-branch
                # layer: flax auto-names the Dropout submodules by call
                # order, so reordering would silently reassign which RNG
                # stream masks which tensor in training
                f3d = drop(nn.relu(f3d))
                if with_2d:
                    f2d = drop(nn.relu(f2d))
                e3d = drop(nn.relu(e3d))
                if with_2d:
                    e2d = drop(nn.relu(e2d))

        return f3d, f2d, e3d, e2d


class MMGSingle(nn.Module):
    """3D-only stack (reference ``MMG_single``, network_MMG.py:253-295)."""

    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    aggr: str = "max"
    dropout_atten: float = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, f3d, e3d, edge_index, edge_mask, *, deterministic: bool = True):
        drop = lambda x: nn.Dropout(self.dropout_atten, deterministic=deterministic)(x)
        for i in range(self.depth):
            f3d, e3d = GraphEdgeAttenNetwork(
                num_heads=self.num_heads,
                dim_node=self.dim_node,
                dim_edge=self.dim_edge,
                dim_atten=self.dim_atten,
                aggr=self.aggr,
                dropout_atten=self.dropout_atten,
                use_edge=self.use_edge,
                name=f"gcn_3d_{i}",
            )(f3d, e3d, edge_index, edge_mask, deterministic=deterministic)
            if i < self.depth - 1 or self.depth == 1:
                f3d = drop(nn.relu(f3d))
                e3d = drop(nn.relu(e3d))
        return f3d, e3d
