"""Symmetric-normalized graph convolution (GCNConv semantics).

Replaces torch-geometric's ``GCNConv(add_self_loops=True)`` used by the
SGGpoint family (src/model/SGGpoint/model.py:140-141): with self-loops,

    out_i = sum_j  A_ij / sqrt(d_i d_j) * x_j   (A includes I; d = 1 + in-degree)

then the dense transform.  Batched over padded per-scene edge lists;
invalid edges contribute nothing and padded nodes keep degree 1 (their
self-loop), staying finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlsat_tpu.ops.graph import gather_edge_endpoints, scatter_edges_to_nodes


def gcn_normalize_adj(edge_index: jnp.ndarray, edge_mask: jnp.ndarray,
                      num_nodes: int):
    """Per-edge symmetric norm coefficients + per-node self-loop coeff."""
    ones = edge_mask.astype(jnp.float32)[..., None]
    deg_in = scatter_edges_to_nodes(ones, edge_index, edge_mask, num_nodes,
                                    aggr="add", target=1)[..., 0] + 1.0
    d_src = jnp.take_along_axis(deg_in, edge_index[..., 0], axis=1)
    d_dst = jnp.take_along_axis(deg_in, edge_index[..., 1], axis=1)
    edge_norm = jax.lax.rsqrt(d_src * d_dst)
    self_norm = 1.0 / deg_in
    return edge_norm, self_norm


def gcn_propagate(x: jnp.ndarray, edge_index: jnp.ndarray, edge_mask: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, D) -> normalized neighborhood aggregation (messages flow
    source (edge[...,0]) -> target (edge[...,1]), torch-geometric default)."""
    n = x.shape[1]
    edge_norm, self_norm = gcn_normalize_adj(edge_index, edge_mask, n)
    x_src, _ = gather_edge_endpoints(x, edge_index)  # one-hot MXU gather
    msg = x_src * edge_norm[..., None]
    agg = scatter_edges_to_nodes(msg, edge_index, edge_mask, n, aggr="add", target=1)
    return agg + x * self_norm[..., None]
