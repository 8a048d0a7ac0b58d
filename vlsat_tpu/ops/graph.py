"""Fixed-shape graph gather/scatter primitives.

TPU-native replacement for the reference's torch-geometric ``MessagePassing``
plumbing (``Gen_Index`` / ``Aggre_Index``,
src/model/model_utils/network_util.py:50-73) and torch-scatter reductions:
gathers are ``take_along_axis`` over padded per-scene edge lists, scatters
are ``jax.ops.segment_*`` with a static segment count, vmapped over the
scene axis.  Invalid (padded) edges are routed to a dump segment.

Empty-segment semantics match torch-scatter: a node with no (valid) incoming
edge aggregates to 0, while a node whose true max is negative keeps its
negative max.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def gather_edge_endpoints(
    x: jnp.ndarray, edge_index: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge endpoint features.

    x: (B, N, D); edge_index: (B, E, 2).
    Returns (x_i, x_j), each (B, E, D), with x_i = x[edge_index[..., 0]]
    (the subject under the reference's ``target_to_source`` flow).
    """
    i = edge_index[..., 0:1]  # (B, E, 1)
    j = edge_index[..., 1:2]
    x_i = jnp.take_along_axis(x, i, axis=1)
    x_j = jnp.take_along_axis(x, j, axis=1)
    return x_i, x_j


def _segment_reduce(data, seg, num_segments, aggr):
    if aggr == "max":
        out = jax.ops.segment_max(data, seg, num_segments=num_segments + 1)
        counts = jax.ops.segment_sum(
            jnp.ones(seg.shape, data.dtype), seg, num_segments=num_segments + 1
        )
        out = jnp.where(counts[:, None] > 0, out, 0.0)
    elif aggr == "add":
        out = jax.ops.segment_sum(data, seg, num_segments=num_segments + 1)
    elif aggr == "mean":
        out = jax.ops.segment_sum(data, seg, num_segments=num_segments + 1)
        counts = jax.ops.segment_sum(
            jnp.ones(seg.shape, data.dtype), seg, num_segments=num_segments + 1
        )
        out = out / jnp.maximum(counts[:, None], 1.0)
    else:
        raise ValueError(f"unknown aggr {aggr!r}")
    return out[:-1]  # drop the dump segment used for invalid edges


@partial(jax.jit, static_argnames=("num_nodes", "aggr"))
def scatter_edges_to_nodes(
    edge_data: jnp.ndarray,
    edge_index: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_nodes: int,
    aggr: str = "max",
    target: int = 0,
) -> jnp.ndarray:
    """Aggregate per-edge features onto nodes.

    edge_data: (B, E, D); edge_index: (B, E, 2); edge_mask: (B, E) bool.
    ``target`` selects which endpoint receives the message (0 = subject,
    matching the reference's ``target_to_source`` aggregation at edge[0]).
    Returns (B, N, D).
    """
    seg = edge_index[..., target]
    seg = jnp.where(edge_mask, seg, num_nodes)  # invalid edges -> dump segment
    fn = partial(_segment_reduce, num_segments=num_nodes, aggr=aggr)
    return jax.vmap(fn)(edge_data, seg)
