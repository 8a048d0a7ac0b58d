"""DGCNN primitives: kNN graph + EdgeConv feature construction.

Counterpart of the reference's ``knn`` / ``get_graph_feature``
(src/model/SGGpoint/model.py:62-95), batched over (B, N, P, C) point sets
instead of a flat (M, C, P) batch with hard-coded ``.cuda()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_indices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: (..., P, C) -> (..., P, k) nearest-neighbor indices (incl. self).

    Uses the reference's -||xi-xj||^2 = -xx - xx^T + 2 x x^T form.
    """
    inner = 2.0 * jnp.einsum("...pc,...qc->...pq", x, x)
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    neg_dist = inner - sq - jnp.swapaxes(sq, -1, -2)
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx


def graph_feature(x: jnp.ndarray, k: int = 20, idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """EdgeConv input: (..., P, C) -> (..., P, k, 2C) = [x_j - x_i, x_i]."""
    if idx is None:
        idx = knn_indices(x, k)
    gathered = jnp.take_along_axis(
        x[..., None, :, :], idx[..., None], axis=-2
    )  # (..., P, k, C)
    center = jnp.broadcast_to(x[..., :, None, :], gathered.shape)
    return jnp.concatenate([gathered - center, center], axis=-1)
