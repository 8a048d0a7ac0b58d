"""Instance / edge spatial descriptors (batched, fixed shape).

Re-designs the reference's per-instance ``gen_descriptor``
(src/utils/op_utils.py:47-64) and the MessagePassing-based
``Gen_edge_descriptor`` (src/utils/op_utils.py:67-97) as single batched XLA
ops over padded scene tensors: no per-edge Python, no gather machinery beyond
``take_along_axis``.
"""

from __future__ import annotations

import jax.numpy as jnp

from vlsat_tpu.ops.graph import gather_edge_endpoints


def gen_descriptor(pts: jnp.ndarray) -> jnp.ndarray:
    """11-dim descriptor per node from raw (uncentered) points.

    pts: (..., P, 3) -> (..., 11) = [centroid(3), std(3), bbox dims(3),
    volume(1), max length(1)].  std uses ddof=1 to match ``torch.std``.
    """
    centroid = pts.mean(axis=-2)
    # torch.std default is the unbiased (ddof=1) estimator.
    var = jnp.square(pts - centroid[..., None, :]).sum(axis=-2) / (pts.shape[-2] - 1)
    std = jnp.sqrt(var)
    dims = pts.max(axis=-2) - pts.min(axis=-2)
    volume = jnp.prod(dims, axis=-1, keepdims=True)
    length = dims.max(axis=-1, keepdims=True)
    return jnp.concatenate([centroid, std, dims, volume, length], axis=-1)


def edge_descriptor(descriptor: jnp.ndarray, edge_index: jnp.ndarray) -> jnp.ndarray:
    """Relative spatial descriptor per directed edge.

    descriptor: (B, N, 11); edge_index: (B, E, 2) — subject at [..., 0].
    Returns (B, E, 11) = [Δcentroid(3), Δstd(3), log dim ratio(3),
    log volume ratio(1), log length ratio(1)] with Δ = subject − object,
    matching reference flow ``target_to_source`` (x_i = subject).
    """
    d_i, d_j = gather_edge_endpoints(descriptor, edge_index)
    delta = d_i[..., 0:6] - d_j[..., 0:6]
    log_ratio = jnp.log(d_i[..., 6:11] / d_j[..., 6:11])
    return jnp.concatenate([delta, log_ratio], axis=-1)
