"""Functional PointNet encoder: shared per-point MLP + max-pool.

The compute core of the reference's ``PointNetfeat``
(src/model/model_utils/network_PointNet.py:121-170): three 1x1 convolutions
(pointwise dense layers) with ReLU, then a channel-wise max over points.
Here it is a pure function over ``(..., P, C)`` tensors so the same code
serves the object encoder (P=128, C=3 -> 768) and, with P=1, the edge
"PointNet" (11 -> 512) which degenerates to an MLP.

Note: the reference instantiates BatchNorm layers but discards their output
(``self.bnX(x)`` without assignment, network_PointNet.py:142-160) and ships
with WITH_BN=false; we therefore implement the BN-free path only.

A fused Pallas kernel for the (P=128) hot path lives in
``vlsat_tpu.ops.pallas.pointnet_kernel``; this jnp version is the reference
implementation and the fallback.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def pointnet_encode(
    pts: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """pts: (..., P, C) -> (..., out).

    weights[i]: (C_in, C_out) dense kernels; ReLU after every layer
    (including the last, before the max-pool, as in the reference).
    """
    x = pts
    for w, b in zip(weights, biases):
        x = jnp.maximum(x @ w + b, 0.0)
    return x.max(axis=-2)
