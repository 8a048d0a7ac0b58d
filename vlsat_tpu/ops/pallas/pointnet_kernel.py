"""Fused PointNet encoder kernel (Pallas/TPU).

The XLA version of the PointNet encoder materializes the per-point
activations — for the object encoder that is a (B*N, P, 768) f32 tensor
(~50 MB at production batch shapes) written to and re-read from HBM around
the max-pool.  This kernel keeps the whole chain

    relu(relu(relu(x@W1+b1)@W2+b2)@W3+b3).max(points)

in VMEM per node tile: HBM traffic collapses to inputs + weights + pooled
outputs.  Used on the inference path; training uses the jnp reference
implementation (vlsat_tpu.ops.pointnet), which XLA differentiates.

Layout: points arrive flattened as (M*P, C); the kernel processes BLOCK_M
nodes (= BLOCK_M*P rows) per grid step and reduces P inside registers.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            *, block_m: int, num_points: int):
    x = x_ref[:]  # (block_m * P, C)
    h = jnp.maximum(jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
                    + b1_ref[:], 0.0)
    h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
                    + b2_ref[:], 0.0)
    h = jnp.maximum(jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
                    + b3_ref[:], 0.0)
    out = h.reshape(block_m, num_points, h.shape[-1]).max(axis=1)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def pointnet_encode_fused(
    pts: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    block_m: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """pts (..., P, C) -> (..., out); three-layer fused PointNet.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests/CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(weights) == 3 and len(biases) == 3
    *lead, p, c = pts.shape
    m = 1
    for d in lead:
        m *= d
    x = pts.reshape(m, p, c)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.concatenate([x, jnp.zeros((m_pad - m, p, c), x.dtype)], axis=0)
    x_flat = x.reshape(m_pad * p, c)
    out_dim = weights[2].shape[-1]

    w1, w2, w3 = (w.astype(jnp.float32) for w in weights)
    b1, b2, b3 = (b.reshape(1, -1).astype(jnp.float32) for b in biases)

    grid = (m_pad // block_m,)
    out = pl.pallas_call(
        functools.partial(_kernel, block_m=block_m, num_points=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m * p, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_dim), jnp.float32),
        interpret=interpret,
    )(x_flat, w1, b1, w2, b2, w3, b3)
    return out[:m].reshape(*lead, out_dim)
