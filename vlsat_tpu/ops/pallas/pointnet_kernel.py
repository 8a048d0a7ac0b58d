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


def _kernel_chunked(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    out_ref, acc_ref, *, block_m: int, num_points: int,
                    p_chunk: int):
    """Point-major chunked variant: x_ref is (P, block_m, C) so each point
    chunk is a contiguous (p_chunk * block_m, C) slab; the (rows, 768)
    stage-3 activation never exceeds p_chunk*block_m rows of VMEM, letting
    block_m grow well past the naive kernel's limit."""
    n_chunks = num_points // p_chunk
    c_dim = x_ref.shape[-1]

    def body(c, _):
        x = x_ref[pl.ds(c * p_chunk, p_chunk), :, :].reshape(
            p_chunk * block_m, c_dim)
        h = jnp.maximum(jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
                        + b1_ref[:], 0.0)
        h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
                        + b2_ref[:], 0.0)
        h = jnp.maximum(jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
                        + b3_ref[:], 0.0)
        part = h.reshape(p_chunk, block_m, h.shape[-1]).max(axis=0)
        acc_ref[:] = jnp.where(c == 0, part, jnp.maximum(acc_ref[:], part))
        return c

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[:] = acc_ref[:]


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


@functools.partial(jax.jit, static_argnames=("block_m", "p_chunk", "interpret"))
def pointnet_encode_fused_v2(
    pts: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    block_m: int = 64,
    p_chunk: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Point-major chunked fused PointNet: point axis reduced incrementally
    in VMEM (see _kernel_chunked).  Bit-exact vs the jnp reference; on
    current Mosaic it matches v1 (~3x slower than XLA's own fusion — the
    C=3 lane-padded input dominates), and larger block_m configs trip a
    whole-output-in-scoped-VMEM placement.  Kept as an experimental base
    for future kernel work; production uses the XLA path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, p, c = pts.shape
    assert p % p_chunk == 0, (p, p_chunk)
    m = 1
    for d in lead:
        m *= d
    x = pts.reshape(m, p, c)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.concatenate([x, jnp.zeros((m_pad - m, p, c), x.dtype)], axis=0)
    x_pm = jnp.swapaxes(x, 0, 1)  # (P, M, C): point-major
    out_dim = weights[2].shape[-1]
    w1, w2, w3 = (w.astype(jnp.float32) for w in weights)
    b1, b2, b3 = (b.reshape(1, -1).astype(jnp.float32) for b in biases)

    out = pl.pallas_call(
        functools.partial(_kernel_chunked, block_m=block_m, num_points=p,
                          p_chunk=p_chunk),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((p, block_m, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((block_m, out_dim), jnp.float32)],
        interpret=interpret,
    )(x_pm, w1, b1, w2, b2, w3, b3)
    return out[:m].reshape(*lead, out_dim)
