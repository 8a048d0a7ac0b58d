"""Masked scaled-dot-product attention with optional additive bias.

Covers the reference's ``ScaledDotProductAttention``
(src/model/transformer/attention.py:41-78) plus the per-scene
block-diagonal masking and distance-bias machinery that the reference builds
with a Python loop over the batch (src/model/model_utils/network_MMG.py:
180-209).  Here scenes are a batch axis, so the block-diagonal mask is just a
key-padding mask and the distance bias is a single batched pairwise op.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    bias_way: str = "add",
) -> jnp.ndarray:
    """Multi-head attention core.

    q: (B, H, Nq, Dk); k: (B, H, Nk, Dk); v: (B, H, Nk, Dv)
    mask: broadcastable to (B, H, Nq, Nk); True/1 = attend, False = masked
    bias: broadcastable to (B, H, Nq, Nk); applied 'add' (pre-softmax add,
      the distance-bias path) or 'mul' (reference way='mul').
    Returns (B, H, Nq, Dv).

    Rows whose keys are fully masked produce zeros instead of NaN (padded
    query rows are discarded by the caller's masks anyway).
    """
    scale = jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale
    if bias is not None:
        att = att + bias if bias_way == "add" else att * bias
    if mask is not None:
        att = jnp.where(mask, att, NEG_INF)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    if mask is not None:
        att = jnp.where(mask, att, 0.0)
    denom = jnp.sum(att, axis=-1, keepdims=True)
    att = att / jnp.maximum(denom, 1e-20)
    return jnp.einsum("bhqk,bhkv->bhqv", att, v)


def masked_attention_bnhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    bias_way: str = "add",
) -> jnp.ndarray:
    """Head-LAST attention core: q/k/v are (B, N, H, D) and stay that way.

    Same math as :func:`masked_attention`, but the head axis is carried in
    the einsum subscripts instead of being physically transposed to axis 1
    — on TPU the (B, N, H, D) <-> (B, H, N, D) transposes around the core
    lower to real layout-copy ops (same pathology as the round-2b
    ``ChannelDense`` fix, PERFORMANCE.md).  mask/bias still broadcast to
    (B, H, Nq, Nk).  Returns (B, Nq, H, Dv).
    """
    scale = jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / scale
    if bias is not None:
        att = att + bias if bias_way == "add" else att * bias
    if mask is not None:
        att = jnp.where(mask, att, NEG_INF)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    if mask is not None:
        att = jnp.where(mask, att, 0.0)
    denom = jnp.sum(att, axis=-1, keepdims=True)
    att = att / jnp.maximum(denom, 1e-20)
    return jnp.einsum("bhqk,bkhv->bqhv", att, v)


def pairwise_distance_bias(centers: jnp.ndarray) -> jnp.ndarray:
    """Pairwise [Δxyz, |Δ|] features for the distance-bias MLP.

    centers: (B, N, 3) -> (B, N, N, 4).  Entry [b, q, k] holds
    centers[k] − centers[q] followed by the Euclidean distance, matching the
    reference layout (network_MMG.py:194-199, where center_A varies along
    the key axis).  A tiny epsilon keeps the diagonal's sqrt gradient
    finite; centers are stop_gradient'ed by callers as in the reference.
    """
    delta = centers[:, None, :, :] - centers[:, :, None, :]  # (B, Nq, Nk, 3)
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True) + 1e-24)
    return jnp.concatenate([delta, dist], axis=-1)
