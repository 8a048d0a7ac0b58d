"""Masked scaled-dot-product attention with optional additive bias.

Covers the reference's ``ScaledDotProductAttention``
(src/model/transformer/attention.py:41-78) plus the per-scene
block-diagonal masking and distance-bias machinery that the reference builds
with a Python loop over the batch (src/model/model_utils/network_MMG.py:
180-209).  Here scenes are a batch axis, so the block-diagonal mask is just a
key-padding mask and the distance bias is a single batched pairwise op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Above a per-(batch, head)-slice score size of ~7M elements (Nq*Nk), the
# handwritten mask->exp->normalize chain stops fusing into a streaming
# softmax and XLA materializes the full (B, H, Nq, Nk) f32 temporaries in
# HBM: at bucket 64 (E=4032, Nq*Nk=16.3M, B=4) it measured 108 ms/call
# where jax.nn.dot_product_attention's lowering ran the same math in
# 8.8 ms (~77% MXU) — the entire "bucket-64 forward cliff" of the round-4
# sweep.  The onset is a SLICE-size cliff, not a total-size one — probed
# on the v5e (B=4, H=8, D=64):
#   E=2560 (slice 6.55M): handwritten 2.60 ms vs dpa 4.46 ms  (keep)
#   E=2816 (slice 7.93M): handwritten 10.29 ms vs dpa 3.91 ms (route)
# while bucket 48 (E=2256, slice 5.09M) stays handwritten-faster up
# through B=32 (sweep: hand 95.5 ms vs dpa 106.6 ms at B=32) even though
# its TOTAL crosses 1.3G elements there.  A secondary total-size gate
# catches the very-large-batch regime where dpa wins again despite a
# sub-cliff slice (bucket 48 B=64, total 2.61G: hand 215.0 ms vs dpa
# 162.5 ms).  Below both gates the handwritten core WINS and every
# previously-benched shape stays on its round-3 codepath bit-for-bit.
# Tests override LARGE_SCORE_ELEMENTS to exercise the large-score path
# on small shapes.
LARGE_SCORE_SLICE = 7 * 1024 * 1024            # Nq*Nk, between the probe points
LARGE_SCORE_ELEMENTS = 2 * 1024 * 1024 * 1024  # B*H*Nq*Nk, between B=32/B=64 @ bucket 48


def _dpa_large(q, k, v, mask, bias, q_mask=None, k_mask=None):
    """Large-score attention via jax.nn.dot_product_attention (same
    (B, N, H, D) head-last layout), preserving the handwritten core's
    fully-masked-row semantics: rows with no valid key return ZEROS
    (dot_product_attention would softmax all -inf logits into NaN), so
    such rows are first unmasked (their output is garbage either way —
    callers discard padded rows) and then zeroed.  Factored q_mask/k_mask
    (B, Nq)/(B, Nk) never build the dense (B, 1, Nq, Nk) mask: keys mask
    as a broadcast (B, 1, 1, Nk) plane, query rows zero via the output
    product."""
    any_k = None
    if k_mask is not None:
        # a scene whose keys are ALL masked would softmax -inf rows into
        # NaN; lift its key plane (outputs are zeroed below via q_mask &
        # any_k) — (B, 1, 1, Nk), broadcast inside dpa's lowering
        any_k = jnp.any(k_mask, axis=-1, keepdims=True)     # (B, 1)
    any_valid = None
    if mask is not None:
        if k_mask is not None:
            # intersect BEFORE the row-validity check: a query row whose
            # mask∩k_mask is empty (but mask alone non-empty) must hit the
            # zeroing path below, not softmax an all-False row into NaN
            mask = mask & k_mask[:, None, None, :]
        any_valid = jnp.any(mask, axis=-1, keepdims=True)   # (B, 1|H, Nq, 1)
        mask = mask | ~any_valid
    elif k_mask is not None:
        mask = (k_mask | ~any_k)[:, None, None, :]
    out = jax.nn.dot_product_attention(q, k, v, bias=bias, mask=mask)
    zero = jnp.zeros((), out.dtype)
    if any_valid is not None:
        row_ok = jnp.moveaxis(any_valid, 1, 2)              # (B, Nq, 1|H, 1)
        out = jnp.where(row_ok, out, zero)
    if k_mask is not None:
        out = jnp.where(any_k[:, :, None, None], out, zero)
    if q_mask is not None:
        out = jnp.where(q_mask[:, :, None, None], out, zero)
    return out


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
    q_mask: jnp.ndarray | None = None,
    k_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Head-LAST attention core: q/k/v are (B, N, H, D) and stay that way.

    Same math as :func:`masked_attention`, but the head axis is carried in
    the einsum subscripts instead of being physically transposed to axis 1
    — on TPU the (B, N, H, D) <-> (B, H, N, D) transposes around the core
    lower to real layout-copy ops (same pathology as the round-2b
    ``ChannelDense`` fix, PERFORMANCE.md).  mask/bias still broadcast to
    (B, H, Nq, Nk).  Returns (B, Nq, H, Dv).

    ``q_mask``/``k_mask`` ((B, Nq)/(B, Nk) bool) are the FACTORED form of
    the rectangular padding mask ``q_mask & k_mask`` every call site of
    the dense ``mask`` builds (network_MMG.py's block-diagonal masks are
    exactly such products): keys mask as a broadcast plane pre-softmax,
    padded query rows zero via an output product — bit-identical to the
    dense mask, without ever materializing (B, 1, Nq, Nk).  At the
    edge-level cross-attention that dense bool is B*E^2 — 520 MB at
    bucket 64, B=32 — and was the reason large-bucket eval hit the
    compile-helper wall one batch size earlier than the math required.

    Score matrices above ``LARGE_SCORE_SLICE`` per (batch, head) slice or
    ``LARGE_SCORE_ELEMENTS`` total route through
    ``jax.nn.dot_product_attention`` (see the constants' comment — the
    edge-level cross-attention at bucket >= ~56 at any batch, and bucket
    48 at B >= 64); the multiplicative-bias path (reference way='mul',
    dead in the shipped configs) has no dpa equivalent and always takes
    the handwritten chain.
    """
    b, h = q.shape[0], q.shape[-2]
    slice_scores = q.shape[-3] * k.shape[-3]
    n_scores = b * h * slice_scores
    large = slice_scores >= LARGE_SCORE_SLICE or n_scores >= LARGE_SCORE_ELEMENTS
    if large and (bias is None or bias_way == "add"):
        return _dpa_large(q, k, v, mask, bias, q_mask=q_mask, k_mask=k_mask)
    scale = jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / scale
    if bias is not None:
        att = att + bias if bias_way == "add" else att * bias
    if k_mask is not None:
        kp = k_mask[:, None, None, :]                       # (B, 1, 1, Nk)
        att = jnp.where(kp, att, NEG_INF)
    if mask is not None:
        att = jnp.where(mask, att, NEG_INF)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    if k_mask is not None:
        att = jnp.where(kp, att, 0.0)
    if mask is not None:
        att = jnp.where(mask, att, 0.0)
    denom = jnp.sum(att, axis=-1, keepdims=True)
    att = att / jnp.maximum(denom, 1e-20)
    out = jnp.einsum("bhqk,bkhv->bqhv", att, v)
    if q_mask is not None:
        out = jnp.where(q_mask[:, :, None, None], out, jnp.zeros((), out.dtype))
    return out


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
