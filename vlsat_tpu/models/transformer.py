"""Post-norm multi-head attention block.

Counterpart of the reference's ``ScaledDotProductAttention`` +
``MultiHeadAttention`` (src/model/transformer/attention.py) with the
same residual / dropout / post-LayerNorm ordering, built on the
mask-safe attention core in :mod:`vlsat_tpu.ops.attention`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vlsat_tpu.ops.attention import masked_attention_bnhd


class MultiHeadAttention(nn.Module):
    """out = LayerNorm(q + Dropout(fc_o(attention(q, k, v)))).

    mask: (B, 1|H, Nq, Nk) bool, True = attend.
    bias: optional additive (way='add') or multiplicative (way='mul')
    attention weights, broadcastable to (B, H, Nq, Nk) — the reference's
    ``attention_weights`` path used for the distance bias.
    """

    num_heads: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, *, mask=None, bias=None, bias_way="add",
                 q_mask=None, k_mask=None, deterministic: bool = True):
        h = self.num_heads
        dk = self.d_model // h

        # head-LAST layout throughout: the (B,N,H,D)<->(B,H,N,D) transposes
        # a head-first core needs lower to real TPU layout copies
        # (PERFORMANCE.md round 3); the einsum core carries H in subscripts
        def split(x, name):
            y = nn.Dense(h * dk, name=name)(x)  # (B, N, H*dk)
            return y.reshape(*y.shape[:-1], h, dk)

        qh = split(q, "fc_q")
        kh = split(k, "fc_k")
        vh = split(v, "fc_v")
        out = masked_attention_bnhd(qh, kh, vh, mask=mask, bias=bias,
                                    bias_way=bias_way,
                                    q_mask=q_mask, k_mask=k_mask)
        out = out.reshape(*q.shape[:-1], h * dk)
        out = nn.Dense(self.d_model, name="fc_o")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(name="layer_norm")(q + out)


def position_embedding(positions: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Sinusoid position embedding (reference transformer/utils.py:6-16;
    dead code in the shipped configs, kept for surface parity): even
    channels sin, odd channels cos, frequency 10000^(2i/d)."""
    pos = positions.reshape(-1, 1).astype(jnp.float32)
    dim = jnp.arange(d_model // 2, dtype=jnp.float32).reshape(1, -1)
    angle = pos / jnp.power(10000.0, 2 * dim / d_model)
    out = jnp.zeros((pos.shape[0], d_model), jnp.float32)
    out = out.at[:, ::2].set(jnp.sin(angle))
    out = out.at[:, 1::2].set(jnp.cos(angle))
    return out


def sinusoid_encoding_table(max_len: int, d_model: int,
                            padding_idx: int | None = None) -> jnp.ndarray:
    """(max_len, d_model) table (transformer/utils.py:19-25)."""
    out = position_embedding(jnp.arange(max_len), d_model)
    if padding_idx is not None:
        out = out.at[padding_idx].set(0.0)
    return out


class PositionWiseFeedForward(nn.Module):
    """Post-norm residual FFN (transformer/utils.py:27-49).  Unused by the
    shipped reference configs; provided for the transformer surface."""

    d_model: int = 512
    d_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.d_ff, name="fc1")(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(name="layer_norm")(x + h)


class DistanceBiasMLP(nn.Module):
    """[Δxyz, dist] -> per-head additive attention bias.

    Reference ``self_attn_fc`` (network_MMG.py:165-173): Linear(4, 32),
    ReLU, LayerNorm, Linear(32, 32), ReLU, LayerNorm, Linear(32, heads).
    Input (B, N, N, 4) -> output (B, H, N, N).
    """

    num_heads: int

    @nn.compact
    def __call__(self, w):
        w = nn.LayerNorm(name="ln0")(nn.relu(nn.Dense(32, name="fc0")(w)))
        w = nn.LayerNorm(name="ln1")(nn.relu(nn.Dense(32, name="fc1")(w)))
        w = nn.Dense(self.num_heads, name="fc2")(w)
        return jnp.moveaxis(w, -1, 1)  # (B, H, N, N)
