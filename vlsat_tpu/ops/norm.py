"""NaN-safe L2 normalization.

``x / x.norm()`` has a NaN *gradient* at exactly-zero rows even when the
forward is guarded with max(norm, eps) — the chain rule multiplies the
guard's zero coefficient by norm's 0/0 gradient.  Padded rows can be (or
train themselves to) zero, so every normalization in the framework uses the
smooth form ``x * rsqrt(sum(x^2) + eps)`` instead; for rows of realistic
magnitude the fp32 forward is bit-identical to the reference's
``x / x.norm(dim=-1, keepdim=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)
