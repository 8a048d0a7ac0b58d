"""Spatial transformer networks (reference STN3d/STNkd).

Counterparts of src/model/model_utils/network_PointNet.py:16-86: predict a
KxK transform from a point set via shared per-point MLP + max-pool + FC
head, initialized so the residual output starts at identity.  The shipped
configs never enable them (input_transform=False, feature_transform=false)
— provided for inventory completeness and ablations.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class STNkd(nn.Module):
    """Per-set KxK transform: conv(64,128,1024)+maxpool -> fc(512,256,k*k),
    biased toward identity."""

    k: int = 3

    @nn.compact
    def __call__(self, pts):
        # pts: (..., P, k)
        x = nn.relu(nn.Dense(64, name="conv1")(pts))
        x = nn.relu(nn.Dense(128, name="conv2")(x))
        x = nn.relu(nn.Dense(1024, name="conv3")(x))
        x = x.max(axis=-2)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.relu(nn.Dense(256, name="fc2")(x))
        x = nn.Dense(self.k * self.k, name="fc3",
                     kernel_init=nn.initializers.zeros)(x)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (x + eye).reshape(*x.shape[:-1], self.k, self.k)


def STN3d() -> STNkd:  # noqa: N802 — reference naming
    return STNkd(k=3)


def apply_transform(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(..., P, k) x (..., k, k) -> transformed points (torch.bmm path,
    network_PointNet.py:126-137)."""
    return jnp.einsum("...pk,...kj->...pj", pts, trans)


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """Orthogonality penalty mean_b ||T_b T_b^t - I||_F on predicted
    transforms (network_PointNet.py:640-647; dead under shipped configs
    since feature_transform=false, provided with the STNs for ablations)."""
    k = trans.shape[-1]
    eye = jnp.eye(k, dtype=trans.dtype)
    diff = jnp.einsum("...ij,...kj->...ik", trans, trans) - eye
    return jnp.mean(jnp.sqrt(jnp.sum(diff * diff, axis=(-2, -1))))
