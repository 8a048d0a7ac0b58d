"""Shared neural building blocks (flax.linen).

Counterparts of the reference's ``build_mlp`` / ``MLP`` helpers
(src/model/model_utils/network_util.py:13-47), ``PointNetfeat``
(network_PointNet.py:88-170), the frozen CLIP ``AdapterModel``
(clip_adapter/model.py:6-33) and the BatchNorm usage in ``mlp_3d``
(SGFN_MMG/model.py:106-111) — the latter reimplemented as a masked
batch-norm because our batches carry padded nodes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseStack(nn.Module):
    """Linear chain with ReLU between layers (reference ``build_mlp``).

    ``activate_last`` mirrors ``on_last``; ``dropout`` (if set) is applied
    after each activation, matching the reference's layer ordering.
    """

    features: Sequence[int]
    activate_last: bool = False
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}")(x)
            last = i == n - 1
            if not last or self.activate_last:
                x = nn.relu(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ChannelDense(nn.Module):
    """Dense over the SECOND-to-last axis: (..., C, H) -> (..., F, H).

    Same parameters as ``nn.Dense`` (kernel (C, F), bias (F,)) but the
    contraction runs on axis -2 via dot_general instead of physically
    transposing to (..., H, C) and back — on TPU those swapaxes lower to
    real layout-copy ops costing ~145 us/iter in the eval step (round-2b
    profile); contracting in place keeps (..., *, H) layouts end to end.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-2], self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jnp.einsum("...ch,cf->...fh", x, kernel)
        return y + bias[:, None]


class HeadMLP(nn.Module):
    """Per-head MLP over the channel axis (reference conv1x1 ``MLP``).

    Input (..., C, H): a 1x1 Conv over C with H as the spatial axis, i.e.
    one shared MLP applied independently per head.  Dropout (p from config
    DROP_OUT_ATTEN) sits after each inner ReLU as in network_util.py:13-28.

    ``head_major=True`` takes (..., H, C) input instead and applies plain
    last-axis Dense layers — algebraically identical with an IDENTICAL
    parameter tree (Dense and ChannelDense share kernel (C, F) / bias (F,)
    shapes and inits), so checkpoints are interchangeable; only the
    caller-side layout differs (see FatEdgeAttention.gate_layout).
    """

    features: Sequence[int]
    dropout: float | None = None
    head_major: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            if self.head_major:
                x = nn.Dense(f, name=f"conv{i}")(x)
            else:
                x = ChannelDense(f, name=f"conv{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid nodes of a padded batch.

    The reference normalizes over the concatenated node axis
    (``torch.nn.BatchNorm1d``); with padding we must exclude invalid rows
    from the batch statistics.  Running stats follow torch semantics:
    biased variance for normalization, unbiased for the running update,
    momentum 0.1.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, *, use_running_average: bool):
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask.astype(x.dtype)[..., None]
            n = jnp.maximum(w.sum(), 1.0)
            axes = tuple(range(x.ndim - 1))
            mean = (x * w).sum(axis=axes) / n
            var = (w * jnp.square(x - mean)).sum(axis=axes) / n
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * n / jnp.maximum(n - 1, 1.0)
        y = (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return y


class PointNetEncoder(nn.Module):
    """Shared per-point MLP + max-pool (reference ``PointNetfeat``).

    (..., P, C) -> (..., out_size).  The reference's BatchNorm calls are
    no-ops (outputs discarded, network_PointNet.py:142-160) and WITH_BN is
    false in the shipped config, so only the BN-free path exists here.
    ReLU follows every layer, including the last before pooling.
    """

    out_size: int
    hidden: Sequence[int] = (64, 128)
    # Route through the Pallas fused kernel (inference).  Bit-exact vs the
    # XLA path, but device-true measurement (PERFORMANCE.md) shows XLA's
    # own fusion is currently ~3x faster at every tested size — keep this
    # opt-in as a base for future kernel work, not a default.
    fused: bool = False

    @nn.compact
    def __call__(self, pts):
        dims = (*self.hidden, self.out_size)
        denses = [nn.Dense(f, name=f"conv{i + 1}") for i, f in enumerate(dims)]
        if self.fused and len(dims) == 3 and not self.is_initializing():
            # bind identical params via per-layer dummy rows, then run fused
            cin = pts.shape[-1]
            for d, f in zip(denses, dims):
                d(jnp.zeros((1, cin), pts.dtype))
                cin = f
            ws = [d.variables["params"]["kernel"] for d in denses]
            bs = [d.variables["params"]["bias"] for d in denses]
            from vlsat_tpu.ops.pallas.pointnet_kernel import pointnet_encode_fused

            return pointnet_encode_fused(pts, ws, bs)
        x = pts
        for d in denses[:-1]:
            x = nn.relu(d(x))
        x = nn.relu(denses[-1](x))
        return x.max(axis=-2)


class AdapterModel(nn.Module):
    """Residual CLIP-feature adapter (clip_adapter/model.py:25-32).

    out = alpha * fc2(relu(fc1(x))) + (1 - alpha) * x.  Frozen inside the
    flagship model; weights come from the shipped ``origin_mean.pth`` via
    tools/import_torch_weights.py.
    """

    hidden: int = 256
    alpha: float = 0.5

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return self.alpha * h + (1 - self.alpha) * x
