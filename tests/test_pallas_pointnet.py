"""Fused Pallas PointNet kernel parity (interpret mode on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp

from vlsat_tpu.ops.pointnet import pointnet_encode
from vlsat_tpu.ops.pallas.pointnet_kernel import pointnet_encode_fused


def test_fused_matches_reference():
    rng = np.random.RandomState(0)
    M, P, C, OUT = 10, 32, 3, 64  # M not a multiple of block_m: tests padding
    pts = jnp.asarray(rng.randn(M, P, C).astype(np.float32))
    ws = [jnp.asarray(rng.randn(C, 16).astype(np.float32)),
          jnp.asarray(rng.randn(16, 32).astype(np.float32)),
          jnp.asarray(rng.randn(32, OUT).astype(np.float32))]
    bs = [jnp.asarray(rng.randn(16).astype(np.float32)),
          jnp.asarray(rng.randn(32).astype(np.float32)),
          jnp.asarray(rng.randn(OUT).astype(np.float32))]
    ref = np.asarray(pointnet_encode(pts, ws, bs))
    out = np.asarray(pointnet_encode_fused(pts, ws, bs, block_m=4))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_module_path():
    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    import dataclasses

    b = make_batch(node_counts=(4,), num_points=16,
                   num_obj_classes=20, num_rel_classes=7)
    cfg = MMGNetConfig(num_obj_classes=20, num_rel_classes=7)
    model = MMGNet(cfg=cfg)
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   b, istrain=True)
    out_ref = model.apply(v, b, istrain=False)

    fused_model = MMGNet(cfg=dataclasses.replace(cfg, fused_pointnet=True))
    out_fused = fused_model.apply(v, b, istrain=False)
    np.testing.assert_allclose(
        np.asarray(out_fused["obj_logits_3d"]),
        np.asarray(out_ref["obj_logits_3d"]), rtol=1e-4, atol=1e-4,
    )


def test_fused_v2_matches_reference():
    from vlsat_tpu.ops.pallas.pointnet_kernel import pointnet_encode_fused_v2

    rng = np.random.RandomState(1)
    M, P, C, OUT = 10, 32, 3, 64
    pts = jnp.asarray(rng.randn(M, P, C).astype(np.float32))
    ws = [jnp.asarray(rng.randn(C, 16).astype(np.float32)),
          jnp.asarray(rng.randn(16, 32).astype(np.float32)),
          jnp.asarray(rng.randn(32, OUT).astype(np.float32))]
    bs = [jnp.asarray(rng.randn(16).astype(np.float32)),
          jnp.asarray(rng.randn(32).astype(np.float32)),
          jnp.asarray(rng.randn(OUT).astype(np.float32))]
    ref = np.asarray(pointnet_encode(pts, ws, bs))
    out = np.asarray(pointnet_encode_fused_v2(pts, ws, bs, block_m=4, p_chunk=8))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
