"""Multi-view projection front-end tests (synthetic pinhole cameras)."""

import numpy as np
import jax.numpy as jnp

from vlsat_tpu.projection import (
    MultiViewFeatureExtractor,
    project_points,
    select_view_crops,
)

W, H, F = 320, 240, 2
INTR = np.asarray([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0], [0, 0, 1, 0]],
                  np.float32)


def cameras():
    # cam0 at origin looking +z; cam1 shifted so the cluster is out of view
    e0 = np.eye(4, dtype=np.float32)
    e1 = np.eye(4, dtype=np.float32)
    e1[0, 3] = 50.0
    return np.stack([e0, e1])


def test_project_points_pinhole():
    pts = np.asarray([[0, 0, 2.0], [0.4, 0.2, 2.0], [0, 0, -1.0]], np.float32)
    pix, vis = project_points(jnp.asarray(pts), jnp.asarray(cameras()),
                              jnp.asarray(INTR), W, H,
                              require_positive_depth=True)
    pix, vis = np.asarray(pix), np.asarray(vis)
    np.testing.assert_allclose(pix[0, 0], [W / 2, H / 2], atol=1e-4)
    np.testing.assert_allclose(pix[0, 1], [W / 2 + 20, H / 2 + 10], atol=1e-3)
    assert vis[0, 0] and vis[0, 1]
    assert not vis[0, 2]  # behind the camera
    assert not vis[1].any()  # shifted camera misses everything


def test_view_selection_tiers():
    rng = np.random.RandomState(0)
    pts = (rng.rand(50, 3).astype(np.float32) - 0.5) * 0.5 + [0, 0, 2.0]
    pix, vis = project_points(jnp.asarray(pts), jnp.asarray(cameras()),
                              jnp.asarray(INTR), W, H,
                              require_positive_depth=True)
    pix, vis = np.asarray(pix), np.asarray(vis)
    crops = select_view_crops(pix, vis, clip_rank=[0, 1], width=W, height=H)
    assert crops[0].tier == "A" and crops[0].frame == 0
    t, l, b, r = crops[0].box
    assert 0 <= t < b <= H and 0 <= l < r <= W

    # no visible projections anywhere -> tier C whole frame
    crops_c = select_view_crops(pix * 0 + 10_000, vis & False, clip_rank=[1, 0],
                                width=W, height=H)
    assert crops_c[0].tier == "C" and crops_c[0].box is None


def test_feature_extractor_end_to_end(tmp_path):
    rng = np.random.RandomState(1)
    pts = (rng.rand(80, 3).astype(np.float32) - 0.5) * 0.4 + [0, 0, 2.0]
    points = np.concatenate([pts, rng.rand(30, 3).astype(np.float32) + 5])
    instances = np.concatenate([np.full(80, 7), np.zeros(30)]).astype(np.int32)
    images = [rng.randint(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(F)]

    def encoder(views):
        return np.stack([np.full(16, float(v.shape[0] * v.shape[1]) % 97 + 1.0)
                         for v in views]).astype(np.float32)

    ex = MultiViewFeatureExtractor(encoder, feat_dim=16)
    feats = ex.process_scene(
        points, instances, {7: "chair"}, images, cameras(), INTR,
        {"chair": [0, 1]}, W, H, save_dir=str(tmp_path))
    assert 7 in feats and feats[7].shape == (16,)
    import os
    assert os.path.exists(tmp_path / "instance_7_class_chair_origin_view_mean.npy")
    assert os.path.exists(tmp_path / "project_quality.txt")
