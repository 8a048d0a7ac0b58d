"""Regression tests for the code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.mini_data import make_mini_dataset


def test_sgpn_through_loader_and_train_step(tmp_path):
    """Finding 1: SGPN must run through the data pipeline and a train step."""
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.config import load_config
    from vlsat_tpu.data.dataset import SceneLoader, SSGScenes
    from vlsat_tpu.models.registry import build_model
    from vlsat_tpu.train.optim import make_optimizer
    from vlsat_tpu.train.state import create_train_state
    from vlsat_tpu.train.step import make_train_step

    ds = SSGScenes(root, scans, "train_scans", with_union_points=True,
                   num_points=8, num_points_union=16)
    batch = next(iter(SceneLoader(ds, batch_size=2, shuffle=True, for_train=True)))
    assert batch.rel_points is not None
    assert batch.rel_points.shape[-1] == 4

    cfg = load_config(overrides={"NAME": "SGPN"})
    model, loss_fn = build_model("SGPN", 160, 26, cfg.MODEL)
    opt = make_optimizer(lr=1e-3, max_iteration=100)
    state = create_train_state(model, batch, opt, seed=0)
    step = make_train_step(model, opt, donate=False,
                           objective=lambda o, b: loss_fn(o, b))
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))


def test_config_accepts_all_registry_names():
    """Finding 5: every registry NAME passes the config enum."""
    from vlsat_tpu.config import load_config

    for name in ("SGFN", "Mmgnet", "MmgnetSingle", "SGPN", "SGGpoint",
                 "SGGpointBaseline", "MMteacher", "MmgnetIn21k"):
        cfg = load_config(overrides={"NAME": name})
        assert cfg.NAME == name


def test_weight_edge_modes():
    """Finding 4: WEIGHT_EDGE config variants produce distinct weights."""
    from vlsat_tpu.train.losses import resolve_rel_weights

    gt = jnp.asarray(np.eye(4, 3, dtype=np.float32)[None])  # (1, 4, 3)
    mask = jnp.ones((1, 4), bool)
    occ = jnp.asarray([0.5, 1.0, 2.0])

    dyn = resolve_rel_weights("DYNAMIC", gt, mask)
    assert dyn.shape == (3,)
    bg = resolve_rel_weights("BG", gt, mask, w_bg=0.8)
    np.testing.assert_allclose(np.asarray(bg), 0.8 * (1 - np.asarray(gt)) + 0.2 * np.asarray(gt))
    assert resolve_rel_weights("BG", gt, mask, w_bg=0.0) is None
    np.testing.assert_array_equal(np.asarray(resolve_rel_weights("OCCU", gt, mask, weights_rel=occ)), np.asarray(occ))
    assert resolve_rel_weights("NONE", gt, mask) is None
    with pytest.raises(NotImplementedError):
        resolve_rel_weights("nope", gt, mask)


def test_depth_stride_intrinsic_correction():
    """Finding 2: subsampled back-projection must still hit the instance."""
    from vlsat_tpu.preprocess.depth import visible_instances_per_frame

    K = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    depth = np.full((48, 64), 2.0, np.float32)
    pose = np.eye(4, dtype=np.float32)
    # instance sits where an off-center pixel's ray lands: pixel (u=48, v=32)
    # -> x = (48-32)/100*2 = 0.32, y = (32-24)/100*2 = 0.16
    labeled = np.asarray([[0.32, 0.16, 2.0]], np.float32)
    vis = visible_instances_per_frame([depth], K, [pose], labeled,
                                      np.asarray([7]), min_pixels=1, stride=8,
                                      max_dist=0.05)
    assert 7 in vis[0]


def test_data_augmentation_flag(tmp_path):
    """Finding 4b: use_data_augmentation actually rotates the scene."""
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.data.dataset import SSGScenes

    plain = SSGScenes(root, scans, "train_scans", num_points=16)
    aug = SSGScenes(root, scans, "train_scans", num_points=16,
                    use_data_augmentation=True)
    d0 = plain.prepare(0, np.random.RandomState(0))["descriptor"]
    d1 = aug.prepare(0, np.random.RandomState(0))["descriptor"]
    assert np.abs(d0[:, :2] - d1[:, :2]).max() > 1e-3  # xy centroids rotated
