"""Offline preprocessing tool tests."""

import numpy as np
import pytest

from vlsat_tpu.data.augment import random_z_rotation, rotation_matrix
from vlsat_tpu.preprocess.depth import backproject_depth, visible_instances_per_frame
from vlsat_tpu.preprocess.gen_data import (
    bbox_groups,
    build_neighbor_graph,
    map_segments,
    sample_seed_points,
    split_scene_relationships,
    train_valid_split,
)
from vlsat_tpu.preprocess.transform import align_scan, apply_transform


def test_apply_transform_row_vector_convention(tmp_path):
    pts = np.asarray([[1.0, 0, 0], [0, 1, 0]], np.float64)
    # translation in row-vector convention lives in the last ROW
    m = np.eye(4)
    m[3, :3] = [10, 20, 30]
    out = apply_transform(pts, m)
    np.testing.assert_allclose(out, [[11, 20, 30], [10, 21, 30]], atol=1e-5)

    from vlsat_tpu.data.ply import read_ply_vertices, write_ply_vertices

    src = str(tmp_path / "in.ply")
    dst = str(tmp_path / "out.ply")
    write_ply_vertices(src, pts.astype(np.float32), instances=np.asarray([1, 2], np.int32))
    align_scan(src, dst, m)
    back = read_ply_vertices(dst)
    np.testing.assert_allclose(back.points, [[11, 20, 30], [10, 21, 30]], atol=1e-4)
    np.testing.assert_array_equal(back.instances, [1, 2])


def test_seed_sampling_and_groups():
    rng = np.random.RandomState(0)
    # two xy clusters far apart
    a = rng.randn(100, 3) * 0.1
    b = rng.randn(100, 3) * 0.1 + [5, 5, 0]
    pts = np.concatenate([a, b])
    segs = np.concatenate([
        np.repeat(np.arange(1, 6), 20), np.repeat(np.arange(6, 11), 20)])
    seeds = sample_seed_points(pts, distance=1.0, rng=rng)
    assert len(seeds) >= 2
    groups = bbox_groups(pts, segs, seeds, bbox_distance=1.0, min_seg_per_group=3)
    assert len(groups) >= 2
    for g in groups:
        assert set(g) <= set(range(1, 6)) or set(g) <= set(range(6, 11))

    entries = split_scene_relationships(
        "scanX", {i: f"cls{i}" for i in range(1, 11)},
        [[1, 2, 0, "on"], [6, 7, 1, "near"]], groups)
    assert all(e["scan"] == "scanX" for e in entries)
    for e in entries:
        for r in e["relationships"]:
            assert str(r[0]) in e["objects"] and str(r[1]) in e["objects"]


def test_map_segments_majority():
    rng = np.random.RandomState(1)
    gt_pts = np.concatenate([rng.randn(50, 3) * 0.05,
                             rng.randn(50, 3) * 0.05 + [2, 0, 0]])
    gt_inst = np.concatenate([np.full(50, 3), np.full(50, 9)])
    pred_pts = gt_pts + rng.randn(100, 3) * 0.01
    pred_seg = np.concatenate([np.full(50, 101), np.full(50, 202)])
    mapping = map_segments(pred_pts, pred_seg, gt_pts, gt_inst, max_dist=0.2)
    assert mapping == {101: 3, 202: 9}


def test_neighbor_graph():
    pts = np.asarray([[0, 0, 0], [0.1, 0, 0], [5, 0, 0], [5.1, 0, 0]], np.float64)
    segs = np.asarray([1, 2, 3, 4])
    nbrs = build_neighbor_graph(pts, segs, radius=0.5)
    assert nbrs[1] == {2} and nbrs[3] == {4}


def test_train_valid_split():
    tr, va = train_valid_split([f"s{i}" for i in range(20)], 0.1, seed=1)
    assert len(va) == 2 and len(tr) == 18
    assert not set(tr) & set(va)


def test_backprojection_roundtrip():
    import jax.numpy as jnp

    K = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    depth = np.full((48, 64), 2.0, np.float32)
    pose = np.eye(4, dtype=np.float32)
    world = np.asarray(backproject_depth(jnp.asarray(depth), jnp.asarray(K),
                                         jnp.asarray(pose)))
    # center pixel -> (0, 0, 2)
    center = world.reshape(48, 64, 3)[24, 32]
    np.testing.assert_allclose(center, [0, 0, 2], atol=1e-4)

    labeled = np.asarray([[0, 0, 2.0]], np.float32)
    vis = visible_instances_per_frame([depth], K, [pose], labeled,
                                      np.asarray([7]), min_pixels=1, stride=8,
                                      max_dist=3.0)
    assert 7 in vis[0]


def test_rotation_and_augment():
    m = rotation_matrix([0, 0, 1], np.pi / 2)
    np.testing.assert_allclose(m @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32)
    out = random_z_rotation(pts, rng)
    # z distances to centroid preserved
    c_in = pts - pts.mean(0)
    c_out = out
    np.testing.assert_allclose(np.linalg.norm(c_in, axis=1),
                               np.linalg.norm(c_out, axis=1), rtol=1e-4)
    np.testing.assert_allclose(c_in[:, 2], c_out[:, 2], atol=1e-5)


def test_adapter_trainer_learns():
    from vlsat_tpu.clipsem.adapter_train import (
        parse_quality_list, smooth_cross_entropy, train_adapter, zero_shot_eval)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n_cls, dim = 5, 32
    table = rng.randn(n_cls, dim).astype(np.float32)
    table /= np.linalg.norm(table, axis=-1, keepdims=True)
    labels = rng.randint(0, n_cls, 200)
    feats = table[labels] + rng.randn(200, dim).astype(np.float32) * 0.4
    params, top1 = train_adapter(feats[:160], labels[:160], feats[160:],
                                 labels[160:], table, epochs=5, batch_size=16)
    assert top1 > 60.0, top1
    zs = zero_shot_eval(feats[160:], labels[160:], table)
    assert zs["top1"] <= zs["top5"] <= zs["top10"]

    # smoothed CE sanity: perfect logits under smoothing > 0
    logits = jnp.asarray(np.eye(n_cls, dtype=np.float32) * 10)
    loss = float(smooth_cross_entropy(logits, jnp.arange(n_cls)))
    assert loss > 0

    # quality list parsing
    import io, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "q.txt")
        with open(p, "w") as f:
            f.write("Scene: abc-123 Instance: 4 Label: trash can Quanlity: A\n")
            f.write("garbage line\n")
        recs = parse_quality_list(p)
    assert len(recs) == 1
    assert recs[0].label == "trash can"
    assert "instance_4_class_trash can_origin_view_mean.npy" in recs[0].feature_path("/r")
