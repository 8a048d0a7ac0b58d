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


def test_clean_gt_segment_labels():
    from vlsat_tpu.preprocess.gen_data import clean_gt_segment_labels

    # segment 1: 700 points label 7 + 600 points label 3 (minority big
    # enough -> new segment), + 50 points label 9 (small -> zeroed)
    segments = np.concatenate([np.full(700, 1), np.full(600, 1), np.full(50, 1),
                               np.full(100, 2)])
    labels = np.concatenate([np.full(700, 7), np.full(600, 3), np.full(50, 9),
                             np.full(100, 4)])
    segs2, labs2 = clean_gt_segment_labels(segments, labels, min_seg_size=512)
    # majority stays
    assert (segs2[:700] == 1).all() and (labs2[:700] == 7).all()
    # big minority -> fresh segment id, label kept
    new_ids = np.unique(segs2[700:1300])
    assert len(new_ids) == 1 and new_ids[0] == 3  # max(1,2)+1
    assert (labs2[700:1300] == 3).all()
    # small minority zeroed out of both arrays
    assert (segs2[1300:1350] == 0).all() and (labs2[1300:1350] == 0).all()
    # untouched segment unchanged
    assert (segs2[1350:] == 2).all() and (labs2[1350:] == 4).all()
    # inputs not mutated
    assert (segments[700] == 1) and (labels[1300] == 9)


def _grid_points(center, n, spacing=0.01):
    side = int(np.ceil(n ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3), -1).reshape(-1, 3)[:n]
    return center + g * spacing


def test_map_segments_scannet_thresholds():
    from vlsat_tpu.preprocess.gen_data import map_segments_scannet

    n = 600  # above min_seg_size=512
    # GT: segment 10 at origin, segment 20 at x=5, segment 30 ('none') at x=10
    gt_pts = np.concatenate([_grid_points([0, 0, 0], n),
                             _grid_points([5, 0, 0], n),
                             _grid_points([10, 0, 0], n)]).astype(np.float32)
    gt_segs = np.concatenate([np.full(n, 10), np.full(n, 20), np.full(n, 30)])
    names = {10: "chair", 20: "table", 30: "none"}

    # pred segment 1 sits on GT 10; pred 2 on GT 20; pred 3 on the 'none'
    # GT (votes discarded -> unmapped); pred 4 too small; pred 5 too far
    pd_pts = np.concatenate([
        _grid_points([0, 0, 0], n), _grid_points([5, 0, 0], n),
        _grid_points([10, 0, 0], n), _grid_points([0, 0, 0], 100),
        _grid_points([50, 0, 0], n),
    ]).astype(np.float32)
    pd_segs = np.concatenate([np.full(n, 1), np.full(n, 2), np.full(n, 3),
                              np.full(100, 4), np.full(n, 5)])
    mapping, groups = map_segments_scannet(
        pd_pts, pd_segs, gt_pts, gt_segs, names, max_dist=0.1)
    assert mapping == {1: 10, 2: 20}
    assert groups == {10: [1], 20: [2]}


def test_map_segments_scannet_ambiguity_filter():
    from vlsat_tpu.preprocess.gen_data import map_segments_scannet

    n = 900
    # three GT segments packed adjacently; a pred segment straddling them
    # with 60/25/15% votes: occ = 0.25/0.6 = 0.42 < 0.75 -> accepted
    gt_pts = np.concatenate([_grid_points([0, 0, 0], 600),
                             _grid_points([0.12, 3, 0], 600),
                             _grid_points([0.12, 6, 0], 600)]).astype(np.float32)
    gt_segs = np.concatenate([np.full(600, 1), np.full(600, 2), np.full(600, 3)])
    names = {1: "sofa", 2: "pillow", 3: "bed"}
    pd = np.concatenate([_grid_points([0, 0, 0], int(n * 0.6)),
                         _grid_points([0.12, 3, 0], int(n * 0.25)),
                         _grid_points([0.12, 6, 0], n - int(n * 0.6) - int(n * 0.25))
                         ]).astype(np.float32)
    segs = np.full(len(pd), 7)
    mapping, _ = map_segments_scannet(pd, segs, gt_pts, gt_segs, names)
    assert mapping == {7: 1}

    # 45/40/15%: winner below corr_thres=0.5 -> rejected
    pd2 = np.concatenate([_grid_points([0, 0, 0], int(n * 0.45)),
                          _grid_points([0.12, 3, 0], int(n * 0.40)),
                          _grid_points([0.12, 6, 0], n - int(n * 0.45) - int(n * 0.40))
                          ]).astype(np.float32)
    mapping2, _ = map_segments_scannet(pd2, np.full(len(pd2), 7), gt_pts,
                                       gt_segs, names)
    assert mapping2 == {}

    # 52/40/8%: passes corr_thres but occ = .40/.52 = 0.77 > 0.75 -> rejected
    pd3 = np.concatenate([_grid_points([0, 0, 0], int(n * 0.52)),
                          _grid_points([0.12, 3, 0], int(n * 0.40)),
                          _grid_points([0.12, 6, 0], n - int(n * 0.52) - int(n * 0.40))
                          ]).astype(np.float32)
    mapping3, _ = map_segments_scannet(pd3, np.full(len(pd3), 7), gt_pts,
                                       gt_segs, names)
    assert mapping3 == {}


def test_gen_scannet_relationships():
    from vlsat_tpu.preprocess.gen_data import gen_scannet_relationships

    mapping = {1: 10, 2: 10, 3: 20}
    names = {10: "wall", 20: "floor"}
    groups = {10: [1, 2], 20: [3]}
    entry = gen_scannet_relationships("scene0000_00", mapping, names, groups)
    assert entry["objects"] == {1: "wall", 2: "wall", 3: "floor"}
    rels = entry["relationships"]
    assert [1, 2, 0, "same part"] in rels and [2, 1, 0, "same part"] in rels
    assert len(rels) == 2  # singleton group emits nothing
