"""Tests for the round-3 surface-tail components: KNN/RADIUS layered-growth
scene splitting, the semseg reader, the 5-angle rendered-view adapter
dataset, and the STN feature-transform regularizer."""

import json

import numpy as np
import pytest

from vlsat_tpu.preprocess.gen_data import (
    generate_groups,
    layered_growth_groups,
)


def _chain_graph(n):
    # segments 1..n in a chain: i <-> i+1
    g = {i: set() for i in range(1, n + 1)}
    for i in range(1, n):
        g[i].add(i + 1)
        g[i + 1].add(i)
    return g


def test_layered_growth_groups_semantics():
    g = _chain_graph(6)
    segments = np.repeat(np.arange(1, 7), 10)  # point i//10+1
    # seed point index 0 -> segment 1; 2 layers over a chain reach {1,2,3}
    groups = layered_growth_groups([0], segments, g, n_layers=2,
                                   min_seg_per_group=3)
    assert groups == [[1, 2, 3]]
    # n_layers=1 -> {1,2}: dropped below min_seg_per_group=3
    assert layered_growth_groups([0], segments, g, n_layers=1,
                                 min_seg_per_group=3) == []
    # growth re-expands from the full accumulated set each layer:
    # seed in the middle (segment 3) reaches {1..5} in 2 layers
    groups = layered_growth_groups([25], segments, g, n_layers=2,
                                   min_seg_per_group=5)
    assert groups == [[1, 2, 3, 4, 5]]


def test_generate_groups_dispatch():
    rng = np.random.RandomState(0)
    # two far-apart xy clusters of 5 adjacent segments each
    a = rng.randn(100, 3) * 0.05
    b = rng.randn(100, 3) * 0.05 + [8, 8, 0]
    pts = np.concatenate([a, b])
    segs = np.concatenate([
        np.repeat(np.arange(1, 6), 20), np.repeat(np.arange(6, 11), 20)])
    for method in ("KNN", "BBOX"):
        groups = generate_groups(pts, segs, split_method=method, distance=2.0,
                                 min_seg_per_group=3, neighbor_radius=1.0,
                                 rng=np.random.RandomState(1))
        assert len(groups) >= 2
        # clusters never mix (they sit ~11 units apart)
        for g in groups:
            assert set(g) <= set(range(1, 6)) or set(g) <= set(range(6, 11))
    with pytest.raises(ValueError):
        generate_groups(pts, segs, split_method="VORONOI")


def test_load_semseg(tmp_path):
    from vlsat_tpu.data.assets import load_semseg

    p = tmp_path / "semseg.v2.json"
    p.write_text(json.dumps({"segGroups": [
        {"id": 1, "label": "Chair"},
        {"id": 2, "label": "FancyLamp"},
    ]}))
    # no mapping: lowercased raw labels
    assert load_semseg(str(p)) == {1: "chair", 2: "fancylamp"}
    # mapping=True: dict lookup, missing keys -> 'none'
    assert load_semseg(str(p), {"Chair": "Seat"}) == {1: "seat", 2: "none"}
    # mapping=False: dict VALUES act as a keep-filter
    assert load_semseg(str(p), {"x": "Chair"}, mapping=False) == \
        {1: "chair", 2: "none"}


def test_multiview_pc_dataset(tmp_path):
    from vlsat_tpu.clipsem.adapter_train import (
        _PC_ANGLES, load_pc_views, parse_pc_data_list)

    lst = tmp_path / "list.txt"
    lst.write_text(
        "Scene:scene1 Instance:3 Label:trash can Quanlity:A\n"
        "\n"
        "Scene:scene2 Instance:7 Label:chair Quanlity:B\n")
    labels = ["chair", "trash can"]
    recs = parse_pc_data_list(str(lst), labels, root_path=str(tmp_path))
    assert len(recs) == 2
    assert recs[0].label == 1 and recs[1].label == 0
    assert recs[0].paths[0].endswith("/scene1/multi_view_pc/3_trash can_0.jpg")
    assert [p.rsplit("_", 1)[1] for p in recs[0].paths] == \
        [f"{a}.jpg" for a in _PC_ANGLES]

    from PIL import Image
    import os

    os.makedirs(tmp_path / "scene1" / "multi_view_pc")
    for i, path in enumerate(recs[0].paths):
        Image.new("L", (6, 4), color=40 * i).save(path)  # grayscale -> RGB
    views = load_pc_views(recs[0], size=8)
    assert views.shape == (5, 3, 8, 8)
    assert views.dtype == np.float32
    assert 0.0 <= views.min() and views.max() <= 1.0
    # view order follows the angle list; constant-gray images keep their level
    np.testing.assert_allclose(views[2], 80 / 255.0, atol=0.02)  # jpeg tol


def test_feature_transform_regularizer():
    import jax.numpy as jnp

    from vlsat_tpu.models.stn import STNkd, feature_transform_regularizer

    # identity transforms -> exactly zero
    eye = jnp.tile(jnp.eye(4)[None], (3, 1, 1))
    assert float(feature_transform_regularizer(eye)) == 0.0

    rng = np.random.RandomState(0)
    t = rng.randn(5, 4, 4).astype(np.float32)
    expected = np.mean([
        np.linalg.norm(ti @ ti.T - np.eye(4)) for ti in t])
    got = float(feature_transform_regularizer(jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # a freshly initialized STN emits identity -> zero penalty
    import jax

    stn = STNkd(k=3)
    pts = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    trans = stn.apply(stn.init(jax.random.PRNGKey(0), pts), pts)
    np.testing.assert_allclose(
        float(feature_transform_regularizer(trans)), 0.0, atol=1e-6)


def test_evaluate_topk_matches_reference_walk():
    """evaluate_topk (eva_utils_acc.py:82-134 — dead code in the
    reference, kept for literal surface completeness) vs a naive oracle
    that mirrors the reference loop verbatim: descending argsort of the
    materialized cube, walk until ``gt_conf >= conf[idx] or index > topk``,
    then the sorted multi-GT rank discount."""
    from vlsat_tpu.eval.metrics import evaluate_topk

    rng = np.random.RandomState(3)
    n, c, r, e = 7, 12, 5, 10
    objs_logp = np.log(rng.dirichlet(np.ones(c), size=n)).astype(np.float32)
    rels_sig = rng.rand(e, r).astype(np.float32)
    edges = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)], axis=1)
    gt_rel = []
    for i in range(e):
        k = int(rng.randint(0, 4))  # 0..3 GT predicates (0 => skipped edge)
        preds = list(rng.choice(r, size=k, replace=False))
        gt_rel.append((int(rng.randint(0, c)), int(rng.randint(0, c)),
                       [int(p) for p in preds]))

    def oracle(objs_pred, rels_pred, gt, ei, multi, topk):
        objs = np.exp(objs_pred)
        rels = rels_pred if multi else np.exp(rels_pred)
        res, cls = [], []
        for edge in range(len(ei)):
            sub = objs[ei[edge][0]]
            obj = objs[ei[edge][1]]
            node = np.matmul(sub.reshape(-1, 1), obj.reshape(1, -1))
            cube = np.matmul(node.reshape(-1, 1),
                             rels[edge].reshape(1, -1)).reshape(
                                 len(sub), len(obj), -1)
            flat = cube.reshape(-1)
            order = np.argsort(-flat, kind="stable")
            s_gt, o_gt, preds = gt[edge]
            temp, tmp_cls = [], []
            for p in preds:
                gt_conf = cube[s_gt, o_gt, p]
                index = 1
                for idx in order:
                    if gt_conf >= flat[idx] or index > topk:
                        break
                    index += 1
                temp.append(index)
                tmp_cls.append(p)
            for i, t in enumerate(sorted(temp)):
                assert t - i > 0
                res.append(t - i)
            cls += tmp_cls
        return np.asarray(res), np.asarray(cls)

    for topk in (101, 8):  # 8 exercises the topk+1 saturation
        got_r, got_c = evaluate_topk(objs_logp, rels_sig, gt_rel, edges,
                                     multi_rel_outputs=True, topk=topk)
        exp_r, exp_c = oracle(objs_logp, rels_sig, gt_rel, edges, True, topk)
        np.testing.assert_array_equal(got_r, exp_r)
        np.testing.assert_array_equal(got_c, exp_c)

    # single-label path: rels are log-softmax and get exponentiated too
    rels_logp = np.log(rng.dirichlet(np.ones(r), size=e)).astype(np.float32)
    got_r, got_c = evaluate_topk(objs_logp, rels_logp, gt_rel, edges,
                                 multi_rel_outputs=False, topk=101)
    exp_r, exp_c = oracle(objs_logp, rels_logp, gt_rel, edges, False, 101)
    np.testing.assert_array_equal(got_r, exp_r)
    np.testing.assert_array_equal(got_c, exp_c)
