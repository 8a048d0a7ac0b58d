"""Packed per-bucket tensor cache + multi-step training dispatch tests."""

import os

import jax
import numpy as np
import pytest

from tests.mini_data import make_mini_dataset
from vlsat_tpu.data.dataset import SSGScenes
from vlsat_tpu.data.packed import PackedLoader, PackedScenes, pack_scenes
from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.train.optim import make_optimizer
from vlsat_tpu.train.state import create_train_state
from vlsat_tpu.train.step import (
    make_multi_train_step, make_train_step, stack_batches)


@pytest.fixture(scope="module")
def packed_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("packed")
    root, scans = make_mini_dataset(tmp, num_scans=4, insts_per_scan=5,
                                    no_rel_scan=2)
    ds = SSGScenes(root, scans, "train_scans")
    out = str(tmp / "pack")
    pack_scenes(ds, out, seed=7, variants=2)
    return root, scans, ds, out


def test_pack_roundtrip(packed_root):
    root, scans, ds, out = packed_root
    packed = PackedScenes(out)
    assert len(packed) == len(ds) == 4
    # weights travel with the pack
    np.testing.assert_allclose(packed.w_cls_obj, ds.w_cls_obj, rtol=1e-6)
    np.testing.assert_allclose(packed.w_cls_rel, ds.w_cls_rel, rtol=1e-6)
    total = 0
    for b in packed.buckets:
        batch = packed.batch(b, slice(0, packed.count(b)))
        total += batch.num_scenes
        # masks consistent with bucket shapes; 5 instances per mini scan
        assert batch.num_nodes == b
        nv = np.asarray(batch.obj_mask).sum(1)
        assert (nv == 5).all()
        ev = np.asarray(batch.edge_mask).sum(1)
        assert (ev == 5 * 4).all()
        assert np.isfinite(np.asarray(batch.obj_points)).all()
        # padded node rows zeroed, valid descriptor finite
        pts = np.asarray(batch.obj_points)
        assert (pts[~np.asarray(batch.obj_mask)] == 0).all()
    assert total == 4

    # variants differ in the point draw but agree on labels/edges
    b = packed.buckets[0]
    b0 = packed.batch(b, slice(0, 1), variant=0)
    b1 = packed.batch(b, slice(0, 1), variant=1)
    np.testing.assert_array_equal(np.asarray(b0.gt_class), np.asarray(b1.gt_class))
    np.testing.assert_array_equal(np.asarray(b0.edge_index), np.asarray(b1.edge_index))
    np.testing.assert_array_equal(np.asarray(b0.gt_rels), np.asarray(b1.gt_rels))
    assert np.abs(np.asarray(b0.obj_points) - np.asarray(b1.obj_points)).max() > 0


def test_packed_loader_epochs(packed_root):
    root, scans, ds, out = packed_root
    packed = PackedScenes(out)
    loader = PackedLoader(packed, batch_size=3, shuffle=True, seed=1)
    n1 = sum(b.num_scenes for b in loader)
    assert n1 == 4
    assert loader.epoch == 1
    # epoch 2 cycles to variant 1 and still covers every scene
    n2 = sum(b.num_scenes for b in loader)
    assert n2 == 4

    # drop_relation_free drops the relation-free mini scan
    out2 = out + "_norel"
    pack_scenes(SSGScenes(root, scans, "train_scans"), out2, seed=7,
                drop_relation_free=True)
    packed2 = PackedScenes(out2)
    assert len(packed2) == 3


def test_evaluate_over_packed_loader(packed_root):
    """The bench e2e composition: PackedLoader -> fused engine -> metrics."""
    root, scans, ds, out = packed_root
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    packed = PackedScenes(out)
    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(3,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    step = make_eval_step(model)
    kw = dict(verbose=False)
    m1 = evaluate(step, variables["params"], variables.get("batch_stats", {}),
                  PackedLoader(packed, batch_size=3), **kw)
    m2 = evaluate(step, variables["params"], variables.get("batch_stats", {}),
                  PackedLoader(packed, batch_size=3), **kw)
    assert m1 == m2  # deterministic over identical packed epochs
    for key in ("obj_acc_1", "rel_acc_1", "triplet_acc_50", "mean_recall_50",
                "obj_acc_2d_5", "rel_acc_mean_3"):
        assert key in m1 and np.isfinite(m1[key])


def test_packed_text_table_roundtrip(tmp_path):
    """rel-mimic targets pack as a deduplicated table + int32 indices; the
    in-step gather must reproduce the direct per-edge vectors exactly and
    the step loss must match the explicit rel_text_feat path."""
    root, scans = make_mini_dataset(tmp_path, num_scans=4, insts_per_scan=4)
    t_tab = np.random.RandomState(0).randn(40, 512).astype(np.float32)

    def lookup(gt_class, gt_rels, ei):
        if len(ei) == 0:
            return np.zeros((0, 512), np.float32)
        return np.ascontiguousarray(t_tab[(gt_class[ei[:, 0]] * 3) % 40])

    ds = SSGScenes(root, scans, "train_scans", num_points=16,
                   triplet_text_lookup=lookup)
    out = str(tmp_path / "pack")
    pack_scenes(ds, out, seed=5)
    packed = PackedScenes(out)
    assert packed.text_table is not None
    # dedup: far fewer rows than scenes x edges; row 0 is zeros
    assert packed.text_table.shape[0] <= 41
    np.testing.assert_array_equal(packed.text_table[0], 0)

    b = packed.buckets[0]
    batch = packed.batch(b, slice(0, packed.count(b)))
    assert batch.rel_text_feat is None and batch.rel_text_idx is not None
    # gather == direct lookup on the valid edges
    rng = np.random.RandomState(5)  # pack seed: same prepare() draw order
    for s in range(batch.num_scenes):
        direct = lookup(np.asarray(batch.gt_class[s]), None,
                        np.asarray(batch.edge_index[s]))
        ev = int(np.asarray(batch.edge_mask[s]).sum())
        gathered = packed.text_table[np.asarray(batch.rel_text_idx[s])]
        np.testing.assert_array_equal(gathered[:ev], direct[:ev])
        np.testing.assert_array_equal(gathered[ev:], 0)

    # step-loss equality: idx+table path == explicit rel_text_feat path
    model = MMGNet(cfg=MMGNetConfig())
    opt = make_optimizer(lr=1e-3, max_iteration=100)
    state = create_train_state(model, batch, opt, seed=0)
    step_tab = make_train_step(model, opt, donate=False,
                               text_table=packed.text_table)
    _, aux_tab = step_tab(state, batch, jax.random.PRNGKey(0))
    full = batch.replace(
        rel_text_feat=packed.text_table[np.asarray(batch.rel_text_idx)],
        rel_text_idx=None)
    step_ref = make_train_step(model, opt, donate=False)
    _, aux_ref = step_ref(state, full, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(aux_tab["loss"]), float(aux_ref["loss"]),
                               rtol=1e-6)


def test_runner_with_packed_root_and_microsteps(tmp_path):
    """Runner end-to-end on the packed pipeline: dataset.packed_root +
    TRAIN_MICROSTEPS=2 (K-step scan per dispatch)."""
    import os

    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    root, scans = make_mini_dataset(tmp_path, num_scans=6, insts_per_scan=4,
                                    no_rel_scan=2)
    packed_root = str(tmp_path / "packed")
    for split, drop in (("train", True), ("validation", False)):
        ds = SSGScenes(root, scans, f"{split}_scans", num_points=16)
        pack_scenes(ds, os.path.join(packed_root, split), seed=3,
                    drop_relation_free=drop)

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"),
        "MAX_EPOCHES": 2,
        "Batch_Size": 2,
        "TRAIN_MICROSTEPS": 2,
        "VALID_INTERVAL": 2,
        "LOG_INTERVAL": 1,
        "MODE": "train",
        "dataset": {"root": root, "scans_root": scans,
                    "packed_root": packed_root,
                    "num_points": 16},
    })
    r = Runner(cfg)
    try:
        r.train()
        # 5 rel-bearing scenes -> 2 batches/epoch (drop_last) -> 1 group of
        # K=2 per epoch -> 2 steps/epoch
        assert int(r.state.step) == 4, int(r.state.step)
        metrics = r.validation()
        assert np.isfinite(metrics["obj_acc_1"])
        assert "mean_recall_50" in metrics
    finally:
        r.close()


def test_multi_step_matches_sequential_steps():
    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    opt = make_optimizer(lr=1e-3, max_iteration=1000)
    batches = [
        make_batch(seed=s, node_counts=(4, 6), num_points=16, with_text=True,
                   num_obj_classes=20, num_rel_classes=7)
        for s in range(3)
    ]
    state = create_train_state(model, batches[0], opt, seed=0)
    step = make_train_step(model, opt, donate=False)
    multi = make_multi_train_step(model, opt, donate=False)

    rng = jax.random.PRNGKey(42)
    st_seq = state
    seq_losses = []
    for i, b in enumerate(batches):
        st_seq, aux = step(st_seq, b, jax.random.fold_in(rng, i))
        seq_losses.append(float(aux["loss"]))

    st_multi, aux_m = multi(state, stack_batches(batches), rng)
    np.testing.assert_allclose(
        np.asarray(aux_m["losses"]), np.asarray(seq_losses), rtol=2e-5)
    assert int(st_multi.step) == 3
    # final params match the sequential path
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        st_multi.params, st_seq.params)
    assert max(jax.tree_util.tree_leaves(d)) < 2e-5


def test_parallel_pack_matches_serial(tmp_path):
    """workers=N pack is bit-identical to the serial per-scene-seed pack.

    The parallel build (spawn pool, tools/pack_dataset.py --workers) seeds
    every (variant, scene) independently so output cannot depend on worker
    count or completion order; per_scene_seed=True runs the identical
    seeding serially — the two must produce byte-equal tensors and the
    same manifest grouping."""
    import json
    import os
    from functools import partial

    from vlsat_tpu.data.packed import build_scenes

    root, scans = make_mini_dataset(tmp_path, num_scans=4, insts_per_scan=5,
                                    no_rel_scan=2)
    kwargs = dict(root=root, scans_root=scans, split="train_scans")
    ds = SSGScenes(**kwargs)
    out_s, out_p = str(tmp_path / "ser"), str(tmp_path / "par")
    man_s = pack_scenes(ds, out_s, seed=7, variants=2, per_scene_seed=True)
    man_p = pack_scenes(ds, out_p, seed=7, variants=2, workers=2,
                        scenes_factory=partial(build_scenes, kwargs))
    assert man_s["buckets"] == man_p["buckets"]
    npys = sorted(f for f in os.listdir(out_s) if f.endswith(".npy"))
    assert npys == sorted(f for f in os.listdir(out_p) if f.endswith(".npy"))
    for f in npys:
        a = np.load(os.path.join(out_s, f))
        b = np.load(os.path.join(out_p, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
    with open(os.path.join(out_s, "manifest.json")) as f:
        ms = json.load(f)
    with open(os.path.join(out_p, "manifest.json")) as f:
        mp_ = json.load(f)
    assert ms == mp_
    # and the default shared-RNG serial path still differs only by the
    # point draw, not by grouping
    assert pack_scenes(ds, str(tmp_path / "leg"), seed=7)["buckets"][
        "8"]["scene_indices"] == ms["buckets"]["8"]["scene_indices"]


def test_synthetic_split_ply_mode_matches_npz(tmp_path):
    """write_ply=True yields the same prepared tensors as the npz-cache
    mode: the PLY round-trip (used by tools/bench_cold_start.py to time
    the true cold path) must be lossless."""
    from vlsat_tpu.data.synthetic import make_synthetic_split

    common = dict(num_scans=3, insts_per_scan=(4, 6), vertices_per_inst=300,
                  rels_per_scan=5, seed=3)
    root_a, scans_a, cache_a = make_synthetic_split(
        str(tmp_path / "npz"), **common)
    root_b, scans_b, cache_b = make_synthetic_split(
        str(tmp_path / "ply"), write_ply=True, background_verts=40, **common)
    assert not os.listdir(cache_b)  # ply mode leaves the cache cold
    ds_a = SSGScenes(root_a, scans_a, "train_scans", cache_root=cache_a)
    ds_b = SSGScenes(root_b, scans_b, "train_scans", cache_root=None)
    assert len(ds_a) == len(ds_b) == 3
    for i in range(3):
        pa = ds_a.prepare(i, np.random.RandomState(5))
        pb = ds_b.prepare(i, np.random.RandomState(5))
        for k in ("obj_points", "descriptor", "gt_class", "edge_index",
                  "gt_rels"):
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)
