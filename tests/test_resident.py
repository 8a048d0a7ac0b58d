"""Device-resident split: step-trajectory equivalence vs the streaming
multi-step, and the epoch permutation scheduler's loader parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mini_data import make_mini_dataset
from vlsat_tpu.data.dataset import SSGScenes
from vlsat_tpu.data.packed import PackedScenes, pack_scenes
from vlsat_tpu.data.resident import (
    ResidentScenes, epoch_permutations, split_nbytes)
from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.train.optim import make_optimizer
from vlsat_tpu.train.state import create_train_state
from vlsat_tpu.train.step import (
    make_multi_train_step, make_resident_multi_train_step, stack_batches)


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("res")
    root, scans = make_mini_dataset(tmp, num_scans=4, insts_per_scan=5)
    ds = SSGScenes(root, scans, "train_scans")
    out = str(tmp / "pack")
    pack_scenes(ds, out, seed=7)
    return PackedScenes(out)


def test_resident_matches_streaming(pack):
    resident = ResidentScenes(pack)
    assert split_nbytes(pack) > 0
    b = pack.buckets[0]
    n = pack.count(b)
    assert n == 4

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    opt = make_optimizer(lr=1e-3, max_iteration=100)
    state0 = create_train_state(model, tiny, opt, seed=0)

    kw = dict(donate=False, text_table=pack.text_table)
    multi = make_multi_train_step(model, opt, **kw)
    res = make_resident_multi_train_step(
        model, opt, resident.full_batch(b), batch_size=2, **kw)

    perm = np.asarray([2, 0, 3, 1], np.int32)
    group = stack_batches([pack.batch(b, perm[:2]), pack.batch(b, perm[2:])])
    key = jax.random.PRNGKey(3)
    s1, a1 = multi(state0, group, key)
    s2, a2 = res(state0, jnp.asarray(perm), key)

    np.testing.assert_allclose(np.asarray(a1["losses"]),
                               np.asarray(a2["losses"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    assert len(l1) == len(l2)
    for x, y in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-7)


def test_resident_eval_loader_matches_streaming(pack):
    """evaluate() over (host, device) pairs == over streamed host batches,
    exactly — including a trailing partial batch."""
    from vlsat_tpu.data.packed import PackedLoader
    from vlsat_tpu.data.resident import ResidentEvalLoader
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    eval_fn = make_eval_step(model)
    resident = ResidentScenes(pack)

    for bs in (2, 3):  # 3: 4 scenes -> a trailing partial batch of 1
        stream = evaluate(eval_fn, params, bstats,
                          PackedLoader(pack, batch_size=bs), verbose=False)
        res_loader = ResidentEvalLoader(resident, bs)
        assert len(res_loader) == -(-pack.count(pack.buckets[0]) // bs)
        res = evaluate(eval_fn, params, bstats, res_loader, verbose=False)
        assert stream.keys() == res.keys()
        for k in stream:
            np.testing.assert_array_equal(
                np.asarray(stream[k]), np.asarray(res[k]), err_msg=k)


def test_resident_grouped_eval_matches_per_batch(pack):
    """ResidentGroupedEval (K batches scanned per dispatch, one packed
    fetch per group) == ResidentEvalLoader metrics exactly — including a
    trailing partial batch (padded to batch_size with masked scenes) and a
    trailing partial GROUP (scan rows repeat the last batch but are never
    assembled)."""
    from vlsat_tpu.data.resident import (
        ResidentEvalLoader, ResidentGroupedEval)
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    eval_fn = make_eval_step(model)
    resident = ResidentScenes(pack)

    # bs=3: 4 scenes -> batches of 3 and 1 (partial tail batch)
    # group=2: exactly one group of 2 batches
    # group=3: partial tail group (2 real batches + 1 repeated scan row)
    base = evaluate(eval_fn, params, bstats,
                    ResidentEvalLoader(resident, 3), verbose=False)
    for g in (1, 2, 3):
        loader = ResidentGroupedEval(resident, 3, group=g)
        assert loader.grouped and len(loader) == 2
        got = evaluate(eval_fn, params, bstats, loader, verbose=False)
        assert base.keys() == got.keys()
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(got[k]), err_msg=f"g={g} {k}")

    with pytest.raises(ValueError, match="group"):
        ResidentGroupedEval(resident, 3, group=0)

    # GT-slot cap: pack-backed loaders ship (B, E, max_gt)-sliced value/
    # pred matrices (here max_gt=1 vs R=26 — maximal slicing); a plain
    # batch list has no max_gt and ships full R.  Metrics must match.
    assert pack.max_gt == 1
    b0 = pack.buckets[0]
    raw = evaluate(eval_fn, params, bstats,
                   [pack.batch(b0, slice(0, 3)), pack.batch(b0, slice(3, 4))],
                   verbose=False)
    assert base.keys() == raw.keys()
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(raw[k]), err_msg=f"uncapped {k}")

    # a loader that under-declares max_gt must be caught, not mis-scored
    class _Lying(list):
        max_gt = 1

    bad = pack.batch(b0, slice(0, 3))
    gr = np.array(bad.gt_rels)
    em = np.asarray(bad.edge_mask)
    s, e = np.argwhere(em)[0]
    gr[s, e, :2] = 1.0  # two GT relations on one valid edge
    bad = bad.replace(gt_rels=gr)
    with pytest.raises(ValueError, match="max_gt"):
        evaluate(eval_fn, params, bstats, _Lying([bad]), verbose=False)

    # scene_recall (in21k protocol) rides the same grouped program
    sr_base = evaluate(eval_fn, params, bstats,
                       ResidentEvalLoader(resident, 3), verbose=False,
                       scene_recall=True)
    sr_got = evaluate(eval_fn, params, bstats,
                      ResidentGroupedEval(resident, 3, group=2),
                      verbose=False, scene_recall=True)
    assert sr_base.keys() == sr_got.keys()
    for k in sr_base:
        np.testing.assert_array_equal(
            np.asarray(sr_base[k]), np.asarray(sr_got[k]), err_msg=k)


def test_resident_sharded_eval_matches_streaming(pack):
    """ResidentShardedEval (batch-structured split, scenes sharded over an
    8-device mesh, dispatches carry only a batch id) reproduces the
    single-device streaming metrics exactly — including the fully-masked
    padding scenes the tail batch gains."""
    from vlsat_tpu.data.packed import PackedLoader
    from vlsat_tpu.data.resident import ResidentShardedEval
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.parallel import make_mesh, replicate
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    eval_fn = make_eval_step(model)

    stream = evaluate(eval_fn, params, bstats,
                      PackedLoader(pack, batch_size=8), verbose=False)

    mesh = make_mesh(jax.devices()[:8])
    loader = ResidentShardedEval(pack, mesh, batch_size=8)
    assert loader.mesh_sharded
    assert len(loader) == 1  # 4 scenes -> one batch padded to 8
    _, dev = next(iter(loader))
    assert dev.obj_mask.shape[0] == 8
    assert not np.asarray(dev.obj_mask)[4:].any()  # padding is masked
    sharded = evaluate(eval_fn, replicate(params, mesh),
                       replicate(bstats, mesh), loader, verbose=False)
    assert stream.keys() == sharded.keys()
    for k in stream:
        np.testing.assert_array_equal(
            np.asarray(stream[k]), np.asarray(sharded[k]), err_msg=k)

    # grouped sharded mode: K batch ids per dispatch, shard-local slices.
    # batch_size=2 over 4 scenes -> 2 batches; group=2 covers a full group
    # and (with group=4... not needed) the tail-repeat path via group=3
    stream2 = evaluate(eval_fn, params, bstats,
                       PackedLoader(pack, batch_size=2), verbose=False)
    mesh2 = make_mesh(jax.devices()[:2])
    for g in (2, 3):
        gl = ResidentShardedEval(pack, mesh2, batch_size=2, group=g)
        assert gl.grouped and gl.mesh_sharded and len(gl) == 2
        got = evaluate(eval_fn, replicate(params, mesh2),
                       replicate(bstats, mesh2), gl, verbose=False)
        assert stream2.keys() == got.keys()
        for k in stream2:
            np.testing.assert_array_equal(
                np.asarray(stream2[k]), np.asarray(got[k]),
                err_msg=f"group={g} {k}")

    with pytest.raises(ValueError, match="divide"):
        ResidentShardedEval(pack, mesh, batch_size=3)


def test_epoch_permutations_cover_and_drop():
    counts = {8: 7, 16: 5}
    groups = list(epoch_permutations(counts, group=2, epoch=0, seed=1))
    by_bucket = {}
    for b, g in groups:
        assert len(g) == 2  # drop_last: fixed group size only
        by_bucket.setdefault(b, []).append(g)
    seen8 = np.concatenate(by_bucket[8])
    seen16 = np.concatenate(by_bucket[16])
    assert len(seen8) == 6 and len(set(seen8.tolist())) == 6   # 7 -> drop 1
    assert len(seen16) == 4 and len(set(seen16.tolist())) == 4  # 5 -> drop 1
    assert set(seen8) <= set(range(7)) and set(seen16) <= set(range(5))
    # different epochs shuffle differently
    g2 = list(epoch_permutations(counts, group=2, epoch=1, seed=1))
    assert any((a[1] != b[1]).any() for a, b in zip(groups, g2))


def test_resident_grouped_eval_multi_bucket(tmp_path):
    """Grouped iteration across MULTIPLE buckets (per-bucket resident
    tensors, per-bucket scan retrace, bucket-ascending order) matches the
    streaming loader exactly."""
    from vlsat_tpu.data.dataset import SSGScenes
    from vlsat_tpu.data.packed import PackedLoader
    from vlsat_tpu.data.resident import ResidentGroupedEval
    from vlsat_tpu.data.synthetic import make_synthetic_split
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    root, scans_root, cache_root = make_synthetic_split(
        str(tmp_path), num_scans=10, insts_per_scan=(4, 8),
        vertices_per_inst=40, rels_per_scan=4, seed=3)
    ds = SSGScenes(root, scans_root, "validation_scans",
                   cache_root=cache_root)
    out = str(tmp_path / "pack")
    pack_scenes(ds, out, seed=3)
    packed = PackedScenes(out)
    assert len(packed.buckets) >= 2, packed.buckets

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    eval_fn = make_eval_step(model)

    stream = evaluate(eval_fn, params, bstats,
                      PackedLoader(packed, batch_size=3), verbose=False)
    loader = ResidentGroupedEval(ResidentScenes(packed), 3, group=2)
    got = evaluate(eval_fn, params, bstats, loader, verbose=False)
    assert stream.keys() == got.keys()
    for k in stream:
        np.testing.assert_array_equal(
            np.asarray(stream[k]), np.asarray(got[k]), err_msg=k)
