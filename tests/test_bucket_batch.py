"""Per-bucket batch-size selection (data/bucket_batch.py): eval metrics
are batch-size independent, so the {bucket: B} loaders must cover every
scene exactly once per pass and reproduce the int-batch metrics
bit-exactly."""

import jax
import numpy as np
import pytest

from vlsat_tpu.data.bucket_batch import DEFAULT_EVAL_BATCH, resolve_batch


def test_resolve_batch():
    assert resolve_batch(32, 8) == 32
    t = {8: 64, 16: 32, 64: 8}
    assert resolve_batch(t, 8) == 64
    assert resolve_batch(t, 16) == 32
    # unlisted bucket: nearest mapped bucket ABOVE (memory-safe direction)
    assert resolve_batch(t, 12) == 32
    assert resolve_batch(t, 24) == 8
    # beyond the largest mapped bucket: the largest's value
    assert resolve_batch(t, 128) == 8
    assert all(isinstance(v, int) for v in DEFAULT_EVAL_BATCH.values())


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    from vlsat_tpu.data.dataset import SSGScenes
    from vlsat_tpu.data.packed import PackedScenes, pack_scenes
    from vlsat_tpu.data.synthetic import make_synthetic_split

    tmp = tmp_path_factory.mktemp("bb")
    root, scans, cache = make_synthetic_split(
        str(tmp / "split"), num_scans=10, insts_per_scan=(4, 14),
        vertices_per_inst=60, rels_per_scan=4, seed=0)
    ds = SSGScenes(root, scans, "validation_scans", cache_root=cache)
    pack_scenes(ds, str(tmp / "pack"), seed=0)
    return PackedScenes(str(tmp / "pack"))


def test_packed_loader_per_bucket_sizes(pack):
    from vlsat_tpu.data.packed import PackedLoader

    table = {b: (4 if b <= 8 else 2) for b in pack.buckets}
    loader = PackedLoader(pack, batch_size=table)
    seen = 0
    for batch in loader:
        b = batch.obj_points.shape[1]
        assert batch.obj_points.shape[0] <= table[b]
        seen += int(np.asarray(batch.obj_mask).any(axis=1).sum())
    assert seen == sum(pack.count(b) for b in pack.buckets)
    assert len(loader) == sum(-(-pack.count(b) // table[b])
                              for b in pack.buckets)


def _metrics(loader):
    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, tiny, istrain=True)
    return evaluate(make_eval_step(model), v["params"],
                    v.get("batch_stats", {}), loader, verbose=False)


def test_per_bucket_eval_metrics_match_int_batch(pack, monkeypatch):
    """The headline guarantee: per-bucket batch sizes change ONLY
    throughput — the full metric suite is bit-identical to batch_size=4
    (f32 wire pinned so the comparison is exact)."""
    from vlsat_tpu.data.resident import ResidentGroupedEval, ResidentScenes

    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")
    res = ResidentScenes(pack)
    m_int = _metrics(ResidentGroupedEval(res, 4, group=2))
    table = {b: (4 if b <= 8 else 2) for b in pack.buckets}
    m_tab = _metrics(ResidentGroupedEval(res, table, group=2))
    assert m_int.keys() == m_tab.keys()
    for k in m_int:
        np.testing.assert_array_equal(np.asarray(m_int[k]),
                                      np.asarray(m_tab[k]), err_msg=k)


def test_runner_eval_bs_auto():
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    r = Runner.__new__(Runner)  # only _eval_bs is under test
    r.cfg = load_config(overrides={"EVAL_BATCH_SIZE": "auto"})
    assert r._eval_bs() == dict(DEFAULT_EVAL_BATCH)
    r.cfg = load_config(overrides={"EVAL_BATCH_SIZE": 16})
    assert r._eval_bs() == 16
