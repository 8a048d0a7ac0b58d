"""Prefetcher, triplet-cache wiring, same-part relations."""

import numpy as np
import pytest

from tests.mini_data import make_mini_dataset


def test_prefetcher_order_and_errors():
    from vlsat_tpu.data.pipeline import Prefetcher

    assert list(Prefetcher(range(10))) == list(range(10))

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_same_part_relationships():
    from vlsat_tpu.preprocess.gen_data import same_part_relationships

    rels = same_part_relationships({10: 1, 11: 1, 12: 2, 13: 1})
    pairs = {(r[0], r[1]) for r in rels}
    assert (10, 11) in pairs and (11, 10) in pairs and (13, 10) in pairs
    assert all(12 not in (a, b) for a, b in pairs)
    assert all(r[3] == "same part" for r in rels)


def test_runner_triplet_cache_wiring(tmp_path):
    root, scans = make_mini_dataset(tmp_path)
    # build a hash-encoder cache over the train index
    from vlsat_tpu.clipsem import HashTextEncoder, TripletTextCache
    from vlsat_tpu.data.assets import build_index, read_classes, read_relationships

    classes = read_classes(root)
    relations = read_relationships(root)[1:]
    cache = TripletTextCache(classes, relations, dim=512)
    idx = build_index(root, "train_scans")
    cache.build(cache.sentences_for_index(idx.scenes), HashTextEncoder(512))
    cache_path = str(tmp_path / "trip.npz")
    cache.save(cache_path)

    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"), "MAX_EPOCHES": 1, "Batch_Size": 2,
        "VALID_INTERVAL": 0, "LOG_INTERVAL": 0, "MODE": "train",
        "MODEL": {"triplet_text_cache": cache_path},
        "dataset": {"root": root, "scans_root": scans, "num_points": 8},
    })
    r = Runner(cfg)
    loader_batch = None
    from vlsat_tpu.data.dataset import SceneLoader

    loader_batch = next(iter(SceneLoader(r.train_scenes, batch_size=2,
                                         shuffle=False, for_train=True)))
    assert loader_batch.rel_text_feat is not None
    norms = np.linalg.norm(np.asarray(loader_batch.rel_text_feat), axis=-1)
    valid = np.asarray(loader_batch.edge_mask)
    np.testing.assert_allclose(norms[valid], 1.0, rtol=1e-4)
    r.train()  # one epoch with the rel-mimic target active


def test_prefetcher_early_exit_no_leak():
    import threading
    from vlsat_tpu.data.pipeline import Prefetcher

    before = threading.active_count()
    for _ in range(5):
        it = iter(Prefetcher(range(1000)))
        next(it)
        it.close()  # consumer stops early
    import time
    time.sleep(0.3)
    assert threading.active_count() <= before + 1
