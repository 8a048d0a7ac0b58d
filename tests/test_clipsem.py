"""CLIP-semantics text table tests (hash encoder path)."""

import numpy as np

from vlsat_tpu.clipsem import (
    HashTextEncoder,
    TripletTextCache,
    build_label_tables,
    no_relation_prompt,
    triplet_prompt,
)


def test_prompts_exact():
    assert triplet_prompt("chair", "standing on", "floor") == \
        "a point cloud of a chair standing on a floor"
    assert no_relation_prompt("chair", "floor") == \
        "the chair and the floor has no relation in the point cloud"


def test_label_tables_normalized_and_deterministic():
    enc = HashTextEncoder(64)
    obj, rel = build_label_tables(["chair", "table"], ["on", "near"], enc)
    assert obj.shape == (2, 64) and rel.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(obj, axis=-1), 1.0, rtol=1e-5)
    obj2, _ = build_label_tables(["chair", "table"], ["on", "near"], enc)
    np.testing.assert_array_equal(obj, obj2)


def test_triplet_cache_roundtrip_and_lookup(tmp_path):
    classes = ["chair", "table", "floor"]
    rels = ["on", "near"]
    enc = HashTextEncoder(32)
    cache = TripletTextCache(classes, rels, dim=32)

    class Ann:
        objects = {1: "chair", 2: "floor"}
        relationships = [[1, 2, 0, "on"]]

    sents = cache.sentences_for_index([Ann()])
    assert "a point cloud of a chair on a floor" in sents
    assert "the chair and the floor has no relation in the point cloud" in sents
    cache.build(sents, enc)

    gt_class = np.asarray([0, 2])
    ei = np.asarray([[0, 1], [1, 0]])
    gt_rels = np.zeros((2, 2), np.float32)
    gt_rels[0, 0] = 1  # chair on floor; edge 1 has no rel
    out = cache(gt_class, gt_rels, ei)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    want = enc([triplet_prompt("chair", "on", "floor")])[0]
    np.testing.assert_allclose(out[0], want / np.linalg.norm(want), rtol=1e-5)

    p = str(tmp_path / "cache.npz")
    cache.save(p)
    back = TripletTextCache.load(p, classes, rels)
    np.testing.assert_allclose(back(gt_class, gt_rels, ei), out, rtol=1e-6)

    # multi-label: mean then normalize
    gt_rels2 = np.zeros((2, 2), np.float32)
    gt_rels2[0] = 1  # both rels
    cache.build(cache.sentences_for_index([Ann()]) +
                [triplet_prompt("chair", "near", "floor")], enc)
    out2 = cache(gt_class, gt_rels2, ei)
    a = enc([triplet_prompt("chair", "on", "floor")])[0]
    b = enc([triplet_prompt("chair", "near", "floor")])[0]
    m = (a + b) / 2
    np.testing.assert_allclose(out2[0], m / np.linalg.norm(m), rtol=1e-5)
