"""Scene-level R@K parity vs a slow cube-materializing oracle."""

import numpy as np

from vlsat_tpu.eval.recall import (batched_scene_hits, scene_recall_topk,
                                   tally_hits)
from vlsat_tpu.scene import full_edge_index


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def slow_scene_recall(obj_logits, rel_probs, gt_rels, gt_class, ei, topk_list, topk_each):
    probs = softmax(obj_logits.astype(np.float32))
    c = probs.shape[-1]
    nrel = rel_probs.shape[-1]
    confs, ids, eids = [], [], []
    for e in range(len(ei)):
        cube = np.einsum("n,m->nm", probs[ei[e, 0]], probs[ei[e, 1]])
        cube = np.einsum("nl,m->nlm", cube, rel_probs[e]).reshape(-1)
        top = np.argsort(-cube, kind="stable")[:topk_each]
        confs.append(cube[top])
        ids.append(top)
        eids.append(np.full(len(top), e))
    conf = np.concatenate(confs)
    idx = np.concatenate(ids)
    eid = np.concatenate(eids)
    order = np.argsort(-conf, kind="stable")[: max(topk_list)]
    correct = [0] * len(topk_list)
    done = [set() for _ in topk_list]
    sub_cls = gt_class[ei[:, 0]]
    obj_cls = gt_class[ei[:, 1]]
    for rank, o in enumerate(order):
        e = eid[o]
        i, j, r = np.unravel_index(idx[o], (c, c, nrel))
        if sub_cls[e] == i and obj_cls[e] == j and gt_rels[e, r] > 0:
            for t, k in enumerate(topk_list):
                if rank < k and e not in done[t]:
                    correct[t] += 1
                    done[t].add(e)
    total = max(float((gt_rels.sum(-1) > 0).sum()), 1.0)
    return np.asarray(correct) / total


def test_scene_recall_matches_oracle():
    rng = np.random.RandomState(3)
    n, c, nrel = 6, 10, 5
    logits = rng.randn(n, c).astype(np.float32) * 2
    gt_class = rng.randint(0, c, n)
    ei = full_edge_index(n)
    rel_probs = rng.rand(len(ei), nrel).astype(np.float32)
    gt_rels = (rng.rand(len(ei), nrel) < 0.25).astype(np.float32)
    topk = (5, 20, 50)
    got = scene_recall_topk(logits, rel_probs, gt_rels, gt_class, ei,
                            topk=topk, topk_each=30, num_rel_classes=nrel)
    want = slow_scene_recall(logits, rel_probs, gt_rels, gt_class, ei,
                             list(topk), 30)
    np.testing.assert_allclose(got, want)


def test_scene_recall_per_class_shape():
    rng = np.random.RandomState(4)
    n, c, nrel = 5, 8, 4
    logits = rng.randn(n, c).astype(np.float32)
    gt_class = rng.randint(0, c, n)
    ei = full_edge_index(n)
    rel_probs = rng.rand(len(ei), nrel).astype(np.float32)
    gt_rels = (rng.rand(len(ei), nrel) < 0.3).astype(np.float32)
    out = scene_recall_topk(logits, rel_probs, gt_rels, gt_class, ei,
                            topk=(10, 20), topk_each=20, num_rel_classes=nrel,
                            per_class=True)
    assert out.shape == (nrel, 2)
    # classes with no GT are -1
    for r in range(nrel):
        if (gt_rels[:, r] > 0).sum() == 0:
            assert (out[r] == -1).all()


def slow_rels_recall(rel_probs, gt_rels, topk_list, topk_each):
    """predcls oracle: rank per-edge predicate scores only."""
    confs, ids, eids = [], [], []
    for e in range(len(rel_probs)):
        top = np.argsort(-rel_probs[e], kind="stable")[:topk_each]
        confs.append(rel_probs[e][top])
        ids.append(top)
        eids.append(np.full(len(top), e))
    conf = np.concatenate(confs)
    idx = np.concatenate(ids)
    eid = np.concatenate(eids)
    order = np.argsort(-conf, kind="stable")[: max(topk_list)]
    correct = [0] * len(topk_list)
    done = [set() for _ in topk_list]
    for rank, o in enumerate(order):
        e = eid[o]
        if gt_rels[e, idx[o]] > 0:
            for t, k in enumerate(topk_list):
                if rank < k and e not in done[t]:
                    correct[t] += 1
                    done[t].add(e)
    total = max(float((gt_rels.sum(-1) > 0).sum()), 1.0)
    return np.asarray(correct) / total


def test_scene_recall_rels_mode_matches_oracle():
    rng = np.random.RandomState(7)
    n, c, nrel = 6, 10, 5
    logits = rng.randn(n, c).astype(np.float32)
    gt_class = rng.randint(0, c, n)
    ei = full_edge_index(n)
    rel_probs = rng.rand(len(ei), nrel).astype(np.float32)
    gt_rels = (rng.rand(len(ei), nrel) < 0.3).astype(np.float32)
    for topk_each in (1, 100):  # gc and ngc variants
        got = scene_recall_topk(logits, rel_probs, gt_rels, gt_class, ei,
                                topk=(5, 20), topk_each=topk_each,
                                num_rel_classes=nrel, evaluate="rels")
        want = slow_rels_recall(rel_probs, gt_rels, [5, 20], topk_each)
        np.testing.assert_allclose(got, want, err_msg=f"topk_each={topk_each}")


def test_scene_recall_valid_edges_ignores_padding():
    rng = np.random.RandomState(9)
    n, c, nrel = 5, 8, 4
    logits = rng.randn(n, c).astype(np.float32)
    gt_class = rng.randint(0, c, n)
    ei_valid = full_edge_index(n)
    ev = len(ei_valid)
    pad = 10
    ei = np.concatenate([ei_valid, np.zeros((pad, 2), np.int32)])
    rel_probs = rng.rand(ev + pad, nrel).astype(np.float32)
    rel_probs[ev:] = 0.99  # poison padded rows — must be dropped
    gt_rels = np.zeros((ev + pad, nrel), np.float32)
    gt_rels[:ev] = (rng.rand(ev, nrel) < 0.3).astype(np.float32)
    for mode in ("triplet", "rels"):
        got = scene_recall_topk(logits, rel_probs, gt_rels, gt_class, ei,
                                topk=(5, 20), topk_each=10,
                                num_rel_classes=nrel, evaluate=mode,
                                valid_edges=ev)
        want = scene_recall_topk(logits, rel_probs[:ev], gt_rels[:ev],
                                 gt_class, ei_valid, topk=(5, 20),
                                 topk_each=10, num_rel_classes=nrel,
                                 evaluate=mode)
        np.testing.assert_allclose(got, want, err_msg=mode)


def test_batched_scene_hits_matches_host_path():
    """The fused engine's device pass (batched_scene_hits + tally_hits)
    must reproduce scene_recall_topk — which the oracles above certify —
    for every (mode, gc/ngc) protocol combo, with ragged padded scenes."""
    rng = np.random.RandomState(11)
    b, n_max, c, nrel = 3, 6, 10, 5
    e_max = n_max * (n_max - 1)
    node_counts = [6, 4, 5]

    logits = rng.randn(b, n_max, c).astype(np.float32) * 2
    gt_class = rng.randint(0, c, (b, n_max)).astype(np.int32)
    rel_probs = rng.rand(b, e_max, nrel).astype(np.float32)
    edge_index = np.zeros((b, e_max, 2), np.int32)
    edge_mask = np.zeros((b, e_max), bool)
    gt_rels = np.zeros((b, e_max, nrel), np.float32)
    for s, nn in enumerate(node_counts):
        ei = full_edge_index(nn)
        edge_index[s, :len(ei)] = ei
        edge_mask[s, :len(ei)] = True
        gt_rels[s, :len(ei)] = (rng.rand(len(ei), nrel) < 0.3)
        rel_probs[s, len(ei):] = 0.99  # poison padding — must be inert

    for mode, te in (("triplet", 1), ("triplet", 100),
                     ("rels", 1), ("rels", 100)):
        eg, hit = batched_scene_hits(
            logits, rel_probs, edge_index, edge_mask, gt_class, gt_rels,
            topk_each=te, kmax=100, mode=mode)
        eg, hit = np.asarray(eg), np.asarray(hit)
        assert eg.shape == (b, 100) and hit.shape == (b, 100)
        for s, nn in enumerate(node_counts):
            ev = len(full_edge_index(nn))
            got_s, got_c = tally_hits(eg[s], hit[s], gt_rels[s, :ev],
                                      topk=(5, 20, 100), num_rel_classes=nrel)
            want_s, want_c = scene_recall_topk(
                logits[s], rel_probs[s], gt_rels[s], gt_class[s],
                edge_index[s], topk=(5, 20, 100), topk_each=te,
                num_rel_classes=nrel, evaluate=mode, valid_edges=ev,
                return_both=True)
            np.testing.assert_allclose(got_s, want_s,
                                       err_msg=f"{mode}/{te} scene {s}")
            np.testing.assert_allclose(got_c, want_c,
                                       err_msg=f"{mode}/{te} scene {s}")


def test_staircase_matches_pairtable():
    """batched_per_edge_topk (factored staircase candidates, no pair-
    product table) == the legacy per-scene pairtable method: identical
    candidate confidences AND cube indices (both compute (s*o)*r with the
    same parenthesization, so ties are bit-equal; random f32 inputs)."""
    from vlsat_tpu.eval.recall import batched_per_edge_topk, per_edge_topk

    rng = np.random.RandomState(5)
    b, n, c, nrel = 4, 8, 40, 9
    e = n * (n - 1)
    logits = rng.randn(b, n, c).astype(np.float32) * 3
    rel = rng.rand(b, e, nrel).astype(np.float32)
    ei = np.broadcast_to(full_edge_index(n), (b, e, 2)).astype(np.int32)

    for te in (1, 7, 100):
        conf_s, idx_s = batched_per_edge_topk(logits, rel, ei, topk_each=te)
        for s in range(b):
            conf_p, idx_p = per_edge_topk(logits[s], rel[s], ei[s],
                                          topk_each=te)
            np.testing.assert_array_equal(
                np.asarray(conf_s[s]), np.asarray(conf_p),
                err_msg=f"conf te={te} scene {s}")
            np.testing.assert_array_equal(
                np.asarray(idx_s[s]), np.asarray(idx_p),
                err_msg=f"idx te={te} scene {s}")

    # full pipeline: both methods through batched_scene_hits
    em = np.ones((b, e), bool)
    gt_class = rng.randint(0, c, (b, n)).astype(np.int32)
    gt_rels = (rng.rand(b, e, nrel) < 0.2).astype(np.float32)
    # te=1 and te>=kmax take the capless global staircase merge; te=7 with
    # kmax=50 exercises the binding-cap fallback (per-edge top_k path)
    for te in (1, 7, 100):
        for m in ("staircase", "pairtable"):
            out = batched_scene_hits(
                logits, rel, ei, em, gt_class, gt_rels,
                topk_each=te, kmax=50, mode="triplet", method=m)
            if m == "staircase":
                want = [np.asarray(o) for o in out]
            else:
                for w, g in zip(want, out):
                    np.testing.assert_array_equal(w, np.asarray(g),
                                                  err_msg=f"te={te}")


def test_tally_hits_batch_matches_per_scene():
    """tally_hits_batch == tally_hits row by row, including no-GT scenes
    (flagged invalid) and padded edges."""
    from vlsat_tpu.eval.recall import tally_hits, tally_hits_batch

    rng = np.random.RandomState(3)
    b, e, nrel, kmax = 5, 30, 7, 40
    sel = rng.randint(0, e, (b, kmax)).astype(np.int32)
    hits = rng.rand(b, kmax) < 0.25
    gt_rels = (rng.rand(b, e, nrel) < 0.2).astype(np.float32)
    edge_mask = np.zeros((b, e), bool)
    evs = [30, 12, 0, 20, 7]
    for s, ev in enumerate(evs):
        edge_mask[s, :ev] = True
        gt_rels[s, ev:] = 0.0
        hits[s] &= sel[s] < max(ev, 1)  # device hits only on valid edges
    gt_rels[3] = 0.0  # valid edges but no GT relations -> invalid scene

    scalar, per_cls, valid = tally_hits_batch(
        sel, hits, gt_rels, edge_mask, topk=(5, 20, 40),
        num_rel_classes=nrel)
    assert valid.tolist() == [True, True, False, False, True]
    for s, ev in enumerate(evs):
        if not valid[s]:
            continue
        want_s, want_c = tally_hits(sel[s], hits[s], gt_rels[s, :ev],
                                    topk=(5, 20, 40), num_rel_classes=nrel)
        np.testing.assert_allclose(scalar[s], want_s, err_msg=f"scene {s}")
        np.testing.assert_allclose(per_cls[s], want_c, err_msg=f"scene {s}")
