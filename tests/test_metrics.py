"""Metric parity tests.

The "slow" implementations below replicate the *documented semantics* of the
reference's sort-loop metrics (SURVEY.md §2.5) directly — descending sorts,
tie handling via >=, the 0.5-threshold rule for no-GT edges, top-101 cube
truncation, multi-GT rank discounting — and the vectorized device metrics
must agree exactly on random inputs.
"""

import numpy as np
import jax.numpy as jnp

from vlsat_tpu.eval.metrics import (
    assemble_predicate_topk,
    assemble_triplet_topk,
    compute_mean_predicate,
    get_mean_recall,
    object_ranks,
    predicate_rank_parts,
    triplet_rank_parts,
)


def slow_object_rank(pred, gt, topk):
    order = np.argsort(-pred, kind="stable")
    index = 1
    for idx in order:
        if pred[gt] >= pred[idx] or index > topk:
            break
        index += 1
    return index


def slow_predicate_ranks(pred, gts, topk, thr=0.5):
    sorted_conf = np.sort(pred)[::-1]
    out = []
    if len(gts) == 0:
        below = np.nonzero(sorted_conf < thr)[0]
        out.append(topk + 1 if len(below) == 0 else int(below[0]) + 1)
    for g in gts:
        index = 1
        for idx in np.argsort(-pred, kind="stable"):
            if pred[g] >= pred[idx] or index > topk:
                break
            index += 1
        out.append(index)
    res, counter = [], 0
    for t in sorted(out):
        res.append(t - counter)
        counter += 1
    return res


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def slow_triplet_ranks(sub_p, obj_p, rel_p, sub_gt, obj_gt, gts, topk, thr=0.5):
    node = np.einsum("n,m->nm", sub_p, obj_p)
    conf = np.einsum("nl,m->nlm", node, rel_p).reshape(-1)
    order = np.argsort(-conf, kind="stable")
    sorted_conf = conf[order][:topk]
    out = []
    if len(gts) == 0:
        below = np.nonzero(sorted_conf < thr)[0]
        out.append(topk + 1 if len(below) == 0 else int(below[0]) + 1)
    for g in gts:
        gt_conf = (sub_p[sub_gt] * obj_p[obj_gt]) * rel_p[g]
        eq = np.nonzero(sorted_conf == gt_conf)[0]
        out.append(topk + 1 if len(eq) == 0 else int(eq[0]) + 1)
    res, counter = [], 0
    for t in sorted(out):
        res.append(t - counter)
        counter += 1
    return res


def test_object_ranks_vs_slow():
    rng = np.random.RandomState(0)
    logits = rng.randn(40, 20).astype(np.float32)
    # inject ties
    logits[5, 3] = logits[5, 7]
    gt = rng.randint(0, 20, 40)
    fast = np.asarray(object_ranks(jnp.asarray(logits), jnp.asarray(gt), topk=11))
    for i in range(40):
        assert fast[i] == slow_object_rank(logits[i], gt[i], 11), i


def test_predicate_ranks_vs_slow():
    rng = np.random.RandomState(1)
    probs = rng.rand(60, 7).astype(np.float32)
    probs[2] = 0.9  # all above threshold -> no-gt rank = topk+1
    probs[3] = 0.1  # all below threshold -> no-gt rank = 1
    gt = (rng.rand(60, 7) < 0.25).astype(np.float32)
    gt[2] = 0
    gt[3] = 0
    cr, ng = predicate_rank_parts(jnp.asarray(probs), topk=6)
    fast = assemble_predicate_topk(np.asarray(cr), np.asarray(ng), gt)
    slow = []
    for e in range(60):
        slow.extend(slow_predicate_ranks(probs[e], np.nonzero(gt[e])[0], topk=6))
    np.testing.assert_array_equal(fast, np.asarray(slow))


def test_triplet_ranks_vs_slow():
    rng = np.random.RandomState(2)
    n, c, r, topk = 6, 12, 7, 25
    logits = rng.randn(n, c).astype(np.float32) * 2
    gt_class = rng.randint(0, c, n)
    from vlsat_tpu.scene import full_edge_index

    ei = full_edge_index(n)
    e_cnt = len(ei)
    rel_probs = rng.rand(e_cnt, r).astype(np.float32)
    gt = (rng.rand(e_cnt, r) < 0.2).astype(np.float32)

    cr, ng = triplet_rank_parts(
        jnp.asarray(logits), jnp.asarray(gt_class), jnp.asarray(rel_probs),
        jnp.asarray(ei), topk=topk,
    )
    obr = np.asarray(object_ranks(jnp.asarray(logits), jnp.asarray(gt_class), topk=11))
    res = assemble_triplet_topk(
        np.asarray(cr), np.asarray(ng), gt,
        gt_class[ei[:, 0]], gt_class[ei[:, 1]],
        obr[ei[:, 0]], obr[ei[:, 1]],
    )
    probs = softmax(logits)
    slow = []
    for e in range(e_cnt):
        slow.extend(
            slow_triplet_ranks(
                probs[ei[e, 0]], probs[ei[e, 1]], rel_probs[e],
                gt_class[ei[e, 0]], gt_class[ei[e, 1]],
                np.nonzero(gt[e])[0], topk=topk,
            )
        )
    np.testing.assert_array_equal(res["topk"], np.asarray(slow))
    # cls_matrix layout: predicate -1 iff edge had no GT
    no_gt_edges = (gt.sum(-1) == 0).sum()
    assert (res["cls_matrix"][:, -1] == -1).sum() == no_gt_edges


def test_mean_recall_and_mean_predicate():
    rank = np.asarray([1, 60, 2, 120, 3])
    cls = np.asarray([
        [0, 1, 1, 1, 0],
        [0, 1, 1, 1, 0],
        [0, 1, 1, 1, 2],
        [0, 1, 1, 1, 2],
        [0, 1, 1, 1, -1],
    ])
    mr = get_mean_recall(rank, cls, topk=(50, 100), num_rel_classes=3)
    # class 0: ranks [1, 60] -> r50=50, r100=100; class 2: [2, 120] -> 50, 50
    np.testing.assert_allclose(mr, [50.0, 75.0])
    m1, m3, m5 = compute_mean_predicate(cls, np.asarray([1, 4, 2, 3, 9]), num_rel_classes=3)
    # class 0 ranks [1,4]: acc1 .5 acc3 .5 acc5 1; class 2 [2,3]: 0, 1, 1
    np.testing.assert_allclose([m1, m3, m5], [25.0, 75.0, 100.0])


def test_triplet_rank_methods_agree():
    """Factored top-k counting (default) == legacy cube sort on random
    data (the only admissible divergence class is the sort method's own
    division-ulp tie flips, measure-zero for random inputs).  Shapes
    cover C > topk (staircase active), C < topk (full-grid staircase,
    exact path), and saturated + unsaturated counts."""
    import jax.numpy as jnp

    from vlsat_tpu.eval.metrics import triplet_rank_parts

    rng = np.random.RandomState(7)
    for n, c, r, e, topk in [(9, 23, 7, 30, 11), (9, 23, 7, 30, 101),
                             (6, 7, 5, 20, 11), (12, 160, 26, 64, 101)]:
        ol = jnp.asarray(rng.randn(n, c).astype(np.float32) * 2)
        gc = jnp.asarray(rng.randint(0, c, n).astype(np.int32))
        probs = rng.rand(e, r).astype(np.float32)
        ei = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)], -1)
        a = triplet_rank_parts(ol, gc, jnp.asarray(probs), jnp.asarray(ei),
                               topk=topk, chunk=16, method="topk")
        b = triplet_rank_parts(ol, gc, jnp.asarray(probs), jnp.asarray(ei),
                               topk=topk, chunk=16, method="sort")
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_zero_shot_recall_matches_naive_loop():
    from vlsat_tpu.eval.metrics import get_zero_shot_recall

    rng = np.random.RandomState(5)
    n, c, nrel = 400, 12, 7
    cls_matrix = np.stack([
        rng.randint(0, c, n), rng.randint(1, 12, n),
        rng.randint(0, c, n), rng.randint(1, 12, n),
        rng.randint(-1, nrel, n)], axis=1).astype(np.int64)
    ranks = rng.randint(1, 102, n).astype(np.int64)
    vocab = {f"{rng.randint(0, c)} {rng.randint(0, c)} {rng.randint(0, nrel)}"
             for _ in range(40)}

    def naive(triplet_rank, cm, train_triplets):
        zero, non_zero, all_r = [], [], []
        for i, row in enumerate(cm):
            if row[-1] == -1:
                continue
            key = f"{row[0]} {row[2]} {row[-1]}"
            (zero if key not in train_triplets else non_zero).append(
                triplet_rank[i])
            all_r.append(triplet_rank[i])

        def rec(a):
            a = np.asarray(a)
            if len(a) == 0:
                return (float("nan"), float("nan"))
            return (float((a <= 50).mean() * 100), float((a <= 100).mean() * 100))

        z, nz, al = rec(zero), rec(non_zero), rec(all_r)
        return {"zero_shot_50": z[0], "zero_shot_100": z[1],
                "non_zero_shot_50": nz[0], "non_zero_shot_100": nz[1],
                "all_50": al[0], "all_100": al[1]}

    got = get_zero_shot_recall(ranks, cls_matrix, vocab)
    want = naive(ranks, cls_matrix, vocab)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], err_msg=k)
    # empty matrix: all NaN, no crash
    empty = get_zero_shot_recall(np.zeros(0, np.int64),
                                 np.zeros((0, 5), np.int64), vocab)
    assert all(np.isnan(v) for v in empty.values())
