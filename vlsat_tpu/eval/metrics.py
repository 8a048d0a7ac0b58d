"""Vectorized evaluation metrics with exact reference semantics.

The reference computes ranks with per-edge Python sort loops
(src/utils/eva_utils_acc.py) — for the triplet metric that means sorting a
160*160*26 confidence cube per edge on the host.  All three metrics reduce
to *counting*, which vectorizes:

  * object rank (eva_utils_acc.py:27-39): walking the descending sort until
    ``pred[gt] >= pred[idx]`` is ``#{c : pred_c > pred_gt} + 1`` capped at
    topk+1 (ties with the GT count as hits);
  * predicate rank (":42-79"): same count per GT class; edges with *no* GT
    relation get ``#{c : pred_c >= 0.5} + 1`` (UNcapped by topk unless every
    class clears the threshold — a reference quirk we reproduce);
  * triplet rank (":137-213"): the first position of gt_conf in the sorted
    top-`topk` cube is ``#{(i,j,k) : s_i*o_j*r_k > gt_conf} + 1`` when that
    count < topk, else topk+1.  Because the rank SATURATES at topk+1, only
    the top-`topk` cube values can ever influence it — and the top-topk of
    the rank-1 cube factorizes (``method="topk"``, round 3): per-node
    top-topk scores, the "staircase" of pair positions
    ``(a+1)*(b+1) <= topk`` (~520 candidates out of C^2 — any pair deeper
    has >= topk pairs above it, so it can only occur in saturated counts),
    a pair top-topk, then a compare-all of the topk*R candidate products
    against the per-class GT confidences.  No per-edge cube sort (the
    legacy sort survives as ``method="sort"`` and measured 1.47 s/batch on
    TPU — the entire end-to-end eval wall, PERFORMANCE.md round 3), no
    giant temporaries, and — unlike the sort method's division-based
    probes — candidates and thresholds are compared as identically-
    computed f32 products, so reference tie semantics are EXACT with no
    ulp corrections at all.

Multi-GT rank discounting (``tmp - counter`` after sorting, ":206-211") and
cls_matrix assembly happen on the host over tiny arrays.

All device math is forced to float32: rank counts are tie-sensitive.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# device-side rank counts
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("topk",))
def object_ranks(obj_logits: jnp.ndarray, gt_class: jnp.ndarray, topk: int = 11) -> jnp.ndarray:
    """(..., C) logits + (...) labels -> (...) int32 ranks in [1, topk+1]."""
    logits = obj_logits.astype(jnp.float32)
    gt_score = jnp.take_along_axis(logits, gt_class[..., None], axis=-1)
    greater = (logits > gt_score).sum(axis=-1)
    return jnp.minimum(greater + 1, topk + 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("topk", "threshold"))
def predicate_rank_parts(
    rel_probs: jnp.ndarray, topk: int = 6, threshold: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class ranks (..., R) and the no-GT threshold rank (...)."""
    p = rel_probs.astype(jnp.float32)
    greater = (p[..., None, :] > p[..., :, None]).sum(axis=-1)  # (..., R)
    class_ranks = jnp.minimum(greater + 1, topk + 1).astype(jnp.int32)
    above = (p >= threshold).sum(axis=-1)
    no_gt_rank = jnp.where(above < p.shape[-1], above + 1, topk + 1).astype(jnp.int32)
    return class_ranks, no_gt_rank


@partial(jax.jit, static_argnames=("topk", "threshold", "chunk", "method"))
def triplet_rank_parts(
    obj_logits: jnp.ndarray,     # (N, C) — one scene
    gt_class: jnp.ndarray,       # (N,)
    rel_probs: jnp.ndarray,      # (E, R)
    edge_index: jnp.ndarray,     # (E, 2)
    topk: int = 101,
    threshold: float = 0.5,
    chunk: int = 128,
    method: str = "topk",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triplet ranks for every candidate predicate of every edge.

    Returns (class_ranks (E, R), no_gt_ranks (E,)); the caller selects the
    GT predicates.  Object scores are softmax(logits) — the reference's
    use_clip=True path (eva_utils_acc.py:143-144).  Edges are processed in
    fixed-size chunks via lax.map to bound the temporaries.

    ``method="topk"`` (default, round 3): factored top-k counting.  Ranks
    saturate at topk+1, so a count is only needed exactly when it is
    < topk — in which case every contributing cube cell (i,j,k) must have
    its pair (i,j) among the top-topk pairwise products (any deeper pair
    has >= topk pairs above it, each of which, times the same r_k, also
    beats the threshold by rounding monotonicity — forcing saturation).
    The top-topk pairs of the rank-1 pair matrix come from per-node
    top-topk scores restricted to the static "staircase"
    ``(a+1)*(b+1) <= topk`` of sorted positions (~520 of C^2=25,600), then
    one small top_k.  Candidate products (topk x R per edge) compare
    against the per-class GT confidences computed as the IDENTICAL f32
    expression ``(s_gt*o_gt)*r_k`` — so exact ties (the GT cell against
    itself included) behave exactly as the reference's materialized cube,
    with no division-ulp corrections (the legacy ``method="sort"``
    searchsorted-on-ratios path needed one; it survives for testing and
    measured 1.47 s per 32-scene batch on TPU — the entire end-to-end
    eval wall, PERFORMANCE.md round 3).
    """
    probs = jax.nn.softmax(obj_logits.astype(jnp.float32), axis=-1)
    r_all = rel_probs.astype(jnp.float32)
    e_cnt, nrel = r_all.shape
    c = probs.shape[-1]
    n_chunks = -(-e_cnt // chunk)
    pad = n_chunks * chunk - e_cnt
    ei_p = jnp.pad(edge_index, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 2)
    r_p = jnp.pad(r_all, ((0, pad), (0, 0))).reshape(n_chunks, chunk, nrel)

    if method == "topk":
        k_node = min(c, topk)
        # staircase of sorted-pair positions that can hold a top-topk pair.
        # Positions index ASCENDING-sorted node vectors (single-operand
        # lax.sort is ~2x the tuple sort top_k lowers to): descending rank
        # a maps to ascending index k_node-1-a.
        aa, bb = np.meshgrid(np.arange(k_node), np.arange(k_node), indexing="ij")
        keep = (aa + 1) * (bb + 1) <= topk
        a_idx = jnp.asarray(k_node - 1 - aa[keep])
        b_idx = jnp.asarray(k_node - 1 - bb[keep])
        k_pair = min(topk, int(keep.sum()))
        # stable=False: a stable sort carries an iota operand through the
        # TPU sort, doubling its cost; only the values are used
        node_top = jnp.sort(probs, axis=-1, stable=False)[..., -k_node:]
        # per-node GT-class probability: the cube's GT cell factor
        p_gt = jnp.take_along_axis(probs, gt_class[:, None], axis=-1)[:, 0]
        n_nodes = probs.shape[0]
        _mm = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

    def body(inputs):
        ei, r = inputs                                   # (chunk, 2), (chunk, R)

        if method == "sort":
            sub = probs[ei[:, 0]]                        # (chunk, C)
            obj = probs[ei[:, 1]]
            # GT-cell node score: same float product as the cube entry
            sub_cls = gt_class[ei[:, 0]]
            obj_cls = gt_class[ei[:, 1]]
            s_gt = jnp.take_along_axis(sub, sub_cls[:, None], axis=-1)[:, 0]
            o_gt = jnp.take_along_axis(obj, obj_cls[:, None], axis=-1)[:, 0]
            ns_gt = s_gt * o_gt
            t_class = ns_gt[:, None] * r                 # (chunk, R) gt confs
            thresholds = jnp.concatenate(
                [t_class, jnp.full((chunk, 1), threshold, jnp.float32)], axis=-1
            )
            r_safe = jnp.maximum(r, 1e-38)
            ratio = thresholds[:, :, None] / r_safe[:, None, :]  # (chunk, R+1, R)
            ns = (sub[:, :, None] * obj[:, None, :]).reshape(chunk, -1)
            ns_sorted = jnp.sort(ns, axis=-1)
            pos = jax.vmap(
                lambda row, x: jnp.searchsorted(row, x.reshape(-1), side="right")
            )(ns_sorted, ratio).reshape(ratio.shape)
            counts = (c * c - pos).sum(axis=-1)          # (chunk, R+1)
            # ulp correction: the GT cell must not count as greater than
            # its own confidence (t/r_k may round below ns_gt)
            div_gt = ns_gt[:, None] > t_class / r_safe
            class_counts = counts[:, :-1] - div_gt.astype(counts.dtype)
        else:
            # one-hot MXU gathers (bit-exact, ~20x the TPU row gather at
            # these shapes — PERFORMANCE.md round 2)
            iota = jnp.arange(n_nodes, dtype=ei.dtype)[None, :]
            oh_s = (ei[:, 0:1] == iota).astype(jnp.float32)   # (chunk, N)
            oh_o = (ei[:, 1:2] == iota).astype(jnp.float32)
            st = _mm("en,nk->ek", oh_s, node_top)        # (chunk, k_node)
            ot = _mm("en,nk->ek", oh_o, node_top)
            s_gt = _mm("en,n->e", oh_s, p_gt)
            o_gt = _mm("en,n->e", oh_o, p_gt)
            t_class = (s_gt * o_gt)[:, None] * r         # (chunk, R) gt confs
            thresholds = jnp.concatenate(
                [t_class, jnp.full((chunk, 1), threshold, jnp.float32)], axis=-1
            )
            stair = st[:, a_idx] * ot[:, b_idx]          # (chunk, ~5*topk)
            tpair = jnp.sort(stair, axis=-1, stable=False)[:, -k_pair:]
            cand = tpair[:, :, None] * r[:, None, :]     # (chunk, k_pair, R)
            counts = (cand[:, None, :, :] > thresholds[:, :, None, None]).sum(
                axis=(-1, -2), dtype=jnp.int32)          # (chunk, R+1)
            # exact f32 products both sides: the GT cell ties with its own
            # threshold and is never counted — no correction needed
            class_counts = counts[:, :-1]
        c05 = counts[:, -1]
        class_ranks = jnp.where(class_counts < topk, class_counts + 1, topk + 1)
        no_gt_ranks = jnp.where(c05 < topk, c05 + 1, topk + 1)
        return class_ranks.astype(jnp.int32), no_gt_ranks.astype(jnp.int32)

    cr, ng = jax.lax.map(body, (ei_p, r_p))
    return cr.reshape(-1, nrel)[:e_cnt], ng.reshape(-1)[:e_cnt]


# --------------------------------------------------------------------------
# device-side discounting (traced into the fused eval jit)
# --------------------------------------------------------------------------

def discounted_ranks_device(
    class_ranks: jnp.ndarray,   # (..., R) int ranks
    no_gt_ranks: jnp.ndarray,   # (...,)   threshold rank for no-GT edges
    gt_rels: jnp.ndarray,       # (..., R) multi-hot GT
) -> jnp.ndarray:
    """Device counterpart of ``_discount_parts``'s value matrix: per edge,
    the GT ranks sorted ascending minus their position index (the
    reference's ``tmp - counter``, eva_utils_acc.py:73-77,206-211), no-GT
    edges carrying their threshold rank in slot 0.  Returns (..., R)
    uint8-safe values OFFSET BY R-1 (the discount can reach 1-(R-1)) and
    clipped to 255; slots past each edge's max(#GT, 1) are meaningless and
    must be masked by the host (it has gt_rels).  Moving the per-edge sort
    here removed the dominant host cost of eval assembly (np.sort over
    (sumE, R) int64 was ~40% of the metric tail, PERFORMANCE.md round 3)."""
    nrel = gt_rels.shape[-1]
    gt = gt_rels > 0
    cnt = gt.sum(-1)
    big = jnp.int32(1 << 20)
    ranks = jnp.where(gt, class_ranks.astype(jnp.int32), big)
    disc = jnp.sort(ranks, axis=-1) - jnp.arange(nrel, dtype=jnp.int32)
    vals = jnp.where((cnt == 0)[..., None],
                     no_gt_ranks.astype(jnp.int32)[..., None], disc)
    return jnp.clip(vals + (nrel - 1), 0, 255)


def sorted_gt_preds_device(gt_rels: jnp.ndarray) -> jnp.ndarray:
    """Per-edge GT predicate ids ascending (cls_matrix column 5 layout),
    encoded uint8-safe as id+1 with 0 = the no-GT edge marker (-1) and
    R+1 padding past each edge's GT count.  Shared across the rel/triplet
    and 3d/2d assemblies (it depends only on gt_rels)."""
    nrel = gt_rels.shape[-1]
    gt = gt_rels > 0
    cnt = gt.sum(-1)
    pm = jnp.where(gt, jnp.arange(nrel, dtype=jnp.int32), jnp.int32(nrel))
    spm = jnp.sort(pm, axis=-1) + 1
    return jnp.where((cnt == 0)[..., None], 0, spm)


# --------------------------------------------------------------------------
# host-side assembly (tiny arrays)
# --------------------------------------------------------------------------

def _discount_parts(
    class_ranks: np.ndarray, no_gt_ranks: np.ndarray, gt_rels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized multi-GT discounting over all edges at once.

    Per edge the reference sorts that edge's GT ranks ascending and
    subtracts the position index (``tmp - counter``, eva_utils_acc.py:73-77,
    206-211); no-GT edges contribute their single threshold rank.  Returns
    (per-edge padded value matrix (E, R), validity mask (E, R) selecting
    each edge's first max(#GT, 1) slots, GT counts (E,)) — flattening
    ``vals[valid]`` reproduces the reference's edge-major accumulation
    order exactly.
    """
    e, r = gt_rels.shape
    gt = gt_rels > 0
    cnt = gt.sum(axis=1)
    big = np.iinfo(np.int64).max
    ranks = np.where(gt, class_ranks.astype(np.int64), big)
    disc = np.sort(ranks, axis=1) - np.arange(r, dtype=np.int64)[None, :]
    vals = np.where((cnt == 0)[:, None], no_gt_ranks.astype(np.int64)[:, None], disc)
    valid = np.arange(r)[None, :] < np.maximum(cnt, 1)[:, None]
    return vals, valid, cnt


def assemble_predicate_topk(
    class_ranks: np.ndarray, no_gt_ranks: np.ndarray, gt_rels: np.ndarray
) -> np.ndarray:
    """Per-edge rank list with multi-GT discounting.

    class_ranks (E, R), no_gt_ranks (E,), gt_rels (E, R) in {0,1} — valid
    edges only.  Returns the flat rank array the reference accumulates.
    Fully vectorized (the round-2 per-edge Python loop dominated eval host
    time); byte-identical output order.
    """
    if gt_rels.shape[0] == 0:
        return np.zeros((0,), np.int64)
    vals, valid, _ = _discount_parts(class_ranks, no_gt_ranks, gt_rels)
    return vals[valid]


def assemble_triplet_topk(
    class_ranks: np.ndarray,      # (E, R)
    no_gt_ranks: np.ndarray,      # (E,)
    gt_rels: np.ndarray,          # (E, R)
    sub_cls: np.ndarray,          # (E,) gt subject class
    obj_cls: np.ndarray,          # (E,)
    obj_rank_sub: np.ndarray,     # (E,) object-metric rank of the subject node
    obj_rank_obj: np.ndarray,     # (E,)
    sub_scores: Optional[np.ndarray] = None,   # (E, C) softmax scores
    obj_scores: Optional[np.ndarray] = None,
    rel_scores: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Triplet ranks + cls_matrix (+score lists), reference layout:
    cls_matrix rows are [sub_gt, sub_rank, obj_gt, obj_rank, predicate]
    with predicate=-1 for no-GT edges (eva_utils_acc.py:183-199).

    Vectorized; preserves the reference's ordering quirk: the rank list is
    rank-sorted per edge while cls_matrix rows follow ascending GT class
    index per edge (both edge-major).
    """
    e, r = gt_rels.shape
    if e == 0:
        z = np.zeros((0,), np.int64)
        out = {"topk": z, "cls_matrix": np.zeros((0, 5), np.int64)}
        if sub_scores is not None:
            out["sub_scores"] = np.zeros((0, sub_scores.shape[-1]), np.float32)
            out["obj_scores"] = np.zeros((0, obj_scores.shape[-1]), np.float32)
            out["rel_scores"] = np.zeros((0, rel_scores.shape[-1]), np.float32)
        return out
    vals, valid, cnt = _discount_parts(class_ranks, no_gt_ranks, gt_rels)
    counts = np.maximum(cnt, 1)
    big = np.iinfo(np.int64).max
    # GT class ids per edge in ascending order; -1 marks a no-GT edge row
    pm = np.where(gt_rels > 0, np.arange(r, dtype=np.int64)[None, :], big)
    preds = np.where((cnt == 0)[:, None], -1, np.sort(pm, axis=1))[valid]
    rep = lambda a: np.repeat(np.asarray(a).astype(np.int64), counts)
    out = {
        "topk": vals[valid],
        "cls_matrix": np.stack(
            [rep(sub_cls), rep(obj_rank_sub), rep(obj_cls), rep(obj_rank_obj),
             preds], axis=1),
    }
    if sub_scores is not None:
        keep = preds >= 0  # score rows exist only for GT predicates
        out["sub_scores"] = np.repeat(sub_scores, counts, axis=0)[keep]
        out["obj_scores"] = np.repeat(obj_scores, counts, axis=0)[keep]
        out["rel_scores"] = np.repeat(rel_scores, counts, axis=0)[keep]
    return out


# --------------------------------------------------------------------------
# aggregate metrics
# --------------------------------------------------------------------------

def topk_accuracy(ranks: np.ndarray, k: int) -> float:
    if len(ranks) == 0:
        return 0.0
    return float((ranks <= k).sum() * 100.0 / len(ranks))


def evaluate_topk(
    objs_pred: np.ndarray,       # (N, C) log-softmax object scores
    rels_pred: np.ndarray,       # (E, R) sigmoid probs (multi) / log-softmax
    gt_rel: Sequence,            # per edge: (sub_cls, obj_cls, [pred ids])
    edges: np.ndarray,           # (E, 2) node indices
    multi_rel_outputs: bool,
    topk: int = 101,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-edge triplet rank over the full C*C*R score cube
    (eva_utils_acc.py:82-134).

    NOTE: this is DEAD CODE in the reference — no model or runner calls it
    (every caller uses evaluate_triplet_topk instead); it exists here only
    to close the literal surface.  Semantics preserved exactly:

    * object scores are exponentiated log-softmax (``np.exp``); predicate
      scores too unless ``multi_rel_outputs`` (already sigmoid probs);
    * the cube cell for edge (i, j) is ``(objs[i, a] * objs[j, b]) *
      rels[e, k]`` with subject probabilities on axis 0 — the reference's
      ``node_score = matmul(objs_pred[edge_from], objs_pred[edge_to].T)``;
    * rank of a GT predicate = 1 + #{cells strictly greater than the GT
      cell} (descending iteration breaks on ``gt_conf >= conf``, so ties
      count as hits), saturated at ``topk + 1``;
    * multiple GT predicates on one edge get the sorted rank-discount
      ``sorted(ranks)[i] - i`` (same trick as evaluate_triplet_topk);
    * the returned class array lists GT predicate ids in edge order
      (undiscounted order — the reference appends ``tmp_cls`` unsorted).
    """
    objs = np.exp(np.asarray(objs_pred, np.float32))
    rels = np.asarray(rels_pred, np.float32)
    if not multi_rel_outputs:
        rels = np.exp(rels)
    edges = np.asarray(edges).reshape(-1, 2)
    res: List[int] = []
    cls: List[int] = []
    for e in range(len(edges)):
        preds = list(gt_rel[e][2])
        if not preds:
            continue
        s, o, r = objs[edges[e, 0]], objs[edges[e, 1]], rels[e]
        # full cube, float order matching the reference's two matmuls:
        # (s_a * o_b) first, then * r_k — so the GT cell ties with its own
        # threshold exactly and is never counted as greater
        cube = np.multiply.outer(np.multiply.outer(s, o), r)
        ranks = sorted(
            min(int((cube > (s[gt_rel[e][0]] * o[gt_rel[e][1]]) * r[p]).sum())
                + 1, topk + 1)
            for p in preds)
        res.extend(rank - i for i, rank in enumerate(ranks))
        cls.extend(preds)
    return np.asarray(res), np.asarray(cls)


def get_mean_recall(
    triplet_rank: np.ndarray, cls_matrix: np.ndarray,
    topk: Sequence[int] = (50, 100), num_rel_classes: int = 26,
) -> np.ndarray:
    """Mean over predicate classes of triplet recall@k
    (eva_utils_acc.py:224-237)."""
    if len(cls_matrix) == 0:
        return np.zeros(len(topk))
    preds = np.asarray(cls_matrix[:, -1])
    m = (preds >= 0) & (preds < num_rel_classes)
    pc = preds[m].astype(np.int64)
    ranks = np.asarray(triplet_rank)[m]
    tot = np.bincount(pc, minlength=num_rel_classes)
    nz = tot > 0
    if not nz.any():
        return np.zeros(len(topk))
    out = []
    for k in topk:
        hits = np.bincount(pc, weights=(ranks <= k).astype(np.float64),
                           minlength=num_rel_classes)
        out.append((hits[nz] * 100.0 / tot[nz]).astype(np.float32).mean())
    return np.asarray(out)


def compute_mean_predicate(
    cls_matrix: np.ndarray, topk_pred: np.ndarray,
    ks: Sequence[int] = (1, 3, 5), num_rel_classes: int = 26,
) -> List[float]:
    """Per-predicate-class mean Acc@k (src/model/model.py:364-388).

    Relies on the reference invariant that the predicate rank list and the
    cls_matrix rows are index-aligned (one entry per GT predicate or per
    no-GT edge).
    """
    preds = np.asarray(cls_matrix[:, -1]) if len(cls_matrix) else np.zeros(0, np.int64)
    m = preds >= 0
    pc = preds[m].astype(np.int64)
    ranks = np.asarray(topk_pred)[m] if len(cls_matrix) else np.zeros(0, np.int64)
    tot = np.bincount(pc, minlength=num_rel_classes)
    nz = tot > 0
    means = []
    for k in ks:
        if not nz.any():
            means.append(0.0)
            continue
        hits = np.bincount(pc, weights=(ranks <= k).astype(np.float64),
                           minlength=num_rel_classes)
        means.append(float((hits[nz] / tot[nz]).mean() * 100.0))
    return means


def get_zero_shot_recall(
    triplet_rank: np.ndarray,
    cls_matrix: np.ndarray,
    train_triplets: set,
    val_is_relevant: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Zero-shot / non-zero-shot / all triplet recall@50/@100.

    ``train_triplets`` is the set of "<sub_cls> <obj_cls> <rel>" keys seen
    in training (built by vlsat_tpu.data.assets.build_triplet_vocab — the
    reference hard-codes an absolute path here, eva_utils_acc.py:249-261).
    """
    # vectorized membership: encode (sub, obj, pred) triplets as single
    # int64 keys and test against the encoded vocab with np.isin — the
    # per-row f-string/set path cost ~1 us/row at full-split scale
    cm = np.asarray(cls_matrix)
    ranks = np.asarray(triplet_rank)
    m = cm[:, -1] != -1 if len(cm) else np.zeros(0, bool)
    cm = cm[m]
    all_r = ranks[m]
    if len(cm):
        base = int(max(cm[:, 0].max(), cm[:, 2].max(), cm[:, -1].max())) + 2
        enc = (cm[:, 0].astype(np.int64) * base + cm[:, 2]) * base + cm[:, -1]
        vocab = []
        for key in train_triplets:
            s, o, p = (int(x) for x in key.split())
            if s < base - 1 and o < base - 1 and p < base - 1:
                vocab.append((s * base + o) * base + p)
        seen = np.isin(enc, np.asarray(vocab, dtype=np.int64))
    else:
        seen = np.zeros(0, bool)
    zero = all_r[~seen]
    non_zero = all_r[seen]

    def rec(a):
        a = np.asarray(a)
        if len(a) == 0:
            return (float("nan"), float("nan"))
        return (float((a <= 50).mean() * 100), float((a <= 100).mean() * 100))

    z50, z100 = rec(zero)
    n50, n100 = rec(non_zero)
    a50, a100 = rec(all_r)
    return {
        "zero_shot_50": z50, "zero_shot_100": z100,
        "non_zero_shot_50": n50, "non_zero_shot_100": n100,
        "all_50": a50, "all_100": a100,
    }
