"""Scene-level Recall@K / mean-Recall@K (SGG-style).

Counterpart of src/utils/eval_utils_recall.py: per edge, keep the top
``topk_each`` triplet candidates from the 160*160*26 confidence cube; merge
into a scene-global top-max(K) ranking; an edge with GT counts as recalled
at K if any of the first K global candidates names its exact
(sub_cls, obj_cls, predicate) GT triplet (dedup per edge).  The per-class
variant credits all GT predicates of a recalled edge.

Redesign: the reference sorts each edge's full cube on the host
(":44-60"); here the per-edge top-k is computed on device from the product
structure — the top-t of {ns_ij * r_k} is contained in (top-t of ns) x
(top-t of r), so only a t x R product table is formed, never the cube.
Candidate order for equal confidences follows edge order (stable sort),
matching the reference's incremental merge.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("topk_each",))
def per_edge_topk(
    obj_logits: jnp.ndarray,   # (N, C)
    rel_probs: jnp.ndarray,    # (E, R)
    edge_index: jnp.ndarray,   # (E, 2)
    topk_each: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``topk_each`` (conf, flat idx) per edge; flat idx is the
    row-major (sub_cls, obj_cls, rel) index in the C*C*R cube."""
    probs = jax.nn.softmax(obj_logits.astype(jnp.float32), axis=-1)
    r = rel_probs.astype(jnp.float32)
    c = probs.shape[-1]
    nrel = r.shape[-1]
    sub = probs[edge_index[:, 0]]
    obj = probs[edge_index[:, 1]]
    ns = (sub[:, :, None] * obj[:, None, :]).reshape(sub.shape[0], -1)  # (E, C*C)

    t_ns = min(topk_each, ns.shape[-1])
    ns_top, ns_idx = jax.lax.top_k(ns, t_ns)                    # (E, t_ns)
    prod = ns_top[:, :, None] * r[:, None, :]                   # (E, t_ns, R)
    flat = prod.reshape(prod.shape[0], -1)
    k = min(topk_each, flat.shape[-1])
    conf, pidx = jax.lax.top_k(flat, k)                          # (E, k)
    ns_sel = jnp.take_along_axis(ns_idx, pidx // nrel, axis=-1)  # cube ij index
    rel_sel = pidx % nrel
    cube_idx = ns_sel * nrel + rel_sel                           # row-major (i, j, k)
    return conf, cube_idx


def _staircase3(t: int, ka: int, kc: int):
    """Static triples (a, b, c) of DESCENDING-sorted positions that can
    hold a top-``t`` value of a product of three descending-sorted lists:
    (a+1)(b+1)(c+1) <= t (any deeper triple is dominated by >= t triples).
    ``ka`` bounds the two object-class axes, ``kc`` the predicate axis.
    For t=100, R=26: 1,335 of C*C*R = 665,600 cube cells."""
    tr = [(a, b, c)
          for a in range(min(ka, t))
          for b in range(min(ka, t // (a + 1)))
          for c in range(min(kc, t // ((a + 1) * (b + 1))))]
    arr = np.asarray(tr, dtype=np.int32)
    return jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2])


def _staircase_candidates(
    obj_logits: jnp.ndarray,   # (B, N, C)
    rel_probs: jnp.ndarray,    # (B, E, R)
    edge_index: jnp.ndarray,   # (B, E, 2)
    t: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge staircase candidates (conf, cube idx), each (B, E, S):
    a superset of every edge's top-``t`` triplet candidates, S ~ 13t.

    No (E, C*C) pair table is formed (per-NODE top-t sorts replace the
    E-row 25,600-wide top-ks), endpoint rows move on the MXU (one-hot
    matmul — class ids < 2^24 ride exactly as f32), and the staircase
    expansion gathers use STATIC index vectors on the minor axis, which
    XLA compiles to cheap strided copies.  Dynamic minor-axis gathers are
    deliberately absent: at (B, E, t) scale each lowers to an
    element-index fusion measured at ~8 ms apiece on TPU — they, not the
    top_k sorts, were what made the original per-scene path cost ~79 ms
    per 32-scene batch (xplane, PERFORMANCE.md round 3).

    Confidences are the same f32 expression ``(s*o)*r`` as
    ``per_edge_topk``'s, so candidate values are bit-identical."""
    from vlsat_tpu.ops.graph import gather_edge_endpoints

    probs = jax.nn.softmax(obj_logits.astype(jnp.float32), axis=-1)
    r = rel_probs.astype(jnp.float32)
    c = probs.shape[-1]
    nrel = r.shape[-1]
    ka = min(c, t)
    kc = min(nrel, t)
    a_pos, b_pos, c_pos = _staircase3(t, ka, kc)

    nv, ni = jax.lax.top_k(probs, ka)                       # (B, N, ka) desc
    rv, ri = jax.lax.top_k(r, kc)                           # (B, E, kc) desc
    sv, ov = gather_edge_endpoints(nv, edge_index)          # (B, E, ka)
    sif, oif = gather_edge_endpoints(ni.astype(jnp.float32), edge_index)
    si = sif.astype(jnp.int32)
    oi = oif.astype(jnp.int32)

    conf = (sv[..., a_pos] * ov[..., b_pos]) * rv[..., c_pos]   # (B, E, S)
    cube = (si[..., a_pos] * c + oi[..., b_pos]) * nrel + ri[..., c_pos]
    return conf, cube


@partial(jax.jit, static_argnames=("topk_each",))
def batched_per_edge_topk(
    obj_logits: jnp.ndarray,   # (B, N, C)
    rel_probs: jnp.ndarray,    # (B, E, R)
    edge_index: jnp.ndarray,   # (B, E, 2)
    topk_each: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``per_edge_topk`` for a whole batch via the staircase candidates
    (``_staircase_candidates``) + one per-edge top_k.  Exact same
    (conf, cube idx) contract; used when the per-edge cap actually binds
    (kmax > topk_each > 1 — NOT the shipped in21k combos, which take the
    capless global merge inside ``batched_scene_hits``)."""
    c = obj_logits.shape[-1]
    nrel = rel_probs.shape[-1]
    t = min(topk_each, c * c * nrel)
    conf_all, cube_all = _staircase_candidates(
        obj_logits, rel_probs, edge_index, t)
    conf, pos = jax.lax.top_k(conf_all, t)                     # (B, E, t)
    cube_idx = jnp.take_along_axis(cube_all, pos, axis=-1)
    return conf, cube_idx


@partial(jax.jit, static_argnames=("topk_each", "kmax", "mode", "method"))
def batched_scene_hits(
    obj_logits: jnp.ndarray,   # (B, N, C)
    rel_probs: jnp.ndarray,    # (B, E, R)
    edge_index: jnp.ndarray,   # (B, E, 2)
    edge_mask: jnp.ndarray,    # (B, E) bool
    gt_class: jnp.ndarray,     # (B, N)
    gt_rels: jnp.ndarray,      # (B, E, R)
    topk_each: int = 100,
    kmax: int = 100,
    mode: str = "triplet",
    method: str = "staircase",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scene-global ranked candidates WITH their GT-hit flags, for a whole
    batch in one traced program: (edge ids (B, kmax) int32,
    hit (B, kmax) bool).

    Replaces the per-scene ``per_edge_topk`` dispatches of
    ``scene_recall_topk`` — through a remote-TPU tunnel those cost ~28 ms
    of round trip per scene per protocol variant, ~110 ms/scene for the
    in21k process_val2/3 suite (engine round 3 folds THIS into the fused
    eval jit instead).  The host tally (``tally_hits``) needs only the
    candidate order, each candidate's edge, and whether it names its
    edge's GT — confidences and cube indices never leave the device.

    Padded edges rank strictly last: their confidences are masked to -1
    (real candidates are >= 0) and top_k breaks ties toward lower flat
    index, which is edge-major — exactly the reference's incremental
    merge order (eval_utils_recall.py:44-60); a padded candidate can
    never hit (its gt_rels row is zero), so trailing slots are inert.
    """
    c = obj_logits.shape[-1]
    nrel = rel_probs.shape[-1]
    if mode == "triplet" and method == "staircase":
        # factored candidates: no pair-product table, no per-scene map
        # (identical f32 confidences to the pairtable method; equality on
        # random inputs is gated in tests/test_recall.py)
        t = min(topk_each, c * c * nrel)
        if kmax <= topk_each or t == 1:
            # the per-edge top-topk_each cap cannot bind (an edge may
            # contribute at most kmax <= topk_each global candidates; at
            # t=1 the staircase IS the per-edge top-1), so merge the raw
            # staircase sets globally — no per-edge top_k, and crucially
            # no (B, E, t) dynamic recovery gathers (see
            # _staircase_candidates).  Both in21k combos (gc topk_each=1,
            # ngc topk_each=100, kmax=100) take this path.
            conf, idx = _staircase_candidates(
                obj_logits, rel_probs, edge_index, t)
        else:
            conf, idx = batched_per_edge_topk(
                obj_logits, rel_probs, edge_index, topk_each=topk_each)
    elif mode == "triplet":
        def per_scene(args):
            ol, r, ei = args
            return per_edge_topk(ol, r, ei, topk_each=topk_each)

        # legacy "pairtable" method, kept for cross-validation: lax.map
        # over scenes bounds the (E, C*C) pair-product temporary (~25 MB
        # at production shape) at one scene's worth
        conf, idx = jax.lax.map(per_scene, (obj_logits, rel_probs, edge_index))
    elif mode == "rels":
        k = min(topk_each, nrel)
        conf, idx = jax.lax.top_k(rel_probs.astype(jnp.float32), k)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    conf = jnp.where(edge_mask[:, :, None], conf, -1.0)
    k = conf.shape[-1]
    e_cnt = conf.shape[-2]
    _, pos = jax.lax.top_k(conf.reshape(conf.shape[0], -1),
                           min(kmax, e_cnt * k))
    edge_g = (pos // k).astype(jnp.int32)
    cand_g = jnp.take_along_axis(idx.reshape(idx.shape[0], -1), pos, axis=-1)

    if mode == "rels":
        # gather gt_rels rows per candidate edge, then its predicate column
        rows = jnp.take_along_axis(gt_rels, edge_g[..., None], axis=1)
        hit = jnp.take_along_axis(rows, cand_g[..., None], axis=-1)[..., 0] > 0
    else:
        i = cand_g // (c * nrel)
        j = (cand_g // nrel) % c
        rl = cand_g % nrel
        sub_cls = jnp.take_along_axis(
            gt_class, jnp.take_along_axis(edge_index[..., 0], edge_g, axis=1),
            axis=1)
        obj_cls = jnp.take_along_axis(
            gt_class, jnp.take_along_axis(edge_index[..., 1], edge_g, axis=1),
            axis=1)
        rows = jnp.take_along_axis(gt_rels, edge_g[..., None], axis=1)
        gt_hit = jnp.take_along_axis(rows, rl[..., None], axis=-1)[..., 0] > 0
        hit = (sub_cls == i) & (obj_cls == j) & gt_hit
    valid = jnp.take_along_axis(edge_mask, edge_g, axis=1)
    hit = hit & valid
    if edge_g.shape[-1] < kmax:
        # fewer than kmax candidates exist (gc variant at small buckets):
        # pad with inert (edge 0, no-hit) slots so the packed transfer
        # shape is always (B, kmax)
        pad = kmax - edge_g.shape[-1]
        edge_g = jnp.pad(edge_g, ((0, 0), (0, pad)))
        hit = jnp.pad(hit, ((0, 0), (0, pad)))
    return edge_g, hit


def tally_hits_batch(
    sel_edges: np.ndarray,     # (B, kmax) candidate edge ids, ranked
    hits: np.ndarray,          # (B, kmax) bool
    gt_rels: np.ndarray,       # (B, E, R) padded
    edge_mask: np.ndarray,     # (B, E) bool
    topk: Sequence[int],
    num_rel_classes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``tally_hits`` for a whole batch in one shot.

    Returns (scalar (B, len(topk)), per-class (B, R, len(topk)),
    valid (B,) — scenes with >= 1 GT relation; invalid rows carry
    garbage and must be dropped by the caller).  Replaces the per-scene
    x per-combo Python loop that dominated the in21k host tail once the
    candidate kernel moved to the staircase (2,048 calls -> 64 per
    512-scene pass; PERFORMANCE.md round 3).  Semantics identical to
    ``tally_hits`` row by row (tests/test_recall.py)."""
    b, kmax = hits.shape
    e = gt_rels.shape[1]
    gt_pos = (gt_rels[..., :num_rel_classes] > 0) & edge_mask[..., None]
    totals = gt_pos.sum(axis=1).astype(np.float64)             # (B, R)
    has_gt = (gt_rels > 0).any(axis=-1) & edge_mask            # (B, E)
    total = has_gt.sum(axis=1).astype(np.float64)              # (B,)

    # first hit rank per (scene, edge): scatter-min of candidate ranks
    franks = np.full((b, e), kmax + 1, np.int64)
    si, ri = np.nonzero(hits)
    np.minimum.at(franks, (si, sel_edges[si, ri]), ri)

    ks = np.asarray(list(topk))
    rec = franks[:, :, None] < ks[None, None, :]               # (B, E, K)
    scalar = rec.sum(axis=1) / np.maximum(total, 1.0)[:, None]
    correct = np.einsum("bek,ber->brk", rec.astype(np.float64),
                        gt_pos.astype(np.float64))
    out = np.full((b, num_rel_classes, len(ks)), -1.0)
    nz = totals > 0                                            # (B, R)
    out[nz] = correct[nz] / totals[nz][:, None]
    return scalar, out, total > 0


def tally_hits(
    sel_edges: np.ndarray,     # (kmax,) candidate edge ids, ranked
    hits: np.ndarray,          # (kmax,) bool — candidate names its edge's GT
    gt_rels: np.ndarray,       # (ev, R) valid edges only
    topk: Sequence[int],
    num_rel_classes: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized host tally over a ranked candidate list (reference
    eval_utils_recall.py:62-112 semantics): an edge with GT is recalled at
    K if any of the first K candidates hits it (dedup per edge = first
    hit rank decides); the per-class variant credits all GT predicates of
    a recalled edge.  Returns (scalar (len(topk),), per-class matrix
    (num_rel_classes, len(topk)) with -1 for absent classes)."""
    gt_pos = gt_rels[:, :num_rel_classes] > 0
    totals = gt_pos.sum(axis=0).astype(np.float64)      # per predicate class
    total = float((gt_rels > 0).any(axis=1).sum())

    pos = np.nonzero(np.asarray(hits))[0]
    first_rank_of = {}
    for r in pos:                                        # ~kmax entries max
        e = int(sel_edges[r])
        if e not in first_rank_of:
            first_rank_of[e] = r
    edges = np.asarray(sorted(first_rank_of), dtype=np.int64)
    franks = np.asarray([first_rank_of[int(e)] for e in edges], dtype=np.int64)

    scalar = np.zeros(len(topk))
    correct_cls = np.zeros((num_rel_classes, len(topk)))
    for t, k in enumerate(topk):
        rec = edges[franks < k]
        scalar[t] = len(rec)
        if len(rec):
            correct_cls[:gt_pos.shape[1], t] = gt_pos[rec].sum(axis=0)
    out = np.full((num_rel_classes, len(topk)), -1.0)
    nz = totals > 0
    out[nz] = correct_cls[nz] / totals[nz, None]
    scalar = scalar / max(total, 1.0)
    return scalar, out


def tally_ranked_candidates(
    sel_edges: np.ndarray,     # (kmax,) candidate edge ids, ranked
    sel_idx: np.ndarray,       # (kmax,) cube / predicate indices
    gt_rels: np.ndarray,       # (ev, R) valid edges only
    sub_cls: np.ndarray,       # (E,) GT subject classes per edge
    obj_cls: np.ndarray,       # (E,) GT object classes per edge
    *,
    topk: Sequence[int],
    num_rel_classes: int,
    evaluate: str,
    c: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side hit computation + tally for ``scene_recall_topk``'s
    standalone (non-engine) path; the fused engine computes the hit flags
    on device (``batched_scene_hits``) and calls ``tally_hits`` directly."""
    nrel = gt_rels.shape[-1]
    sel_edges = np.asarray(sel_edges)
    sel_idx = np.asarray(sel_idx)
    if evaluate == "rels":
        hits = gt_rels[sel_edges, sel_idx] > 0
    else:
        i = sel_idx // (c * nrel)
        j = (sel_idx // nrel) % c
        rl = sel_idx % nrel
        hits = ((sub_cls[sel_edges] == i) & (obj_cls[sel_edges] == j)
                & (gt_rels[sel_edges, rl] > 0))
    return tally_hits(sel_edges, hits, gt_rels,
                      topk=topk, num_rel_classes=num_rel_classes)


def scene_recall_topk(
    obj_logits: np.ndarray,
    rel_probs: np.ndarray,
    gt_rels: np.ndarray,       # (E, R) multi-hot
    gt_class: np.ndarray,      # (N,)
    edge_index: np.ndarray,    # (E, 2)
    topk: Sequence[int] = (20, 50, 100),
    topk_each: int = 100,
    num_rel_classes: int = 26,
    per_class: bool = False,
    evaluate: str = "triplet",
    valid_edges: "int | None" = None,
    return_both: bool = False,
):
    """Scene-level R@K (or per-class matrix when per_class=True).

    ``evaluate`` selects the reference's two protocols
    (eval_utils_recall.py:7-112, used by the in21k ``process_val2/3``,
    model_in21k.py:441-512):

      * "triplet" (sgcls): candidates are ranked by the
        sub*obj*predicate confidence product and a hit requires the exact
        GT (sub_cls, obj_cls, predicate);
      * "rels" (predcls): candidates are ranked by the predicate
        confidence alone and a hit requires only the GT predicate.

    ``topk_each=1`` is the graph-constrained variant, ``topk_each>=R``
    (reference uses 100) the unconstrained one.

    ``valid_edges``: with padded inputs, only the first ``valid_edges``
    edge rows are real — the device pass runs at the full padded shape
    (so jit compilations stay bounded by the bucket count) and padding is
    dropped on the host.
    """
    e_cnt, nrel = rel_probs.shape
    c = obj_logits.shape[-1]
    ev = e_cnt if valid_edges is None else int(valid_edges)
    if evaluate == "triplet":
        conf2, idx2 = per_edge_topk(
            jnp.asarray(obj_logits), jnp.asarray(rel_probs),
            jnp.asarray(edge_index), topk_each=topk_each,
        )
        conf2 = np.asarray(conf2)  # (E, k)
        idx2 = np.asarray(idx2).astype(np.int64)
    elif evaluate == "rels":
        k = min(topk_each, nrel)
        # predicate-only candidates; the match condition ignores classes
        idx2 = np.argsort(-rel_probs, axis=-1, kind="stable")[:, :k].astype(np.int64)
        conf2 = np.take_along_axis(rel_probs, idx2, axis=-1)
    else:
        raise ValueError(f"unknown evaluate mode {evaluate!r}")
    k_per = conf2.shape[1]
    conf = conf2[:ev].reshape(-1)
    cube_idx = idx2[:ev].reshape(-1)
    edge_ids = np.repeat(np.arange(ev), k_per)
    gt_rels = gt_rels[:ev]

    kmax = int(max(topk))
    order = np.argsort(-conf, kind="stable")[:kmax]
    sel_edges = edge_ids[order]
    sel_idx = cube_idx[order]

    sub_cls = gt_class[edge_index[:, 0]]
    obj_cls = gt_class[edge_index[:, 1]]

    # one ranking pass tallies BOTH the scalar and the per-class recalls
    # (the per-edge device top-k above is the expensive part — callers that
    # need both ask via return_both instead of ranking twice)
    scalar, out = tally_ranked_candidates(
        sel_edges, sel_idx, gt_rels, sub_cls, obj_cls,
        topk=topk, num_rel_classes=num_rel_classes, evaluate=evaluate, c=c)
    if return_both:
        return scalar, out
    return out if per_class else scalar
