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
    correct_cls = np.zeros((num_rel_classes, len(topk)))
    totals = np.asarray([(gt_rels[:, r] > 0).sum() for r in range(num_rel_classes)],
                        dtype=np.float64)
    correct = np.zeros(len(topk))
    total = float((gt_rels.sum(-1) > 0).sum())

    done = [set() for _ in topk]
    for rank, (e, idx) in enumerate(zip(sel_edges, sel_idx)):
        if evaluate == "rels":
            hit = gt_rels[e, idx] > 0
        else:
            i = idx // (c * nrel)
            j = (idx // nrel) % c
            rl = idx % nrel
            hit = sub_cls[e] == i and obj_cls[e] == j and gt_rels[e, rl] > 0
        if hit:
            for t, k in enumerate(topk):
                if rank < k and e not in done[t]:
                    correct[t] += 1
                    for rg in np.nonzero(gt_rels[e])[0]:
                        correct_cls[rg, t] += 1
                    done[t].add(e)

    out = np.full((num_rel_classes, len(topk)), -1.0)
    for r in range(num_rel_classes):
        if totals[r] > 0:
            out[r] = correct_cls[r] / totals[r]
    scalar = correct / max(total, 1.0)
    if return_both:
        return scalar, out
    return out if per_class else scalar
