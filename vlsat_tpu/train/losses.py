"""Training losses for the VL-SAT objective.

Faithful, mask-aware re-implementations of the reference's
``process_train`` loss stack (src/model/SGFN_MMG/model.py:337-418):

  total = lambda_o * (CE_obj_2d + CE_obj_3d)
        + 3 * lambda_r * (BCE_rel_2d + BCE_rel_3d)   [DYNAMIC class weights]
        + 0.1 * (mimic + rel_mimic_2d)

All reductions are means over *valid* nodes/edges (the reference has no
padding, so plain means coincide).  The DYNAMIC per-batch class weights
depend on global-batch label statistics (model.py:353-366) — under data
parallelism they must be computed from the full batch before sharding, or
with a psum; `dynamic_rel_weights` takes the already-reduced counts so both
schemes work.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vlsat_tpu.ops.norm import safe_normalize
from vlsat_tpu.scene import SceneBatch


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    denom = jnp.maximum((m * jnp.ones_like(x)).sum(), 1.0)
    return (x * m).sum() / denom


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    logp = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return masked_mean(nll, mask)


def dynamic_rel_weights(
    gt_rels: jnp.ndarray,
    edge_mask: jnp.ndarray,
    ignore_none_rel: bool = False,
    none_ratio: Optional[float] = 1.0,
) -> jnp.ndarray:
    """Per-class BCE weights from batch label statistics (WEIGHT_EDGE=DYNAMIC).

    Mirrors model.py:353-366: counts per predicate class over the batch,
    plus a leading "none" slot counting edges with no GT relation; weight =
    1 / (log(count + 1) + 1); the none slot is dropped after the zero-fill
    trick.
    """
    m = edge_mask.astype(gt_rels.dtype)
    batch_mean = (gt_rels * m[..., None]).sum(axis=tuple(range(gt_rels.ndim - 1)))
    zeros = ((gt_rels.sum(-1) == 0) * m).sum()[None]
    counts = jnp.concatenate([zeros, batch_mean], axis=0)
    weight = jnp.abs(1.0 / (jnp.log(counts + 1.0) + 1.0))
    if ignore_none_rel:
        weight = weight.at[0].set(0.0) * 1e-2
    if none_ratio is not None and none_ratio != 1.0:
        weight = weight.at[0].mul(none_ratio)
    fill = weight[0] if not ignore_none_rel else 0.0
    weight = jnp.where(weight == 0, fill, weight)
    return weight[1:]


def weighted_bce(
    probs: jnp.ndarray, targets: jnp.ndarray, weight: Optional[jnp.ndarray],
    edge_mask: jnp.ndarray, eps: float = 1e-7,
) -> jnp.ndarray:
    """torch F.binary_cross_entropy(pred, gt, weight) over valid edges."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    ll = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    if weight is not None:
        ll = ll * weight
    return masked_mean(ll, edge_mask)


def single_label_rel_weights(gt_rels_onehot: jnp.ndarray, edge_mask: jnp.ndarray,
                             ignore_none_rel: bool = False) -> jnp.ndarray:
    """DYNAMIC weights for single-label mode (model.py:377-383): per-class
    counts of the one-hot targets (class 0 = 'none'), w = 1/(log(c+1)+1)."""
    m = edge_mask.astype(gt_rels_onehot.dtype)
    counts = (gt_rels_onehot * m[..., None]).sum(axis=tuple(range(gt_rels_onehot.ndim - 1)))
    weight = jnp.abs(1.0 / (jnp.log(counts + 1.0) + 1.0))
    if ignore_none_rel:
        weight = weight.at[0].set(0.0) * 1e-2
    return weight


def single_label_rel_nll(log_probs: jnp.ndarray, gt_rels_onehot: jnp.ndarray,
                         weight: Optional[jnp.ndarray], edge_mask: jnp.ndarray) -> jnp.ndarray:
    """torch F.nll_loss(log_probs, labels, weight) over valid edges —
    weighted-mean reduction (sum w_y*nll / sum w_y), matching torch."""
    nll = -(gt_rels_onehot * log_probs).sum(-1)
    m = edge_mask.astype(log_probs.dtype)
    if weight is not None:
        w_y = (gt_rels_onehot * weight).sum(-1)
        return (nll * w_y * m).sum() / jnp.maximum((w_y * m).sum(), 1e-12)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def triplet_distill_loss(
    obj_logits_3d: jnp.ndarray, rel_cls_3d: jnp.ndarray,
    obj_logits_2d: jnp.ndarray, rel_cls_2d: jnp.ndarray,
    edge_index: jnp.ndarray, edge_mask: jnp.ndarray,
) -> jnp.ndarray:
    """3D-vs-2D triplet score-cube L1 (reference ``compute_triplet_loss``,
    SGFN_MMG/model.py:267-286 — defined but never used by the shipped
    training; provided for ablations).  The absolute difference of two
    rank-1 cubes has no closed factorization, so each edge materializes
    its (C*C, R) block; edges are mapped in bounded chunks."""
    s3 = jax.nn.softmax(obj_logits_3d, axis=-1)
    s2 = jax.lax.stop_gradient(jax.nn.softmax(obj_logits_2d, axis=-1))
    r2 = jax.lax.stop_gradient(rel_cls_2d)

    def per_scene(s3s, s2s, ei, r3s, r2s, ms):
        def per_edge(args):
            e_idx, r3e, r2e, m = args
            ns3 = jnp.outer(s3s[e_idx[0]], s3s[e_idx[1]]).reshape(-1)
            ns2 = jnp.outer(s2s[e_idx[0]], s2s[e_idx[1]]).reshape(-1)
            diff = jnp.abs(ns3[:, None] * r3e[None, :]
                           - ns2[:, None] * r2e[None, :])
            return diff.sum() * m

        # chunked map: vectorized within chunks, memory bounded by
        # batch_size * C*C * R floats
        return jax.lax.map(per_edge, (ei, r3s, r2s, ms.astype(r3s.dtype)),
                           batch_size=64)

    sums = jax.vmap(per_scene)(s3, s2, edge_index, rel_cls_3d, r2, edge_mask)
    denom = jnp.maximum(edge_mask.sum(), 1)
    return sums.sum() / denom


def resolve_rel_weights(
    mode: str,
    gt_rels: jnp.ndarray,
    edge_mask: jnp.ndarray,
    multi_rel: bool = True,
    w_bg: float = 1.0,
    none_ratio: float = 1.0,
    ignore_none_rel: bool = False,
    weights_rel: Optional[jnp.ndarray] = None,
):
    """WEIGHT_EDGE dispatch (model.py:348-372): DYNAMIC per-batch counts,
    BG foreground/background mix, OCCU dataset occurrence weights, NONE."""
    if mode == "DYNAMIC":
        if multi_rel:
            return dynamic_rel_weights(gt_rels, edge_mask,
                                       ignore_none_rel=ignore_none_rel,
                                       none_ratio=none_ratio)
        return single_label_rel_weights(gt_rels, edge_mask,
                                        ignore_none_rel=ignore_none_rel)
    if mode == "BG":
        if not multi_rel:
            raise NotImplementedError("BG weighting is multi-label only")
        return w_bg * (1.0 - gt_rels) + (1.0 - w_bg) * gt_rels if w_bg != 0 else None
    if mode == "OCCU":
        return weights_rel
    if mode == "NONE":
        return None
    raise NotImplementedError(f"unknown WEIGHT_EDGE {mode!r}")


def cosine_mimic_loss(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray,
                      t: float = 0.8) -> jnp.ndarray:
    """clamp(t - cos(a, b), min=0).mean() (model.py:257-258, 408-410)."""
    an = safe_normalize(a)
    bn = safe_normalize(b)
    cos = (an * bn).sum(-1)
    return masked_mean(jnp.maximum(t - cos, 0.0), mask)


def rel_mimic_l1(edge_feature_2d: jnp.ndarray, rel_text_feat: jnp.ndarray,
                 edge_mask: jnp.ndarray) -> jnp.ndarray:
    """L1 between normalized projected 2D pair features and CLIP text
    targets (model.py:412-416)."""
    e = safe_normalize(edge_feature_2d)
    return masked_mean(jnp.abs(e - rel_text_feat), edge_mask)


def vlsat_total_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: SceneBatch,
    lambda_o: float = 0.1,
    ignore_none_rel: bool = False,
    none_ratio: float = 1.0,
    multi_rel: bool = True,
    weight_mode: str = "DYNAMIC",
    w_bg: float = 1.0,
    weights_rel: Optional[jnp.ndarray] = None,
    with_mimic: bool = True,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``with_mimic=False`` is the in21k protocol: the reference's
    model_in21k.py comments the mimic terms out of the total
    (:368-375,395-399), leaving lambda_o*(obj2d+obj3d)+3*(rel2d+rel3d)."""
    lambda_r = 1.0
    lam_max = max(lambda_r, lambda_o)
    lambda_r, lambda_o = lambda_r / lam_max, lambda_o / lam_max

    loss_obj_3d = cross_entropy(outputs["obj_logits_3d"], batch.gt_class, batch.obj_mask)
    loss_obj_2d = cross_entropy(outputs["obj_logits_2d"], batch.gt_class, batch.obj_mask)

    w = resolve_rel_weights(weight_mode, batch.gt_rels, batch.edge_mask,
                            multi_rel=multi_rel, w_bg=w_bg, none_ratio=none_ratio,
                            ignore_none_rel=ignore_none_rel, weights_rel=weights_rel)
    if multi_rel:
        loss_rel_3d = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
        loss_rel_2d = weighted_bce(outputs["rel_cls_2d"], batch.gt_rels, w, batch.edge_mask)
    else:
        # single-label mode: heads emit log-probs over [none]+classes
        loss_rel_3d = single_label_rel_nll(outputs["rel_cls_3d"], batch.gt_rels,
                                           w, batch.edge_mask)
        loss_rel_2d = single_label_rel_nll(outputs["rel_cls_2d"], batch.gt_rels,
                                           w, batch.edge_mask)

    loss_mimic = jnp.asarray(0.0)
    loss_rel_mimic = jnp.asarray(0.0)
    if with_mimic:
        loss_mimic = cosine_mimic_loss(
            outputs["obj_feature_3d_mimic"], outputs["obj_features_2d_mimic"],
            batch.obj_mask,
        )
        if batch.rel_text_feat is not None:
            loss_rel_mimic = rel_mimic_l1(
                outputs["edge_feature_2d_dis"], batch.rel_text_feat, batch.edge_mask
            )

    total = (
        lambda_o * (loss_obj_2d + loss_obj_3d)
        + 3.0 * lambda_r * (loss_rel_2d + loss_rel_3d)
        + 0.1 * (loss_mimic + loss_rel_mimic)
    )
    aux = dict(
        loss=total,
        obj_loss=loss_obj_3d, obj_loss_2d=loss_obj_2d,
        rel_loss=loss_rel_3d, rel_loss_2d=loss_rel_2d,
        mimic_loss=loss_mimic, rel_mimic_loss_2d=loss_rel_mimic,
    )
    return total, aux


def vlsat_single_loss(
    outputs: Dict[str, jnp.ndarray], batch: SceneBatch, lambda_o: float = 0.1,
    ignore_none_rel: bool = False, none_ratio: float = 1.0,
    weight_mode: str = "DYNAMIC", w_bg: float = 1.0,
    weights_rel: Optional[jnp.ndarray] = None, multi_rel: bool = True,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """3D-only variant: lambda_o*obj + 3*rel + 0.1*rel_mimic_3d
    (model_single.py:356-373)."""
    lambda_r = 1.0
    lam = max(lambda_r, lambda_o)
    lambda_r, lambda_o = lambda_r / lam, lambda_o / lam
    loss_obj = cross_entropy(outputs["obj_logits_3d"], batch.gt_class, batch.obj_mask)
    w = resolve_rel_weights(weight_mode, batch.gt_rels, batch.edge_mask,
                            multi_rel=multi_rel, w_bg=w_bg, none_ratio=none_ratio,
                            ignore_none_rel=ignore_none_rel, weights_rel=weights_rel)
    if multi_rel:
        loss_rel = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
    else:
        loss_rel = single_label_rel_nll(outputs["rel_cls_3d"], batch.gt_rels,
                                        w, batch.edge_mask)
    if batch.rel_text_feat is not None:
        mimic = rel_mimic_l1(outputs["edge_feature_3d_dis"], batch.rel_text_feat,
                             batch.edge_mask)
    else:
        mimic = jnp.asarray(0.0)
    total = lambda_o * loss_obj + 3.0 * lambda_r * loss_rel + 0.1 * mimic
    return total, dict(loss=total, obj_loss=loss_obj, rel_loss=loss_rel,
                       rel_mimic_loss_3d=mimic)


def sgfn_loss(
    outputs: Dict[str, jnp.ndarray], batch: SceneBatch, lambda_o: float = 0.1,
    weight_mode: str = "DYNAMIC", w_bg: float = 1.0, none_ratio: float = 1.0,
    weights_rel: Optional[jnp.ndarray] = None, multi_rel: bool = True,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SGFN baseline: lambda_o*obj + lambda_r*rel (baseline_sgfn.py:131-194).
    The object head emits log-probs; CE over log-probs == NLL."""
    lambda_r = 1.0
    lam = max(lambda_r, lambda_o)
    lambda_r, lambda_o = lambda_r / lam, lambda_o / lam
    logp = outputs["obj_logits_3d"]
    nll = -jnp.take_along_axis(logp, batch.gt_class[..., None], axis=-1)[..., 0]
    loss_obj = masked_mean(nll, batch.obj_mask)
    w = resolve_rel_weights(weight_mode, batch.gt_rels, batch.edge_mask,
                            multi_rel=multi_rel, w_bg=w_bg, none_ratio=none_ratio,
                            weights_rel=weights_rel)
    if multi_rel:
        loss_rel = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
    else:
        loss_rel = single_label_rel_nll(outputs["rel_cls_3d"], batch.gt_rels,
                                        w, batch.edge_mask)
    total = lambda_o * loss_obj + lambda_r * loss_rel
    return total, dict(loss=total, obj_loss=loss_obj, rel_loss=loss_rel)


def sgpn_loss(
    outputs: Dict[str, jnp.ndarray], batch: SceneBatch,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SGPN baseline: 0.1*nll_obj + unweighted bce_rel
    (baseline_sgpn.py:99-112)."""
    logp = outputs["obj_logits_3d"]
    nll = -jnp.take_along_axis(logp, batch.gt_class[..., None], axis=-1)[..., 0]
    loss_obj = masked_mean(nll, batch.obj_mask)
    loss_rel = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, None, batch.edge_mask)
    total = 0.1 * loss_obj + loss_rel
    return total, dict(loss=total, obj_loss=loss_obj, rel_loss=loss_rel)
