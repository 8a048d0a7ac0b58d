"""Validation engine: full metric suite over a scene loader.

Counterpart of ``MMGNet.validation`` (src/model/model.py:181-362): per
scene, compute 3D and 2D object / predicate / triplet ranks, accumulate,
then report Acc@k, per-class mean predicate accuracy, mean recall and
zero-shot recall, optionally dumping the reference's eval artifacts
(topk lists, cls_matrix, score arrays, result.txt).

Device work per scene is three count kernels (vlsat_tpu.eval.metrics);
host work is tiny list assembly.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from vlsat_tpu.eval.metrics import (
    assemble_predicate_topk,
    assemble_triplet_topk,
    compute_mean_predicate,
    get_mean_recall,
    get_zero_shot_recall,
    object_ranks,
    predicate_rank_parts,
    topk_accuracy,
    triplet_rank_parts,
)
from vlsat_tpu.scene import SceneBatch
from vlsat_tpu.utils.progbar import Progbar


def evaluate(
    eval_step,
    params,
    batch_stats,
    loader: Iterable[SceneBatch],
    num_rel_classes: int = 26,
    train_triplet_vocab: Optional[set] = None,
    save_dir: Optional[str] = None,
    with_scores: bool = False,
    verbose: bool = True,
    total: Optional[int] = None,
    multi_rel: bool = True,
    scene_recall: bool = False,
) -> Dict[str, float]:
    """``multi_rel=False`` evaluates the single-label mode: heads emit
    log-probs over [none]+classes; predicate ranks use the raw log-probs
    (reference process_val passes them as-is), triplet confidences use
    exp(log-probs) (eva_utils_acc.py:146-147), and 'none' targets count as
    no-GT edges (get_gt, ":20-22").

    ``scene_recall=True`` adds the in21k ``process_val2/val3`` protocol
    (model_in21k.py:441-512): scene-level predcls/sgcls R@{20,50,100} and
    per-predicate mean variants, each in graph-constrained (gc,
    topk_each=1) and unconstrained (ngc, topk_each=100) form, averaged
    over scenes with at least one GT relation (the reference's per-scene
    ratios are 0/0 on relation-free scenes)."""
    acc = {
        k: [] for k in (
            "topk_obj", "topk_obj_2d", "topk_rel", "topk_rel_2d",
            "topk_triplet", "topk_triplet_2d",
        )
    }
    cls_rows, sub_scores, obj_scores, rel_scores = [], [], [], []
    sr_combos = [("predcls", "rels"), ("sgcls", "triplet")]
    sr_acc: Dict[str, list] = {f"{m}_{t}": [] for m, _ in sr_combos for t in ("gc", "ngc")}
    sr_cls: Dict[str, list] = {k: [] for k in sr_acc}
    progbar = Progbar(total, width=20) if verbose else None
    seen = 0
    # running hit/total counters for the progress line: O(1) per scene
    # instead of re-scanning the ever-growing rank lists
    prog_hits = {"obj": 0, "rel": 0, "trip": 0}
    prog_tot = {"obj": 0, "rel": 0, "trip": 0}

    def _pct(key: str) -> float:
        t = prog_tot[key]
        return prog_hits[key] * 100.0 / t if t else 0.0

    has_2d = True
    for batch in loader:
        out = eval_step(params, batch_stats, batch)
        # serving mode (branch_3d_only) emits no 2D outputs: report the 3D
        # metric families only
        has_2d = out.get("obj_logits_2d") is not None
        obr3 = np.asarray(object_ranks(out["obj_logits_3d"], batch.gt_class, topk=11))
        pr3, png3 = predicate_rank_parts(out["rel_cls_3d"], topk=6)
        pr3, png3 = np.asarray(pr3), np.asarray(png3)
        if has_2d:
            obr2 = np.asarray(object_ranks(out["obj_logits_2d"], batch.gt_class, topk=11))
            pr2, png2 = predicate_rank_parts(out["rel_cls_2d"], topk=6)
            pr2, png2 = np.asarray(pr2), np.asarray(png2)
        obj_mask = np.asarray(batch.obj_mask)
        edge_mask = np.asarray(batch.edge_mask)
        gt_rels = np.asarray(batch.gt_rels)
        if not multi_rel:
            gt_rels = gt_rels.copy()
            gt_rels[..., 0] = 0  # 'none' targets -> no-GT edges
            out = dict(out, rel_cls_3d=jax.numpy.exp(out["rel_cls_3d"]))
            if has_2d:
                out["rel_cls_2d"] = jax.numpy.exp(out["rel_cls_2d"])
        gt_class = np.asarray(batch.gt_class)
        edge_index = np.asarray(batch.edge_index)

        for s in range(batch.num_scenes):
            nv = int(obj_mask[s].sum())
            ev = int(edge_mask[s].sum())
            if nv == 0:
                continue
            obj_r = obr3[s, :nv]
            rel_r = np.asarray(
                assemble_predicate_topk(pr3[s, :ev], png3[s, :ev], gt_rels[s, :ev]))
            acc["topk_obj"].extend(obj_r)
            acc["topk_rel"].extend(rel_r)
            prog_hits["obj"] += int((obj_r <= 1).sum())
            prog_tot["obj"] += len(obj_r)
            prog_hits["rel"] += int((rel_r <= 1).sum())
            prog_tot["rel"] += len(rel_r)
            if has_2d:
                acc["topk_obj_2d"].extend(obr2[s, :nv])
                acc["topk_rel_2d"].extend(
                    assemble_predicate_topk(pr2[s, :ev], png2[s, :ev], gt_rels[s, :ev]))

            if ev:
                # full padded shapes: compilations stay bounded by the
                # bucket count, not by distinct valid-node counts; padded
                # rows are sliced away below
                tr3, tng3 = triplet_rank_parts(
                    out["obj_logits_3d"][s], batch.gt_class[s],
                    out["rel_cls_3d"][s], batch.edge_index[s], topk=101)
                tr3, tng3 = tr3[:ev], tng3[:ev]
                if has_2d:
                    tr2, tng2 = triplet_rank_parts(
                        out["obj_logits_2d"][s], batch.gt_class[s],
                        out["rel_cls_2d"][s], batch.edge_index[s], topk=101)
                    tr2, tng2 = tr2[:ev], tng2[:ev]
                ei = edge_index[s, :ev]
                sub_cls = gt_class[s][ei[:, 0]]
                obj_cls = gt_class[s][ei[:, 1]]
                scores = {}
                if with_scores:
                    probs3 = np.asarray(jax.nn.softmax(
                        out["obj_logits_3d"][s, :nv].astype(np.float32), axis=-1))
                    scores = dict(
                        sub_scores=probs3[ei[:, 0]],
                        obj_scores=probs3[ei[:, 1]],
                        rel_scores=np.asarray(out["rel_cls_3d"][s, :ev]),
                    )
                t3 = assemble_triplet_topk(
                    np.asarray(tr3), np.asarray(tng3), gt_rels[s, :ev],
                    sub_cls, obj_cls, obr3[s][ei[:, 0]], obr3[s][ei[:, 1]], **scores)
                trip_r = np.asarray(t3["topk"])
                acc["topk_triplet"].extend(trip_r)
                prog_hits["trip"] += int((trip_r <= 50).sum())
                prog_tot["trip"] += len(trip_r)
                if has_2d:
                    t2 = assemble_triplet_topk(
                        np.asarray(tr2), np.asarray(tng2), gt_rels[s, :ev],
                        sub_cls, obj_cls, obr2[s][ei[:, 0]], obr2[s][ei[:, 1]])
                    acc["topk_triplet_2d"].extend(t2["topk"])
                cls_rows.append(t3["cls_matrix"])
                if scene_recall and gt_rels[s, :ev].sum() > 0:
                    from vlsat_tpu.eval.recall import scene_recall_topk

                    rel3 = np.asarray(out["rel_cls_3d"][s])
                    ol3 = np.asarray(out["obj_logits_3d"][s])
                    for name, mode in sr_combos:
                        for tag, te in (("gc", 1), ("ngc", 100)):
                            scalar, per_cls = scene_recall_topk(
                                obj_logits=ol3, rel_probs=rel3,
                                gt_rels=gt_rels[s], gt_class=gt_class[s],
                                edge_index=edge_index[s],
                                topk=(20, 50, 100), topk_each=te,
                                num_rel_classes=num_rel_classes,
                                evaluate=mode, valid_edges=ev,
                                return_both=True)
                            sr_acc[f"{name}_{tag}"].append(scalar)
                            sr_cls[f"{name}_{tag}"].append(per_cls)
                if with_scores:
                    sub_scores.append(t3["sub_scores"])
                    obj_scores.append(t3["obj_scores"])
                    rel_scores.append(t3["rel_scores"])
            seen += 1
            if progbar is not None:
                progbar.update(seen, [
                    ("Acc@1/obj", _pct("obj")),
                    ("Acc@1/rel", _pct("rel")),
                    ("Acc@50/trip", _pct("trip")),
                ])

    arr = {k: np.asarray(v) for k, v in acc.items()}
    cls_matrix = np.concatenate(cls_rows) if cls_rows else np.zeros((0, 5), np.int64)

    metrics: Dict[str, float] = {}
    families = [
        ("obj_acc", "topk_obj", (1, 5, 10)),
        ("rel_acc", "topk_rel", (1, 3, 5)),
        ("triplet_acc", "topk_triplet", (50, 100)),
    ]
    if has_2d:
        families += [
            ("obj_acc_2d", "topk_obj_2d", (1, 5, 10)),
            ("rel_acc_2d", "topk_rel_2d", (1, 3, 5)),
            ("triplet_acc_2d", "topk_triplet_2d", (50, 100)),
        ]
    for name, key, ks in families:
        for k in ks:
            metrics[f"{name}_{k}"] = topk_accuracy(arr[key], k)

    m1, m3, m5 = compute_mean_predicate(cls_matrix, arr["topk_rel"], num_rel_classes=num_rel_classes)
    metrics.update(rel_acc_mean_1=m1, rel_acc_mean_3=m3, rel_acc_mean_5=m5)
    mr = get_mean_recall(arr["topk_triplet"], cls_matrix, num_rel_classes=num_rel_classes)
    metrics.update(mean_recall_50=float(mr[0]), mean_recall_100=float(mr[1]))
    if has_2d:
        m1_2, m3_2, m5_2 = compute_mean_predicate(cls_matrix, arr["topk_rel_2d"], num_rel_classes=num_rel_classes)
        metrics.update(rel_acc_2d_mean_1=m1_2, rel_acc_2d_mean_3=m3_2, rel_acc_2d_mean_5=m5_2)
        mr2 = get_mean_recall(arr["topk_triplet_2d"], cls_matrix, num_rel_classes=num_rel_classes)
        metrics.update(mean_recall_2d_50=float(mr2[0]), mean_recall_2d_100=float(mr2[1]))

    if train_triplet_vocab is not None:
        metrics.update(get_zero_shot_recall(arr["topk_triplet"], cls_matrix, train_triplet_vocab))

    if scene_recall:
        ks = (20, 50, 100)
        for key, vals in sr_acc.items():
            stacked = np.stack(vals) if vals else np.full((1, len(ks)), np.nan)
            for i, k in enumerate(ks):
                metrics[f"{key}_recall_{k}"] = float(np.nanmean(stacked[:, i]) * 100)
        for key, vals in sr_cls.items():
            stacked = (np.stack(vals) if vals
                       else np.full((1, num_rel_classes, len(ks)), -1.0))
            masked = np.where(stacked >= 0, stacked, np.nan)  # -1 = class absent
            with np.errstate(invalid="ignore"):
                cls_mean = np.nanmean(masked, axis=0)  # (R, ks)
                for i, k in enumerate(ks):
                    metrics[f"{key}_mean_recall_{k}"] = float(
                        np.nanmean(cls_mean[:, i]) * 100)

    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, "topk_pred_list.npy"), arr["topk_rel"])
        np.save(os.path.join(save_dir, "topk_triplet_list.npy"), arr["topk_triplet"])
        np.save(os.path.join(save_dir, "cls_matrix_list.npy"), cls_matrix)
        if with_scores and sub_scores:
            np.save(os.path.join(save_dir, "sub_scores_list.npy"), np.concatenate(sub_scores))
            np.save(os.path.join(save_dir, "obj_scores_list.npy"), np.concatenate(obj_scores))
            np.save(os.path.join(save_dir, "rel_scores_list.npy"), np.concatenate(rel_scores))
        with open(os.path.join(save_dir, "result.txt"), "w") as f:
            for k, v in metrics.items():
                print(f"Eval: {k}: {v}", file=f)

    return metrics
