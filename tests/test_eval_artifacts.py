"""Eval artifact dump (with_scores + save_dir): the engine's device-side
discounted assembly must reproduce the legacy host assembly
(assemble_predicate_topk / assemble_triplet_topk from raw rank parts)
exactly — topk lists, cls_matrix and the score arrays the reference dumps
(src/model/model.py:255-320)."""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.eval.engine import evaluate
from vlsat_tpu.eval.metrics import (
    assemble_predicate_topk,
    assemble_triplet_topk,
    object_ranks,
    predicate_rank_parts,
    triplet_rank_parts,
)
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.train.step import make_eval_step


def _legacy_assembly(eval_step, params, bs, batches, with_scores):
    """Round-2 host path: raw rank parts fetched per batch, discounting and
    cls_matrix/scores assembled with the legacy NumPy functions."""
    topk_rel, topk_trip, cls_rows = [], [], []
    subs, objs, rels = [], [], []
    for batch in batches:
        out = eval_step(params, bs, batch)
        obr = np.asarray(object_ranks(out["obj_logits_3d"], batch.gt_class,
                                      topk=11))
        pr, png = predicate_rank_parts(out["rel_cls_3d"], topk=6)
        chunk = max(8, min(batch.num_edges, 4096 // max(batch.num_scenes, 1)))
        tr, tng = jax.vmap(
            partial(triplet_rank_parts, topk=101, chunk=chunk)
        )(out["obj_logits_3d"], batch.gt_class, out["rel_cls_3d"],
          batch.edge_index)
        pr, png = np.asarray(pr), np.asarray(png)
        tr, tng = np.asarray(tr), np.asarray(tng)
        edge_mask = np.asarray(batch.edge_mask)
        gt_rels = np.asarray(batch.gt_rels)
        gt_class = np.asarray(batch.gt_class)
        edge_index = np.asarray(batch.edge_index)

        gt_f = gt_rels[edge_mask]
        topk_rel.extend(assemble_predicate_topk(
            pr[edge_mask], png[edge_mask], gt_f))
        bi = np.arange(batch.num_scenes)[:, None]
        sub_idx, obj_idx = edge_index[..., 0], edge_index[..., 1]
        scores = {}
        if with_scores:
            probs3 = np.asarray(jax.nn.softmax(
                out["obj_logits_3d"].astype(jnp.float32), axis=-1))
            scores = dict(
                sub_scores=probs3[bi, sub_idx][edge_mask],
                obj_scores=probs3[bi, obj_idx][edge_mask],
                rel_scores=np.asarray(out["rel_cls_3d"])[edge_mask].astype(
                    np.float32),
            )
        t3 = assemble_triplet_topk(
            tr[edge_mask], tng[edge_mask], gt_f,
            gt_class[bi, sub_idx][edge_mask], gt_class[bi, obj_idx][edge_mask],
            obr[bi, sub_idx][edge_mask], obr[bi, obj_idx][edge_mask],
            **scores)
        topk_trip.extend(t3["topk"])
        cls_rows.append(t3["cls_matrix"])
        if with_scores:
            subs.append(t3["sub_scores"])
            objs.append(t3["obj_scores"])
            rels.append(t3["rel_scores"])
    out = {
        "topk_pred_list": np.asarray(topk_rel),
        "topk_triplet_list": np.asarray(topk_trip),
        "cls_matrix_list": np.concatenate(cls_rows),
    }
    if with_scores:
        out["sub_scores_list"] = np.concatenate(subs)
        out["obj_scores_list"] = np.concatenate(objs)
        out["rel_scores_list"] = np.concatenate(rels)
    return out


def test_artifact_dump_matches_legacy_assembly(tmp_path):
    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    batches = [
        make_batch(seed=0, node_counts=(3, 4, 5), num_points=8, bucket=8,
                   num_obj_classes=20, num_rel_classes=7),
        make_batch(seed=1, node_counts=(4, 6), num_points=8, bucket=8,
                   num_obj_classes=20, num_rel_classes=7),
    ]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0], istrain=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    ev = make_eval_step(model)

    save = str(tmp_path / "artifacts")
    metrics = evaluate(ev, params, bs, batches, num_rel_classes=7,
                       verbose=False, with_scores=True, save_dir=save)
    want = _legacy_assembly(ev, params, bs, batches, with_scores=True)

    for name, ref in want.items():
        path = os.path.join(save, f"{name}.npy")
        assert os.path.exists(path), name
        got = np.load(path)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        if got.dtype.kind == "f":
            np.testing.assert_allclose(got, ref, rtol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(got, ref, err_msg=name)

    # result.txt carries every metric
    with open(os.path.join(save, "result.txt")) as f:
        txt = f.read()
    for k in metrics:
        assert f"Eval: {k}: " in txt, k
