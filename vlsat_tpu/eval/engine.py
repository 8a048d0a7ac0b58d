"""Validation engine: full metric suite over a scene loader.

Counterpart of ``MMGNet.validation`` (src/model/model.py:181-362): per
scene, compute 3D and 2D object / predicate / triplet ranks, accumulate,
then report Acc@k, per-class mean predicate accuracy, mean recall and
zero-shot recall, optionally dumping the reference's eval artifacts
(topk lists, cls_matrix, score arrays, result.txt).

Round-3 engineering (the reference's eval bottleneck was Python per-edge
loops, eva_utils_acc.py:137-213; round 2 of this rebuild still dispatched
the triplet ranks per *scene* and assembled per scene in Python):

  * ONE device dispatch per batch — the model forward and every rank
    kernel (object/predicate/triplet, 3D+2D) trace into a single jitted
    program (``jit`` composes through the already-jitted ``eval_step``),
    so a remote-TPU dispatch ceiling of ~230 calls/s bounds batches, not
    scenes;
  * host assembly is flat over the whole batch: masked scene-major
    flattening reproduces the per-scene accumulation order exactly while
    replacing the per-scene Python loop with a handful of NumPy ops
    (vlsat_tpu.eval.metrics vectorized assembly);
  * the multi-GT discounting (per-edge sort of GT ranks, ``tmp -
    counter``) and the in21k scene-recall candidate ranking+hit flags are
    computed ON DEVICE inside the same fused program — the host receives
    already-discounted uint8 values and finishes with boolean selects.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.eval.metrics import (
    compute_mean_predicate,
    discounted_ranks_device,
    get_mean_recall,
    get_zero_shot_recall,
    object_ranks,
    predicate_rank_parts,
    sorted_gt_preds_device,
    topk_accuracy,
    triplet_rank_parts,
)
from vlsat_tpu.scene import SceneBatch
from vlsat_tpu.utils.progbar import Progbar


SR_COMBOS = (("predcls", "rels"), ("sgcls", "triplet"))
SR_VARIANTS = (("gc", 1), ("ngc", 100))


def _metric_parts(out, batch: SceneBatch, single_label: bool,
                  with_probs: bool, with_raw: bool,
                  scene_recall: bool = False,
                  gt_cap: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Rank tensors for a whole batch (traced into the fused eval jit).

    ``single_label`` quirk parity: predicate ranks consume the RAW
    log-probs (the reference's process_val passes them as-is, so the
    0.5-confidence rule compares against log-space values) while triplet
    confidences use exp(log-probs) (eva_utils_acc.py:146-147).

    ``gt_cap``: static upper bound on per-edge GT-relation counts (a
    loader's ``max_gt``, known from the pack).  The discounted value and
    sorted-pred matrices are ascending-sorted with meaningful entries only
    in each edge's first max(#GT, 1) slots, so slicing the last axis to
    ``gt_cap`` is exact — and cuts the dominant share of the packed D2H
    payload (R=26 slots shipped vs typically <= a handful used).
    ``None`` ships the full R columns.
    """
    parts: Dict[str, jnp.ndarray] = {}
    tags = ("3d", "2d") if out.get("obj_logits_2d") is not None else ("3d",)
    # 'none' targets count as no-GT edges in single-label mode (get_gt,
    # ":20-22"); the host-side assembly masks with the same zeroed copy
    gt_rels_d = (batch.gt_rels.at[..., 0].set(0.0) if single_label
                 else batch.gt_rels)
    for tag in tags:
        ol = out[f"obj_logits_{tag}"]
        rc = out[f"rel_cls_{tag}"]
        rc_trip = jnp.exp(rc) if single_label else rc
        parts[f"obr_{tag}"] = object_ranks(ol, batch.gt_class, topk=11)
        pr, png = predicate_rank_parts(rc, topk=6)
        # chunk: static at trace time.  The factored-top-k method's big
        # temp is the (B, chunk, R+1, topk, R) compare tensor inside the
        # vmapped lax.map — bound B*chunk to keep it a few hundred MB even
        # if XLA materializes it (it usually fuses into the count reduce)
        chunk = max(8, min(batch.num_edges, 4096 // max(batch.num_scenes, 1)))
        # lane-tile raggedness: a chunk that sticks just past a 128
        # boundary compiles ~10x slower than the 128-multiple below it
        # (bucket 12, E=132: 2.00 ms vs 0.21 ms at chunk=128 on the v5e —
        # the source of the round-4 sweep's bucket-12 small-batch anomaly,
        # PERFORMANCE.md).  Shapes with a substantial tail (E=240, 552,
        # 992) measure FASTER single-chunk, so only trim near-boundary
        # tails.
        if chunk > 128 and chunk % 128 < 32:
            chunk = (chunk // 128) * 128
        tr, tng = jax.vmap(
            partial(triplet_rank_parts, topk=101, chunk=chunk)
        )(ol, batch.gt_class, rc_trip, batch.edge_index)
        # multi-GT discounting ON DEVICE: ship the already-discounted value
        # matrices instead of the raw rank parts — the host keeps only a
        # boolean select (the per-edge int64 sorts were ~40% of its tail).
        # [..., :gt_cap] with gt_cap=None is the full slice.
        parts[f"prv_{tag}"] = discounted_ranks_device(
            pr, png, gt_rels_d)[..., :gt_cap]
        parts[f"trv_{tag}"] = discounted_ranks_device(
            tr, tng, gt_rels_d)[..., :gt_cap]
    parts["preds"] = sorted_gt_preds_device(gt_rels_d)[..., :gt_cap]
    if with_probs:
        parts["probs_3d"] = jax.nn.softmax(
            out["obj_logits_3d"].astype(jnp.float32), axis=-1)
    if with_raw:
        parts["rel_cls_3d"] = jnp.exp(out["rel_cls_3d"]) if single_label \
            else out["rel_cls_3d"]
        parts["obj_logits_3d"] = out["obj_logits_3d"]
    if scene_recall:
        # in21k process_val2/3 candidates: ranked scene-global top-100
        # with device-computed hit flags — the per-scene host path paid 4
        # tunnel dispatches per SCENE for the same answer (round 3)
        from vlsat_tpu.eval.recall import batched_scene_hits

        rc3 = out["rel_cls_3d"]
        rc3 = jnp.exp(rc3) if single_label else rc3
        for name, mode in SR_COMBOS:
            for tag2, te in SR_VARIANTS:
                eg, hit = batched_scene_hits(
                    out["obj_logits_3d"], rc3, batch.edge_index,
                    batch.edge_mask, batch.gt_class, gt_rels_d,
                    topk_each=te, kmax=100, mode=mode)
                parts[f"sre_{name}_{tag2}"] = eg
                parts[f"srh_{name}_{tag2}"] = hit
    return parts


# fixed device<->host packing order for the int rank tensors (per tag);
# "preds" (shared across tags) is appended after the per-tag blocks
_INT_PARTS = ("obr", "prv", "trv")
_FLOAT_PARTS = ("probs_3d", "rel_cls_3d", "obj_logits_3d")


# fused (model forward + rank kernels) jits, cached per eval_step so repeat
# validation passes reuse the compiled program; values hold a strong ref to
# the eval_step, keeping the id() key unique for the cache's lifetime
_FUSED_CACHE: Dict[tuple, tuple] = {}


def _get_fused(eval_step, single_label: bool, with_probs: bool,
               with_raw: bool, scene_recall: bool = False,
               gt_cap: Optional[int] = None):
    """Fused (forward + ranks) jit returning THREE flat arrays.

    On a remote-TPU tunnel each device->host fetch pays a full round trip
    (~28 ms here), so the ten per-batch rank tensors cost ~370 ms/batch if
    fetched one by one — 14x the device compute.  All int rank tensors
    (plus the scene-recall hit flags) concatenate into ONE uint8 vector
    (ranks are bounded by topk+1 = 102 and the predicate no-GT quirk by
    R+2, both < 256, so the cast is lossless — guarded in evaluate()),
    scene-recall candidate edge ids into one int32 vector, and the
    optional float tensors into one f32 vector: at most three transfers
    per batch, overlapped via copy_to_host_async with the next batch's
    dispatch (see evaluate()).
    """
    key = (id(eval_step), single_label, with_probs, with_raw, scene_recall,
           gt_cap)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit[0]

    fused = jax.jit(_make_pack(eval_step, single_label, with_probs,
                               with_raw, scene_recall, gt_cap))
    _FUSED_CACHE[key] = (fused, eval_step)
    return fused


def _make_pack(eval_step, single_label: bool, with_probs: bool,
               with_raw: bool, scene_recall: bool,
               gt_cap: Optional[int] = None):
    """Traceable (params, batch_stats, batch) -> (uint8, int32, f32) body
    shared by the per-batch fused jit and the K-batch grouped scan."""
    sr_keys = [f"{n}_{t2}" for n, _ in SR_COMBOS for t2, _ in SR_VARIANTS]

    def pack(params, batch_stats, batch):
        # wire-format batches (f16 points/features, u8 gt_rels — the
        # streaming H2D path, data/wire.py) widen to f32 here, inside the
        # fused jit; f32 batches trace the identity, so resident loaders
        # compile the exact round-4 program
        from vlsat_tpu.data.wire import decode_wire

        batch = decode_wire(batch)
        out = eval_step(params, batch_stats, batch)
        parts = _metric_parts(out, batch, single_label=single_label,
                              with_probs=with_probs, with_raw=with_raw,
                              scene_recall=scene_recall, gt_cap=gt_cap)
        tags = ("3d", "2d") if "obr_2d" in parts else ("3d",)
        u8 = [parts[f"{n}_{t}"].astype(jnp.uint8).reshape(-1)
              for t in tags for n in _INT_PARTS]
        u8.append(parts["preds"].astype(jnp.uint8).reshape(-1))
        if scene_recall:
            u8 += [parts[f"srh_{k}"].astype(jnp.uint8).reshape(-1)
                   for k in sr_keys]
            i32s = jnp.concatenate(
                [parts[f"sre_{k}"].reshape(-1) for k in sr_keys])
        else:
            i32s = jnp.zeros((0,), jnp.int32)
        flts = [parts[k].reshape(-1) for k in _FLOAT_PARTS if k in parts]
        floats = (jnp.concatenate(flts) if flts
                  else jnp.zeros((0,), jnp.float32))
        return jnp.concatenate(u8), i32s, floats

    return pack


def _get_fused_grouped(eval_step, single_label: bool, with_probs: bool,
                       with_raw: bool, scene_recall: bool = False,
                       gt_cap: Optional[int] = None):
    """K-batch fused eval: one dispatch scans K minibatches gathered by
    index from a device-resident bucket and stacks their packed outputs to
    (K, n) — ONE output fetch per K batches.  Through a remote-TPU tunnel
    the per-batch engine is bounded by the per-fetch link round trip
    (~30 ms); grouping amortizes it K-fold (data/resident.py
    ``ResidentGroupedEval``)."""
    key = ("grouped", id(eval_step), single_label, with_probs, with_raw,
           scene_recall, gt_cap)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit[0]

    pack = _make_pack(eval_step, single_label, with_probs, with_raw,
                      scene_recall, gt_cap)

    @jax.jit
    def fused_grouped(params, batch_stats, full, idx):
        # idx rank is static at trace time and selects the storage mode:
        #   (K, B) int32 — flat resident split: gather B scene rows per
        #                  scan step (single-device ResidentGroupedEval);
        #   (K,)   int32 — batch-structured sharded split (leaves
        #                  (num_batches, B, ...) placed P(None, 'data')):
        #                  select whole batch k per step — a shard-local
        #                  slice, so the scan stays data-parallel with no
        #                  cross-device gathers (ResidentShardedEval).
        def body(carry, rows):
            dev_in = jax.tree_util.tree_map(
                lambda a: jnp.take(a, rows, axis=0), full)
            return carry, pack(params, batch_stats, dev_in)

        _, outs = jax.lax.scan(body, 0, idx)
        return outs

    _FUSED_CACHE[key] = (fused_grouped, eval_step)
    return fused_grouped


def _unpack_parts(ints: np.ndarray, i32s: np.ndarray, floats: np.ndarray,
                  batch: SceneBatch, with_probs: bool, with_raw: bool,
                  scene_recall: bool = False,
                  gt_cap: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Invert the fused packing: flat (uint8, i32, f32) -> named arrays."""
    b, n = batch.gt_class.shape
    e, r = batch.num_edges, batch.gt_rels.shape[-1]
    rc = min(gt_cap, r) if gt_cap else r  # GT-slot columns shipped
    shapes = {"obr": (b, n), "prv": (b, e, rc), "trv": (b, e, rc)}
    per_tag = sum(int(np.prod(s)) for s in shapes.values())
    preds_size = b * e * rc
    sr_keys = [f"{n2}_{t2}" for n2, _ in SR_COMBOS for t2, _ in SR_VARIANTS]
    sr_size = (b * 100 * len(sr_keys)) if scene_recall else 0
    tags = (("3d", "2d")
            if ints.size - sr_size - preds_size == 2 * per_tag else ("3d",))
    parts: Dict[str, np.ndarray] = {}
    off = 0
    for t in tags:
        for name in _INT_PARTS:
            sz = int(np.prod(shapes[name]))
            parts[f"{name}_{t}"] = (
                ints[off:off + sz].astype(np.int32).reshape(shapes[name]))
            off += sz
    parts["preds"] = ints[off:off + preds_size].astype(np.int32).reshape(
        (b, e, rc))
    off += preds_size
    if scene_recall:
        for k in sr_keys:
            parts[f"srh_{k}"] = (
                ints[off:off + b * 100].reshape(b, 100).astype(bool))
            off += b * 100
        soff = 0
        for k in sr_keys:
            parts[f"sre_{k}"] = i32s[soff:soff + b * 100].reshape(b, 100)
            soff += b * 100
    c = floats.size  # infer C lazily only when float parts are present
    fshapes = []
    if with_probs:
        fshapes.append(("probs_3d", None))
    if with_raw:
        fshapes.extend([("rel_cls_3d", (b, e, r)), ("obj_logits_3d", None)])
    known = sum(int(np.prod(s)) for _, s in fshapes if s is not None)
    n_c = sum(1 for _, s in fshapes if s is None)
    c_dim = (c - known) // (b * n * n_c) if n_c else 0
    off = 0
    for name, s in fshapes:
        s = s if s is not None else (b, n, c_dim)
        sz = int(np.prod(s))
        parts[name] = floats[off:off + sz].reshape(s)
        off += sz
    return parts


def evaluate(
    eval_step,
    params,
    batch_stats,
    loader: Iterable,  # SceneBatch items, or (host, device) SceneBatch pairs
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
    if 2 * num_rel_classes + 1 > 255:
        raise ValueError(
            "uint8 rank packing requires num_rel_classes <= 127: the "
            "discounted no-GT rank (R+2) plus the R-1 encode offset must "
            f"fit a byte (got {num_rel_classes}); see _get_fused")
    acc = {
        k: [] for k in (
            "topk_obj", "topk_obj_2d", "topk_rel", "topk_rel_2d",
            "topk_triplet", "topk_triplet_2d",
        )
    }
    cls_rows, sub_scores, obj_scores, rel_scores = [], [], [], []
    sr_combos = list(SR_COMBOS)
    sr_acc: Dict[str, list] = {f"{m}_{t}": [] for m, _ in sr_combos for t in ("gc", "ngc")}
    sr_cls: Dict[str, list] = {k: [] for k in sr_acc}
    progbar = Progbar(total, width=20) if verbose else None
    seen = 0
    # running hit/total counters for the progress line: O(1) per batch
    prog_hits = {"obj": 0, "rel": 0, "trip": 0}
    prog_tot = {"obj": 0, "rel": 0, "trip": 0}

    def _pct(key: str) -> float:
        t = prog_tot[key]
        return prog_hits[key] * 100.0 / t if t else 0.0

    # GT-slot cap: loaders backed by a pack know the split's max per-edge
    # GT count (PackedScenes.max_gt); slicing the (B, E, R) value/pred
    # matrices to it on device cuts most of the packed D2H payload.
    # Loaders without the attribute (plain batch lists) ship full R.
    gt_cap = getattr(loader, "max_gt", None)
    if gt_cap is not None:
        gt_cap = max(1, int(gt_cap))
    fused = _get_fused(eval_step, single_label=not multi_rel,
                       with_probs=with_scores, with_raw=with_scores,
                       scene_recall=scene_recall, gt_cap=gt_cap)

    state = {"has_2d": True}

    def _assemble(p: Dict[str, np.ndarray], batch: SceneBatch) -> None:
        nonlocal seen
        has_2d = state["has_2d"] = "obr_2d" in p
        obj_mask = np.asarray(batch.obj_mask)
        edge_mask = np.asarray(batch.edge_mask)
        gt_rels = np.asarray(batch.gt_rels)
        if not multi_rel:
            gt_rels = gt_rels.copy()
            gt_rels[..., 0] = 0  # 'none' targets -> no-GT edges
        gt_class = np.asarray(batch.gt_class)
        edge_index = np.asarray(batch.edge_index)

        # ---- flat (scene-major) assembly over the whole batch ----------
        # device already sorted + discounted the ranks (discounted_ranks
        # _device); the host keeps boolean selects over the valid slots
        gt_f = gt_rels[edge_mask]                      # (sumE, R)
        r = gt_f.shape[-1]
        off = r - 1                                    # u8 encode offset
        cnt = (gt_f > 0).sum(axis=1)
        counts = np.maximum(cnt, 1)
        # rc: GT-slot columns the device actually shipped (<= R when the
        # loader declared a max_gt cap); exactness requires every edge's
        # GT count to fit — guard against a loader misdeclaring its pack
        rc = p["prv_3d"].shape[-1]
        if rc < r and cnt.size and int(cnt.max()) > rc:
            raise ValueError(
                f"loader declared max_gt={rc} but a batch edge carries "
                f"{int(cnt.max())} GT relations — stale or wrong pack "
                "metadata (PackedScenes.max_gt)")
        valid = np.arange(rc)[None, :] < counts[:, None]

        def _sel(key: str) -> np.ndarray:
            return (p[key][edge_mask].astype(np.int64) - off)[valid]

        obj_f3 = p["obr_3d"][obj_mask]
        rel_f3 = _sel("prv_3d")
        acc["topk_obj"].append(obj_f3)
        acc["topk_rel"].append(rel_f3)
        prog_hits["obj"] += int((obj_f3 <= 1).sum())
        prog_tot["obj"] += len(obj_f3)
        prog_hits["rel"] += int((rel_f3 <= 1).sum())
        prog_tot["rel"] += len(rel_f3)
        if has_2d:
            acc["topk_obj_2d"].append(p["obr_2d"][obj_mask])
            acc["topk_rel_2d"].append(_sel("prv_2d"))

        if edge_mask.any():
            bi = np.arange(batch.num_scenes)[:, None]
            sub_idx, obj_idx = edge_index[..., 0], edge_index[..., 1]
            sub_cls = gt_class[bi, sub_idx][edge_mask]
            obj_cls = gt_class[bi, obj_idx][edge_mask]
            rank_sub = p["obr_3d"][bi, sub_idx][edge_mask]
            rank_obj = p["obr_3d"][bi, obj_idx][edge_mask]
            trip_r = _sel("trv_3d")
            preds = p["preds"][edge_mask].astype(np.int64)[valid] - 1
            acc["topk_triplet"].append(trip_r)
            prog_hits["trip"] += int((trip_r <= 50).sum())
            prog_tot["trip"] += len(trip_r)
            rep = lambda a: np.repeat(np.asarray(a).astype(np.int64), counts)
            cls_rows.append(np.stack(
                [rep(sub_cls), rep(rank_sub), rep(obj_cls), rep(rank_obj),
                 preds], axis=1))
            if has_2d:
                acc["topk_triplet_2d"].append(_sel("trv_2d"))
            if with_scores:
                keep = preds >= 0  # score rows exist only for GT predicates
                probs3 = p["probs_3d"]
                sub_scores.append(
                    np.repeat(probs3[bi, sub_idx][edge_mask], counts,
                              axis=0)[keep])
                obj_scores.append(
                    np.repeat(probs3[bi, obj_idx][edge_mask], counts,
                              axis=0)[keep])
                rel_scores.append(
                    np.repeat(p["rel_cls_3d"][edge_mask].astype(np.float32),
                              counts, axis=0)[keep])

        if scene_recall:
            # device already ranked the candidates and computed their hit
            # flags inside the fused program (batched_scene_hits); the host
            # tally runs once per (batch, combo) — the per-scene x
            # per-combo tally loop was the last in21k host wall
            from vlsat_tpu.eval.recall import tally_hits_batch

            for name, _ in sr_combos:
                for tag, _te in SR_VARIANTS:
                    k2 = f"{name}_{tag}"
                    scalar, per_cls, valid = tally_hits_batch(
                        p[f"sre_{k2}"], p[f"srh_{k2}"], gt_rels, edge_mask,
                        topk=(20, 50, 100),
                        num_rel_classes=num_rel_classes)
                    if valid.any():
                        sr_acc[k2].append(scalar[valid])
                        sr_cls[k2].append(per_cls[valid])

        seen += int((obj_mask.sum(axis=1) > 0).sum())
        if progbar is not None:
            progbar.update(seen, [
                ("Acc@1/obj", _pct("obj")),
                ("Acc@1/rel", _pct("rel")),
                ("Acc@50/trip", _pct("trip")),
            ])

    # pipelined loop: dispatches stay on this thread (cheap, async);
    # device->host fetches move to a small pool — each fetch BLOCKS for a
    # full tunnel round trip (~30-40 ms) even with copy_to_host_async, and
    # on the main thread that latency serialized with everything else
    # (PERFORMANCE.md round 3; on the STREAMING path, concatenating K
    # batches' outputs on device measured slower — per-batch H2D plus the
    # concat barrier beat the latency saved; the RESIDENT grouped loader
    # has no per-batch H2D, which is what makes its K-batch scan pay).
    # Assembly drains in FIFO order, preserving the reference's scene
    # accumulation order exactly.
    def _fetch(dev) -> tuple:
        # a fetch of even a 0-size device array pays a full tunnel round
        # trip (~7 ms here); shape is local metadata, so skip those
        return tuple(np.asarray(d) if d.size else np.zeros(d.shape, d.dtype)
                     for d in dev)

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    grouped = bool(getattr(loader, "grouped", False))
    if grouped:
        fused_grouped = _get_fused_grouped(
            eval_step, single_label=not multi_rel, with_probs=with_scores,
            with_raw=with_scores, scene_recall=scene_recall, gt_cap=gt_cap)
    else:
        # H2D double buffer for STREAMING loaders (round-4): a plain host
        # batch used to ship its ~2.7 MB of inputs synchronously inside
        # the dispatch — through a remote-TPU tunnel that serialized ~20 ms
        # of link time with every batch's compute + output fetch.  A
        # background thread device_puts batch k+1/k+2 while batch k
        # dispatches (mirror of the existing D2H double buffer); items
        # become the same (host, device) pairs the resident loaders yield,
        # so assembly still reads host memory and metrics are bit-identical
        # (tests/test_resident.py equality gates run through this path).
        # Already-paired items (ResidentEvalLoader) and device-placed
        # batches (shard_eval_batches output) pass through untouched.
        #
        # WIRE FORMAT (round-5): the double buffer hides link LATENCY,
        # not BANDWIDTH — at the round-4 capture's 29 MB/s the f32
        # payload alone was ~90 ms/batch of un-hideable link time.  The
        # host narrows points/features to f16 and multi-hot gt_rels to
        # uint8 (data/wire.py, ~2.3x fewer bytes); the fused program
        # widens back to f32 on device (decode_wire in _make_pack).
        # Assembly still reads the UNTOUCHED host batch.  Bit-exact mode:
        # VLSAT_WIRE_DTYPE=float32.
        from vlsat_tpu.data.pipeline import Prefetcher
        from vlsat_tpu.data.wire import encode_wire

        def _h2d_pairs(it):
            for item in it:
                if isinstance(item, tuple):
                    yield item
                elif isinstance(jax.tree_util.tree_leaves(item)[0],
                                np.ndarray):
                    yield item, jax.device_put(encode_wire(item))
                else:
                    yield item, item

        loader = Prefetcher(_h2d_pairs(loader), depth=2)

    def _drain(fut, pb) -> None:
        arrs = fut.result()
        if isinstance(pb, list):  # grouped: arrays carry a leading K axis
            for j, host in enumerate(pb):
                _assemble(_unpack_parts(arrs[0][j], arrs[1][j], arrs[2][j],
                                        host, with_scores, with_scores,
                                        scene_recall, gt_cap=gt_cap), host)
        else:
            _assemble(_unpack_parts(*arrs, pb, with_scores, with_scores,
                                    scene_recall, gt_cap=gt_cap), pb)

    depth = 2 if grouped else 4  # a grouped entry is K batches of backlog
    with ThreadPoolExecutor(max_workers=2) as pool:
        pending = deque()
        for item in loader:
            if grouped:
                # (hosts, full, idx) groups (data/resident.py
                # ResidentGroupedEval): ONE dispatch scans the K index-
                # gathered minibatches; tail-padded scan rows (idx rows
                # beyond len(hosts)) are computed but never assembled
                hosts, full, idx = item
                dev = fused_grouped(params, batch_stats, full,
                                    jnp.asarray(idx))
                payload = hosts
            else:
                # (host, device) pairs (data/resident.py
                # ResidentEvalLoader): dispatch on the device half — no
                # per-batch H2D payload — and assemble from the host half
                # (mmap views; reading fields off device arrays would pay
                # a D2H round trip per leaf)
                batch, dev_in = (item if isinstance(item, tuple)
                                 else (item, item))
                dev = fused(params, batch_stats, dev_in)
                payload = batch
            for d in dev:
                if d.size:
                    d.copy_to_host_async()
            pending.append((pool.submit(_fetch, dev), payload))
            while len(pending) > depth:
                _drain(*pending.popleft())
        while pending:
            _drain(*pending.popleft())
    has_2d = state["has_2d"]

    # per-batch arrays are APPENDED, not extend()-ed: extending a Python
    # list with a NumPy array boxes every element (~22 ms per 512-scene
    # pass); one concatenate at the end is near-free
    arr = {k: (np.concatenate(v) if v else np.zeros(0, np.int64))
           for k, v in acc.items()}
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
        # per-batch (V, ...) row blocks from tally_hits_batch concatenate
        # into the same per-scene row list the per-scene tally produced
        for key, vals in sr_acc.items():
            stacked = (np.concatenate(vals) if vals
                       else np.full((1, len(ks)), np.nan))
            for i, k in enumerate(ks):
                metrics[f"{key}_recall_{k}"] = float(np.nanmean(stacked[:, i]) * 100)
        for key, vals in sr_cls.items():
            stacked = (np.concatenate(vals) if vals
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
