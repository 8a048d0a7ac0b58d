"""Experiment runner: wiring config -> data -> model -> train/eval loops.

Counterpart of the reference runner ``MMGNet`` (src/model/model.py:18-362):
builds datasets, model and optimizer from a Config, runs the epoch loop
with progress/metric logging, periodic validation, checkpointing with
best-model promotion on mean recall@50, and the standalone eval mode with
artifact dumps.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from vlsat_tpu.config import Config
from vlsat_tpu.data.assets import build_triplet_vocab, load_relationship_json
from vlsat_tpu.data.dataset import SceneLoader, SSGScenes
from vlsat_tpu.eval.engine import evaluate
from vlsat_tpu.eval.metrics import object_ranks, predicate_rank_parts, assemble_predicate_topk, topk_accuracy
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.parallel import make_mesh, replicate, shard_batch
from vlsat_tpu.train.checkpoint import CheckpointManager
from vlsat_tpu.train.optim import make_optimizer
from vlsat_tpu.train.state import TrainState, create_train_state
from vlsat_tpu.train.step import make_eval_step, make_train_step
from vlsat_tpu.utils.logging import MetricLogger
from vlsat_tpu.utils.progbar import Progbar


def model_config_from(cfg: Config, num_obj: int, num_rel: int) -> MMGNetConfig:
    m = cfg.MODEL
    return MMGNetConfig(
        num_obj_classes=num_obj,
        num_rel_classes=num_rel,
        point_feature_size=m.point_feature_size,
        dim_atten=m.DIM_ATTEN,
        num_heads=m.NUM_HEADS,
        depth=m.N_LAYERS,
        gcn_aggr=m.GCN_AGGR,
        dropout_atten=m.DROP_OUT_ATTEN,
        use_gcn_edge=m.USE_GCN_EDGE,
        use_spatial=m.USE_SPATIAL,
        clip_feat_dim=m.clip_feat_dim,
        adapter_alpha=m.adapter_alpha,
        multi_rel_outputs=m.multi_rel_outputs,
    )


class Runner:
    def __init__(self, cfg: Config, data_parallel: bool = False):
        self.cfg = cfg
        d = cfg.dataset
        self.mode = cfg.get("MODE", "train")
        # NOTE: the PRNG_IMPL config ("rbg" speeds dropout ~4x on TPU) is
        # applied by the CLI entry (main.py) and bench.py — it is global
        # process state, so the library constructor must not mutate it

        common = dict(
            root=d.root,
            scans_root=d.scans_root,
            label_file=d.label_file,
            num_points=d.num_points,
            num_points_union=d.num_points_union,
            multi_view_root=d.multi_view_root,
            cache_root=d.cache_root,
            # SGPN consumes per-edge union point clouds
            with_union_points=d.with_union_points or cfg.NAME == "SGPN",
            feat_dim=cfg.MODEL.clip_feat_dim,
            multi_rel=cfg.MODEL.multi_rel_outputs,
            # extra point channels (reference load_mesh, dataset_3dssg.py:
            # 38-58); the encoders' first-layer width follows the batch
            use_rgb=cfg.MODEL.get("USE_RGB", False),
            use_normal=cfg.MODEL.get("USE_NORMAL", False),
        )
        # Precomputed CLIP triplet-sentence cache feeds the rel-mimic loss.
        # The relation list MUST be the one indexing gt_rels (relationships
        # minus 'none').  NOTE a reference bug we deliberately do not
        # replicate: SGFN_MMG/model.py:237 indexes rel_label_path
        # (relations.txt, alphabetical order) with gt indices from
        # relationships.txt order, so its mimic sentences name the wrong
        # predicate for most classes.
        text_lookup = None
        # rel-mimic (and hence the text cache) exists only for multi-label
        # mode — the reference's get_rel_emb asserts 2-D multi-hot targets
        if cfg.MODEL.get("triplet_text_cache") and cfg.MODEL.multi_rel_outputs:
            from vlsat_tpu.clipsem import TripletTextCache
            from vlsat_tpu.data.assets import read_classes, read_relationships

            classes = read_classes(d.root)
            relations = read_relationships(d.root)[1:]
            text_lookup = TripletTextCache.load(
                cfg.MODEL.triplet_text_cache, classes, relations)

        self.train_scenes = None
        if self.mode == "train":
            self.train_scenes = SSGScenes(
                split="train_scans",
                use_data_augmentation=d.get("use_data_augmentation", False),
                triplet_text_lookup=text_lookup,
                # runtime BFS subgraph sampling is a train-time capability
                # (the eval protocol needs full graphs)
                sample_in_runtime=d.get("sample_in_runtime", False),
                sample_num_nn=d.get("sample_num_nn", 2),
                sample_num_seed=d.get("sample_num_seed", 4),
                max_edges=d.get("max_edges", -1),
                neighbor_radius=d.get("neighbor_radius", 0.5),
                **common)
        self.valid_scenes = SSGScenes(split="validation_scans", **common)

        num_obj = len(self.valid_scenes.class_names)
        num_rel = len(self.valid_scenes.relation_names)
        self.num_rel = num_rel

        obj_text = None
        if cfg.MODEL.obj_text_table:
            obj_text = np.load(cfg.MODEL.obj_text_table)
        from vlsat_tpu.models.registry import build_model

        self.model, self.loss_fn = build_model(
            cfg.NAME, num_obj, num_rel, cfg.MODEL, obj_text_features=obj_text)

        n_train = len(self.train_scenes) if self.train_scenes else len(self.valid_scenes)
        self.max_iteration = int(float(cfg.MAX_EPOCHES) * n_train // cfg.Batch_Size)
        self.use_pretrain = cfg.MODEL.get("use_pretrain", "") or ""
        self.optimizer = make_optimizer(
            lr=float(cfg.LR), max_iteration=max(self.max_iteration, 1),
            weight_decay=float(cfg.W_DECAY or 0.0),
            schedule=cfg.get("LR_SCHEDULE", "Cosine"),
            freeze_non_predictor=bool(self.use_pretrain),
        )

        self.exp_dir = os.path.join(cfg.PATH, cfg.NAME, cfg.get("exp", "default"))
        self.ckpt = CheckpointManager(os.path.join(self.exp_dir, "checkpoints"))
        self.logger = MetricLogger(os.path.join(cfg.PATH, "logs", cfg.NAME, cfg.get("exp", "default")))

        self.mesh = make_mesh() if data_parallel and jax.device_count() > 1 else None
        self.state: Optional[TrainState] = None

        self.train_triplet_vocab = None
        try:
            data = load_relationship_json(d.root, "train_scans")
            self.train_triplet_vocab = build_triplet_vocab(
                data, self.valid_scenes.class_names, self.valid_scenes.relation_names)
        except FileNotFoundError:
            pass

    # ------------------------------------------------------------------ setup
    def _init_state(self, example_batch) -> TrainState:
        state = create_train_state(self.model, example_batch, self.optimizer,
                                   seed=self.cfg.SEED)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def close(self) -> None:
        """Release the metric logger (flushes the TensorBoard writer thread;
        long-lived hosts — and the test suite — otherwise leak one event
        writer thread per Runner)."""
        self.logger.close()

    def load(self, best: bool = False, allow_fallback: bool = False) -> bool:
        """Restore the latest/best checkpoint.

        ``allow_fallback=True`` (train resume): an unrestorable checkpoint
        (structure mismatch after a code change, corruption) is archived
        aside — leaving it in place would make orbax silently skip every
        save whose step is below the stale one — and training starts fresh.
        Default (eval/trace): restore errors propagate; silently evaluating
        a fresh-init model would produce garbage metrics with exit code 0.
        """
        loader = SceneLoader(self.valid_scenes, batch_size=1, shuffle=False)
        example = next(iter(loader))
        template = self._init_state(example)
        try:
            restored = self.ckpt.restore(template, best=best)
        except Exception as e:
            if not allow_fallback:
                raise RuntimeError(
                    f"checkpoint restore failed for {self.exp_dir} "
                    f"({type(e).__name__}); delete or archive the stale "
                    "checkpoints to proceed"
                ) from e
            archived = self.ckpt.archive_stale()
            print(f"warning: checkpoint restore failed ({type(e).__name__}); "
                  f"archived stale checkpoints to {archived}; starting fresh")
            restored = None
        if restored is None:
            self.state = template
            return False
        self.state = restored
        return True

    # ------------------------------------------------------------------ data
    def _packed(self, split: str):
        """PackedScenes for ``split`` when dataset.packed_root holds a pack
        (tools/pack_dataset.py), else None."""
        root = self.cfg.dataset.get("packed_root")
        if not root:
            return None
        pack = os.path.join(root, split)
        if not os.path.exists(os.path.join(pack, "manifest.json")):
            return None
        from vlsat_tpu.data.packed import PackedScenes

        # cached per split: _eval_loader keys its device-resident copy on
        # the PackedScenes identity across repeated validation passes
        cache = getattr(self, "_packed_cache", None)
        if cache is None:
            cache = self._packed_cache = {}
        if split not in cache:
            cache[split] = PackedScenes(pack)
        return cache[split]

    def _eval_bs(self):
        """EVAL_BATCH_SIZE resolved: "auto" -> the measured per-bucket
        throughput-best table (data/bucket_batch.py DEFAULT_EVAL_BATCH —
        eval metrics are batch-size independent, so per-bucket sizes are
        pure throughput), else the configured int."""
        raw = self.cfg.get("EVAL_BATCH_SIZE", 1)
        if str(raw).lower() == "auto":
            from vlsat_tpu.data.bucket_batch import DEFAULT_EVAL_BATCH

            return dict(DEFAULT_EVAL_BATCH)
        return int(raw)

    def _eval_loader(self, packed, bs):
        """Validation loader over a packed split.

        Pins the split in HBM and gathers eval batches by index on device
        (EVAL_RESIDENT: auto/true/false, mirroring TRAIN_RESIDENT —
        "auto" enables it when the pack fits RESIDENT_HBM_BUDGET); the
        resident copy is cached across validation passes.  Under a mesh
        the split is stored batch-structured and sharded P(None, 'data')
        (data/resident.py ResidentShardedEval) so dispatches stay
        payload-free AND data-parallel; the streaming PackedLoader (+
        shard_eval_batches padding) remains the fallback when residency
        is off or EVAL_BATCH_SIZE does not divide over the mesh.
        """
        from vlsat_tpu.data.packed import PackedLoader

        mode = str(self.cfg.get("EVAL_RESIDENT", "auto")).lower()
        on = mode in ("1", "true", "yes")
        if mode == "auto":
            from vlsat_tpu.data.resident import split_nbytes

            on = split_nbytes(packed) <= int(
                self.cfg.get("RESIDENT_HBM_BUDGET", 2 << 30))
        if on and self.mesh is not None:
            from vlsat_tpu.data.bucket_batch import resolve_batch

            n_dev = self.mesh.shape.get("data", 1)
            if all(resolve_batch(bs, b) % n_dev == 0
                   for b in packed.buckets):
                from vlsat_tpu.data.resident import ResidentShardedEval

                group = int(self.cfg.get("EVAL_GROUP", 4))
                cached = getattr(self, "_eval_resident", None)
                if (not isinstance(cached, ResidentShardedEval)
                        or cached.packed is not packed
                        or cached.batch_size != bs
                        or cached.group != max(group, 1)):
                    cached = self._eval_resident = ResidentShardedEval(
                        packed, self.mesh, bs, group=max(group, 1))
                return cached
        elif on:
            from vlsat_tpu.data.resident import (
                ResidentEvalLoader, ResidentGroupedEval, ResidentScenes)

            cached = getattr(self, "_eval_resident", None)
            if not isinstance(cached, ResidentScenes) or \
                    cached.packed is not packed:
                cached = self._eval_resident = ResidentScenes(packed)
            group = int(self.cfg.get("EVAL_GROUP", 4))
            if group > 1:
                # K batches per dispatch: one output fetch per group
                # amortizes the per-dispatch link round trip (+67% e2e
                # through this tunnel at K=4 with the max_gt payload cut;
                # metrics bit-identical — tests/test_resident.py)
                return ResidentGroupedEval(cached, bs, group=group)
            return ResidentEvalLoader(cached, bs)
        return PackedLoader(packed, batch_size=bs)

    # ------------------------------------------------------------------ train
    def train(self) -> None:
        cfg = self.cfg
        packed = self._packed("train")
        if packed is not None:
            from vlsat_tpu.data.packed import PackedLoader

            loader = PackedLoader(packed, batch_size=cfg.Batch_Size,
                                  shuffle=True, seed=cfg.SEED, drop_last=True)
        else:
            loader = SceneLoader(
                self.train_scenes, batch_size=cfg.Batch_Size, shuffle=True,
                seed=cfg.SEED, drop_last=True, for_train=True,
                buckets=cfg.dataset.node_buckets,
            )
        def val_loader():
            vp = self._packed("validation")
            ebs = self._eval_bs()
            if vp is not None:
                vl = self._eval_loader(vp, ebs)
            else:
                vl = SceneLoader(
                    self.valid_scenes,
                    batch_size=ebs if isinstance(ebs, int) else 1,
                    shuffle=False, buckets=cfg.dataset.node_buckets)
            if self.mesh is not None and not getattr(vl, "mesh_sharded", False):
                # same data-parallel eval path as validation(): pad ragged
                # batches with masked scenes and shard over the mesh
                from vlsat_tpu.parallel import shard_eval_batches

                return shard_eval_batches(vl, self.mesh)
            return vl
        if self.state is None:
            first = next(iter(loader))
            self.state = self._init_state(first)
        if self.use_pretrain:
            # reference load_pretrain_model: load weights, train only the
            # predictor heads (model_base.py:131-147)
            pre = CheckpointManager(self.use_pretrain)
            restored = pre.restore(self.state, best=True)
            if restored is not None:
                self.state = self.state.replace(
                    params=restored.params, batch_stats=restored.batch_stats)
            else:
                print(f"warning: no pretrain checkpoint at {self.use_pretrain}")
        import inspect

        import jax.numpy as jnp

        m = cfg.MODEL
        supported = inspect.signature(self.loss_fn).parameters
        loss_kw = {
            k: v for k, v in dict(
                lambda_o=m.lambda_o,
                weight_mode=m.get("WEIGHT_EDGE", "DYNAMIC"),
                w_bg=m.get("w_bg", 1.0),
                none_ratio=m.get("NONE_RATIO", 1.0),
                ignore_none_rel=m.get("ignore_none_rel", False),
                weights_rel=jnp.asarray(self.train_scenes.w_cls_rel),
            ).items() if k in supported
        }
        objective = lambda outputs, batch: self.loss_fn(outputs, batch, **loss_kw)
        # packed splits carry rel-mimic targets as a deduplicated table +
        # per-edge indices; ship the table to the device once (replicated
        # under a mesh) and gather inside the step
        text_table = None
        if packed is not None and packed.text_table is not None:
            text_table = jnp.asarray(packed.text_table)
            if self.mesh is not None:
                text_table = replicate(text_table, self.mesh)
        step_fn = make_train_step(self.model, self.optimizer,
                                  objective=objective, text_table=text_table)
        # TRAIN_MICROSTEPS > 1: scan K batches per dispatch (amortizes the
        # remote-dispatch enqueue; loss/step trajectory identical)
        micro_k = max(int(cfg.get("TRAIN_MICROSTEPS", 1)), 1)
        if micro_k > 1:
            from vlsat_tpu.train.step import make_multi_train_step

            multi_fn = make_multi_train_step(
                self.model, self.optimizer, objective=objective,
                text_table=text_table)
        # TRAIN_RESIDENT ("auto"/true/false): pin the packed split's
        # tensors in device HBM and dispatch only (K*B,) permutation
        # indices — zero per-step host->device payload (data/resident.py).
        # "auto" enables it when the pack fits RESIDENT_HBM_BUDGET bytes.
        # Single-device path: under a mesh the streaming loaders shard the
        # batch axis instead.
        resident_cache = resident_fn = None
        if packed is not None and self.mesh is None:
            mode = str(cfg.get("TRAIN_RESIDENT", "auto")).lower()
            on = mode in ("1", "true", "yes")
            if mode == "auto":
                from vlsat_tpu.data.resident import split_nbytes

                on = split_nbytes(packed) <= int(
                    cfg.get("RESIDENT_HBM_BUDGET", 2 << 30))
            if on:
                from vlsat_tpu.train.step import (
                    make_resident_multi_train_step)

                resident_cache = {}
                resident_fn = make_resident_multi_train_step(
                    self.model, self.optimizer, batch_size=cfg.Batch_Size,
                    objective=objective, text_table=text_table)
        eval_fn = make_eval_step(self.model)
        rng = jax.random.PRNGKey(cfg.SEED + 7)

        start_epoch = 1 + int(self.state.step) // max(len(loader), 1)
        eva_res = -1.0
        from vlsat_tpu.data.pipeline import Prefetcher

        for epoch in range(start_epoch, cfg.MAX_EPOCHES + 1):
            print(f"\nTraining epoch: {epoch}")
            epoch_t0, epoch_scenes = time.perf_counter(), 0
            progbar = Progbar(len(loader), width=20,
                              stateful_metrics=["Misc/epo", "Misc/it"])
            if resident_fn is not None:
                from vlsat_tpu.data.resident import (
                    ResidentScenes, epoch_permutations)

                variant = (epoch - 1) % packed.variants
                if variant not in resident_cache:
                    resident_cache.clear()  # hold ONE variant in HBM
                    resident_cache[variant] = ResidentScenes(packed, variant)
                rs = resident_cache[variant]
                counts = {b: packed.count(b) for b in packed.buckets}
                source = (((b, p), micro_k) for b, p in epoch_permutations(
                    counts, micro_k * cfg.Batch_Size, epoch - 1,
                    seed=cfg.SEED))
            elif micro_k > 1:
                from vlsat_tpu.parallel import shard_stacked_batch
                from vlsat_tpu.train.step import stack_batches

                def grouped():
                    buf = []
                    for b in loader:
                        buf.append(b)
                        if len(buf) == micro_k:
                            yield stack_batches(buf)
                            buf = []
                    # trailing partial groups are dropped (a smaller stack
                    # would trigger a fresh compile; drop_last semantics)

                source = ((g, micro_k) for g in Prefetcher(grouped()))
            else:
                source = ((b, 1) for b in Prefetcher(loader))
            for item, k in source:
                rng, sub = jax.random.split(rng)
                if resident_fn is not None:
                    bkt, perm = item
                    self.state, aux = resident_fn(
                        self.state, rs.full_batch(bkt), jnp.asarray(perm), sub)
                else:
                    if self.mesh is not None:
                        item = (shard_stacked_batch(item, self.mesh) if k > 1
                                else shard_batch(item, self.mesh))
                    self.state, aux = (multi_fn if k > 1 else step_fn)(
                        self.state, item, sub)
                it = int(self.state.step)
                logs = [(f"train/{name}", float(v)) for name, v in aux.items()
                        if np.ndim(v) == 0]
                logs += [("Misc/epo", epoch), ("Misc/it", it)]
                progbar.add(k, values=logs)
                epoch_scenes += (len(item[1]) if resident_fn is not None
                                 else k * int(cfg.Batch_Size))
                if cfg.LOG_INTERVAL and (it % cfg.LOG_INTERVAL) < k:
                    self.logger.log(logs, it)
                if it >= self.max_iteration:
                    break
            # reference saves every epoch (model.py:149); CKPT_EPOCH_INTERVAL
            # thins that out for fast-epoch workloads where the orbax save
            # dominates wall time (the final epoch always saves)
            ck_int = int(cfg.get("CKPT_EPOCH_INTERVAL", 1))
            if (epoch % max(ck_int, 1) == 0 or int(self.state.step) >= self.max_iteration
                    or epoch == int(cfg.MAX_EPOCHES)):
                self.ckpt.save(self.state, eva_res if eva_res >= 0 else None)
            validated = None
            if cfg.VALID_INTERVAL > 0 and epoch % cfg.VALID_INTERVAL == 0:
                print("\nstart validation...")
                val_t0 = time.perf_counter()
                metrics = evaluate(
                    eval_fn, self.state.params, self.state.batch_stats,
                    val_loader(), num_rel_classes=self.num_rel,
                    train_triplet_vocab=self.train_triplet_vocab,
                    total=len(self.valid_scenes),
                    multi_rel=self.cfg.MODEL.multi_rel_outputs,
                )
                eva_res = metrics["mean_recall_50"]
                validated = {"mean_recall_50": round(float(eva_res), 5),
                             "val_wall_s": round(
                                 time.perf_counter() - val_t0, 2)}
                self.logger.log(list(metrics.items()), int(self.state.step))
                self.ckpt.save(self.state, eva_res)
            self._write_epoch_stats(epoch, epoch_t0, epoch_scenes, validated)
            if int(self.state.step) >= self.max_iteration:
                break

    def _write_epoch_stats(self, epoch: int, epoch_t0: float,
                           scenes: int, validated) -> None:
        """Append one epoch's telemetry to <exp_dir>/epoch_stats.jsonl:
        wall time, train scenes/s, peak host RSS, device HBM in use —
        the per-epoch record a long soak (tools/soak.py, SOAK_r05.json)
        and any production babysitter reads.  Telemetry must never kill
        the run: failures degrade to missing fields."""
        import json as _json
        import resource

        wall = time.perf_counter() - epoch_t0
        row = {"epoch": epoch, "step": int(self.state.step),
               "scenes": int(scenes), "wall_s": round(wall, 2),
               "scenes_per_sec": round(scenes / max(wall, 1e-9), 1),
               "peak_rss_mb": round(resource.getrusage(
                   resource.RUSAGE_SELF).ru_maxrss / 1024, 1)}
        try:
            ms = jax.local_devices()[0].memory_stats()
            if ms:
                row["hbm_in_use_mb"] = round(
                    ms.get("bytes_in_use", 0) / 1e6, 1)
                row["hbm_peak_mb"] = round(
                    ms.get("peak_bytes_in_use", 0) / 1e6, 1)
        except Exception:
            pass
        if validated:
            row.update(validated)
        try:
            with open(os.path.join(self.exp_dir, "epoch_stats.jsonl"),
                      "a") as f:
                f.write(_json.dumps(row) + "\n")
        except OSError:
            pass

    # ------------------------------------------------------------------ serve
    def serve(self, host: str = "127.0.0.1", port: int = 8764,
              max_batch: int = 32, deadline_ms: float = 5.0):
        """Build the deployment frontend: micro-batching BatchedServer +
        HTTP transport (vlsat_tpu/serving.py), honoring EVAL_3D_ONLY like
        validation() does.  Returns an un-started HTTPFrontend; call
        ``.serve_forever()`` (CLI) or use it as a context manager (tests).
        """
        assert self.state is not None, "call load() first"
        from vlsat_tpu.models import MMGNet as _MMGNet
        from vlsat_tpu.serving import BatchedServer, HTTPFrontend

        b3d = bool(self.cfg.get("EVAL_3D_ONLY", False)) and isinstance(
            self.model, _MMGNet)
        eval_fn = make_eval_step(self.model, branch_3d_only=b3d)
        server = BatchedServer(
            eval_fn, self.state.params, self.state.batch_stats,
            max_batch=max_batch, deadline_ms=deadline_ms,
            buckets=tuple(self.cfg.dataset.node_buckets),
            feat_dim=self.cfg.MODEL.clip_feat_dim,
            num_rel_classes=self.num_rel)
        return HTTPFrontend(server, host=host, port=port)

    # ------------------------------------------------------------------- eval
    def validation(self, save: bool = False, with_scores: bool = False,
                   batch_size: Optional[int] = None) -> dict:
        """Reference protocol is batch_size=1 (model.py:186); larger batches
        give identical metrics (masks keep scenes independent) at much
        higher throughput — set EVAL_BATCH_SIZE in the config."""
        assert self.state is not None, "call load() first"
        # EVAL_3D_ONLY: serving mode for MMGNet-class models — 3D branch
        # alone (bit-identical 3D outputs, ~2x throughput); 2D metric
        # families are then absent from the result
        from vlsat_tpu.models import MMGNet as _MMGNet

        b3d = bool(self.cfg.get("EVAL_3D_ONLY", False)) and isinstance(
            self.model, _MMGNet)
        eval_fn = make_eval_step(self.model, branch_3d_only=b3d)
        bs = batch_size or self._eval_bs()
        packed = self._packed("validation")
        if packed is not None:
            loader = self._eval_loader(packed, bs)
        else:
            loader = SceneLoader(self.valid_scenes,
                                 batch_size=bs if isinstance(bs, int) else 1,
                                 shuffle=False,
                                 buckets=self.cfg.dataset.node_buckets)
        if self.mesh is not None and not getattr(loader, "mesh_sharded", False):
            # data-parallel eval: pad ragged batches with masked scenes
            # (skipped by the engine) and shard over the mesh
            # (ResidentShardedEval batches are already mesh-sharded)
            from vlsat_tpu.parallel import shard_eval_batches

            loader = shard_eval_batches(loader, self.mesh)
        save_dir = os.path.join(self.cfg.PATH, "results", self.cfg.NAME,
                                self.cfg.get("exp", "default")) if save else None
        metrics = evaluate(
            eval_fn, self.state.params, self.state.batch_stats, loader,
            num_rel_classes=self.num_rel,
            train_triplet_vocab=self.train_triplet_vocab,
            save_dir=save_dir, with_scores=with_scores,
            total=len(self.valid_scenes),
            multi_rel=self.cfg.MODEL.multi_rel_outputs,
            # in21k process_val2/3 protocol (scene-level R@K / mR@K)
            scene_recall=bool(self.cfg.get("SCENE_RECALL", False)),
        )
        for k, v in metrics.items():
            print(f"Eval: {k}: {v}")
        return metrics
