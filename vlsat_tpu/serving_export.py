"""Ahead-of-time serving artifacts: serialized compiled eval programs.

The reference's only deployment artifact is a directory of ``.pth`` module
checkpoints that require the full Python model source (and its CUDA stack)
to run (src/model/model_utils/model_base.py:47-129).  The TPU-native
deployment story is stronger: ``jax.export`` serializes the *lowered,
shape-specialized eval program* — parameters baked in as constants — into
a self-contained artifact that any JAX runtime can execute WITHOUT the
model source, flax, or the checkpoint machinery (and with jax.export's
cross-version calling-convention compatibility guarantees).

An artifact directory holds one serialized program per node bucket plus a
``manifest.json`` describing the exact serving contract (batch size,
buckets, point/feature dims, output names, platforms).  The loader
returns a drop-in ``eval_step`` for :class:`vlsat_tpu.serving.BatchedServer`,
so the serving loop is identical whether it runs the live model or the
frozen artifact (parity gated in tests/test_serving_export.py).

Portability note: multi-platform exports (``platforms=("cpu", "tpu")``)
require the traced program to avoid platform-specific custom calls — set
``VLSAT_DISABLE_PALLAS=1`` (before first trace) so the segment-max routes
through plain XLA; single-platform TPU exports may keep the Pallas kernel.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

MANIFEST_NAME = "manifest.json"
_FORMAT_VERSION = 1
_OUT_KEYS = ("obj_logits_3d", "rel_cls_3d", "obj_logits_2d", "rel_cls_2d")


def _serving_fn(model, params, batch_stats, num_rel_classes: int,
                branch_3d_only: bool):
    """Eval forward over the serving inputs only (no GT fields).

    GT class/relation tensors exist on :class:`SceneBatch` for training and
    metric evaluation; the eval forward never reads them, so the exported
    calling convention carries just the six serving arrays.
    """
    import jax.numpy as jnp

    from vlsat_tpu.scene import SceneBatch

    kwargs = {"branch_3d_only": True} if branch_3d_only else {}

    def fn(obj_points, obj_mask, descriptor, obj_2d_feats, edge_index,
           edge_mask):
        b, n = obj_mask.shape
        e = edge_mask.shape[1]
        batch = SceneBatch(
            obj_points=obj_points,
            obj_mask=obj_mask,
            descriptor=descriptor,
            obj_2d_feats=obj_2d_feats,
            gt_class=jnp.zeros((b, n), jnp.int32),
            edge_index=edge_index,
            edge_mask=edge_mask,
            gt_rels=jnp.zeros((b, e, num_rel_classes), jnp.float32),
        )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            istrain=False, **kwargs)
        return {k: out[k] for k in _OUT_KEYS if out.get(k) is not None}

    return fn


def export_serving_artifact(
    model,
    params,
    batch_stats,
    out_dir: str,
    *,
    buckets: Sequence[int] = (8, 16),
    max_batch: int = 32,
    num_points: int = 128,
    point_dim: int = 3,
    feat_dim: int = 512,
    branch_3d_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> Dict:
    """Serialize the compiled eval program per bucket; returns the manifest.

    ``platforms=None`` exports for the current default backend only; pass
    e.g. ``("cpu", "tpu")`` for a portable artifact (see module docstring
    about the Pallas kill switch).
    """
    import jax
    from jax import export as jexport

    num_rel = int(model.cfg.num_rel_classes)
    fn = _serving_fn(model, params, batch_stats, num_rel, branch_3d_only)
    plats = tuple(platforms) if platforms else (jax.default_backend(),)

    os.makedirs(out_dir, exist_ok=True)
    entries = {}
    out_keys: Tuple[str, ...] = ()
    for bucket in sorted(set(int(b) for b in buckets)):
        e = bucket * (bucket - 1)
        sds = jax.ShapeDtypeStruct
        args = (
            sds((max_batch, bucket, num_points, point_dim), np.float32),
            sds((max_batch, bucket), np.bool_),
            sds((max_batch, bucket, 11), np.float32),
            sds((max_batch, bucket, feat_dim), np.float32),
            sds((max_batch, e, 2), np.int32),
            sds((max_batch, e), np.bool_),
        )
        exp = jexport.export(jax.jit(fn), platforms=plats)(*args)
        out_keys = tuple(exp.out_tree.unflatten(
            [None] * exp.out_tree.num_leaves).keys())
        fname = f"bucket_{bucket}.jaxexp"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        entries[str(bucket)] = {"file": fname, "num_edges": e}

    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(plats),
        "max_batch": max_batch,
        "num_points": num_points,
        "point_dim": point_dim,
        "feat_dim": feat_dim,
        "num_rel_classes": num_rel,
        "branch_3d_only": branch_3d_only,
        "outputs": list(out_keys),
        "buckets": entries,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


class ExportedEvalStep:
    """A loaded serving artifact, callable with the ``eval_step`` signature.

    ``(params, batch_stats, batch) -> {output name: array}`` — the first
    two arguments are ignored (parameters are baked into the program), so
    instances drop straight into :class:`vlsat_tpu.serving.BatchedServer`
    and :func:`vlsat_tpu.eval.engine.evaluate`-style callers.
    """

    def __init__(self, manifest: Dict, modules: Dict[int, object],
                 path: str):
        self.manifest = manifest
        self.path = path
        self._modules = modules

    @property
    def buckets(self) -> Tuple[int, ...]:
        return tuple(sorted(self._modules))

    def __call__(self, params, batch_stats, batch) -> Dict:
        m = self.manifest
        b, n = batch.obj_mask.shape
        mod = self._modules.get(int(n))
        if mod is None:
            raise ValueError(
                f"no exported program for bucket {n}; artifact at "
                f"{self.path} has buckets {self.buckets}")
        if b != m["max_batch"]:
            raise ValueError(
                f"artifact compiled for batch {m['max_batch']}, got {b} "
                "(BatchedServer(pad_to_max=True) pads every dispatch)")
        p = batch.obj_points.shape[2]
        if p != m["num_points"] or batch.obj_points.shape[3] != m["point_dim"]:
            raise ValueError(
                f"artifact expects ({m['num_points']}, {m['point_dim']}) "
                f"points/channels, got {tuple(batch.obj_points.shape[2:])}")
        # hand the leaves to the jitted wrapper AS THEY ARE — host f16/u8
        # wire batches (serving ingest, data/wire.py) ship their narrow
        # payload and widen ON DEVICE inside the wrapper, and device-array
        # callers (eval engine parity paths) dispatch directly.  The
        # previous np.asarray(..., f32) coercions here fetched device
        # arrays D2H (a full round trip per dispatch, re-uploaded right
        # after) and widened wire batches on the single host core — the
        # round-4 "AOT 2x under-load deficit" was largely this call-path
        # conversion work serializing with the client threads.
        out = mod(batch.obj_points, batch.obj_mask, batch.descriptor,
                  batch.obj_2d_feats, batch.edge_index, batch.edge_mask)
        return dict(out)


def load_serving_artifact(path: str) -> ExportedEvalStep:
    from jax import export as jexport

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format {manifest.get('format_version')} "
            f"(loader supports {_FORMAT_VERSION})")
    import jax

    import jax.numpy as jnp

    def make_entry(exp):
        # jit the exported call ONCE per bucket: Exported.call rebuilds
        # its call graph on every invocation, which measured ~4x slower
        # than the live jitted server under load (PERFORMANCE.md round-4
        # serving table); a stable jitted callable hits jax's C++
        # dispatch fast path on every repeat dispatch.  The wrapper casts
        # INSIDE the jit so f16/u8 wire-format inputs (data/wire.py) ship
        # their narrow H2D payload and widen on device — for f32 callers
        # the casts trace to the identity.  Distinct input dtype combos
        # (f16 wire vs f32) compile once each.
        call = exp.call

        @jax.jit
        def entry(op, om, de, o2, ei, em):
            return call(op.astype(jnp.float32), om.astype(jnp.bool_),
                        de.astype(jnp.float32), o2.astype(jnp.float32),
                        ei.astype(jnp.int32), em.astype(jnp.bool_))

        return entry

    modules = {}
    for bucket, entry in manifest["buckets"].items():
        with open(os.path.join(path, entry["file"]), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        modules[int(bucket)] = make_entry(exp)
    return ExportedEvalStep(manifest, modules, path)
