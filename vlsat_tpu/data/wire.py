"""Wire format for host->device SceneBatch transport.

Round-4 finding (VERDICT): the streaming eval path collapses 4x under a
slow host<->device link (297 scenes/s at 29 MB/s vs 1,202 at 117 MB/s)
because each 32-scene batch ships ~2.7 MB of float32 payload — the H2D
double buffer hides latency, not bandwidth.  The payload is dominated by
three fields whose full f32 precision the wire does not need:

  obj_points   (B, N, P, 3) f32  zero-meaned metre-scale coordinates —
                                 f16 keeps ~3 decimal digits (~0.5 mm at
                                 room scale, far below the 128-point
                                 sampling noise)
  obj_2d_feats (B, N, 512)  f32  CLIP features, unit-norm scale
  gt_rels      (B, E, R)    f32  multi-hot {0,1} labels — uint8 is a
                                 LOSSLESS 4x cut

``encode_wire`` casts these on the host before the transfer;
``decode_wire`` restores float32 INSIDE the consuming jit (zero extra
dispatches, and XLA fuses the widening cast into the first consumer).
Decoding an already-f32 batch is the identity, so every device-side
consumer (eval engine pack, eval step, train step) decodes
unconditionally and the bit-exact f32 path stays available by simply not
encoding (``VLSAT_WIRE_DTYPE=float32``).

Exactness: gt_rels round-trips bit-exactly (encode_wire verifies the
values are integral 0..255 and falls back to f32 otherwise).  The f16
point/feature cast perturbs model inputs by <= 2^-11 relative; the
metric-equality gate (tests/test_wire.py) asserts the full eval metric
suite is UNCHANGED on the synthetic split vs the f32 wire.  Rank metrics
are discrete, so equality holds unless a logit tie sits within the cast
noise — for a bit-exactness guarantee on other data, set
VLSAT_WIRE_DTYPE=float32.

The resident loaders never touch this module: their splits ship to HBM
once at f32 and dispatch only indices (data/resident.py).
"""

from __future__ import annotations

import os

import numpy as np

from vlsat_tpu.scene import SceneBatch

# fields narrowed to the wire float dtype (metre-scale or unit-scale
# values; descriptor stays f32 — 11 floats/node is noise in the payload
# and its volume/length channels have wide dynamic range)
_CAST_FIELDS = ("obj_points", "obj_2d_feats", "rel_text_feat", "rel_points")


def wire_dtype(default: str = "float16") -> str:
    """Wire float dtype: VLSAT_WIRE_DTYPE in {float16, bfloat16, float32};
    float32 = bit-exact passthrough."""
    return os.environ.get("VLSAT_WIRE_DTYPE", default)


def encode_wire(batch: SceneBatch, dtype: str | None = None) -> SceneBatch:
    """Narrow a HOST SceneBatch for transport (NumPy casts, ~1 ms/batch).

    float32 (or an unrecognized dtype) returns the batch unchanged.
    """
    dtype = dtype or wire_dtype()
    if dtype not in ("float16", "bfloat16"):
        return batch
    if dtype == "bfloat16":
        # NumPy has no native bfloat16; ml_dtypes ships with jax
        import ml_dtypes

        wdt = np.dtype(ml_dtypes.bfloat16)
    else:
        wdt = np.dtype(np.float16)
    kw = {}
    for f in _CAST_FIELDS:
        v = getattr(batch, f)
        if v is not None and v.dtype == np.float32:
            kw[f] = np.asarray(v).astype(wdt)
    gr = np.asarray(batch.gt_rels)
    if gr.dtype == np.float32:
        # lossless only for integral multi-hot labels; anything else
        # (soft labels) keeps f32
        if gr.size == 0 or (np.all(gr == np.floor(gr)) and gr.min() >= 0
                            and gr.max() <= 255):
            kw["gt_rels"] = gr.astype(np.uint8)
    return batch.replace(**kw) if kw else batch


def decode_wire(batch: SceneBatch) -> SceneBatch:
    """Restore float32 INSIDE a jit (trace-time: identity for f32 input,
    so f32 callers compile the exact round-4 program)."""
    import jax.numpy as jnp

    kw = {}
    for f in _CAST_FIELDS:
        v = getattr(batch, f)
        if v is not None and v.dtype in (jnp.float16, jnp.bfloat16):
            kw[f] = v.astype(jnp.float32)
    if batch.gt_rels is not None and batch.gt_rels.dtype == jnp.uint8:
        kw["gt_rels"] = batch.gt_rels.astype(jnp.float32)
    return batch.replace(**kw) if kw else batch


def wire_nbytes(batch: SceneBatch, dtype: str | None = None) -> int:
    """Bytes a batch occupies on the wire under ``dtype`` (for the bench
    link-cost models) without materializing the cast."""
    dtype = dtype or wire_dtype()
    import jax

    total = 0
    names = {f: getattr(batch, f) for f in _CAST_FIELDS}
    cast_ids = {id(v) for v in names.values() if v is not None}
    gr = batch.gt_rels
    for leaf in jax.tree_util.tree_leaves(batch):
        n = leaf.nbytes
        if dtype in ("float16", "bfloat16"):
            if id(leaf) in cast_ids and leaf.dtype == np.float32:
                n //= 2
            elif leaf is gr and leaf.dtype == np.float32:
                n //= 4
        total += n
    return int(total)
