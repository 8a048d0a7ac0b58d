"""Per-bucket batch-size selection for the packed/resident loaders.

Round-4 finding (BUCKET_TABLE_r04 / VERDICT): the throughput-best batch
size varies strongly with the node bucket — B=64 at bucket 8 (1.06x over
B=32, 1.5x over B=16), B=8-32 elsewhere — but the loaders used ONE
config batch size for every bucket, so the production mix (buckets 8+12
after the <=9-object scan splitting, assets/3dssg) ran small buckets at
whatever ``EVAL_BATCH_SIZE`` said.

Eval batch size is pure throughput: eval has no cross-scene coupling
(BN runs on running stats, attention is scene-masked), so metrics are
bit-identical at any B (tests/test_resident.py equality gates).  The
loaders therefore accept ``batch_size`` as EITHER an int (fixed, the
round-4 behavior) or a mapping {bucket: B} resolved per bucket here.

TRAIN batch size is NOT pure throughput — it sets the gradient noise
scale and interacts with the batch-multiplicative LR schedule
(train/optim.py, reference optimizer.py) — so the runner keeps the
single ``cfg.Batch_Size`` for training by default and per-bucket train
batching stays an explicit loader-level choice.

``DEFAULT_EVAL_BATCH`` ships the winners measured on the v5e chip
(tools/bench_buckets.py, re-audited r05 table with the DCE + outlier
lints).  ``EVAL_BATCH_SIZE="auto"`` in the runner config resolves to it.
"""

from __future__ import annotations

from typing import Mapping, Union

BatchSpec = Union[int, Mapping[int, int]]

# throughput-best EVAL batch per bucket, measured on TPU v5e
# (BUCKET_TABLE_r05.json — the re-audited table: adaptive slope trip
# counts, per-cell DCE audit, outlier lint; bucket-12's round-4 B=4
# "winner" was a sub-ms-slope timing artifact).  Near-ties (bucket-8
# B=32 vs B=64 within 0.3%) pick the smaller batch.  Unlisted buckets
# resolve to the nearest larger bucket's value (smaller batches are the
# safe direction for memory as shapes grow).  All values divide over an
# 8-device mesh (ResidentShardedEval's constraint).
DEFAULT_EVAL_BATCH: Mapping[int, int] = {
    8: 32,
    12: 32,
    16: 8,
    24: 32,
    32: 8,
    48: 64,
    64: 16,
}


def resolve_batch(batch_size: BatchSpec, bucket: int) -> int:
    """Resolve a loader ``batch_size`` spec for one bucket.

    int -> itself; mapping -> exact bucket, else the value at the
    smallest mapped bucket ABOVE it (conservative for memory), else the
    largest mapped bucket's value.
    """
    if isinstance(batch_size, int):
        return batch_size
    if bucket in batch_size:
        return int(batch_size[bucket])
    above = [k for k in batch_size if k > bucket]
    key = min(above) if above else max(batch_size)
    return int(batch_size[key])
