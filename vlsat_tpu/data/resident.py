"""Device-resident packed splits: the zero-transfer input pipeline.

A packed split (data/packed.py) is already padded, collated, and — after
text-target deduplication — small: a 3DSSG-scale training split is tens of
MB of tensors, i.e. well under 1% of one TPU chip's HBM.  Instead of
streaming K-batch groups host->device every dispatch (each group pays the
host->device link once per leaf plus payload — through a remote tunnel
that measured ~200 ms per 256-scene group, more than the 105 ms of compute
it feeds), ship every (bucket, field) tensor to the device ONCE and gather
minibatches BY INDEX inside the jitted multi-step.  A training dispatch
then carries a (K*B,) int32 permutation — a few KB — and the device-side
row gather of one minibatch is microseconds.

This is the TPU-native answer to the reference's DataLoader worker pool
(src/dataset/DataLoader.py:25-38): rather than hiding per-item host work
behind more host processes, there is no per-step host work at all.

Epoch shuffling semantics match PackedLoader exactly: permute scene rows
within each bucket, emit fixed-size groups, drop trailing partials
(drop_last), and cycle pack variants per epoch.  Use ``nbytes()`` to
budget HBM; fall back to the streaming PackedLoader for packs that do not
fit (the runner's TRAIN_RESIDENT="auto" does this).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from vlsat_tpu.data.packed import PackedScenes
from vlsat_tpu.scene import SceneBatch


def split_nbytes(packed: PackedScenes, variant: int = 0) -> int:
    """Total bytes of one variant's tensors (HBM budget for residency)."""
    total = 0
    for b in packed.buckets:
        for f in packed.fields(b):
            total += packed.array(b, f, variant).nbytes
    return total


class ResidentScenes:
    """One pack variant resident on the default device.

    ``full_batch(bucket)`` returns a SceneBatch whose leaves are device
    arrays with a leading scene axis (count(bucket), ...) — close over it
    in a jit and gather rows by index (train/step.py
    ``make_resident_multi_train_step``).
    """

    def __init__(self, packed: PackedScenes, variant: int = 0):
        import jax
        import jax.numpy as jnp

        self.packed = packed
        self.variant = variant
        self.text_table = packed.text_table
        self._full: Dict[int, SceneBatch] = {}
        for b in packed.buckets:
            host = packed.batch(b, slice(None), variant)
            self._full[b] = jax.tree_util.tree_map(jnp.asarray, host)

    @property
    def buckets(self):
        return self.packed.buckets

    def count(self, bucket: int) -> int:
        return self.packed.count(bucket)

    def full_batch(self, bucket: int) -> SceneBatch:
        return self._full[bucket]

    def host_batch(self, bucket: int, idx) -> SceneBatch:
        """Host-side (mmap) view of the same rows — for eval assembly."""
        return self.packed.batch(bucket, idx, self.variant)


class ResidentEvalLoader:
    """Sequential eval batches as (host, device) SceneBatch pairs.

    ``evaluate()`` dispatches the fused program on the DEVICE half — the
    minibatch is gathered by index from the resident copy, so the dispatch
    carries no per-batch host->device payload (a streamed 32-scene eval
    batch is ~2.7 MB; through a remote-TPU tunnel that is ~20 ms of link
    time per batch on the critical path) — and assembles metrics from the
    HOST half (mmap views of the same rows; reading batch fields off
    device arrays would pay a device->host round trip per leaf).

    Iteration order matches ``PackedLoader(shuffle=False)`` exactly:
    buckets ascending, contiguous slices, trailing partial batch kept
    (eval covers every scene; each distinct tail size compiles once).

    ``batch_size`` is an int or a {bucket: B} mapping
    (data/bucket_batch.py) — eval metrics are batch-size independent, so
    per-bucket throughput-best sizes are free.
    """

    def __init__(self, resident: ResidentScenes, batch_size):
        self.resident = resident
        self.batch_size = batch_size

    def _bs(self, bucket: int) -> int:
        from vlsat_tpu.data.bucket_batch import resolve_batch

        return resolve_batch(self.batch_size, bucket)

    @property
    def max_gt(self) -> int:
        """Eval-engine GT-slot cap (see PackedScenes.max_gt)."""
        return self.resident.packed.max_gt

    def __len__(self) -> int:
        return sum(-(-self.resident.count(b) // self._bs(b))
                   for b in self.resident.buckets)

    def __iter__(self):
        import jax
        import jax.numpy as jnp

        gather = jax.jit(lambda full, idx: jax.tree_util.tree_map(
            lambda a: jnp.take(a, idx, axis=0), full))
        for b in self.resident.buckets:
            c = self.resident.count(b)
            bs = self._bs(b)
            full = self.resident.full_batch(b)
            for start in range(0, c, bs):
                stop = min(start + bs, c)
                host = self.resident.host_batch(b, slice(start, stop))
                dev = gather(full, jnp.arange(start, stop, dtype=jnp.int32))
                yield host, dev


class ResidentGroupedEval:
    """K eval batches per dispatch over the resident split.

    Through a remote-TPU tunnel every fused eval dispatch's OUTPUT fetch
    pays a full link round trip (~30 ms here) on top of ~1.5 MB of packed
    rank bytes per 32-scene batch — with per-batch dispatches the link
    LATENCY, not bandwidth, bounds the metric engine (PERFORMANCE.md
    round 3).  This loader scans K batches inside ONE jitted dispatch
    (eval/engine.py ``_get_fused_grouped``): the device gathers each
    minibatch by index from the resident bucket, stacks the packed rank
    vectors to (K, n), and the host fetches once per K batches.

    Yields ``(hosts, full, idx)`` items (``grouped = True`` tells
    ``evaluate()`` to take this path): ``hosts`` is a list of <= K host
    SceneBatches off the pack's mmap, each padded to ``batch_size`` with
    fully-masked scenes; ``full`` is the bucket's resident device batch;
    ``idx`` is (K, batch_size) int32 scene rows.  Tail rows clamp to the
    last scene and tail groups repeat the last batch — their device
    outputs are computed but never assembled (eval mode has no cross-scene
    coupling: BN uses running stats, attention is scene-masked), so
    metrics match the per-batch loaders exactly (tests/test_resident.py).

    Batch boundaries and iteration order are identical to
    :class:`ResidentEvalLoader` at the same ``batch_size`` (which is an
    int or a per-bucket {bucket: B} mapping, data/bucket_batch.py).
    """

    grouped = True

    def __init__(self, resident: ResidentScenes, batch_size,
                 group: int = 8):
        if group < 1:
            raise ValueError(f"group must be >= 1, got {group}")
        self.resident = resident
        self.batch_size = batch_size
        self.group = int(group)

    def _bs(self, bucket: int) -> int:
        from vlsat_tpu.data.bucket_batch import resolve_batch

        return resolve_batch(self.batch_size, bucket)

    @property
    def max_gt(self) -> int:
        """Eval-engine GT-slot cap (see PackedScenes.max_gt)."""
        return self.resident.packed.max_gt

    def __len__(self) -> int:
        return sum(-(-self.resident.count(b) // self._bs(b))
                   for b in self.resident.buckets)

    def __iter__(self):
        from vlsat_tpu.scene import pad_batch_scenes

        k = self.group
        for b in self.resident.buckets:
            c = self.resident.count(b)
            bs = self._bs(b)
            full = self.resident.full_batch(b)
            starts = list(range(0, c, bs))
            for g0 in range(0, len(starts), k):
                chunk = starts[g0:g0 + k]
                hosts = [pad_batch_scenes(
                    self.resident.host_batch(b, slice(s, min(s + bs, c))), bs)
                    for s in chunk]
                idx = np.stack([
                    np.minimum(np.arange(s, s + bs), c - 1).astype(np.int32)
                    for s in chunk])
                if len(chunk) < k:  # fixed (K, B) shape: one compile
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], k - len(chunk), axis=0)])
                yield hosts, full, idx


class ResidentShardedEval:
    """Device-resident eval split for a data-parallel mesh.

    Multi-chip analog of :class:`ResidentEvalLoader`.  A scene-axis
    sharding of the flat split would put each CONTIGUOUS eval batch on one
    device (blockwise shards), serializing the mesh — so the split is
    stored BATCH-STRUCTURED instead: per bucket, batches are padded to a
    fixed ``batch_size`` (tail filled with fully-masked scenes, which the
    metric engine skips) and stacked to ``(num_batches, batch_size, ...)``
    leaves placed ONCE with ``P(None, 'data')`` — the batch axis is
    unsharded, scenes within each batch spread over the mesh.  Selecting
    batch k is then a shard-local slice: every eval dispatch carries only
    the int32 batch id, no H2D payload and no cross-device gathers.

    Yields (host, device) SceneBatch pairs like ResidentEvalLoader; the
    host half is the same padded rows off the pack's mmap, so
    ``evaluate()``'s metric assembly is unchanged.  ``batch_size`` must
    divide by the mesh axis size (the runner falls back to the streaming
    ``shard_eval_batches`` path otherwise).
    """

    mesh_sharded = True  # runner/val paths skip shard_eval_batches

    def __init__(self, packed: PackedScenes, mesh, batch_size,
                 axis: str = "data", variant: int = 0, group: int = 1):
        """``group`` > 1 scans K batches per dispatch (one output fetch
        per group, like ResidentGroupedEval): items become (hosts,
        stacked split, (K,) int32 batch ids) and each scan step takes a
        shard-local batch slice, so the grouped dispatch stays
        data-parallel with no cross-device gathers.  Tail groups repeat
        the last batch id; repeats are never assembled.

        ``batch_size`` is an int or a per-bucket {bucket: B} mapping
        (data/bucket_batch.py); every resolved size must divide over the
        mesh axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vlsat_tpu.data.bucket_batch import resolve_batch
        from vlsat_tpu.scene import pad_batch_scenes

        n_dev = mesh.shape[axis]
        for b in packed.buckets:
            if resolve_batch(batch_size, b) % n_dev:
                raise ValueError(
                    f"batch_size {resolve_batch(batch_size, b)} (bucket "
                    f"{b}) does not divide over {n_dev} devices on mesh "
                    f"axis {axis!r}")
        if group < 1:
            raise ValueError(f"group must be >= 1, got {group}")
        self.packed = packed
        self.batch_size = batch_size
        self.variant = variant
        self.group = int(group)
        self.grouped = self.group > 1  # evaluate() takes the grouped path
        sharding = NamedSharding(mesh, P(None, axis))
        self._take = jax.jit(
            lambda full, k: jax.tree_util.tree_map(lambda a: a[k], full))
        self._hosts: Dict[int, list] = {}
        self._stacks: Dict[int, SceneBatch] = {}
        for b in packed.buckets:
            c = packed.count(b)
            bs = resolve_batch(batch_size, b)
            hosts = []
            for start in range(0, c, bs):
                hb = packed.batch(
                    b, slice(start, min(start + bs, c)), variant)
                hosts.append(pad_batch_scenes(hb, bs))
            self._hosts[b] = hosts
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *hosts)
            self._stacks[b] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), stacked)

    @property
    def max_gt(self) -> int:
        """Eval-engine GT-slot cap (see PackedScenes.max_gt)."""
        return self.packed.max_gt

    def __len__(self) -> int:
        return sum(len(v) for v in self._hosts.values())

    def __iter__(self):
        import jax.numpy as jnp

        for b in sorted(self._hosts):
            full = self._stacks[b]
            hosts_b = self._hosts[b]
            if not self.grouped:
                for k, host in enumerate(hosts_b):
                    yield host, self._take(full, jnp.int32(k))
                continue
            for g0 in range(0, len(hosts_b), self.group):
                hosts = hosts_b[g0:g0 + self.group]
                ids = np.arange(g0, g0 + len(hosts), dtype=np.int32)
                if len(hosts) < self.group:  # fixed (K,) shape: one compile
                    ids = np.concatenate(
                        [ids, np.full(self.group - len(hosts), ids[-1],
                                      np.int32)])
                yield hosts, full, ids


def epoch_permutations(
    counts: Dict[int, int],
    group: int,
    epoch: int,
    seed: int = 2020,
    shuffle: bool = True,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (bucket, perm) index groups for one epoch.

    ``group`` = scenes per dispatch (K*B for the resident multi-step).
    Permutes within each bucket with the same RandomState stream the
    streaming PackedLoader uses (seed + epoch), emits fixed-size groups,
    drops trailing partials (drop_last semantics: a smaller group would
    trigger a fresh compile).
    """
    rng = np.random.RandomState(seed + epoch)
    for b in sorted(counts):
        c = counts[b]
        order = (rng.permutation(c) if shuffle
                 else np.arange(c)).astype(np.int32)
        for start in range(0, c - group + 1, group):
            yield b, order[start:start + group]
