"""Full-scale cold-start benchmark: pack build + epoch-0 at 3RScan scale.

Round-3 verdict: the host-pipeline study used a 40-scan split; pack-build
wall time for the real 1,177-scan train split and epoch-0 behavior at
that scale were extrapolated, not measured.  This tool synthesizes a
train split at full 3RScan scale — default 1,177 scans, each written as a
REAL binary PLY at realistic vertex counts (3RScan annotated meshes run
~100-250K vertices) — and measures every phase a user pays between
"fresh checkout + raw dataset" and "training steps flowing":

  1. ``synth_s``           — fabricating the dataset (not a cold-start
                             cost; reported for reproducibility)
  2. ``index_s``           — SSGScenes construction (JSON index + weights)
  3. ``pack_build_s``      — tools/pack_dataset path: per-scene PLY parse
                             + point sampling + descriptors + bucket pack
                             (``--workers N`` fans this over a spawn pool;
                             on this container's single core it is a wash,
                             on production hosts it scales ~linearly)
  4. ``epoch0_stream_s``   — one epoch through SceneLoader with a COLD
                             npz cache (the no-pack path's first epoch:
                             PLY parse included)
  5. ``epoch_warm_stream_s`` — the same epoch warm (npz cache populated)
  6. ``epoch_packed_s``    — one epoch through PackedLoader (mmap slices)

plus ``pack_bytes`` on disk and ``amortize_epochs`` = pack_build_s /
(epoch_warm_stream_s - epoch_packed_s): how many epochs until the pack
build has paid for itself against the best streaming alternative.

Usage:
    python tools/bench_cold_start.py [--num-scans 1177]
        [--verts-per-inst 20000] [--background-verts 30000]
        [--workers 0] [--batch-size 8] [--base DIR] [--out JSON]

Host-only measurement (JAX pinned to CPU): the phases above are input-
pipeline costs; device rates are covered by bench.py / bench_buckets.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-scans", type=int, default=1177)
    ap.add_argument("--verts-per-inst", type=int, default=20000)
    ap.add_argument("--background-verts", type=int, default=30000)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--base", type=str, default="/tmp/vlsat_coldstart")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized dataset + pack on exit")
    ap.add_argument("--skip-stream-epochs", action="store_true",
                    help="only measure pack build + packed epoch")
    args = ap.parse_args()

    from functools import partial

    from vlsat_tpu.data.dataset import SceneLoader, SSGScenes
    from vlsat_tpu.data.packed import (
        PackedLoader, PackedScenes, build_scenes, pack_scenes)
    from vlsat_tpu.data.synthetic import make_synthetic_split

    res = {"num_scans": args.num_scans,
           "verts_per_inst": args.verts_per_inst,
           "background_verts": args.background_verts,
           "workers": args.workers}

    # -- 1. synthesize the raw dataset (PLYs, no npz cache) ---------------
    # Node counts follow the 3DSSG scan-split histogram (<=9 objects per
    # split, gen_data_gt.py generate_groups); vertex counts are the knob
    # that matches 3RScan mesh scale.
    rng = np.random.RandomState(7)
    node_counts = rng.randint(5, 10, args.num_scans)
    rel_counts = np.clip(rng.poisson(17, args.num_scans), 1, 46)
    t0 = time.perf_counter()
    root, scans_root, _ = make_synthetic_split(
        args.base, num_scans=args.num_scans,
        vertices_per_inst=args.verts_per_inst,
        background_verts=args.background_verts,
        node_counts=node_counts, rel_counts=rel_counts,
        seed=11, write_ply=True)
    res["synth_s"] = round(time.perf_counter() - t0, 1)
    res["dataset_bytes"] = dir_bytes(scans_root)
    print(f"synth: {res['synth_s']}s, "
          f"{res['dataset_bytes'] / 1e9:.2f} GB of PLYs", flush=True)

    def fresh_cache(tag):
        d = os.path.join(args.base, f"cache_{tag}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        return d

    kwargs = dict(root=root, scans_root=scans_root, split="train_scans",
                  num_points=128, feat_dim=512, multi_rel=True,
                  cache_root=fresh_cache("pack"))

    # -- 2./3. index + cold pack build ------------------------------------
    t0 = time.perf_counter()
    ds = SSGScenes(**kwargs)
    res["index_s"] = round(time.perf_counter() - t0, 2)
    pack_dir = os.path.join(args.base, "packed")
    shutil.rmtree(pack_dir, ignore_errors=True)
    t0 = time.perf_counter()
    pack_scenes(ds, pack_dir, seed=2020, drop_relation_free=True,
                workers=args.workers,
                scenes_factory=partial(build_scenes, kwargs)
                if args.workers else None)
    # rates divide the UNROUNDED elapsed time: a small --num-scans smoke
    # run can round a fast phase to 0.0 s (ZeroDivisionError otherwise)
    pack_t = max(time.perf_counter() - t0, 1e-9)
    res["pack_build_s"] = round(pack_t, 1)
    res["pack_scenes_per_sec"] = round(args.num_scans / pack_t, 1)
    res["pack_bytes"] = dir_bytes(pack_dir)
    print(f"pack build: {res['pack_build_s']}s "
          f"({res['pack_scenes_per_sec']} scenes/s, workers={args.workers}), "
          f"pack {res['pack_bytes'] / 1e6:.0f} MB", flush=True)

    # -- 4./5. streaming epochs (cold npz cache, then warm) ---------------
    if not args.skip_stream_epochs:
        ds_stream = SSGScenes(**{**kwargs, "cache_root": fresh_cache("st")})
        loader = SceneLoader(ds_stream, batch_size=args.batch_size,
                             shuffle=True, seed=0, for_train=True)
        for tag in ("epoch0_stream_s", "epoch_warm_stream_s"):
            t0 = time.perf_counter()
            nb = sum(1 for _ in loader)
            ep_t = max(time.perf_counter() - t0, 1e-9)
            res[tag] = round(ep_t, 1)
            res[tag[:-2] + "_scenes_per_sec"] = round(
                args.num_scans / ep_t, 1)
            print(f"{tag}: {res[tag]}s ({nb} batches)", flush=True)

    # -- 6. packed epoch ---------------------------------------------------
    packed = PackedScenes(pack_dir)
    ploader = PackedLoader(packed, batch_size=args.batch_size,
                           shuffle=True, seed=0)
    sum(1 for _ in ploader)  # prime the mmaps / page cache
    t0 = time.perf_counter()
    nb = sum(1 for _ in ploader)
    packed_t = max(time.perf_counter() - t0, 1e-9)
    res["epoch_packed_s"] = round(packed_t, 2)
    res["epoch_packed_scenes_per_sec"] = round(
        args.num_scans / packed_t, 1)
    print(f"packed epoch: {res['epoch_packed_s']}s ({nb} batches)", flush=True)

    if "epoch_warm_stream_s" in res:
        saved = res["epoch_warm_stream_s"] - res["epoch_packed_s"]
        res["amortize_epochs"] = round(res["pack_build_s"] / saved, 2) \
            if saved > 0 else None

    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    if not args.keep:
        shutil.rmtree(args.base, ignore_errors=True)


if __name__ == "__main__":
    main()
