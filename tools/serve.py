"""Batched serving demo/benchmark: measure the micro-batching server
against the naive per-scene dispatch ceiling.

Usage:
    python tools/serve.py [--duration 5] [--clients 8] [--max-batch 32]
                          [--deadline-ms 5] [--full-branch] [--naive]

Starts a BatchedServer over a freshly initialized flagship model (swap in
a checkpoint via --ckpt for real deployments), drives it closed-loop with
synthetic 3DSSG-shaped scenes from N client threads, and prints sustained
scenes/s + latency percentiles.  ``--naive`` also measures the per-scene
dispatch loop for comparison (the ~230 calls/s tunnel ceiling,
PERFORMANCE.md "Measurement methodology").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--deadline-ms", type=float, default=5.0)
    ap.add_argument("--full-branch", action="store_true",
                    help="run the full dual-branch model instead of EVAL_3D_ONLY")
    ap.add_argument("--naive", action="store_true",
                    help="also measure the per-scene dispatch loop")
    ap.add_argument("--http", action="store_true",
                    help="also measure through the HTTP frontend (full "
                         "transport: npz encode + POST + decode)")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="orbax checkpoint directory (optional)")
    ap.add_argument("--export-artifact", type=str, default=None,
                    help="write an AOT serving artifact (jax.export, params "
                         "baked in) to this directory and exit")
    ap.add_argument("--artifact", type=str, default=None,
                    help="serve from a saved AOT artifact instead of the "
                         "live model (serving_export.py)")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep offered load (closed-loop clients 1..128) "
                         "and report the scenes/s vs p50/p99 curve, the "
                         "knee, and the deadline-bounded operating point")
    ap.add_argument("--sweep-clients", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64, 128])
    ap.add_argument("--deadline-p99-ms", type=float, default=150.0,
                    help="p99 budget that defines the deadline-bounded "
                         "operating point reported by --sweep")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result JSON to this path")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for smoke tests; "
                         "this environment's sitecustomize overrides the "
                         "JAX_PLATFORMS env var, so it must be set via "
                         "jax.config after import)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/vlsat_jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import numpy as np

    from vlsat_tpu.data.synthetic import make_batch, make_scene
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.serving import BatchedServer, bench_server
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.ckpt:
        from vlsat_tpu.train.checkpoint import CheckpointManager
        from vlsat_tpu.train.optim import make_optimizer
        from vlsat_tpu.train.state import create_train_state

        opt = make_optimizer(lr=1e-4, max_iteration=1)
        template = create_train_state(model, tiny, opt, seed=0)
        st = CheckpointManager(args.ckpt).restore(template, best=True)
        if st is not None:
            params, batch_stats = st.params, st.batch_stats

    if args.export_artifact:
        from vlsat_tpu.serving_export import export_serving_artifact

        manifest = export_serving_artifact(
            model, params, batch_stats, args.export_artifact,
            buckets=(12, 16), max_batch=args.max_batch, num_points=128,
            branch_3d_only=not args.full_branch)
        print(json.dumps({"exported": args.export_artifact,
                          "buckets": sorted(manifest["buckets"]),
                          "outputs": manifest["outputs"]}, indent=2))
        return

    server_buckets = None
    if args.artifact:
        from vlsat_tpu.serving_export import load_serving_artifact

        eval_step = load_serving_artifact(args.artifact)
        args.max_batch = eval_step.manifest["max_batch"]
        server_buckets = eval_step.buckets
    else:
        eval_step = make_eval_step(model, branch_3d_only=not args.full_branch)

    # request pool: 9-16 node scenes at production point count
    rng = np.random.RandomState(0)
    scenes = []
    for n in (9, 11, 12, 13, 14, 15, 16, 10):
        s = make_scene(rng, n, num_points=128)
        scenes.append({"obj_points": s["obj_points"],
                       "descriptor": s["descriptor"],
                       "obj_2d_feats": s["obj_2d_feats"]})

    from vlsat_tpu.scene import DEFAULT_NODE_BUCKETS

    server = BatchedServer(eval_step, params, batch_stats,
                           max_batch=args.max_batch,
                           deadline_ms=args.deadline_ms,
                           buckets=server_buckets or DEFAULT_NODE_BUCKETS)
    with server:
        # warm the compile for both buckets the pool can produce (12 and 16)
        # cold compiles of the (max_batch, bucket) programs can take
        # minutes on a loaded host — far past predict()'s default 60 s
        server.predict(scenes[0], timeout=1800)   # 9 nodes  -> bucket 12
        server.predict(scenes[6], timeout=1800)   # 16 nodes -> bucket 16
        if args.sweep:
            # latency-vs-offered-load curve (VERDICT round-5 task 5): the
            # single 64-client number is a saturation point whose p50 is
            # queueing delay, not service time.  Closed-loop client count
            # IS the offered load here; the knee is the last point whose
            # marginal throughput per added client is still >= 25% of the
            # first point's per-client throughput (past it, added load
            # only adds queueing).
            curve = []
            for c in sorted(set(args.sweep_clients)):
                r = bench_server(server, scenes, duration_s=args.duration,
                                 clients=c)
                row = {"clients": c,
                       "scenes_per_sec": round(r["scenes_per_sec"], 1),
                       "p50_latency_ms": round(r["p50_latency_ms"], 1),
                       "p99_latency_ms": round(r["p99_latency_ms"], 1),
                       "mean_batch": round(r["mean_batch_size"], 2)}
                curve.append(row)
                print(json.dumps(row), flush=True)
            per1 = curve[0]["scenes_per_sec"] / curve[0]["clients"]
            knee = curve[0]
            for prev, cur in zip(curve, curve[1:]):
                gain = (cur["scenes_per_sec"] - prev["scenes_per_sec"]) / \
                    (cur["clients"] - prev["clients"])
                if gain < 0.25 * per1:
                    break
                knee = cur
            within = [r for r in curve
                      if r["p99_latency_ms"] <= args.deadline_p99_ms]
            op = max(within, key=lambda r: r["scenes_per_sec"]) \
                if within else None
            res = {"curve": curve, "knee": knee,
                   "deadline_p99_ms": args.deadline_p99_ms,
                   "deadline_operating_point": op}
        else:
            res = bench_server(server, scenes, duration_s=args.duration,
                               clients=args.clients)
    out = {"batched": res}

    if args.http:
        # same closed-loop load, but through the HTTP transport — measures
        # the npz encode/POST/decode overhead on top of the micro-batcher
        import io
        import threading
        import urllib.request

        from vlsat_tpu.serving import BatchedServer as _BS, HTTPFrontend

        server2 = _BS(eval_step, params, batch_stats,
                      max_batch=args.max_batch, deadline_ms=args.deadline_ms,
                      buckets=server_buckets or DEFAULT_NODE_BUCKETS)
        with HTTPFrontend(server2, port=0) as fe:
            url = f"http://127.0.0.1:{fe.port}/predict"

            def post(s):
                buf = io.BytesIO()
                np.savez(buf, **s)
                req = urllib.request.Request(url, data=buf.getvalue())
                with urllib.request.urlopen(req, timeout=1800) as resp:
                    with np.load(io.BytesIO(resp.read()),
                                 allow_pickle=False) as z:
                        return {k: z[k] for k in z.files}

            post(scenes[0])  # warm both buckets
            post(scenes[6])
            lat, lock = [], threading.Lock()
            stop_t = time.monotonic() + args.duration

            def client(i):
                rng2 = np.random.RandomState(100 + i)
                local = []
                while time.monotonic() < stop_t:
                    s = scenes[int(rng2.randint(len(scenes)))]
                    t0 = time.monotonic()
                    post(s)
                    local.append(time.monotonic() - t0)
                with lock:
                    lat.extend(local)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(args.clients)]
            t0 = time.monotonic()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.monotonic() - t0
            arr = np.asarray(lat) * 1e3
            out["http"] = {
                "scenes_per_sec": len(lat) / wall,
                "p50_latency_ms": float(np.percentile(arr, 50)) if len(arr) else None,
                "p99_latency_ms": float(np.percentile(arr, 99)) if len(arr) else None,
                "mean_batch_size": (server2.stats["batch_size_sum"] /
                                    max(server2.stats["batches"], 1)),
            }

    if args.naive and args.artifact:
        print("note: --naive skipped with --artifact (the exported program "
              "is compiled for the padded max_batch shape only)")
        args.naive = False
    if args.naive:
        # per-scene dispatch loop (what a no-batching server would do)
        from vlsat_tpu.scene import collate, full_edge_index, pad_scene

        def one(s):
            n = s["obj_points"].shape[0]
            padded = pad_scene(
                s["obj_points"], s["descriptor"], s["obj_2d_feats"],
                np.zeros((n,), np.int32), full_edge_index(n),
                np.zeros((n * (n - 1), 26), np.float32), n_max=16)
            b = collate([padded])
            return np.asarray(
                eval_step(params, batch_stats, b)["obj_logits_3d"])

        one(scenes[0])  # warm
        t0 = time.perf_counter()
        k = 0
        while time.perf_counter() - t0 < args.duration:
            one(scenes[k % len(scenes)])
            k += 1
        out["naive_per_scene_dispatch"] = {
            "scenes_per_sec": k / (time.perf_counter() - t0)}

    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
