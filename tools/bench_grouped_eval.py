"""A/B: per-batch resident eval vs K-batch grouped scan (ResidentGroupedEval).

Through a remote-TPU tunnel the per-batch engine pays one output-fetch
round trip (~30 ms) per 32-scene batch; the grouped loader scans K batches
in one dispatch and fetches once per group.  This measures full end-to-end
evaluate() passes (512-scene synthetic split, full metric suite) for
group sizes 1 (per-batch loader), 4, 8, 16.

Usage: python tools/bench_grouped_eval.py [--scene-recall]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
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

    from vlsat_tpu.data.packed import PackedScenes
    from vlsat_tpu.data.resident import (
        ResidentEvalLoader, ResidentGroupedEval, ResidentScenes)
    from vlsat_tpu.data.synthetic import make_batch, make_synthetic_split
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.step import make_eval_step

    scene_recall = "--scene-recall" in sys.argv

    base = os.environ.get("VLSAT_BENCH_SPLIT", "/tmp/vlsat_bench_split")
    pack_dir = os.path.join(base, "pack")
    if not os.path.exists(os.path.join(pack_dir, "manifest.json")):
        # same split recipe as bench.py (without the text table: eval only)
        from vlsat_tpu.data.dataset import SSGScenes
        from vlsat_tpu.data.packed import pack_scenes

        root, scans_root, cache_root = make_synthetic_split(
            base, num_scans=512, insts_per_scan=(13, 16),
            vertices_per_inst=600, rels_per_scan=12, seed=0)
        ds = SSGScenes(root, scans_root, "validation_scans",
                       cache_root=cache_root)
        pack_scenes(ds, pack_dir, seed=0)
    packed = PackedScenes(pack_dir)

    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    eval_fn = make_eval_step(model)
    resident = ResidentScenes(packed)

    def run(loader, reps=5):
        evaluate(eval_fn, params, bstats, loader, verbose=False,
                 scene_recall=scene_recall)  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            m = evaluate(eval_fn, params, bstats, loader, verbose=False,
                         scene_recall=scene_recall)
            ts.append(time.perf_counter() - t0)
        return len(packed) / float(np.median(ts)), m

    base_rate, base_m = run(ResidentEvalLoader(resident, 32))
    print(f"per-batch resident (B=32): {base_rate:8.1f} scenes/s")
    for g in (4, 8, 16):
        rate, m = run(ResidentGroupedEval(resident, 32, group=g))
        for k in base_m:
            np.testing.assert_array_equal(
                np.asarray(base_m[k]), np.asarray(m[k]), err_msg=k)
        print(f"grouped K={g:<2} (B=32):      {rate:8.1f} scenes/s "
              f"({rate / base_rate:.2f}x, metrics identical)")


if __name__ == "__main__":
    main()
