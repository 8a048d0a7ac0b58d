"""Benchmark: flagship MMG-Net eval throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full dual-branch MMG-Net (160 obj / 26 rel classes, 128 points
per instance) evaluating batches of 32 synthetic 3DSSG-like scenes padded
to the 16-node bucket (240 directed edges/scene) — the shape profile of
the 3DSSG validation split.  ``vs_baseline`` compares against the
PyTorch-CPU equivalent on the SAME 32-scene workload
(tools/bench_torch_baseline.py -> bench_baseline.json).

Measurement method: N eval iterations inside ONE jitted lax.scan whose
body depends on the loop carry (defeating loop-invariant hoisting), timed
across two N values with a host fetch forcing full synchronization —
per-iteration time is the slope.  A naive python dispatch loop measures
the host/tunnel enqueue rate instead of device throughput on remote-TPU
setups (block_until_ready can acknowledge before execution completes), and
without the carry dependence XLA hoists the whole body out of the loop.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: a warm run takes ~55 s instead of ~225 s
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vlsat_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    node_counts = (9, 11, 12, 13, 14, 15, 16, 10) * 4
    batch_scenes = len(node_counts)
    batch = make_batch(seed=0, node_counts=node_counts, num_points=128, bucket=16)

    model = MMGNet(cfg=MMGNetConfig())
    # init on a tiny batch — parameter shapes are batch-independent and this
    # avoids compiling the full-size train-mode graph just for init
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @partial(jax.jit, static_argnames=("n",))
    def eval_many(params, batch_stats, batch, n):
        def body(carry, _):
            perturbed = batch.replace(obj_points=batch.obj_points + carry * 1e-30)
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              perturbed, istrain=False)
            return carry + out["obj_logits_3d"].sum() * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    from vlsat_tpu.utils.profiling import trace

    def timed(n):
        float(np.asarray(eval_many(params, batch_stats, batch, n)))  # compile+warm
        t0 = time.perf_counter()
        float(np.asarray(eval_many(params, batch_stats, batch, n)))  # full sync
        return time.perf_counter() - t0

    with trace():  # set VLSAT_PROFILE_DIR to capture a kernel timeline
        n_lo, n_hi = 8, 40
        t_lo = timed(n_lo)
        t_hi = timed(n_hi)
    per_batch = (t_hi - t_lo) / (n_hi - n_lo)
    scenes_per_sec = batch_scenes / per_batch

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("torch_cpu_scenes_per_sec")

    vs = scenes_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "mmgnet_eval_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
