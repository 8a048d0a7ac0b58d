"""Benchmark: flagship MMG-Net eval throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full dual-branch MMG-Net (160 obj / 26 rel classes, 128 points
per instance) evaluating batches of 32 synthetic 3DSSG-like scenes padded
to the 16-node bucket (240 directed edges/scene) — the shape profile of
the 3DSSG validation split.  ``vs_baseline`` compares against the
PyTorch-CPU equivalent on the SAME 32-scene workload
(tools/bench_torch_baseline.py -> bench_baseline.json).
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.step import make_eval_step

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
    eval_step = make_eval_step(model)

    # warmup / compile
    out = eval_step(params, batch_stats, batch)
    jax.block_until_ready(out)

    from vlsat_tpu.utils.profiling import trace

    iters = 30
    with trace():  # set VLSAT_PROFILE_DIR to capture a kernel timeline
        t0 = time.perf_counter()
        for _ in range(iters):
            out = eval_step(params, batch_stats, batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    scenes_per_sec = batch_scenes * iters / dt

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
