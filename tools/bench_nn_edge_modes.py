"""Device-true A/B of the nn_edge node-projection modes (models/gnn.py).

Times the FULL flagship eval step (bench.py workload) for each mode with
the carry-chained lax.scan slope methodology.  Run on the real TPU chip:

  python tools/bench_nn_edge_modes.py [train]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial


def main(with_train: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vlsat_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    node_counts = (9, 11, 12, 13, 14, 15, 16, 10) * 4
    batch = make_batch(seed=0, node_counts=node_counts, num_points=128, bucket=16)
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    train_counts = node_counts[:8]
    train_batch = make_batch(seed=3, node_counts=train_counts, num_points=128,
                             bucket=16, with_text=True)

    results = {}
    train_results = {}
    for mode in ("edge", "gather", "onehot"):
        model = MMGNet(cfg=MMGNetConfig(nn_edge_mode=mode))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tiny, istrain=True)
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

        def timed(n):
            float(np.asarray(eval_many(params, batch_stats, batch, n)))
            t0 = time.perf_counter()
            float(np.asarray(eval_many(params, batch_stats, batch, n)))
            return time.perf_counter() - t0

        per_batch = (timed(40) - timed(8)) / 32
        sps = len(node_counts) / per_batch
        results[mode] = sps
        print(f"eval {mode:>7}: {sps:10.1f} scenes/s  ({per_batch * 1e3:.3f} ms/batch)")

        if with_train:
            # full train step (fwd+loss+bwd+AdamW), same carry-chained scan
            # + per-step fold_in key as bench.py's train_many
            from vlsat_tpu.train.optim import make_optimizer
            from vlsat_tpu.train.state import create_train_state
            from vlsat_tpu.train.step import make_train_step

            opt = make_optimizer(lr=1e-4, max_iteration=1000)
            state = create_train_state(model, tiny, opt, seed=0)
            step = make_train_step(model, opt, donate=False)

            @partial(jax.jit, static_argnames=("n",))
            def train_many(state, b, n):
                def body(st, i):
                    st2, aux = step(st, b, jax.random.fold_in(jax.random.PRNGKey(0), i))
                    return st2, aux["loss"]

                _, losses = jax.lax.scan(body, state, jnp.arange(n))
                return losses[-1]

            def timed_tr(n):
                float(np.asarray(train_many(state, train_batch, n)))
                t0 = time.perf_counter()
                float(np.asarray(train_many(state, train_batch, n)))
                return time.perf_counter() - t0

            per_step = (timed_tr(32) - timed_tr(8)) / 24
            tsps = len(train_counts) / per_step
            train_results[mode] = tsps
            print(f"train {mode:>6}: {tsps:10.1f} scenes/s  ({per_step * 1e3:.3f} ms/step)")

    base = results["edge"]
    for mode, sps in results.items():
        print(f"eval {mode:>7}: {sps / base:5.3f}x vs edge")
    if train_results:
        tbase = train_results["edge"]
        for mode, sps in train_results.items():
            print(f"train {mode:>6}: {sps / tbase:5.3f}x vs edge")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main(with_train="train" in sys.argv[1:])
