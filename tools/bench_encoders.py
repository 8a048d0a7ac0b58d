"""Encoder-only throughput (BASELINE.json config #2).

Measures the PointNet object encoder (3->64->128->768 over 128-pt
instances) and the edge-descriptor relation encoders (11->512) batched
over a full 3DSSG-validation-sized split (548 scan-splits, ~9 instances
each), XLA vs the fused Pallas kernel.

Usage: python tools/bench_encoders.py [--scenes 548] [--nodes 9]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=548)
    p.add_argument("--nodes", type=int, default=9)
    p.add_argument("--points", type=int, default=128)
    args = p.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlsat_tpu.ops.pointnet import pointnet_encode
    from vlsat_tpu.ops.pallas.pointnet_kernel import pointnet_encode_fused
    from vlsat_tpu.ops.descriptor import edge_descriptor, gen_descriptor
    from vlsat_tpu.scene import full_edge_index

    rng = np.random.RandomState(0)
    m = args.scenes * args.nodes
    pts = jnp.asarray(rng.randn(m, args.points, 3).astype(np.float32))
    dims = [(3, 64), (64, 128), (128, 768)]
    ws = [jnp.asarray(rng.randn(a, b).astype(np.float32) * 0.1) for a, b in dims]
    bs = [jnp.zeros(b) for _, b in dims]

    # Device-true timing: carry-chained lax.scan (see PERFORMANCE.md — a
    # python dispatch loop measures the tunnel's enqueue rate instead).
    def bench(fn, x, n_lo=4, n_hi=24):
        @partial(jax.jit, static_argnames=("n",))
        def many(x, n):
            def body(c, _):
                out = fn(x + c * 1e-30)
                return c + out.sum() * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        def timed(n):
            float(np.asarray(many(x, n)))
            t0 = time.perf_counter()
            float(np.asarray(many(x, n)))
            return time.perf_counter() - t0

        return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)

    t_xla = bench(lambda p: pointnet_encode(p, ws, bs), pts)
    t_pl = bench(lambda p: pointnet_encode_fused(p, ws, bs), pts)
    print(f"object encoder over {args.scenes} scenes x {args.nodes} nodes "
          f"({m} instances x {args.points} pts):")
    print(f"  XLA   : {t_xla * 1e3:7.3f} ms  ({args.scenes / t_xla:9.0f} scenes/s)")
    print(f"  Pallas: {t_pl * 1e3:7.3f} ms  ({args.scenes / t_pl:9.0f} scenes/s)")

    # relation encoder: edge descriptors through the 11->512 MLP
    n = args.nodes
    desc = gen_descriptor(pts.reshape(args.scenes, n, args.points, 3))
    ei = jnp.asarray(np.broadcast_to(full_edge_index(n)[None],
                                     (args.scenes, n * (n - 1), 2)).copy())
    dims_r = [(11, 64), (64, 128), (128, 512)]
    ws_r = [jnp.asarray(rng.randn(a, b).astype(np.float32) * 0.1) for a, b in dims_r]
    bs_r = [jnp.zeros(b) for _, b in dims_r]

    def rel_encode(d):
        ed = edge_descriptor(d, ei)
        return pointnet_encode(ed[..., None, :], ws_r, bs_r)

    t_rel = bench(rel_encode, desc)
    e_total = args.scenes * n * (n - 1)
    print(f"relation encoder over {e_total} edges: {t_rel * 1e3:7.3f} ms "
          f"({args.scenes / t_rel:9.0f} scenes/s)")


if __name__ == "__main__":
    main()
