"""Guard the bench harness against XLA dead-code elimination.

Round-3 find: a carry-chained ``lax.scan`` defeats hoisting and call
elision, but XLA still dead-code-eliminates any model output the carry
does not consume and hoists any input the carry does not perturb — the
scanned body then executes a DIFFERENT (smaller) program than the one
being reported on.  An earlier harness consumed only ``obj_logits_3d``
and ran 78 GFLOP/iter where the real eval program is 258.7 GFLOP (B=32,
bucket 16; PERFORMANCE.md round 3, "Round-3 harness audit").

This test lowers bench.py's actual scan (``make_eval_many``) and the
standalone eval program at a small shape and asserts the compiled
per-iteration FLOPs match — so the harness can't silently regress into
measuring a dead-code-stripped program again.
"""

import jax
import pytest

import bench
from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig


def _flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


@pytest.mark.parametrize("b3d", [False, True])
def test_scan_body_flops_match_standalone_program(b3d):
    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    tiny = make_batch(seed=1, node_counts=(3,), num_points=8, bucket=4,
                      num_obj_classes=20, num_rel_classes=7)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    batch = make_batch(seed=0, node_counts=(3, 4), num_points=16, bucket=4,
                       num_obj_classes=20, num_rel_classes=7)

    eval_many = bench.make_eval_many(model)
    # XLA cost_analysis counts a scan/while body ONCE regardless of trip
    # count (the trip count may be dynamic); verify that semantic holds
    # by lowering at two lengths — the totals must match, which also
    # proves nothing is being incrementally hoisted between lengths
    scan4 = _flops(eval_many.lower(params, bstats, batch, n=4, b3d=b3d).compile())
    scan8 = _flops(eval_many.lower(params, bstats, batch, n=8, b3d=b3d).compile())
    assert abs(scan4 - scan8) <= 0.02 * scan4, (
        f"scan FLOPs scale with length ({scan4:.3e} vs {scan8:.3e}) — "
        f"counted-once body assumption broken, rethink this test")

    standalone = jax.jit(
        lambda p, bs, b: model.apply({"params": p, "batch_stats": bs},
                                     b, istrain=False, branch_3d_only=b3d))
    solo_flops = _flops(standalone.lower(params, bstats, batch).compile())

    # the body adds only the carry perturbation/accumulation (a handful
    # of elementwise adds); a body below ~95% of the standalone program
    # means XLA removed real model work from the measured loop (the
    # round-3 bug measured 30% here)
    assert scan4 >= 0.95 * solo_flops, (
        f"scan body executes {scan4:.3e} FLOP/iter vs "
        f"{solo_flops:.3e} standalone — bench harness is being "
        f"dead-code-eliminated")
    # and it shouldn't be doing significantly MORE work either
    assert scan4 <= 1.10 * solo_flops
