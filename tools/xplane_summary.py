"""Summarize a jax.profiler xplane capture: top ops and category buckets.

    VLSAT_PROFILE_DIR=/tmp/prof python bench.py      # capture
    python tools/xplane_summary.py /tmp/prof [--iters 20] [--top 25]

Parses ``vm.xplane.pb`` directly with the TSL protobuf (the
tensorboard-plugin-profile conversion is broken in this image —
PERFORMANCE.md profiling recipe).  ``--iters`` divides durations by the
scanned iteration count so numbers read as us/step.

Categories are VL-SAT-shape-aware heuristics over the HLO text (edge-path
GEMMs, dropout masks, layout copies, segment scatters, PointNet pool,
attention probs) — the buckets behind PERFORMANCE.md's roofline tables.
"""

from __future__ import annotations

import argparse
import glob
import re
from collections import defaultdict


def categorize(op: str, full: str) -> str:
    if re.search(r"s32\[\d+\]", full) and "fusion" in op:
        return "segment scatter/gather-by-index"
    if "u8[" in full and "pred[" in full or ("u8[" in full and "bf16" in full):
        return "dropout mask gen/apply"
    if op.startswith("rng") or "rng-bit-generator" in full:
        return "rng bits"
    if re.search(r"\[\d+,\d+,128,768\]|\[\d+,\d+,768\]\{", full):
        return "obj PointNet (layers+pool)"
    if op.startswith("multiply_add_fusion"):
        return "weight-grad GEMMs + optimizer fusions"
    if op.startswith("copy"):
        return "layout copies"
    if re.search(r"\[\d+,\d+,240,240\]", full):
        return "edge cross-attn probs"
    if re.search(r"\[\d+,240,(1536|1024|512)\]|\[1920,", full):
        return "edge-path activations (nn_edge/proj/gate)"
    return "other fusions/elementwise"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--iters", type=int, default=1,
                    help="scanned iterations per capture (divide durations)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(args.profile_dir + "/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {args.profile_dir}")
    xs = xplane_pb2.XSpace.FromString(open(paths[-1], "rb").read())

    for p in xs.planes:
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            per_op = defaultdict(float)
            cats = defaultdict(float)
            while_total = 0.0
            for ev in line.events:
                full = p.event_metadata[ev.metadata_id].name
                us = ev.duration_ps / 1e6 / args.iters
                m = re.match(r"%?([A-Za-z0-9_.\-]+)", full)
                op = m.group(1) if m else full
                if op.startswith("while"):
                    while_total += us
                    continue
                per_op[full] += us
                cats[categorize(op, full)] += us
            print(f"plane {p.name!r}: while loop {while_total:.1f} us/iter; "
                  f"inner ops {sum(cats.values()):.1f} us/iter")
            print("\ncategories:")
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"  {v:9.1f} us/iter  {k}")
            print(f"\ntop {args.top} ops:")
            for full, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
                print(f"  {v:9.1f} us/iter  {full[:120]}")


if __name__ == "__main__":
    main()
