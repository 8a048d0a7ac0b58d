"""Profiling hooks (SURVEY §5: the reference has no profiler integration;
its '--mode trace' is ONNX export only).

``trace()`` wraps a region with jax.profiler so kernel timelines are
inspectable in TensorBoard/Perfetto; ``annotate()`` names subregions.
Enable in the runner/bench via the VLSAT_PROFILE_DIR environment variable.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    log_dir = log_dir or os.environ.get("VLSAT_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def peak_flops_per_sec(device=None) -> float:
    """bf16 peak FLOP/s of the attached chip, for MFU reporting.

    Override with VLSAT_PEAK_TFLOPS (e.g. a non-TPU backend or a chip
    this table predates); defaults to v5e's 197 TFLOP/s when the kind is
    unrecognized."""
    env = os.environ.get("VLSAT_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    # public peak bf16 numbers: v5e 197, v4 275, v5p 459, v6e 918 TFLOP/s
    table = {"v5 lite": 197e12, "v5litepod": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12}
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12


def compiled_flops(jitted, *args, static=None) -> float:
    """FLOPs of one execution of ``jitted(*args, **static)`` from XLA's
    compiled cost_analysis.  NOTE: a ``lax.scan`` body is counted ONCE
    regardless of trip count (the property the bench DCE audit relies on,
    tests/test_bench_harness.py) — so on a scanned program this is the
    per-iteration FLOP count.  Returns 0.0 when the backend offers no
    cost model."""
    try:
        lowered = jitted.lower(*args, **(static or {}))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0
