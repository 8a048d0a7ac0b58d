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
