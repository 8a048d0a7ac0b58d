"""Model tracing / export + numeric cross-check.

TPU-native analog of the reference's ONNX export harness
(src/utils/op_utils.py:283-303 and the per-module ``.trace`` methods):
instead of ONNX + onnxruntime, the model lowers to StableHLO (the portable
serialization for XLA) and the compiled program is numerically
cross-checked against eager execution at two different shape buckets
(the analog of the reference's doubled-batch dynamic-axes check), with the
same tolerance gate (rtol 1e-3, atol 1e-5; loosened on-TPU where matmuls
default to bf16).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def export_and_check(fn, args_small, args_large, out_dir: str, name: str,
                     rtol: float = 1e-3, atol: float = 1e-5) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args_small)
    stablehlo = lowered.as_text(dialect="stablehlo")
    path = os.path.join(out_dir, f"{name}.stablehlo.mlir")
    with open(path, "w") as f:
        f.write(stablehlo)

    report = {"stablehlo": path}
    for tag, args in (("small", args_small), ("large", args_large)):
        compiled = np.asarray(jax.tree.leaves(jitted(*args))[0])
        with jax.disable_jit():
            eager = np.asarray(jax.tree.leaves(fn(*args))[0])
        np.testing.assert_allclose(compiled, eager, rtol=rtol, atol=atol)
        report[f"checked_{tag}"] = True
    return report


def trace_model(runner, out_dir: str) -> dict:
    """Trace the flagship eval forward at two buckets and verify."""
    from vlsat_tpu.data.synthetic import make_batch

    model = runner.model
    params = runner.state.params
    batch_stats = runner.state.batch_stats
    num_obj = model.cfg.num_obj_classes
    num_rel = model.cfg.num_rel_classes

    def fwd(batch):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           batch, istrain=False)

    small = make_batch(node_counts=(5,), num_points=32, bucket=8,
                       num_obj_classes=num_obj, num_rel_classes=num_rel)
    large = make_batch(node_counts=(9, 11), num_points=32, bucket=12,
                       num_obj_classes=num_obj, num_rel_classes=num_rel)
    report = export_and_check(fwd, (small,), (large,), out_dir, "mmgnet_eval")
    print(f"traced -> {report['stablehlo']}")
    return report
