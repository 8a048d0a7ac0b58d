"""StableHLO export + numeric cross-check harness (ONNX-check analog)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.utils.export import export_and_check


def test_export_and_check_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w).sum(axis=-1)

    rng = np.random.RandomState(0)
    small = (jnp.asarray(rng.randn(4, 8).astype(np.float32)),
             jnp.asarray(rng.randn(8, 8).astype(np.float32)))
    large = (jnp.asarray(rng.randn(16, 8).astype(np.float32)),
             jnp.asarray(rng.randn(8, 8).astype(np.float32)))
    report = export_and_check(fn, small, large, str(tmp_path), "toy")
    assert report["checked_small"] and report["checked_large"]
    assert os.path.exists(report["stablehlo"])
    text = open(report["stablehlo"]).read()
    assert "stablehlo" in text or "func.func" in text


def test_trace_model_on_flagship(tmp_path):
    """Counterpart of the reference's per-module ONNX trace methods."""
    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.optim import make_optimizer
    from vlsat_tpu.train.state import create_train_state
    from vlsat_tpu.utils.export import trace_model

    class FakeRunner:
        pass

    cfg = MMGNetConfig(num_obj_classes=20, num_rel_classes=7)
    model = MMGNet(cfg=cfg)
    tiny = make_batch(node_counts=(3,), num_points=8,
                      num_obj_classes=20, num_rel_classes=7)
    state = create_train_state(model, tiny, make_optimizer(), seed=0)
    r = FakeRunner()
    r.model, r.state = model, state
    report = trace_model(r, str(tmp_path))
    assert os.path.exists(report["stablehlo"])
