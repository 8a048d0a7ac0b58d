"""EVAL_3D_ONLY serving mode: the 3D branch alone.

The 2D branch only ever reads the 3D stream (cross-attention q=2D, k/v=3D
— reference network_MMG.py:218,231), so dropping it at inference must give
BIT-IDENTICAL 3D outputs while skipping half the edge-GEMM FLOPs.  This is
the paper's deployment protocol ("at eval time the 3D branch runs alone").
"""

import numpy as np
import pytest

from tests.mini_data import make_mini_dataset


def _model_and_batch():
    import jax

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    batch = make_batch(seed=0, node_counts=(7, 11), num_points=32, bucket=12,
                       with_text=True)
    model = MMGNet(cfg=MMGNetConfig())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True)
    return model, variables, batch


def test_3d_only_outputs_bit_identical():
    model, variables, batch = _model_and_batch()
    full = model.apply(variables, batch, istrain=False)
    only3d = model.apply(variables, batch, istrain=False, branch_3d_only=True)
    assert set(only3d) == {"obj_logits_3d", "rel_cls_3d"}
    np.testing.assert_array_equal(np.asarray(full["obj_logits_3d"]),
                                  np.asarray(only3d["obj_logits_3d"]))
    np.testing.assert_array_equal(np.asarray(full["rel_cls_3d"]),
                                  np.asarray(only3d["rel_cls_3d"]))


def test_3d_only_rejects_train_mode():
    model, variables, batch = _model_and_batch()
    with pytest.raises(ValueError):
        model.apply(variables, batch, istrain=True, branch_3d_only=True,
                    rngs={"dropout": __import__("jax").random.PRNGKey(0)})


def test_engine_runs_without_2d_outputs():
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    model, variables, batch = _model_and_batch()
    eval_fn = make_eval_step(model, branch_3d_only=True)
    metrics = evaluate(
        eval_fn, variables["params"], variables.get("batch_stats", {}),
        [batch], num_rel_classes=26, verbose=False)
    for key in ("obj_acc_1", "rel_acc_1", "triplet_acc_50", "mean_recall_50",
                "rel_acc_mean_1"):
        assert key in metrics and np.isfinite(metrics[key]), key
    assert not any(k.endswith("_2d") or "_2d_" in k for k in metrics), metrics.keys()

    # 3D metric values match the full-branch eval exactly
    full_fn = make_eval_step(model)
    full_metrics = evaluate(
        full_fn, variables["params"], variables.get("batch_stats", {}),
        [batch], num_rel_classes=26, verbose=False)
    for k, v in metrics.items():
        assert full_metrics[k] == pytest.approx(v), k


def test_runner_eval_3d_only_flag(tmp_path):
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    root, scans = make_mini_dataset(tmp_path)
    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"),
        "MAX_EPOCHES": 1,
        "Batch_Size": 2,
        "VALID_INTERVAL": 0,
        "MODE": "train",
        "EVAL_3D_ONLY": True,
        "dataset": {"root": root, "scans_root": scans,
                    "cache_root": str(tmp_path / "cache"),
                    "num_points": 16},
    })
    r = Runner(cfg)
    try:
        r.train()
        metrics = r.validation()
        assert "obj_acc_1" in metrics
        assert not any("_2d" in k for k in metrics)
    finally:
        r.close()
