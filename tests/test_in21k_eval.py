"""in21k eval protocol: scene-level R@K / mR@K (process_val2/3) end to end
with 768-d features through the MmgnetIn21k registry preset."""

import jax
import numpy as np

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.eval.engine import evaluate
from vlsat_tpu.models.registry import build_model
from vlsat_tpu.train.step import make_eval_step


class _M(dict):
    __getattr__ = dict.__getitem__

    def get(self, k, default=None):
        return dict.get(self, k, default)


def _mcfg():
    return _M(point_feature_size=768, DIM_ATTEN=256, NUM_HEADS=8, N_LAYERS=2,
              GCN_AGGR="max", DROP_OUT_ATTEN=0.5, USE_GCN_EDGE=True,
              USE_SPATIAL=True, clip_feat_dim=768, adapter_alpha=0.5,
              multi_rel_outputs=True)


def test_in21k_scene_recall_protocol():
    model, _ = build_model("MmgnetIn21k", num_obj=20, num_rel=7, mcfg=_mcfg())
    batches = [
        make_batch(seed=s, node_counts=(5, 6), num_points=16, bucket=8,
                   feat_dim=768, num_obj_classes=20, num_rel_classes=7)
        for s in range(2)
    ]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0], istrain=True)
    metrics = evaluate(
        make_eval_step(model), variables["params"],
        variables.get("batch_stats", {}), batches, num_rel_classes=7,
        verbose=False, scene_recall=True)
    for name in ("predcls", "sgcls"):
        for tag in ("gc", "ngc"):
            for k in (20, 50, 100):
                key = f"{name}_{tag}_recall_{k}"
                assert key in metrics and np.isfinite(metrics[key]), key
                mkey = f"{name}_{tag}_mean_recall_{k}"
                assert mkey in metrics, mkey
    # unconstrained recall dominates graph-constrained at equal K
    for name in ("predcls", "sgcls"):
        for k in (50, 100):
            assert (metrics[f"{name}_ngc_recall_{k}"]
                    >= metrics[f"{name}_gc_recall_{k}"] - 1e-9)
    # recall is monotone in K
    assert metrics["sgcls_ngc_recall_100"] >= metrics["sgcls_ngc_recall_20"] - 1e-9
