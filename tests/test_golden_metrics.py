"""Golden-metric regression: frozen full-suite eval numbers on mini data.

Complements the unit-level metric oracles (tests/test_metrics.py): a
fixed-seed model evaluated on the deterministic mini dataset must keep
producing bit-identical metrics.  Any silent semantic drift in the model
forward, the data pipeline, or the metric assembly — the kind unit oracles
can't see because they test pieces in isolation — shows up as a diff here.

Regenerate after an *intentional* change with:
  VLSAT_REGEN_GOLDEN=1 python -m pytest tests/test_golden_metrics.py
and review the diff of tests/golden/metrics_mini.json in the commit.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from tests.mini_data import make_mini_dataset

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "metrics_mini.json")


def _compute_metrics(tmp_path):
    from vlsat_tpu.data.assets import build_triplet_vocab, load_relationship_json
    from vlsat_tpu.data.dataset import SceneLoader, SSGScenes
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.train.step import make_eval_step

    root, scans = make_mini_dataset(tmp_path)
    scenes = SSGScenes(split="validation_scans", root=root, scans_root=scans,
                       num_points=16, cache_root=str(tmp_path / "cache"))
    model = MMGNet(cfg=MMGNetConfig())
    loader = SceneLoader(scenes, batch_size=1, shuffle=False)
    example = next(iter(loader))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example, istrain=True)
    vocab = build_triplet_vocab(
        load_relationship_json(root, "train_scans"),
        scenes.class_names, scenes.relation_names)
    return evaluate(
        make_eval_step(model), variables["params"],
        variables.get("batch_stats", {}), loader,
        num_rel_classes=len(scenes.relation_names),
        train_triplet_vocab=vocab, total=len(scenes), verbose=False)


def test_golden_metrics(tmp_path):
    metrics = {k: float(v) for k, v in _compute_metrics(tmp_path).items()}
    if os.environ.get("VLSAT_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run with VLSAT_REGEN_GOLDEN=1 and commit it")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert set(metrics) == set(golden), (
        set(metrics) ^ set(golden))
    for k, v in golden.items():
        got = metrics[k]
        if np.isnan(v):
            assert np.isnan(got), k
        else:
            np.testing.assert_allclose(got, v, rtol=0, atol=1e-4, err_msg=k)
