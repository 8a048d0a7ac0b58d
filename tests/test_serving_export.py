"""AOT serving artifacts (serving_export.py): export -> reload -> parity.

The artifact must reproduce the live eval step exactly (same backend, same
program — jax.export serializes the lowered StableHLO) and drop into
BatchedServer unchanged.  The reference has no counterpart: its deployment
artifact is .pth files that need the full model source
(src/model/model_utils/model_base.py:47-129).
"""

import numpy as np
import pytest

import jax

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.serving import BatchedServer
from vlsat_tpu.serving_export import (
    export_serving_artifact, load_serving_artifact)
from vlsat_tpu.train.step import make_eval_step

BUCKET, BATCH, POINTS = 4, 4, 8


@pytest.fixture(scope="module")
def model_and_vars():
    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=7, node_counts=(4,), num_points=POINTS, bucket=BUCKET)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    return model, variables["params"], variables.get("batch_stats", {})


@pytest.fixture(scope="module")
def artifact(model_and_vars, tmp_path_factory):
    model, params, batch_stats = model_and_vars
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_serving_artifact(
        model, params, batch_stats, out,
        buckets=(BUCKET,), max_batch=BATCH, num_points=POINTS)
    return out, manifest


def test_manifest_contract(artifact):
    _, manifest = artifact
    assert manifest["outputs"] == ["obj_logits_3d", "rel_cls_3d"]
    assert manifest["max_batch"] == BATCH
    assert manifest["branch_3d_only"] is True
    assert set(manifest["buckets"]) == {str(BUCKET)}
    assert jax.default_backend() in manifest["platforms"]


def test_roundtrip_matches_live_eval_step(model_and_vars, artifact):
    model, params, batch_stats = model_and_vars
    loaded = load_serving_artifact(artifact[0])
    batch = make_batch(seed=3, node_counts=(3, 4, 2, 4), num_points=POINTS,
                       bucket=BUCKET)
    live = make_eval_step(model, branch_3d_only=True)(
        params, batch_stats, batch)
    frozen = loaded(None, None, batch)
    assert set(frozen) == {"obj_logits_3d", "rel_cls_3d"}
    for k in frozen:
        np.testing.assert_allclose(
            np.asarray(frozen[k]), np.asarray(live[k]), rtol=1e-6, atol=1e-6)


def test_exported_step_drives_batched_server(model_and_vars, artifact):
    model, params, batch_stats = model_and_vars
    loaded = load_serving_artifact(artifact[0])
    rng = np.random.RandomState(0)
    scenes = []
    for n in (3, 4, 2):
        pts = rng.randn(n, POINTS, 3).astype(np.float32)
        scenes.append({
            "obj_points": pts - pts.mean(axis=1, keepdims=True),
            "descriptor": rng.randn(n, 11).astype(np.float32),
            "obj_2d_feats": rng.randn(n, 512).astype(np.float32),
        })

    def run(step):
        with BatchedServer(step, params, batch_stats, max_batch=BATCH,
                           deadline_ms=1.0, buckets=(BUCKET,)) as srv:
            return [srv.predict(s, timeout=300.0) for s in scenes]

    live = run(make_eval_step(model, branch_3d_only=True))
    frozen = run(loaded)
    for a, b in zip(live, frozen):
        assert a["obj_logits"].shape == b["obj_logits"].shape
        np.testing.assert_allclose(a["obj_logits"], b["obj_logits"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(a["rel_cls"], b["rel_cls"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(a["edge_index"], b["edge_index"])


def test_shape_validation_errors(artifact):
    loaded = load_serving_artifact(artifact[0])
    wrong_bucket = make_batch(seed=1, node_counts=(5,) * BATCH,
                              num_points=POINTS, bucket=8)
    with pytest.raises(ValueError, match="bucket"):
        loaded(None, None, wrong_bucket)
    wrong_batch = make_batch(seed=1, node_counts=(3, 4), num_points=POINTS,
                             bucket=BUCKET)
    with pytest.raises(ValueError, match="batch"):
        loaded(None, None, wrong_batch)
    wrong_points = make_batch(seed=1, node_counts=(3,) * BATCH,
                              num_points=POINTS * 2, bucket=BUCKET)
    with pytest.raises(ValueError, match="points"):
        loaded(None, None, wrong_points)


def test_full_branch_export_outputs_2d(model_and_vars, tmp_path):
    model, params, batch_stats = model_and_vars
    manifest = export_serving_artifact(
        model, params, batch_stats, str(tmp_path),
        buckets=(BUCKET,), max_batch=2, num_points=POINTS,
        branch_3d_only=False)
    assert set(manifest["outputs"]) == {
        "obj_logits_3d", "rel_cls_3d", "obj_logits_2d", "rel_cls_2d"}
    loaded = load_serving_artifact(str(tmp_path))
    batch = make_batch(seed=5, node_counts=(4, 3), num_points=POINTS,
                       bucket=BUCKET)
    out = loaded(None, None, batch)
    assert out["obj_logits_2d"].shape == out["obj_logits_3d"].shape
