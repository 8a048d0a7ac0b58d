"""Batched serving loop tests (CPU backend; the TPU numbers live in
PERFORMANCE.md via tools/serve.py)."""

import threading

import jax
import numpy as np

from vlsat_tpu.data.synthetic import make_batch, make_scene
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.scene import collate, full_edge_index, pad_scene
from vlsat_tpu.serving import BatchedServer, bench_server
from vlsat_tpu.train.step import make_eval_step


def _small_setup():
    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    tiny = make_batch(seed=1, node_counts=(3,), num_points=8, bucket=4,
                      num_obj_classes=20, num_rel_classes=7)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    return model, variables["params"], variables.get("batch_stats", {})


def _scene(rng, n, num_points=8):
    s = make_scene(rng, n, num_points=num_points, num_obj_classes=20,
                   num_rel_classes=7)
    return {"obj_points": s["obj_points"], "descriptor": s["descriptor"],
            "obj_2d_feats": s["obj_2d_feats"]}


def test_server_matches_direct_eval_and_batches(monkeypatch):
    # bit-exact wire: the server's ingest narrows to f16 by default
    # (data/wire.py); pin f32 so the direct-eval comparison is exact, then
    # check the default f16 wire separately below
    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")
    model, params, batch_stats = _small_setup()
    step = make_eval_step(model)
    server = BatchedServer(step, params, batch_stats, max_batch=4,
                           deadline_ms=50.0, num_rel_classes=7)
    rng = np.random.RandomState(0)
    scenes = [_scene(rng, n) for n in (3, 4, 3, 4)]
    with server:
        futs = [server.submit(s) for s in scenes]
        results = [f.result(timeout=120) for f in futs]

    # micro-batching happened: fewer dispatches than scenes
    assert server.stats["scenes"] == 4
    assert server.stats["batches"] < 4

    # per-scene outputs equal a direct padded eval of the same scene at the
    # same bucket (scene-axis independence is tested elsewhere)
    for s, r in zip(scenes, results):
        n = s["obj_points"].shape[0]
        ei = full_edge_index(n)
        padded = pad_scene(
            s["obj_points"], s["descriptor"], s["obj_2d_feats"],
            np.zeros((n,), np.int32), ei, np.zeros((len(ei), 7), np.float32),
            n_max=4)
        direct = step(params, batch_stats, collate([padded]))
        np.testing.assert_allclose(
            r["obj_logits"], np.asarray(direct["obj_logits_3d"])[0, :n],
            rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            r["rel_cls"], np.asarray(direct["rel_cls_3d"])[0, :len(ei)],
            rtol=2e-5, atol=1e-5)
        assert r["edge_index"].shape == (n * (n - 1), 2)

    # default f16 wire: same scenes, loose tolerance (input cast noise)
    monkeypatch.delenv("VLSAT_WIRE_DTYPE")
    server16 = BatchedServer(step, params, batch_stats, max_batch=4,
                             deadline_ms=50.0, num_rel_classes=7)
    with server16:
        futs = [server16.submit(s) for s in scenes]
        r16 = [f.result(timeout=120) for f in futs]
    for r, r2 in zip(results, r16):
        np.testing.assert_allclose(r2["obj_logits"], r["obj_logits"],
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(r2["rel_cls"], r["rel_cls"],
                                   rtol=5e-2, atol=5e-2)


def test_server_deadline_flush_and_bench():
    model, params, batch_stats = _small_setup()
    step = make_eval_step(model)
    server = BatchedServer(step, params, batch_stats, max_batch=32,
                           deadline_ms=5.0, num_rel_classes=7)
    rng = np.random.RandomState(1)
    with server:
        # a single request must not wait for a full batch
        r = server.predict(_scene(rng, 3), timeout=120)
        assert np.isfinite(r["obj_logits"]).all()
        res = bench_server(server, [_scene(rng, 3), _scene(rng, 4)],
                           duration_s=1.0, clients=3)
    assert res["requests"] > 0
    assert res["scenes_per_sec"] > 0
    assert np.isfinite(res["p99_latency_ms"])


def test_server_error_propagates():
    model, params, batch_stats = _small_setup()

    def broken_step(params, batch_stats, batch):
        raise RuntimeError("boom")

    server = BatchedServer(broken_step, params, batch_stats,
                           num_rel_classes=7)
    rng = np.random.RandomState(2)
    with server:
        fut = server.submit(_scene(rng, 3))
        try:
            fut.result(timeout=30)
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "boom" in str(e)


def test_server_pads_batches_to_constant_shape(monkeypatch):
    """pad_to_max (default): every dispatch sees exactly max_batch scenes
    regardless of how many requests were soaked, so one compiled program
    per bucket serves all load levels (variable closed-loop batch sizes
    otherwise compile a fresh (batch, bucket) program each, 20-40 s on
    TPU). Padded scenes are zero obj_mask rows the result distribution
    never reads."""
    # the exactness comparison below needs the bit-exact f32 wire
    # (test_server_matches_direct_eval_and_batches covers the f16 default)
    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")
    model, params, batch_stats = _small_setup()
    step = make_eval_step(model)
    seen_shapes = []

    def recording_step(p, bs, batch):
        seen_shapes.append(batch.obj_points.shape[0])
        return step(p, bs, batch)

    server = BatchedServer(recording_step, params, batch_stats, max_batch=6,
                           deadline_ms=30.0, num_rel_classes=7)
    rng = np.random.RandomState(3)
    scenes = [_scene(rng, n) for n in (3, 4, 3)]
    with server:
        # first a single request (flushes as a 1-scene micro-batch), then a
        # burst of 3 — both dispatches must be padded to max_batch=6
        r0 = server.predict(scenes[0], timeout=120)
        futs = [server.submit(s) for s in scenes]
        rs = [f.result(timeout=120) for f in futs]
    assert seen_shapes and all(s == 6 for s in seen_shapes), seen_shapes

    # padding must not perturb real outputs: same scene, direct eval
    n = scenes[0]["obj_points"].shape[0]
    ei = full_edge_index(n)
    padded = pad_scene(
        scenes[0]["obj_points"], scenes[0]["descriptor"],
        scenes[0]["obj_2d_feats"], np.zeros((n,), np.int32), ei,
        np.zeros((len(ei), 7), np.float32), n_max=4)
    direct = step(params, batch_stats, collate([padded]))
    np.testing.assert_allclose(
        r0["obj_logits"], np.asarray(direct["obj_logits_3d"])[0, :n],
        rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        rs[0]["obj_logits"], r0["obj_logits"], rtol=1e-6, atol=1e-6)


def test_http_frontend_predict_and_health(monkeypatch):
    """POST /predict (npz in, npz out) matches direct eval; /healthz counts."""
    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")  # exactness check
    import io
    import json as _json
    import urllib.request

    from vlsat_tpu.serving import HTTPFrontend

    model, params, batch_stats = _small_setup()
    step = make_eval_step(model)
    server = BatchedServer(step, params, batch_stats, max_batch=4,
                           deadline_ms=5.0, num_rel_classes=7)
    rng = np.random.RandomState(5)
    scene = _scene(rng, 3)

    with HTTPFrontend(server, port=0) as fe:
        buf = io.BytesIO()
        np.savez(buf, **scene)
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            with np.load(io.BytesIO(resp.read()), allow_pickle=False) as z:
                out = {k: z[k] for k in z.files}

        with urllib.request.urlopen(
                f"http://127.0.0.1:{fe.port}/healthz", timeout=30) as resp:
            health = _json.loads(resp.read())
        assert health["ok"] and health["scenes"] == 1

        # malformed payload -> 400 with a reason, server stays up
        bad = io.BytesIO()
        np.savez(bad, obj_points=scene["obj_points"])  # no descriptor
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/predict", data=bad.getvalue())
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"descriptor" in e.read()

    n = scene["obj_points"].shape[0]
    ei = full_edge_index(n)
    padded = pad_scene(
        scene["obj_points"], scene["descriptor"], scene["obj_2d_feats"],
        np.zeros((n,), np.int32), ei, np.zeros((len(ei), 7), np.float32),
        n_max=4)
    direct = step(params, batch_stats, collate([padded]))
    np.testing.assert_allclose(
        out["obj_logits"], np.asarray(direct["obj_logits_3d"])[0, :n],
        rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        out["rel_cls"], np.asarray(direct["rel_cls_3d"])[0, :len(ei)],
        rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(out["edge_index"], ei)
