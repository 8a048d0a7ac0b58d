"""Runner/CLI end-to-end on the mini dataset: train -> ckpt -> eval."""

import json
import os

import numpy as np
import pytest

from tests.mini_data import make_mini_dataset


@pytest.fixture()
def runner_cfg(tmp_path):
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.config import load_config

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"),
        "MAX_EPOCHES": 2,
        "Batch_Size": 2,
        "VALID_INTERVAL": 2,
        "LOG_INTERVAL": 1,
        "MODE": "train",
        "dataset": {"root": root, "scans_root": scans,
                    "cache_root": str(tmp_path / "cache"),
                    "num_points": 16},
    })
    return cfg


def test_runner_train_validate_checkpoint(runner_cfg, tmp_path):
    from vlsat_tpu.train.runner import Runner

    r = Runner(runner_cfg)
    r.train()
    assert int(r.state.step) >= 2
    metrics = r.validation(save=True)
    for key in ("obj_acc_1", "rel_acc_1", "triplet_acc_50", "mean_recall_50",
                "rel_acc_mean_1", "zero_shot_50"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]) or key.startswith("zero"), (key, metrics[key])
    res_dir = os.path.join(runner_cfg.PATH, "results", "Mmgnet", "default")
    assert os.path.exists(os.path.join(res_dir, "result.txt"))
    assert os.path.exists(os.path.join(res_dir, "cls_matrix_list.npy"))

    # checkpoint resume restores step
    r2 = Runner(runner_cfg)
    assert r2.load(best=False)
    assert int(r2.state.step) == int(r.state.step)

    # best checkpoint also resolvable
    r3 = Runner(runner_cfg)
    assert r3.load(best=True)
    for runner in (r, r2, r3):
        runner.close()


def test_config_enum_validation():
    from vlsat_tpu.config import Config

    with pytest.raises(ValueError):
        Config({"_X": ["a", "b"], "X": "c"})
    c = Config({"_X": ["a", "b"], "X": "a", "nested": {"y": 1}})
    assert c.X == "a"
    assert c.nested.y == 1
    with pytest.raises(AttributeError):
        _ = c.missing_key


def test_runner_serve_mode_http(runner_cfg):
    """--mode serve path: Runner.serve -> BatchedServer + HTTPFrontend,
    fresh-init fallback when no checkpoint exists (main.py serve mode)."""
    import io
    import urllib.request

    from vlsat_tpu.train.runner import Runner

    cfg = runner_cfg
    cfg["MODE"] = "serve"
    r = Runner(cfg)
    try:
        r.load(best=False, allow_fallback=True)  # no ckpt -> fresh init
        with r.serve(port=0, max_batch=4, deadline_ms=5.0) as fe:
            scene = r.valid_scenes.prepare(0, np.random.RandomState(0))
            buf = io.BytesIO()
            np.savez(buf, obj_points=scene["obj_points"],
                     descriptor=scene["descriptor"],
                     obj_2d_feats=scene["obj_2d_feats"])
            req = urllib.request.Request(
                f"http://127.0.0.1:{fe.port}/predict", data=buf.getvalue())
            with urllib.request.urlopen(req, timeout=300) as resp:
                with np.load(io.BytesIO(resp.read()),
                             allow_pickle=False) as z:
                    out = {k: z[k] for k in z.files}
        n = scene["obj_points"].shape[0]
        assert out["obj_logits"].shape[0] == n
        assert out["edge_index"].shape == (n * (n - 1), 2)
        assert np.isfinite(out["obj_logits"]).all()
        assert np.isfinite(out["rel_cls"]).all()
    finally:
        r.close()
