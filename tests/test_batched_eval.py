"""Batched validation must produce identical metrics to batch-size 1."""

import numpy as np

from tests.mini_data import make_mini_dataset


def test_batched_eval_matches_batch1(tmp_path):
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"), "MAX_EPOCHES": 1, "Batch_Size": 2,
        "VALID_INTERVAL": 0, "LOG_INTERVAL": 0, "MODE": "train",
        "dataset": {"root": root, "scans_root": scans, "num_points": 8},
    })
    r = Runner(cfg)
    r.load(best=False)  # fresh init (no ckpt)
    m1 = r.validation(batch_size=1)
    m3 = r.validation(batch_size=3)
    for k in m1:
        a, b = m1[k], m3[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=k)
