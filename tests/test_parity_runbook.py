"""End-to-end runbook test for tools/parity_eval.py.

Fabricates a "released" reference checkpoint directory (one .pth per child
module, the BaseModel.save layout) from the torch oracle, runs the parity
runbook on the mini dataset, fabricates a reference result.txt from the
first run, and re-runs with the ±0.5-pt comparison — the exact flow a user
follows with the real released checkpoint + 3RScan data.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.mini_data import make_mini_dataset


def _fabricate_ckpt(tmp_path, seed=0):
    from vlsat_tpu.interop.torch_oracle import TorchMmgnetOracle

    torch.manual_seed(seed)
    oracle = TorchMmgnetOracle().eval()
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    children = ["obj_encoder", "rel_encoder_2d", "rel_encoder_3d", "mmg",
                "clip_adapter", "rel_predictor_2d", "rel_predictor_3d",
                "obj_predictor_2d", "obj_predictor_3d", "mlp_3d",
                "triplet_projector_2d"]
    for name in children:
        torch.save(getattr(oracle, name).state_dict(), str(ckpt / f"{name}.pth"))
    torch.save({"obj_logit_scale": oracle.obj_logit_scale.detach()},
               str(ckpt / "obj_logit_scale.pth"))
    return str(ckpt)


def test_parity_eval_runbook(tmp_path):
    import parity_eval

    root, scans = make_mini_dataset(tmp_path)
    ckpt_dir = _fabricate_ckpt(tmp_path)

    metrics, ok = parity_eval.run_parity_eval(
        ckpt_dir=ckpt_dir, root=root, scans_root=scans,
        cache_root=str(tmp_path / "cache"), eval_batch_size=2,
        num_points=16, verbose=False)
    assert ok  # no reference file -> vacuously within tolerance
    for key in ("obj_acc_1", "rel_acc_1", "triplet_acc_50", "mean_recall_50"):
        assert key in metrics and np.isfinite(metrics[key]), key

    # fabricate the reference result.txt in the reference's line format and
    # re-run: a self-comparison must land within the ±0.5-pt gate
    res = tmp_path / "result.txt"
    key_to_label = {v: k for k, v in parity_eval.REF_LABEL_TO_KEY.items()}
    with open(res, "w") as f:
        for key, label in key_to_label.items():
            if key in metrics and np.isfinite(metrics[key]):
                print(f"Eval: {label} : {metrics[key]}", file=f)
    parsed = parity_eval.parse_reference_result(str(res))
    assert parsed, "reference parser matched no lines"

    out_json = str(tmp_path / "parity.json")
    _, ok2 = parity_eval.run_parity_eval(
        ckpt_dir=ckpt_dir, root=root, scans_root=scans,
        cache_root=str(tmp_path / "cache"), eval_batch_size=2,
        num_points=16, reference=str(res), out_json=out_json, verbose=False)
    assert ok2
    assert os.path.exists(out_json)

    # a cooked reference value outside the gate must flip the verdict
    with open(res, "a") as f:
        print(f"Eval: 3d obj Acc@1  : {metrics['obj_acc_1'] + 5.0}", file=f)
    _, ok3 = parity_eval.run_parity_eval(
        ckpt_dir=ckpt_dir, root=root, scans_root=scans,
        cache_root=str(tmp_path / "cache"), eval_batch_size=2,
        num_points=16, reference=str(res), verbose=False)
    assert not ok3
