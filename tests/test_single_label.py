"""Single-label relation mode (multi_rel_outputs=False) end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.mini_data import make_mini_dataset


def test_single_label_losses():
    from vlsat_tpu.train.losses import single_label_rel_nll, single_label_rel_weights

    # 3 valid edges: classes [none, 1, 2]; 1 padded edge
    gt = np.zeros((1, 4, 3), np.float32)
    gt[0, 0, 0] = 1
    gt[0, 1, 1] = 1
    gt[0, 2, 2] = 1
    gt[0, 3, 1] = 1  # padded, must be ignored
    mask = np.asarray([[True, True, True, False]])
    w = np.asarray(single_label_rel_weights(jnp.asarray(gt), jnp.asarray(mask)))
    want = 1.0 / (np.log(np.asarray([1.0, 1.0, 1.0]) + 1) + 1)
    np.testing.assert_allclose(w, want, rtol=1e-6)

    logp = np.log(np.full((1, 4, 3), 1 / 3, np.float32))
    loss = float(single_label_rel_nll(jnp.asarray(logp), jnp.asarray(gt), jnp.asarray(w),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(loss, -np.log(1 / 3), rtol=1e-5)

    # matches torch weighted-mean semantics with non-uniform weights
    torch = pytest.importorskip("torch")
    w2 = np.asarray([0.2, 1.0, 3.0], np.float32)
    logp2 = np.log(np.asarray([[[0.5, 0.3, 0.2], [0.1, 0.8, 0.1], [0.2, 0.2, 0.6]]],
                              np.float32))
    labels = np.asarray([0, 1, 2])
    got = float(single_label_rel_nll(jnp.asarray(logp2),
                                     jnp.asarray(np.eye(3, dtype=np.float32)[labels][None]),
                                     jnp.asarray(w2),
                                     jnp.asarray([[True, True, True]])))
    want = float(torch.nn.functional.nll_loss(
        torch.tensor(logp2[0]), torch.tensor(labels), weight=torch.tensor(w2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_single_label_dataset_and_runner(tmp_path):
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"),
        "MAX_EPOCHES": 1, "Batch_Size": 2, "VALID_INTERVAL": 0,
        "LOG_INTERVAL": 0, "MODE": "train",
        "MODEL": {"multi_rel_outputs": False},
        "dataset": {"root": root, "scans_root": scans, "num_points": 8},
    })
    r = Runner(cfg)
    assert len(r.valid_scenes.relation_names) == 27  # 'none' kept
    s = r.valid_scenes.prepare(0, np.random.RandomState(0))
    assert s["gt_rels"].shape[-1] == 27
    np.testing.assert_allclose(s["gt_rels"].sum(-1), 1.0)  # one-hot incl none
    assert s["gt_rels"][:, 0].sum() == len(s["edge_index"]) - 2

    r.train()
    metrics = r.validation()
    assert np.isfinite(metrics["rel_acc_1"])
    assert np.isfinite(metrics["triplet_acc_50"])
