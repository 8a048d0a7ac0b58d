"""Variant model forward + loss smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models.mmgnet import MMGNetConfig
from vlsat_tpu.models.variants import MMGNetSingle, SGFN, SGFNConfig, SGPN, SGPNConfig
from vlsat_tpu.train.losses import sgfn_loss, sgpn_loss, vlsat_single_loss


def batch7():
    return make_batch(node_counts=(4, 6), num_points=16, with_text=True,
                      num_obj_classes=20, num_rel_classes=7)


def test_mmgnet_single():
    b = batch7()
    model = MMGNetSingle(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   b, istrain=True)
    out, _ = model.apply(v, b, istrain=True, rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["rel_cls_3d"].shape == (2, b.num_edges, 7)
    assert out["edge_feature_3d_dis"].shape == (2, b.num_edges, 512)
    loss, aux = vlsat_single_loss(out, b)
    assert np.isfinite(float(loss))
    # 3d-only: 2d outputs alias 3d
    np.testing.assert_array_equal(np.asarray(out["obj_logits_3d"]),
                                  np.asarray(out["obj_logits_2d"]))


def test_sgfn():
    b = batch7()
    model = SGFN(cfg=SGFNConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   b, istrain=True)
    out = model.apply(v, b, istrain=False)
    # log-softmax head sums to 1 in prob space
    p = np.exp(np.asarray(out["obj_logits_3d"]))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)
    loss, _ = sgfn_loss(out, b)
    assert np.isfinite(float(loss))


def test_sgpn():
    b = batch7()
    rng = np.random.RandomState(0)
    rel_points = jnp.asarray(rng.randn(2, b.num_edges, 32, 4).astype(np.float32))
    b = b.replace(rel_points=rel_points)
    model = SGPN(cfg=SGPNConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   b, istrain=True)
    out = model.apply(v, b, istrain=False)
    assert out["rel_cls_3d"].shape == (2, b.num_edges, 7)
    loss, _ = sgpn_loss(out, b)
    assert np.isfinite(float(loss))
    # missing rel_points -> clear error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   b.replace(rel_points=None), istrain=True)


def test_registry():
    from vlsat_tpu.config import load_config
    from vlsat_tpu.models.registry import build_model

    cfg = load_config()
    for name in ("Mmgnet", "MmgnetSingle", "SGFN", "SGPN"):
        model, loss_fn = build_model(name, 20, 7, cfg.MODEL)
        assert model is not None and callable(loss_fn)
    with pytest.raises(ValueError):
        build_model("nope", 20, 7, cfg.MODEL)
