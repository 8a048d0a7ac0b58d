"""Tests for the second wave of variants: MMteacher, SGGpoint, TripletGCN,
in21k config, and the DGCNN/GCN ops."""

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.ops.dgcnn import graph_feature, knn_indices
from vlsat_tpu.ops.gcn import gcn_propagate
from vlsat_tpu.scene import full_edge_index


def test_knn_and_graph_feature():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 10, 3).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(x), k=4))
    # nearest neighbor of each point is itself
    for b in range(2):
        for n in range(3):
            for p in range(10):
                d = np.square(x[b, n] - x[b, n, p]).sum(-1)
                want = set(np.argsort(d, kind="stable")[:4])
                assert p in idx[b, n, p]
                assert set(idx[b, n, p]) == want, (b, n, p)
    g = np.asarray(graph_feature(jnp.asarray(x), k=4))
    assert g.shape == (2, 3, 10, 4, 6)
    # [x_j - x_i, x_i] layout; self edge -> zeros then x_i
    np.testing.assert_allclose(g[..., 3:][0, 0, 0, 0], x[0, 0, 0], atol=1e-6)


def test_gcn_propagate_matches_dense():
    rng = np.random.RandomState(1)
    n, d = 5, 4
    x = rng.randn(1, n, d).astype(np.float32)
    ei = full_edge_index(n)[None]
    mask = np.ones((1, len(ei[0])), bool)
    mask[0, -3:] = False  # drop some edges
    out = np.asarray(gcn_propagate(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(mask)))
    # dense oracle: A with self loops, sym-normalized by in-degree+1
    A = np.eye(n)
    for e, (i, j) in enumerate(ei[0]):
        if mask[0, e]:
            A[j, i] += 1  # message source i -> target j
    deg = A.sum(1)
    Dn = np.diag(1.0 / np.sqrt(deg))
    want = Dn @ A @ Dn @ x[0]
    np.testing.assert_allclose(out[0], want, rtol=1e-4, atol=1e-5)


def b7(**kw):
    return make_batch(node_counts=(4, 5), num_points=16,
                      num_obj_classes=20, num_rel_classes=7, **kw)


def test_mmteacher():
    from vlsat_tpu.models.mmgnet import MMGNetConfig
    from vlsat_tpu.models.mmteacher import MMTeacher, mmteacher_loss

    batch = b7(with_text=True)
    model = MMTeacher(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch, istrain=True)
    out, _ = model.apply(v, batch, istrain=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, aux = mmteacher_loss(out, batch)
    assert np.isfinite(float(loss))
    assert out["obj_logits_3d"].shape == (2, batch.num_nodes, 20)
    assert "mimic_after" in aux


def test_sggpoint():
    from vlsat_tpu.models.sggpoint import SGGpoint, SGGpointConfig, sggpoint_loss

    batch = b7(with_text=True)
    model = SGGpoint(cfg=SGGpointConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch, istrain=True)
    out, _ = model.apply(v, batch, istrain=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, _ = sggpoint_loss(out, batch)
    assert np.isfinite(float(loss))
    assert (np.asarray(out["rel_cls_3d"]) > 0).all()


def test_sggpoint_baseline():
    from vlsat_tpu.models.sggpoint import (
        SGGpointBaseline, SGGpointConfig, sggpoint_baseline_loss)

    batch = b7()
    model = SGGpointBaseline(cfg=SGGpointConfig(num_obj_classes=20, num_rel_classes=7))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch, istrain=True)
    out = model.apply(v, batch, istrain=False)
    loss, _ = sggpoint_baseline_loss(out, batch)
    assert np.isfinite(float(loss))


def test_triplet_gcn_model():
    from vlsat_tpu.models.gnn import TripletGCNModel

    rng = np.random.RandomState(0)
    n, e_cnt = 5, 20
    x = jnp.asarray(rng.randn(1, n, 32).astype(np.float32))
    ei = jnp.asarray(full_edge_index(n)[None])
    em = jnp.ones((1, e_cnt), bool)
    e = jnp.asarray(rng.randn(1, e_cnt, 64).astype(np.float32))
    model = TripletGCNModel(num_layers=2, dim_node=32, dim_edge=64, dim_hidden=48)
    v = model.init(jax.random.PRNGKey(0), x, e, ei, em)
    (xo, eo), _ = model.apply(v, x, e, ei, em, mutable=["batch_stats"])
    assert xo.shape == (1, n, 32)
    assert eo.shape == (1, e_cnt, 64)
    assert np.isfinite(np.asarray(xo)).all()


def test_in21k_registry():
    from vlsat_tpu.config import load_config
    from vlsat_tpu.models.registry import build_model

    cfg = load_config()
    model, loss_fn = build_model("MmgnetIn21k", 20, 7, cfg.MODEL)
    batch = make_batch(node_counts=(4,), num_points=16, feat_dim=768,
                       num_obj_classes=20, num_rel_classes=7, with_text=True)
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch, istrain=True)
    assert "clip_adapter" not in v["params"]
    assert "obj_logit_scale" not in v["params"]
    out = model.apply(v, batch, istrain=False)
    assert out["obj_logits_3d"].shape == (1, batch.num_nodes, 20)
    # in21k protocol: mimic terms are dropped from the total
    # (model_in21k.py comments them out of the sum, :368-375)
    out_tr, _ = model.apply(v, batch, istrain=True,
                            rngs={"dropout": jax.random.PRNGKey(2)},
                            mutable=["batch_stats"])
    total, aux = loss_fn(out_tr, batch)
    assert np.isfinite(float(total))
    assert float(aux["mimic_loss"]) == 0.0
    assert float(aux["rel_mimic_loss_2d"]) == 0.0
    for nm in ("MMteacher", "SGGpoint", "SGGpointBaseline"):
        m, lf = build_model(nm, 20, 7, cfg.MODEL)
        assert m is not None and callable(lf)
