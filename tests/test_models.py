"""Model construction / forward smoke + semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig


def tiny_cfg(**kw):
    base = dict(
        num_obj_classes=20,
        num_rel_classes=7,
        point_feature_size=768,
        dim_node=512,
        dim_edge=512,
        dim_atten=256,
        num_heads=8,
        depth=2,
    )
    base.update(kw)
    return MMGNetConfig(**base)


def init_and_apply(batch, istrain, cfg=None, text=None):
    model = MMGNet(cfg=cfg or tiny_cfg(), obj_text_features=text)
    # init in train mode so train-only submodules (triplet projector) exist
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    out, mutated = model.apply(
        variables, batch, istrain=istrain,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if istrain else [],
    )
    return model, variables, out


def test_forward_eval_shapes_and_finiteness():
    batch = make_batch(node_counts=(4, 7), num_points=32,
                       num_obj_classes=20, num_rel_classes=7)
    _, _, out = init_and_apply(batch, istrain=False)
    B, N, E = batch.num_scenes, batch.num_nodes, batch.num_edges
    assert out["obj_logits_3d"].shape == (B, N, 20)
    assert out["obj_logits_2d"].shape == (B, N, 20)
    assert out["rel_cls_3d"].shape == (B, E, 7)
    assert out["rel_cls_2d"].shape == (B, E, 7)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # sigmoid outputs in (0, 1)
    assert (np.asarray(out["rel_cls_3d"]) > 0).all()
    assert (np.asarray(out["rel_cls_3d"]) < 1).all()


def test_forward_train_extras():
    batch = make_batch(node_counts=(4,), num_points=32,
                       num_obj_classes=20, num_rel_classes=7)
    _, _, out = init_and_apply(batch, istrain=True)
    assert out["obj_feature_3d_mimic"].shape == (1, batch.num_nodes, 512)
    assert out["obj_features_2d_mimic"].shape == (1, batch.num_nodes, 512)
    assert out["edge_feature_2d_dis"].shape == (1, batch.num_edges, 512)
    assert np.isfinite(np.asarray(out["edge_feature_2d_dis"])).all()


def test_text_initialized_classifier():
    rng = np.random.RandomState(0)
    text = rng.randn(20, 512).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    batch = make_batch(node_counts=(3,), num_points=16,
                       num_obj_classes=20, num_rel_classes=7)
    model, variables, _ = init_and_apply(batch, istrain=False, text=text)
    kernel = np.asarray(variables["params"]["obj_predictor_3d"]["kernel"])
    np.testing.assert_allclose(kernel, text.T, atol=1e-6)


def test_eval_deterministic_train_stochastic():
    batch = make_batch(node_counts=(4,), num_points=16,
                       num_obj_classes=20, num_rel_classes=7)
    model = MMGNet(cfg=tiny_cfg())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    a = model.apply(variables, batch, istrain=False)
    b = model.apply(variables, batch, istrain=False)
    np.testing.assert_array_equal(
        np.asarray(a["obj_logits_3d"]), np.asarray(b["obj_logits_3d"])
    )
    # train mode with different dropout rngs differs
    t1, _ = model.apply(variables, batch, istrain=True,
                        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    t2, _ = model.apply(variables, batch, istrain=True,
                        rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"])
    assert np.abs(np.asarray(t1["obj_logits_3d"]) - np.asarray(t2["obj_logits_3d"])).max() > 0


def test_padding_invariance():
    """A scene's outputs on its valid nodes must not depend on the padding."""
    b_small = make_batch(node_counts=(5,), num_points=16, bucket=8,
                         num_obj_classes=20, num_rel_classes=7)
    b_big = jax.tree.map(lambda x: x, b_small)
    # re-pad same scene into a larger bucket
    from vlsat_tpu.scene import pad_scene, collate, edge_count
    import numpy as onp

    n_valid, e_valid = 5, 20
    s = dict(
        obj_points=onp.asarray(b_small.obj_points[0, :n_valid]),
        descriptor=onp.asarray(b_small.descriptor[0, :n_valid]),
        obj_2d_feats=onp.asarray(b_small.obj_2d_feats[0, :n_valid]),
        gt_class=onp.asarray(b_small.gt_class[0, :n_valid]),
        edge_index=onp.asarray(b_small.edge_index[0, :e_valid]),
        gt_rels=onp.asarray(b_small.gt_rels[0, :e_valid]),
    )
    b_big = collate([pad_scene(**s, n_max=12)])

    model = MMGNet(cfg=tiny_cfg())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b_small, istrain=False,
    )
    out_s = model.apply(variables, b_small, istrain=False)
    out_b = model.apply(variables, b_big, istrain=False)
    np.testing.assert_allclose(
        np.asarray(out_s["obj_logits_3d"])[0, :n_valid],
        np.asarray(out_b["obj_logits_3d"])[0, :n_valid],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["rel_cls_3d"])[0, :e_valid],
        np.asarray(out_b["rel_cls_3d"])[0, :e_valid],
        rtol=2e-4, atol=2e-4,
    )


def test_gate_layout_head_major_equivalent():
    """gate_layout="head_major" (plain last-axis Dense gate MLP between two
    explicit transposes) computes the same function as the default
    "channel" layout with an IDENTICAL parameter tree — checkpoints are
    interchangeable.  (A device A/B measured head_major ~10% SLOWER on
    TPU, so "channel" stays the default; PERFORMANCE.md round 3.)"""
    batch = make_batch(seed=3, node_counts=(5, 4), num_points=16, bucket=6)
    m_ch = MMGNet(cfg=tiny_cfg())
    m_hm = MMGNet(cfg=tiny_cfg(gate_layout="head_major"))
    variables = m_ch.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    v2 = m_hm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    o1 = m_ch.apply(variables, batch, istrain=False)
    o2 = m_hm.apply(variables, batch, istrain=False)
    assert o1.keys() == o2.keys()
    for k in o1:
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), rtol=2e-4, atol=2e-4,
            err_msg=k)
