"""Tests for STN modules, pretrain-freeze labels, rel-only edges, schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.models.stn import STN3d, STNkd, apply_transform


def test_stn_identity_at_init():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    stn = STN3d()
    v = stn.init(jax.random.PRNGKey(0), pts)
    trans = stn.apply(v, pts)
    assert trans.shape == (2, 3, 3)
    # fc3 kernel zero-init -> bias-dependent offset around identity; with
    # zero bias init it IS the identity
    np.testing.assert_allclose(np.asarray(trans[0]), np.eye(3), atol=1e-5)
    out = apply_transform(pts, trans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)
    k = STNkd(k=16)
    feats = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))
    v2 = k.init(jax.random.PRNGKey(0), feats)
    assert k.apply(v2, feats).shape == (2, 16, 16)


def test_freeze_non_predictor_labels():
    from flax import traverse_util

    from vlsat_tpu.train.optim import label_params

    params = {
        "obj_encoder": {"conv1": {"kernel": np.zeros((3, 4))}},
        "rel_predictor_3d": {"fc1": {"kernel": np.zeros((3, 4))}},
        "obj_predictor_3d": {"kernel": np.zeros((3, 4))},
        "clip_adapter": {"fc1": {"kernel": np.zeros((3, 4))}},
    }
    labels = traverse_util.flatten_dict(label_params(params, freeze_non_predictor=True))
    got = {"/".join(k): v for k, v in labels.items()}
    assert got["obj_encoder/conv1/kernel"] == "frozen"
    assert got["clip_adapter/fc1/kernel"] == "frozen"
    assert got["rel_predictor_3d/fc1/kernel"] == "base"
    assert got["obj_predictor_3d/kernel"] == "obj_predictor"


def test_rel_only_edges(tmp_path):
    from tests.mini_data import make_mini_dataset
    from vlsat_tpu.data.dataset import SSGScenes

    root, scans = make_mini_dataset(tmp_path)
    ds = SSGScenes(root, scans, "train_scans", all_edges=False)
    s = ds.prepare(0, np.random.RandomState(0))
    assert s["edge_index"].shape == (2, 2)  # only the 2 annotated pairs
    assert s["gt_rels"].sum() == 2
    assert (s["gt_rels"].sum(-1) > 0).all()


def test_batch_multiplicative_schedule():
    from vlsat_tpu.train.optim import batch_multiplicative_schedule

    s = batch_multiplicative_schedule(1.0, factor=0.5, batch_size=2, ref_batch_size=1)
    np.testing.assert_allclose(s(0), 1.0)
    np.testing.assert_allclose(s(1), 0.25)


def test_triplet_distill_loss():
    from vlsat_tpu.train.losses import triplet_distill_loss
    from vlsat_tpu.scene import full_edge_index

    rng = np.random.RandomState(0)
    n, c, r = 4, 6, 3
    o3 = rng.randn(1, n, c).astype(np.float32)
    o2 = rng.randn(1, n, c).astype(np.float32)
    ei = full_edge_index(n)[None]
    e_cnt = ei.shape[1]
    r3 = rng.rand(1, e_cnt, r).astype(np.float32)
    r2 = rng.rand(1, e_cnt, r).astype(np.float32)
    mask = np.ones((1, e_cnt), bool)
    mask[0, -2:] = False
    got = float(triplet_distill_loss(
        jnp.asarray(o3), jnp.asarray(r3), jnp.asarray(o2), jnp.asarray(r2),
        jnp.asarray(ei), jnp.asarray(mask)))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    s3, s2 = softmax(o3[0]), softmax(o2[0])
    total = 0.0
    for e in range(e_cnt - 2):
        ns3 = np.einsum("n,m->nm", s3[ei[0, e, 0]], s3[ei[0, e, 1]])
        ns2 = np.einsum("n,m->nm", s2[ei[0, e, 0]], s2[ei[0, e, 1]])
        c3 = np.einsum("nl,m->nlm", ns3, r3[0, e]).reshape(-1)
        c2 = np.einsum("nl,m->nlm", ns2, r2[0, e]).reshape(-1)
        total += np.abs(c3 - c2).sum()
    want = total / (e_cnt - 2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rel_predictor_multi2():
    import jax
    from vlsat_tpu.models.mmgnet import RelPredictorMulti2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    m = RelPredictorMulti2(7)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert out.shape == (2, 5, 7)
    assert (out > 0).all() and (out < 1).all()


def test_transformer_utils_oracle():
    """position_embedding / sinusoid table vs the reference torch formula
    (transformer/utils.py:6-25), FFN residual+post-norm behavior."""
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    from vlsat_tpu.models.transformer import (
        PositionWiseFeedForward, position_embedding, sinusoid_encoding_table)

    d_model, max_len = 64, 17
    pos = torch.arange(max_len, dtype=torch.float32).view(-1, 1)
    dim = torch.arange(d_model // 2, dtype=torch.float32).view(1, -1)
    want = torch.zeros((max_len, d_model))
    want[:, ::2] = torch.sin(pos / 10000 ** (2 * dim / d_model))
    want[:, 1::2] = torch.cos(pos / 10000 ** (2 * dim / d_model))
    got = np.asarray(position_embedding(jnp.arange(max_len), d_model))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-6)

    table = np.asarray(sinusoid_encoding_table(max_len, d_model, padding_idx=0))
    assert (table[0] == 0).all()
    np.testing.assert_allclose(table[1:], want.numpy()[1:], rtol=1e-6, atol=1e-6)

    ffn = PositionWiseFeedForward(d_model=16, d_ff=32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16), jnp.float32)
    v = ffn.init(jax.random.PRNGKey(0), x)
    y = ffn.apply(v, x)
    assert y.shape == x.shape
    # post-norm: output rows are LayerNorm'd -> ~zero mean, unit variance
    np.testing.assert_allclose(np.asarray(y).mean(-1), 0.0, atol=1e-5)
