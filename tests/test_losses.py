"""Loss semantics tests vs straightforward NumPy on unpadded data."""

import numpy as np
import jax.numpy as jnp

from vlsat_tpu.train.losses import (
    cosine_mimic_loss,
    cross_entropy,
    dynamic_rel_weights,
    masked_mean,
    rel_mimic_l1,
    weighted_bce,
)


def test_masked_mean_ignores_padding():
    x = jnp.asarray([[1.0, 2.0], [100.0, 200.0]])
    mask = jnp.asarray([True, False])
    assert float(masked_mean(x, mask)) == 1.5


def test_cross_entropy_matches_numpy():
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (3, 8))
    mask = rng.rand(3, 8) > 0.3
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    nll = -np.log(np.take_along_axis(p, labels[..., None], -1)[..., 0])
    want = nll[mask].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dynamic_weights_formula():
    # 4 valid edges: counts per class [2, 1, 0]; 1 edge with no rels
    gt = np.zeros((1, 5, 3), np.float32)
    gt[0, 0, 0] = 1
    gt[0, 1, 0] = 1
    gt[0, 1, 1] = 1
    mask = np.asarray([[True, True, True, True, False]])
    # padded edge 4 has labels that must be ignored
    gt[0, 4, 2] = 1
    w = np.asarray(dynamic_rel_weights(jnp.asarray(gt), jnp.asarray(mask)))
    want = 1.0 / (np.log(np.asarray([2.0, 1.0, 0.0]) + 1) + 1)
    np.testing.assert_allclose(w, want, rtol=1e-6)


def test_weighted_bce_matches_numpy():
    rng = np.random.RandomState(1)
    p = rng.rand(1, 6, 4).astype(np.float32) * 0.9 + 0.05
    t = (rng.rand(1, 6, 4) < 0.4).astype(np.float32)
    w = rng.rand(4).astype(np.float32)
    mask = np.asarray([[True] * 4 + [False] * 2])
    got = float(weighted_bce(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), jnp.asarray(mask)))
    ll = -(t * np.log(p) + (1 - t) * np.log(1 - p)) * w
    want = ll[0, :4].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cosine_mimic():
    a = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    b = jnp.asarray([[[1.0, 0.0], [1.0, 0.0]]])
    mask = jnp.asarray([[True, True]])
    # cos = [1, 0] -> clamp(0.8 - cos) = [0, 0.8] -> mean 0.4
    np.testing.assert_allclose(float(cosine_mimic_loss(a, b, mask, t=0.8)), 0.4, rtol=1e-6)


def test_rel_mimic_l1_normalizes_pred_only():
    e = jnp.asarray([[[2.0, 0.0]]])  # normalizes to [1, 0]
    t = jnp.asarray([[[0.0, 1.0]]])
    mask = jnp.asarray([[True]])
    np.testing.assert_allclose(float(rel_mimic_l1(e, t, mask)), 1.0, rtol=1e-6)
