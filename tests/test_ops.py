"""Unit tests for core graph/descriptor/attention/pointnet ops.

Golden values are computed with straightforward NumPy, replicating the
reference semantics documented in SURVEY.md §2.3/§2.6.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlsat_tpu.ops import (
    gen_descriptor,
    edge_descriptor,
    gather_edge_endpoints,
    scatter_edges_to_nodes,
    masked_attention,
    pairwise_distance_bias,
    pointnet_encode,
)
from vlsat_tpu.scene import full_edge_index


def test_gen_descriptor_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 5, 32, 3).astype(np.float32)
    d = np.asarray(gen_descriptor(jnp.asarray(pts)))
    assert d.shape == (2, 5, 11)
    for b in range(2):
        for n in range(5):
            p = pts[b, n]
            np.testing.assert_allclose(d[b, n, 0:3], p.mean(0), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(d[b, n, 3:6], p.std(0, ddof=1), rtol=1e-5, atol=1e-6)
            dims = p.max(0) - p.min(0)
            np.testing.assert_allclose(d[b, n, 6:9], dims, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(d[b, n, 9], dims.prod(), rtol=1e-5)
            np.testing.assert_allclose(d[b, n, 10], dims.max(), rtol=1e-5)


def test_edge_descriptor():
    rng = np.random.RandomState(1)
    desc = np.abs(rng.randn(1, 4, 11)).astype(np.float32) + 0.5
    ei = full_edge_index(4)[None]  # (1, 12, 2)
    ed = np.asarray(edge_descriptor(jnp.asarray(desc), jnp.asarray(ei)))
    assert ed.shape == (1, 12, 11)
    for e in range(12):
        i, j = ei[0, e]
        np.testing.assert_allclose(ed[0, e, 0:6], desc[0, i, 0:6] - desc[0, j, 0:6], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            ed[0, e, 6:11], np.log(desc[0, i, 6:11] / desc[0, j, 6:11]), rtol=1e-3, atol=1e-4
        )


def test_gather_endpoints():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    ei = jnp.asarray([[[2, 1], [0, 3]]], dtype=jnp.int32)
    x_i, x_j = gather_edge_endpoints(x, ei)
    np.testing.assert_array_equal(np.asarray(x_i[0, 0]), [6, 7, 8])
    np.testing.assert_array_equal(np.asarray(x_j[0, 0]), [3, 4, 5])
    np.testing.assert_array_equal(np.asarray(x_i[0, 1]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(x_j[0, 1]), [9, 10, 11])


@pytest.mark.parametrize("aggr", ["max", "add", "mean"])
def test_scatter_semantics(aggr):
    # 3 nodes, 4 edge slots (last invalid). Edges aggregate onto edge[0].
    data = jnp.asarray([[[-1.0], [-3.0], [2.0], [99.0]]])
    ei = jnp.asarray([[[0, 1], [0, 2], [1, 0], [0, 0]]], dtype=jnp.int32)
    mask = jnp.asarray([[True, True, True, False]])
    out = np.asarray(scatter_edges_to_nodes(data, ei, mask, num_nodes=3, aggr=aggr))
    if aggr == "max":
        # node0: max(-1,-3) = -1 (negative max preserved); node2 empty -> 0
        np.testing.assert_allclose(out[0, :, 0], [-1.0, 2.0, 0.0])
    elif aggr == "add":
        np.testing.assert_allclose(out[0, :, 0], [-4.0, 2.0, 0.0])
    else:
        np.testing.assert_allclose(out[0, :, 0], [-2.0, 2.0, 0.0])


def test_masked_attention_matches_dense_softmax():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 2, 4, 8).astype(np.float32)
    k = rng.randn(1, 2, 4, 8).astype(np.float32)
    v = rng.randn(1, 2, 4, 8).astype(np.float32)
    bias = rng.randn(1, 2, 4, 4).astype(np.float32)
    mask = np.ones((1, 1, 4, 4), bool)
    mask[..., 3] = False  # key 3 masked for all queries
    out = np.asarray(
        masked_attention(*map(jnp.asarray, (q, k, v)), mask=jnp.asarray(mask), bias=jnp.asarray(bias))
    )
    att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(8.0) + bias
    att = np.where(mask, att, -np.inf)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    ref = att @ v
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_masked_attention_fully_masked_row_is_finite():
    q = k = v = jnp.ones((1, 1, 2, 4))
    mask = jnp.asarray([[[[False, False], [True, True]]]])
    out = np.asarray(masked_attention(q, k, v, mask=mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 0, 0], 0.0)


def test_masked_attention_bnhd_large_score_routes_to_dpa(monkeypatch):
    """The size-gated dot_product_attention path must match the handwritten
    core — including zeros (not NaN) on fully-masked query rows and the
    additive distance bias.  Exercised on small shapes by lowering the gate."""
    import vlsat_tpu.ops.attention as A

    rng = np.random.RandomState(7)
    B, N, H, D = 2, 6, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.randn(B, 1, N, N).astype(np.float32))
    mask = np.ones((B, 1, N, N), bool)
    mask[0, 0, 2, :] = False  # fully-masked query row
    mask[..., 5] = False      # padded key for every query
    mask = jnp.asarray(mask)

    for kw in (
        dict(mask=mask, bias=bias),
        dict(mask=mask),
        dict(bias=bias),
        dict(),
    ):
        monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", 1 << 62)
        ref = np.asarray(A.masked_attention_bnhd(q, k, v, **kw))
        monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", 1)
        out = np.asarray(A.masked_attention_bnhd(q, k, v, **kw))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        if "mask" in kw:
            np.testing.assert_allclose(out[0, 2], 0.0)  # masked row -> zeros


def test_masked_attention_bnhd_mask_and_kmask_intersection(monkeypatch):
    """Round-5 review fix: when BOTH mask and k_mask are given and their
    intersection empties a query row that was non-empty under mask alone,
    the dpa route must return zeros for that row (like the handwritten
    chain), not softmax an all-False row into NaN."""
    import vlsat_tpu.ops.attention as A

    rng = np.random.RandomState(13)
    B, N, H, D = 2, 5, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) for _ in range(3))
    mask = np.ones((B, 1, N, N), bool)
    mask[0, 0, 1, :2] = False        # row 1 attends keys 2..4 under mask
    km = np.ones((B, N), bool)
    km[0, 2:] = False                # ...but k_mask kills keys 2..4
    mask, km = jnp.asarray(mask), jnp.asarray(km)

    for gate in (1 << 62, 1):
        monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", gate)
        out = np.asarray(A.masked_attention_bnhd(q, k, v, mask=mask, k_mask=km))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, 1], 0.0)  # emptied row -> zeros
        if gate > 1:
            ref = out
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_masked_attention_bnhd_mul_bias_never_routes(monkeypatch):
    """way='mul' has no dot_product_attention equivalent; it must stay on
    the handwritten chain even above the size gate."""
    import vlsat_tpu.ops.attention as A

    def _boom(*a, **kw):  # pragma: no cover - fails the test if reached
        raise AssertionError("mul-bias path must not route through dpa")

    monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", 1)
    monkeypatch.setattr(A, "_dpa_large", _boom)
    rng = np.random.RandomState(8)
    q, k, v = (jnp.asarray(rng.randn(1, 4, 2, 8).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.rand(1, 1, 4, 4).astype(np.float32) + 0.5)
    out = np.asarray(A.masked_attention_bnhd(q, k, v, bias=bias, bias_way="mul"))
    assert np.isfinite(out).all()


def test_masked_attention_bnhd_large_score_grad_finite(monkeypatch):
    """Gradients through the dpa path stay finite, including through the
    fully-masked-row zeroing."""
    import vlsat_tpu.ops.attention as A

    monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", 1)
    rng = np.random.RandomState(9)
    q, k, v = (jnp.asarray(rng.randn(1, 4, 2, 8).astype(np.float32)) for _ in range(3))
    mask = np.ones((1, 1, 4, 4), bool)
    mask[0, 0, 3, :] = False
    mask = jnp.asarray(mask)

    def loss(q):
        return jnp.sum(A.masked_attention_bnhd(q, k, v, mask=mask) ** 2)

    g = np.asarray(jax.grad(loss)(q))
    assert np.isfinite(g).all()


def test_masked_attention_bnhd_factored_masks_match_dense(monkeypatch):
    """q_mask/k_mask are the factored form of the rectangular padding mask
    q&k — outputs must be BIT-identical to the dense product on the
    handwritten chain and numerically identical on the dpa route,
    including a scene with zero valid keys (all outputs zero)."""
    import vlsat_tpu.ops.attention as A

    rng = np.random.RandomState(11)
    B, N, H, D = 3, 6, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) for _ in range(3))
    qm = np.ones((B, N), bool)
    km = np.ones((B, N), bool)
    qm[0, 4:] = False
    km[0, 3:] = False
    qm[2] = False          # scene with nothing valid at all
    km[2] = False
    dense = jnp.asarray((qm[:, None, :, None] & km[:, None, None, :]))
    qm, km = jnp.asarray(qm), jnp.asarray(km)

    for gate in (1 << 62, 1):
        monkeypatch.setattr(A, "LARGE_SCORE_ELEMENTS", gate)
        ref = np.asarray(A.masked_attention_bnhd(q, k, v, mask=dense))
        out = np.asarray(A.masked_attention_bnhd(q, k, v, q_mask=qm, k_mask=km))
        assert np.isfinite(out).all()
        if gate > 1:
            np.testing.assert_array_equal(out, ref)   # handwritten: bit-exact
        else:
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[0, 4:], 0.0)   # padded query rows
        np.testing.assert_allclose(out[2], 0.0)       # fully-empty scene


def test_pairwise_distance_bias_layout():
    centers = jnp.asarray([[[0.0, 0, 0], [3.0, 4.0, 0]]])
    w = np.asarray(pairwise_distance_bias(centers))
    # entry [q=0, k=1] = centers[1] - centers[0], dist 5
    np.testing.assert_allclose(w[0, 0, 1], [3, 4, 0, 5], atol=1e-5)
    np.testing.assert_allclose(w[0, 1, 0], [-3, -4, 0, 5], atol=1e-5)


def test_pointnet_encode():
    rng = np.random.RandomState(3)
    pts = rng.randn(2, 3, 16, 3).astype(np.float32)
    ws = [rng.randn(3, 8).astype(np.float32), rng.randn(8, 12).astype(np.float32)]
    bs = [rng.randn(8).astype(np.float32), rng.randn(12).astype(np.float32)]
    out = np.asarray(pointnet_encode(jnp.asarray(pts), [jnp.asarray(w) for w in ws], [jnp.asarray(b) for b in bs]))
    x = np.maximum(pts @ ws[0] + bs[0], 0)
    x = np.maximum(x @ ws[1] + bs[1], 0)
    ref = x.max(axis=-2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert out.shape == (2, 3, 12)
