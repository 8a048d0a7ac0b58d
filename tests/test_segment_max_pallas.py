"""Pallas segment-max kernel vs the XLA segment scatter (interpret mode).

The device path is exercised by bench.py; here the kernel runs in Pallas
interpret mode on the CPU backend and must match
``scatter_edges_to_nodes(aggr="max")`` bit-exactly, including
torch-scatter empty-segment semantics (no valid edge -> 0, negative
maxima preserved).
"""

import numpy as np

from vlsat_tpu.scene import full_edge_index


def _case(rng, B, N, D):
    E = N * (N - 1)
    ei = np.zeros((B, E, 2), np.int32)
    em = np.zeros((B, E), bool)
    for b in range(B):
        n = rng.randint(2, N + 1)
        e = full_edge_index(n)
        ei[b, : len(e)] = e
        em[b, : len(e)] = True
    data = rng.randn(B, E, D).astype(np.float32)
    return data, ei, em


def test_segment_max_pallas_matches_xla():
    import jax.numpy as jnp

    from vlsat_tpu.ops.graph import scatter_edges_to_nodes
    from vlsat_tpu.ops.pallas.segment_max import segment_max_pallas

    rng = np.random.RandomState(0)
    for (B, N, D) in [(4, 16, 256), (2, 12, 512), (3, 16, 11), (2, 4, 64)]:
        data, ei, em = _case(rng, B, N, D)
        ref = scatter_edges_to_nodes(
            jnp.asarray(data), jnp.asarray(ei), jnp.asarray(em), N, "max",
            use_pallas=False)
        out = segment_max_pallas(
            jnp.asarray(data), jnp.asarray(ei), jnp.asarray(em), N,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out),
                                      err_msg=str((B, N, D)))


def test_segment_max_pallas_negative_and_empty():
    import jax.numpy as jnp

    from vlsat_tpu.ops.pallas.segment_max import segment_max_pallas

    # node 0 receives only negative messages (keeps them); node 2 receives
    # nothing (zero); the masked edge must not contribute
    ei = np.array([[[0, 1], [0, 2], [2, 0]]], np.int32)
    em = np.array([[True, True, False]])
    data = np.array([[[-3.0, -1.0], [-2.0, -5.0], [99.0, 99.0]]], np.float32)
    out = np.asarray(segment_max_pallas(
        jnp.asarray(data), jnp.asarray(ei), jnp.asarray(em), 3, interpret=True))
    np.testing.assert_array_equal(out[0, 0], [-2.0, -1.0])
    np.testing.assert_array_equal(out[0, 1], [0.0, 0.0])
    np.testing.assert_array_equal(out[0, 2], [0.0, 0.0])


def test_onehot_gather_bit_exact_vs_take_along():
    import jax.numpy as jnp

    from vlsat_tpu.ops.graph import gather_edge_endpoints

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 16, 512), jnp.float32)
    ei = jnp.asarray(rng.randint(0, 16, (3, 240, 2)), jnp.int32)
    x_i, x_j = gather_edge_endpoints(x, ei)
    ref_i = jnp.take_along_axis(x, ei[..., 0:1], axis=1)
    ref_j = jnp.take_along_axis(x, ei[..., 1:2], axis=1)
    np.testing.assert_array_equal(np.asarray(x_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(x_j), np.asarray(ref_j))
