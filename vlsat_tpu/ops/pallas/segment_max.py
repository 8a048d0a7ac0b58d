"""Masked per-scene segment-max (Pallas/TPU).

The GEAN aggregation (reference ``Aggre_Index`` with ``GCN_AGGR=max``,
src/model/model_utils/network_util.py:64-73) scatters per-edge messages
onto nodes.  XLA lowers ``jax.ops.segment_max`` to a serialized scatter
that runs at ~80-230 GB/s effective on TPU — the round-2 profile shows the
two scatter fusions costing ~160 us of the ~1.36 ms eval step.  This
kernel instead streams each scene's edge messages through VMEM once and
reduces them against an iota segment mask, so HBM traffic is one read of
the messages plus one write of the (N, D) output.

Semantics match ``vlsat_tpu.ops.graph._segment_reduce(aggr="max")``
(torch-scatter empty-segment behavior): a node with no valid incoming edge
aggregates to 0, a node whose true max is negative keeps it.  Invalid
(padded) edges carry segment id ``num_nodes`` and never match the iota.

Scope: the kernel itself is a forward primitive; the caller
(``vlsat_tpu.ops.graph.scatter_edges_to_nodes``, graph.py:130-145) wraps
it in a custom VJP that re-derives the gradient through the XLA scatter
at the same primal, so differentiating through it works — callers still
route *training* through the XLA scatter because its fused backward is
cheaper.  Single-device only: under a sharded eval the gate in
``_pallas_max_available`` keeps the XLA scatter (see PERFORMANCE.md,
"Pallas segment-max under data parallelism" for why).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = jnp.finfo(jnp.float32).min
_E_CHUNK = 128   # edges reduced per loop step; bounds the (N, EC, DK) temp
_D_MAX = 256     # feature tile


def _kernel(seg_ref, data_ref, out_ref, *, num_nodes: int, e_chunk: int):
    e_total = seg_ref.shape[-1]
    d = data_ref.shape[-1]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (num_nodes, e_chunk), 0)

    def body(c, carry):
        acc, cnt = carry
        s = seg_ref[0, 0, pl.ds(c * e_chunk, e_chunk)]           # (EC,)
        block = data_ref[0, pl.ds(c * e_chunk, e_chunk), :]      # (EC, D)
        maskf = (s[None, :] == n_iota).astype(jnp.float32)       # (N, EC)
        # Mosaic cannot insert a minor dim on an i1 vector; use an additive
        # f32 penalty instead of a boolean select: unmatched rows get
        # +_NEG, pushing them below any real candidate for the max
        penalty = (1.0 - maskf) * _NEG                           # (N, EC)
        cand = block[None, :, :] + penalty[:, :, None]           # (N, EC, D)
        acc = jnp.maximum(acc, cand.max(axis=1))
        cnt = cnt + maskf.sum(axis=1)
        return acc, cnt

    acc0 = jnp.full((num_nodes, d), _NEG, jnp.float32)
    cnt0 = jnp.zeros((num_nodes,), jnp.float32)
    acc, cnt = jax.lax.fori_loop(0, e_total // e_chunk, body, (acc0, cnt0))
    out_ref[0] = jnp.where(cnt[:, None] > 0, acc, 0.0)


@functools.partial(jax.jit, static_argnames=("num_nodes", "target", "interpret"))
def segment_max_pallas(
    edge_data: jnp.ndarray,    # (B, E, D)
    edge_index: jnp.ndarray,   # (B, E, 2)
    edge_mask: jnp.ndarray,    # (B, E) bool
    num_nodes: int,
    target: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    b, e, d = edge_data.shape
    seg = jnp.where(edge_mask, edge_index[..., target], num_nodes)
    seg = seg.astype(jnp.int32)

    e_pad = -(-e // _E_CHUNK) * _E_CHUNK
    if e_pad != e:
        seg = jnp.pad(seg, ((0, 0), (0, e_pad - e)),
                      constant_values=num_nodes)
        edge_data = jnp.pad(edge_data, ((0, 0), (0, e_pad - e), (0, 0)))
    d_tile = min(_D_MAX, -(-d // 128) * 128)
    d_pad = -(-d // d_tile) * d_tile
    if d_pad != d:
        edge_data = jnp.pad(edge_data, ((0, 0), (0, 0), (0, d_pad - d)))
    # node axis padded to the f32 sublane multiple; pad nodes never match
    # any segment id < n_pad... they CAN match padded seg ids in
    # [num_nodes, n_pad), so route invalid edges to n_pad instead
    n_pad = max(8, -(-num_nodes // 8) * 8)
    if n_pad != num_nodes:
        seg = jnp.where(seg >= num_nodes, n_pad, seg)

    out = pl.pallas_call(
        functools.partial(_kernel, num_nodes=n_pad, e_chunk=_E_CHUNK),
        grid=(b, d_pad // d_tile),
        in_specs=[
            pl.BlockSpec((1, 1, e_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, e_pad, d_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d_tile), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(seg[:, None, :], edge_data.astype(jnp.float32))
    return out[:, :num_nodes, :d]


def pallas_segment_max_supported(edge_data: jnp.ndarray, num_nodes: int) -> bool:
    """Shape guard: keep the (N, EC, DK) temporary + data block within a
    conservative VMEM budget."""
    b, e, d = edge_data.shape
    e_pad = -(-e // _E_CHUNK) * _E_CHUNK
    d_tile = min(_D_MAX, -(-d // 128) * 128)
    temp = num_nodes * _E_CHUNK * d_tile * 4
    block = e_pad * d_tile * 4
    return (temp + block) <= 10 * 2 ** 20
