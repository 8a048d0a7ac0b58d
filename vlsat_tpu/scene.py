"""Fixed-shape scene-graph batch representation.

The reference (wz7in/CVPR2023-VLSAT) concatenates variable-size scenes along
the node/edge dimension and keeps a ``batch_ids`` vector
(src/dataset/DataLoader.py:153-176), then rebuilds per-scene block-diagonal
attention masks with a Python loop every forward pass
(src/model/model_utils/network_MMG.py:180-209).  On TPU we instead keep the
scene axis explicit and pad nodes/edges to bucket sizes: attention over nodes
is then an ordinary batched ``(B, N, N)`` attention with a padding mask,
gather/scatter over edges are ``take_along_axis`` / ``segment_*`` ops, and
XLA sees only static shapes.

Padded entries are *sanitized* at construction time (identity-ish descriptor
values, edges pointing at node 0) so that downstream ``log`` / ``norm`` calls
never produce NaN; correctness is enforced by the masks, which every loss and
metric consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Default problem sizes for the 3DSSG-subset benchmark.
NUM_OBJ_CLASSES = 160
NUM_REL_CLASSES = 26
DESCRIPTOR_DIM = 11

# Node-count buckets.  E is always N*(N-1) (fully-connected directed graph
# minus self loops, reference src/dataset/dataset_3dssg.py:263-266).
DEFAULT_NODE_BUCKETS = (4, 8, 12, 16, 24, 32, 48, 64)


def edge_count(num_nodes: int) -> int:
    return num_nodes * (num_nodes - 1)


def pick_bucket(n: int, buckets: Sequence[int] = DEFAULT_NODE_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def full_edge_index(num_nodes: int) -> np.ndarray:
    """All ordered (i, j) pairs, i != j — shape (N*(N-1), 2)."""
    idx = np.arange(num_nodes)
    src = np.repeat(idx, num_nodes)
    dst = np.tile(idx, num_nodes)
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=-1).astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneBatch:
    """A batch of padded scene graphs.

    Shapes (B = scenes, N = max nodes, E = max edges, P = points per node,
    C = point channels, R = relation classes):

      obj_points    (B, N, P, C) float   raw sampled instance points,
                                         xyz zero-meaned per instance
      obj_mask      (B, N)       bool    node validity
      descriptor    (B, N, 11)   float   raw-point descriptor (centroid, std,
                                         dims, volume, length) — computed on
                                         *uncentered* points, reference
                                         src/utils/op_utils.py:47-64
      obj_2d_feats  (B, N, D2)   float   frozen per-instance CLIP features
      gt_class      (B, N)       int32   object class id (0 on padding)
      edge_index    (B, E, 2)    int32   (subject, object) node ids within
                                         the scene; (0, 0) on padding
      edge_mask     (B, E)       bool    edge validity
      gt_rels       (B, E, R)    float   multi-hot predicate labels
      rel_text_feat (B, E, D2)   float   optional per-edge CLIP text target
                                         (mean GT-triplet sentence embedding,
                                         reference SGFN_MMG/model.py:221-255);
                                         zeros when not provided
    """

    obj_points: jax.Array
    obj_mask: jax.Array
    descriptor: jax.Array
    obj_2d_feats: jax.Array
    gt_class: jax.Array
    edge_index: jax.Array
    edge_mask: jax.Array
    gt_rels: jax.Array
    rel_text_feat: Optional[jax.Array] = None
    # per-edge union point clouds (B, E, P_u, 4) — only the SGPN-style
    # configs consume these (dataset with_union_points=True)
    rel_points: Optional[jax.Array] = None
    # compact alternative to rel_text_feat: (B, E) int32 rows into a
    # deduplicated text-embedding table shipped to the device once (row 0
    # is the zero vector for padded edges).  The train step materializes
    # rel_text_feat = table[rel_text_idx] on device — per-edge wire cost
    # drops from 512 floats to one int32 (see data/packed.py).
    rel_text_idx: Optional[jax.Array] = None

    @property
    def num_scenes(self) -> int:
        return self.obj_points.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.obj_points.shape[1]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    def replace(self, **kw) -> "SceneBatch":
        return dataclasses.replace(self, **kw)


# Descriptor values used for padded nodes: zero centroid/std, unit dims /
# volume / length so that the log-ratios in the edge descriptor and the
# log(volume)/log(length) spatial features are exactly 0.
_SAFE_DESCRIPTOR = np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1], np.float32)


def pad_scene(
    obj_points: np.ndarray,
    descriptor: np.ndarray,
    obj_2d_feats: np.ndarray,
    gt_class: np.ndarray,
    edge_index: np.ndarray,
    gt_rels: np.ndarray,
    n_max: int,
    rel_text_feat: Optional[np.ndarray] = None,
    rel_points: Optional[np.ndarray] = None,
    feat_dim: int = 512,
) -> dict:
    """Pad a single scene's arrays to (n_max, ...) / (edge_count(n_max), ...)."""
    n = obj_points.shape[0]
    e = edge_index.shape[0]
    e_max = edge_count(n_max)
    if n > n_max:
        raise ValueError(f"scene has {n} nodes > bucket {n_max}")
    p, c = obj_points.shape[1], obj_points.shape[2]
    out = {
        "obj_points": np.zeros((n_max, p, c), np.float32),
        "obj_mask": np.zeros((n_max,), bool),
        "descriptor": np.tile(_SAFE_DESCRIPTOR, (n_max, 1)),
        "obj_2d_feats": np.zeros((n_max, obj_2d_feats.shape[-1] if obj_2d_feats.size else feat_dim), np.float32),
        "gt_class": np.zeros((n_max,), np.int32),
        "edge_index": np.zeros((e_max, 2), np.int32),
        "edge_mask": np.zeros((e_max,), bool),
        "gt_rels": np.zeros((e_max, gt_rels.shape[-1]), np.float32),
    }
    out["obj_points"][:n] = obj_points
    out["obj_mask"][:n] = True
    out["descriptor"][:n] = descriptor
    out["obj_2d_feats"][:n] = obj_2d_feats
    out["gt_class"][:n] = gt_class
    out["edge_index"][:e] = edge_index
    out["edge_mask"][:e] = True
    out["gt_rels"][:e] = gt_rels
    if rel_text_feat is not None:
        buf = np.zeros((e_max, rel_text_feat.shape[-1]), np.float32)
        buf[:e] = rel_text_feat
        out["rel_text_feat"] = buf
    if rel_points is not None:
        buf = np.zeros((e_max, *rel_points.shape[1:]), np.float32)
        buf[:e] = rel_points
        out["rel_points"] = buf
    return out


def pad_batch_scenes(batch: SceneBatch, total: int) -> SceneBatch:
    """Grow a SceneBatch to ``total`` scenes by appending fully-masked pad
    scenes (all-False obj/edge masks, sanitized descriptors so downstream
    logs stay finite).  Pad scenes contribute nothing to losses or metrics;
    used to make eval batches divide evenly over a device mesh."""
    b = batch.num_scenes
    if total < b:
        raise ValueError(f"total {total} < batch scenes {b}")
    if total == b:
        return batch
    k = total - b

    def pad(x, fill=0):
        # x.dtype works on np and jax arrays alike — no device->host copy.
        # NumPy inputs stay NumPy: padded HOST halves feed metric assembly
        # (np.asarray on a device leaf would pay a D2H round trip each)
        extra = np.full((k, *x.shape[1:]), fill, dtype=x.dtype)
        if isinstance(x, np.ndarray):
            return np.concatenate([x, extra], axis=0)
        return jnp.concatenate([jnp.asarray(x), jnp.asarray(extra)], axis=0)

    desc = np.tile(_SAFE_DESCRIPTOR, (k, batch.num_nodes, 1))
    cat = (np.concatenate if isinstance(batch.descriptor, np.ndarray)
           else lambda xs, axis: jnp.concatenate(
               [jnp.asarray(x) for x in xs], axis=axis))
    return SceneBatch(
        obj_points=pad(batch.obj_points),
        obj_mask=pad(batch.obj_mask, False),
        descriptor=cat([batch.descriptor, desc], axis=0),
        obj_2d_feats=pad(batch.obj_2d_feats),
        gt_class=pad(batch.gt_class),
        edge_index=pad(batch.edge_index),
        edge_mask=pad(batch.edge_mask, False),
        gt_rels=pad(batch.gt_rels),
        rel_text_feat=None if batch.rel_text_feat is None else pad(batch.rel_text_feat),
        rel_points=None if batch.rel_points is None else pad(batch.rel_points),
        rel_text_idx=None if batch.rel_text_idx is None else pad(batch.rel_text_idx),
    )


def collate(scenes: Sequence[dict], with_text: bool = False,
            device: bool = True) -> SceneBatch:
    """Stack per-scene padded dicts (all same bucket) into a SceneBatch.

    ``device=False`` keeps the leaves as host NumPy arrays — callers that
    narrow the wire format before the transfer (serving's encode_wire)
    need the batch on the host; jit moves it at dispatch."""
    if device:
        stack = lambda k: jnp.asarray(np.stack([s[k] for s in scenes]))
    else:
        stack = lambda k: np.stack([s[k] for s in scenes])
    rel_text = None
    if with_text and "rel_text_feat" in scenes[0]:
        rel_text = stack("rel_text_feat")
    rel_points = stack("rel_points") if "rel_points" in scenes[0] else None
    return SceneBatch(
        obj_points=stack("obj_points"),
        obj_mask=stack("obj_mask"),
        descriptor=stack("descriptor"),
        obj_2d_feats=stack("obj_2d_feats"),
        gt_class=stack("gt_class"),
        edge_index=stack("edge_index"),
        edge_mask=stack("edge_mask"),
        gt_rels=stack("gt_rels"),
        rel_text_feat=rel_text,
        rel_points=rel_points,
    )
