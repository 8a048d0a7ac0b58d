"""Synthetic scene generator for tests and benchmarks.

Produces SceneBatches with the same statistics/shape contract as the real
3DSSG pipeline (nodes with clustered point sets, fully-connected directed
edges, sparse multi-hot predicates) without needing 3RScan assets.
"""

from __future__ import annotations

import numpy as np

from vlsat_tpu.ops.descriptor import gen_descriptor
from vlsat_tpu.scene import (
    NUM_OBJ_CLASSES,
    NUM_REL_CLASSES,
    SceneBatch,
    collate,
    full_edge_index,
    pad_scene,
    pick_bucket,
)

import jax.numpy as jnp


def make_scene(
    rng: np.random.RandomState,
    num_nodes: int,
    num_points: int = 128,
    feat_dim: int = 512,
    num_obj_classes: int = NUM_OBJ_CLASSES,
    num_rel_classes: int = NUM_REL_CLASSES,
    rel_density: float = 0.08,
) -> dict:
    centers = rng.randn(num_nodes, 1, 3).astype(np.float32) * 2.0
    scales = (0.2 + rng.rand(num_nodes, 1, 3).astype(np.float32))
    pts = centers + rng.randn(num_nodes, num_points, 3).astype(np.float32) * scales
    desc = np.asarray(gen_descriptor(jnp.asarray(pts)))
    pts_centered = pts - pts.mean(axis=1, keepdims=True)
    ei = full_edge_index(num_nodes)
    gt_rels = (rng.rand(len(ei), num_rel_classes) < rel_density).astype(np.float32)
    return dict(
        obj_points=pts_centered,
        descriptor=desc,
        obj_2d_feats=rng.randn(num_nodes, feat_dim).astype(np.float32),
        gt_class=rng.randint(0, num_obj_classes, num_nodes).astype(np.int32),
        edge_index=ei,
        gt_rels=gt_rels,
    )


def make_batch(
    seed: int = 0,
    node_counts=(5, 9),
    num_points: int = 128,
    bucket: int | None = None,
    feat_dim: int = 512,
    with_text: bool = False,
    **kw,
) -> SceneBatch:
    rng = np.random.RandomState(seed)
    n_max = bucket or pick_bucket(max(node_counts))
    scenes = []
    for n in node_counts:
        s = make_scene(rng, n, num_points=num_points, feat_dim=feat_dim, **kw)
        if with_text:
            t = rng.randn(len(s["edge_index"]), feat_dim).astype(np.float32)
            t /= np.linalg.norm(t, axis=-1, keepdims=True)
            s["rel_text_feat"] = t
        scenes.append(
            pad_scene(
                s["obj_points"], s["descriptor"], s["obj_2d_feats"], s["gt_class"],
                s["edge_index"], s["gt_rels"], n_max=n_max,
                rel_text_feat=s.get("rel_text_feat"), feat_dim=feat_dim,
            )
        )
    return collate(scenes, with_text=with_text)
