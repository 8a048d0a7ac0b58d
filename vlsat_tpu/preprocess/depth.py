"""Depth back-projection + per-frame visible-instance lists.

Counterpart of data/get_object_frame.py:128-183: back-project each depth
map to world space, assign every pixel its nearest labeled instance point,
and record which instances are visible per frame (the depth-based
alternative to the CLIP projection pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def backproject_depth(depth: jnp.ndarray, intrinsic: jnp.ndarray,
                      cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """depth (H, W) + intrinsic (3, 3) + pose (4, 4) -> world points (H*W, 3).

    Pixels at (u, v) unproject as z * K^-1 [u, v, 1]; zero-depth pixels
    produce the camera origin (filter with depth > 0 downstream).
    """
    h, w = depth.shape
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(u)
    pix = jnp.stack([u, v, ones], axis=-1).reshape(-1, 3)
    rays = pix @ jnp.linalg.inv(intrinsic).T
    cam = rays * depth.reshape(-1, 1)
    ph = jnp.concatenate([cam, jnp.ones((cam.shape[0], 1), cam.dtype)], axis=-1)
    world = ph @ cam_to_world.T
    return world[:, :3]


def nearest_instance(world_pts: np.ndarray, labeled_pts: np.ndarray,
                     labels: np.ndarray, max_dist: float = 0.1,
                     chunk: int = 2048) -> np.ndarray:
    """Nearest labeled point per query (brute force, chunked); 0 when
    farther than max_dist."""
    out = np.zeros(len(world_pts), labels.dtype)
    for i in range(0, len(world_pts), chunk):
        q = world_pts[i:i + chunk]
        d2 = np.square(q[:, None, :] - labeled_pts[None, :, :]).sum(-1)
        nn = np.argmin(d2, axis=1)
        ok = np.sqrt(d2[np.arange(len(q)), nn]) <= max_dist
        out[i:i + chunk] = np.where(ok, labels[nn], 0)
    return out


def visible_instances_per_frame(
    depths: List[np.ndarray], intrinsic: np.ndarray, poses: List[np.ndarray],
    labeled_pts: np.ndarray, labels: np.ndarray,
    min_pixels: int = 50, stride: int = 8, max_dist: float = 0.1,
) -> Dict[int, List[int]]:
    """frame index -> instance ids visible with >= min_pixels assigned
    pixels (subsampled by ``stride`` for tractability)."""
    out: Dict[int, List[int]] = {}
    # subsampling the depth map rescales pixel coordinates by `stride`, so
    # the intrinsic's focal lengths and principal point shrink with it
    k_sub = np.asarray(intrinsic[:3, :3], np.float32).copy()
    k_sub[0, :] /= stride
    k_sub[1, :] /= stride
    for f, (d, pose) in enumerate(zip(depths, poses)):
        ds = d[::stride, ::stride]
        world = np.asarray(backproject_depth(
            jnp.asarray(ds, jnp.float32),
            jnp.asarray(k_sub, jnp.float32),
            jnp.asarray(pose, jnp.float32)))
        valid = ds.reshape(-1) > 0
        inst = nearest_instance(world[valid], labeled_pts, labels, max_dist)
        ids, counts = np.unique(inst[inst != 0], return_counts=True)
        out[f] = [int(i) for i, c in zip(ids, counts)
                  if c * stride * stride >= min_pixels]
    return out
