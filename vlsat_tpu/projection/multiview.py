"""Multi-view projection front-end (2D CLIP feature generation).

Counterpart of the reference's offline ``data/pointcloud2image.py``: for
every annotated instance, project its points into every RGB frame, pick
good views (three quality tiers), crop padded bounding boxes, encode the
crops with a CLIP image encoder and save the mean feature per instance —
the sole source of ``obj_2d_feats`` at train time.

TPU re-design: the per-instance x per-frame projection loop
(pointcloud2image.py:168-176) becomes one jitted einsum over all frames
and points; frame selection / cropping stays host-side (tiny); the image
encoder is pluggable (transformers CLIP vision tower offline, or any
callable images -> features).

Conventions (reference :168-176): extrinsics are world->camera 4x4,
intrinsic is the 3x4 projection block, a point is visible when
0 < u < width and 0 < v < height with positive depth handled implicitly
by the reference (we expose it explicitly via ``require_positive_depth``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("width", "height", "require_positive_depth"))
def project_points(
    points: jnp.ndarray,       # (P, 3) world coordinates
    extrinsics: jnp.ndarray,   # (F, 4, 4) world -> camera
    intrinsic: jnp.ndarray,    # (3, 4) or (F, 3, 4)
    width: int,
    height: int,
    require_positive_depth: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pix (F, P, 2), visible (F, P))."""
    ph = jnp.concatenate([points, jnp.ones((points.shape[0], 1), points.dtype)], -1)
    cam = jnp.einsum("fij,pj->fpi", extrinsics, ph)            # (F, P, 4)
    if intrinsic.ndim == 2:
        img = jnp.einsum("ij,fpj->fpi", intrinsic, cam)        # (F, P, 3)
    else:
        img = jnp.einsum("fij,fpj->fpi", intrinsic, cam)
    z = img[..., 2:3]
    pix = img[..., :2] / z
    visible = ((pix[..., 0] < width) & (pix[..., 0] > 0)
               & (pix[..., 1] < height) & (pix[..., 1] > 0))
    if require_positive_depth:
        visible = visible & (z[..., 0] > 0)
    return pix, visible


def crop_box(pix: np.ndarray, width: int, height: int) -> Tuple[int, int, int, int]:
    """Reference padded bbox (pointcloud2image.py:216-226):
    returns (top, left, bottom, right) in pixel rows/cols."""
    padding_x = min(height * 0.3, 20)
    padding_y = min(width * 0.3, 20)
    top = max(0, int(pix[:, 1].min()) - padding_x)
    left = max(0, int(pix[:, 0].min()) - padding_y)
    bottom = min(int(pix[:, 1].max()) + padding_x, height)
    right = min(int(pix[:, 0].max()) + padding_y, width)
    return int(top), int(left), int(bottom), int(right)


@dataclass
class ViewCrop:
    frame: int
    box: Optional[Tuple[int, int, int, int]]  # None = whole frame (tier C)
    tier: str                                  # 'A' | 'B' | 'C'
    pc_ratio: float


def select_view_crops(
    pix: np.ndarray,            # (F, P, 2)
    visible: np.ndarray,        # (F, P)
    clip_rank: Sequence[int],   # frames sorted by CLIP class similarity
    width: int,
    height: int,
    max_views: int = 5,
) -> List[ViewCrop]:
    """Three-tier view selection (pointcloud2image.py:211-293):
    A = CLIP-ranked frames where the instance projects; B = best frames by
    projected-point ratio; C = top CLIP frame, whole image."""
    out: List[ViewCrop] = []
    for k in clip_rank:
        sel = pix[k][visible[k]]
        if len(sel) == 0:
            continue
        out.append(ViewCrop(int(k), crop_box(sel, width, height), "A",
                            float(visible[k].mean())))
        if len(out) >= max_views:
            return out
    if not out:
        ratios = visible.mean(-1)
        for k in np.argsort(-ratios, kind="stable")[:max_views]:
            sel = pix[k][visible[k]]
            if len(sel) == 0:
                continue
            out.append(ViewCrop(int(k), crop_box(sel, width, height), "B",
                                float(ratios[k])))
    if not out:
        out.append(ViewCrop(int(clip_rank[0]), None, "C", 0.0))
    return out


class MultiViewFeatureExtractor:
    """Orchestrates per-scene feature generation.

    ``image_encoder``: callable mapping a list of HxWx3 uint8 arrays to
    (n, d) features (e.g. a CLIP vision tower).  The saved artifact matches
    the reference naming: instance_{id}_class_{name}_origin_view_mean.npy
    (consumed by the dataset, dataset_3dssg.py:296-297).
    """

    def __init__(self, image_encoder: Callable, feat_dim: int = 512,
                 max_views: int = 5):
        self.encode = image_encoder
        self.feat_dim = feat_dim
        self.max_views = max_views

    def instance_feature(self, images: Sequence[np.ndarray],
                         crops: Sequence[ViewCrop]) -> np.ndarray:
        views: List[np.ndarray] = []
        for c in crops[: self.max_views]:
            img = images[c.frame]
            if c.box is not None:
                t, l, b, r = c.box
                views.append(img[t:b, l:r])
            views.append(img)  # reference encodes cropped AND full frames
        feats = self.encode(views)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        return feats.mean(0)

    def process_scene(
        self,
        points: np.ndarray,
        instances: np.ndarray,
        instance_names: Dict[int, str],
        images: Sequence[np.ndarray],
        extrinsics: np.ndarray,
        intrinsic: np.ndarray,
        clip_rank_per_class: Dict[str, Sequence[int]],
        width: int,
        height: int,
        save_dir: Optional[str] = None,
    ) -> Dict[int, np.ndarray]:
        results: Dict[int, np.ndarray] = {}
        log: List[str] = []
        for iid, name in instance_names.items():
            pts = points[instances == iid]
            if len(pts) == 0:
                continue
            pix, vis = project_points(
                jnp.asarray(pts, jnp.float32), jnp.asarray(extrinsics, jnp.float32),
                jnp.asarray(intrinsic, jnp.float32), width, height)
            crops = select_view_crops(
                np.asarray(pix), np.asarray(vis),
                clip_rank_per_class.get(name, range(len(images))),
                width, height, self.max_views)
            feat = self.instance_feature(images, crops)
            results[iid] = feat
            log.append(f"instance {iid} class {name} tier {crops[0].tier}")
            if save_dir is not None:
                os.makedirs(save_dir, exist_ok=True)
                np.save(os.path.join(
                    save_dir, f"instance_{iid}_class_{name}_origin_view_mean.npy"),
                    feat)
        if save_dir is not None and log:
            with open(os.path.join(save_dir, "project_quality.txt"), "a") as f:
                f.write("\n".join(log) + "\n")
        return results
