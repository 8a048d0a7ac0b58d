"""Optimizer: AdamW with per-module LR groups + cosine annealing.

Mirrors the reference's parameter-group scheme (SGFN_MMG/model.py:143-158):

  group          LR factor   params
  base           1           encoders, heads, projectors, mlp_3d, logit scale
  mmg_obj        1/4         MMG params except the edge-update MLPs
  mmg_rel        1/2         MMG ``nn_edge`` MLPs
  obj_predictor  1/10        the two CLIP-text cosine classifiers
  frozen         0           clip_adapter (requires_grad=False in the ref)

Weight decay/amsgrad follow the shipped config (both off).  The schedule is
torch CosineAnnealingLR(T_max=max_iteration, eta_min=0), stepped per batch.
"""

from __future__ import annotations

from typing import Any, Dict

import optax
from flax import traverse_util


def label_params(params: Dict[str, Any], freeze_non_predictor: bool = False) -> Dict[str, Any]:
    """``freeze_non_predictor`` replicates the reference's
    ``load_pretrain_model(is_freeze=True)`` (model_base.py:131-147): every
    module whose name lacks 'predictor' is frozen after loading pretrained
    weights."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        top = path[0]
        if top == "clip_adapter":
            labels[path] = "frozen"
        elif freeze_non_predictor and "predictor" not in top:
            labels[path] = "frozen"
        elif top in ("obj_predictor_2d", "obj_predictor_3d"):
            labels[path] = "obj_predictor"
        elif top == "mmg":
            labels[path] = "mmg_rel" if any("nn_edge" in p for p in path) else "mmg_obj"
        else:
            labels[path] = "base"
    return traverse_util.unflatten_dict(labels)


def batch_multiplicative_schedule(base_lr: float, factor: float = 0.95,
                                  batch_size: int = 1,
                                  ref_batch_size: int = 1):
    """Batch-size-aware multiplicative decay — the semantics of the
    reference's (unused) ``BatchMultiplicativeLR``
    (src/utils/optimizer.py:6-133): each step multiplies the LR by
    ``factor`` scaled by the seen batch fraction."""
    exponent = batch_size / max(ref_batch_size, 1)

    def schedule(step):
        return base_lr * (factor ** (step * exponent))

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    max_iteration: int = 100_000,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    schedule: str = "Cosine",
    freeze_non_predictor: bool = False,
) -> optax.GradientTransformation:
    def adamw(factor: float):
        if schedule == "Cosine":
            sched = optax.cosine_decay_schedule(lr * factor, max_iteration, alpha=0.0)
        elif schedule == "BatchMultiplicative":
            sched = batch_multiplicative_schedule(lr * factor)
        else:
            raise ValueError(f"unknown LR schedule {schedule!r}")
        return optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay)

    from functools import partial

    return optax.multi_transform(
        {
            "base": adamw(1.0),
            "mmg_obj": adamw(0.25),
            "mmg_rel": adamw(0.5),
            "obj_predictor": adamw(0.1),
            "frozen": optax.set_to_zero(),
        },
        partial(label_params, freeze_non_predictor=freeze_non_predictor),
    )
