"""Train state container (params + batch stats + optimizer + step)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlsat_tpu.models.mmgnet import MMGNet, MMGNetConfig
from vlsat_tpu.train.optim import make_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def create_train_state(
    model: MMGNet,
    example_batch,
    optimizer: optax.GradientTransformation,
    seed: int = 2020,
) -> TrainState:
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        example_batch,
        istrain=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
