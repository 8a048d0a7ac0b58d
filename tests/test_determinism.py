"""Determinism: fixed seeds must reproduce identical training trajectories.

The reference attempts single-process determinism via seeding only
(utils/util.py:3-9, worker seeds); here the whole train step is a pure
function of (state, batch, rng), so two runs from the same seed must match
bit-for-bit on CPU.
"""

import numpy as np
import jax

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.train.optim import make_optimizer
from vlsat_tpu.train.state import create_train_state
from vlsat_tpu.train.step import make_train_step


def run_losses(seed):
    batch = make_batch(node_counts=(4, 5), num_points=8, with_text=True,
                       num_obj_classes=12, num_rel_classes=5)
    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=12, num_rel_classes=5))
    opt = make_optimizer(lr=1e-3, max_iteration=100)
    state = create_train_state(model, batch, opt, seed=seed)
    step = make_train_step(model, opt, donate=False)
    rng = jax.random.PRNGKey(seed)
    losses = []
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))
    return losses, state


def test_same_seed_identical_trajectory():
    l1, s1 = run_losses(0)
    l2, s2 = run_losses(0)
    assert l1 == l2, (l1, l2)
    k1 = np.asarray(s1.params["obj_encoder"]["conv1"]["kernel"])
    k2 = np.asarray(s2.params["obj_encoder"]["conv1"]["kernel"])
    np.testing.assert_array_equal(k1, k2)


def test_different_seed_differs():
    l1, _ = run_losses(0)
    l3, _ = run_losses(1)
    assert l1 != l3
