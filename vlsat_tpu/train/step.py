"""Jitted train / eval steps.

The whole reference per-batch pipeline (forward + losses + backward +
optimizer + scheduler, SGFN_MMG/model.py:337-419,483-488) compiles into one
XLA program.  Data parallelism: shard the batch's scene axis over a
``Mesh('data')`` (vlsat_tpu.parallel.mesh) and jit does the rest — gradients
are averaged by XLA-inserted psums over ICI, replicated params stay in HBM.

Note the DYNAMIC BCE class weights depend on *global*-batch label counts;
inside jit the counts are computed over the full (sharded) batch, so the
reduction is global automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlsat_tpu.data.wire import decode_wire
from vlsat_tpu.models.mmgnet import MMGNet
from vlsat_tpu.scene import SceneBatch
from vlsat_tpu.train.losses import vlsat_total_loss
from vlsat_tpu.train.state import TrainState


def _raw_train_step(model: MMGNet, optimizer: optax.GradientTransformation,
                    lambda_o: float = 0.1, objective=None):
    """The un-jitted train step (fwd + loss + bwd + optimizer).
    ``objective(outputs, batch) -> (loss, aux)``; defaults to the
    flagship VL-SAT loss with the given lambda_o."""
    if objective is None:
        objective = lambda outputs, batch: vlsat_total_loss(outputs, batch, lambda_o=lambda_o)

    def loss_fn(params, batch_stats, batch, rng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            istrain=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss, aux = objective(outputs, batch)
        if "logit_scale" in outputs:
            aux["logit_scale"] = outputs["logit_scale"]
        return loss, (aux, mutated["batch_stats"])

    def train_step(state: TrainState, batch: SceneBatch, rng) -> Tuple[TrainState, Dict[str, Any]]:
        batch = decode_wire(batch)  # f16/u8 wire batches -> f32 (identity on f32)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, aux

    return train_step


def _materialize_text(batch: SceneBatch, table) -> SceneBatch:
    """Expand compact rel_text_idx rows into rel_text_feat on device
    (table row 0 is the zero vector for padded edges)."""
    if batch.rel_text_idx is None or table is None:
        return batch
    feat = jnp.take(table, batch.rel_text_idx, axis=0)
    return batch.replace(rel_text_feat=feat, rel_text_idx=None)


def make_train_step(model: MMGNet, optimizer: optax.GradientTransformation,
                    lambda_o: float = 0.1, donate: bool = True,
                    objective=None, text_table=None):
    """Jitted single-batch train step (see ``_raw_train_step``).

    ``text_table``: optional (T, D) deduplicated text-target table (from a
    packed split, data/packed.py).  Batches then carry (B, E) int32
    ``rel_text_idx`` instead of (B, E, D) float targets — 512x less
    host->device traffic per edge; the gather happens inside the jit.
    Pass a device-placed (replicated under a mesh) array to avoid
    re-transfer per call.
    """
    step = _raw_train_step(model, optimizer, lambda_o=lambda_o,
                           objective=objective)
    if text_table is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    table = jnp.asarray(text_table)

    def with_table(state, batch, rng, table):
        return step(state, _materialize_text(batch, table), rng)

    jitted = jax.jit(with_table, donate_argnums=(0,) if donate else ())
    return lambda state, batch, rng: jitted(state, batch, rng, table)


def make_multi_train_step(model: MMGNet, optimizer: optax.GradientTransformation,
                          lambda_o: float = 0.1, donate: bool = True,
                          objective=None, text_table=None):
    """K train steps in ONE dispatch: ``lax.scan`` over a stack of K
    batches (every SceneBatch leaf gains a leading K axis — see
    ``stack_batches``).

    Rationale: through a remote-TPU tunnel each dispatch costs ~4.3 ms of
    host time while the B=8 device step takes ~3.3 ms, so a per-step
    python loop is *dispatch-bound* (PERFORMANCE.md).  Scanning K steps
    per dispatch amortizes the enqueue to 4.3/K ms; the host input
    pipeline hands over K batches at a time.  RNG: per-step dropout keys
    are folded from the dispatch key and the step index inside the scan,
    identical in distribution to the per-step path.

    Returns ``fn(state, stacked_batches, rng) -> (state, aux)`` with
    ``aux['loss']`` the last step's loss and ``aux['losses']`` all K.
    """
    step = _raw_train_step(model, optimizer, lambda_o=lambda_o,
                           objective=objective)

    def multi_step(state: TrainState, batches: SceneBatch, rng, table=None):
        k = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def body(st, xs):
            b, i = xs
            st2, aux = step(st, _materialize_text(b, table),
                            jax.random.fold_in(rng, i))
            return st2, aux["loss"]

        state, losses = jax.lax.scan(body, state, (batches, jnp.arange(k)))
        return state, {"loss": losses[-1], "losses": losses}

    if text_table is None:
        return jax.jit(lambda state, batches, rng: multi_step(state, batches, rng),
                       donate_argnums=(0,) if donate else ())
    table = jnp.asarray(text_table)
    jitted = jax.jit(multi_step, donate_argnums=(0,) if donate else ())
    return lambda state, batches, rng: jitted(state, batches, rng, table)


def make_resident_multi_train_step(
        model: MMGNet, optimizer: optax.GradientTransformation,
        split_batch: SceneBatch = None, batch_size: int = 8,
        lambda_o: float = 0.1, donate: bool = True,
        objective=None, text_table=None):
    """K train steps in one dispatch over a DEVICE-RESIDENT split.

    ``split_batch``: a full packed bucket on device — every leaf has a
    leading scene axis (data/resident.py ``ResidentScenes.full_batch``).
    The returned ``fn(state, perm, rng)`` takes a (K*B,) int32 permutation
    of scene rows, reshapes it to (K, B), and each scanned step gathers
    its minibatch from the resident tensors ON DEVICE (a ~1 MB row gather,
    microseconds) before the usual fwd+loss+bwd+opt.  A dispatch therefore
    ships a few KB of indices instead of a multi-MB group — through a
    remote-TPU tunnel this is the difference between ~200 ms and ~0 ms of
    per-group transfer (PERFORMANCE.md round 3 "End-to-end").

    Pass ``split_batch=None`` to get the unbound form
    ``fn(state, split_batch, perm, rng)`` — the split rides as a jit
    argument (no re-transfer: it is already device-committed), so one
    compiled program serves every same-shape bucket/pack-variant.

    Step semantics are identical to ``make_multi_train_step`` fed the same
    rows: same per-step fold_in dropout keys, same loss trajectory
    (tests/test_resident.py certifies equality).
    """
    step = _raw_train_step(model, optimizer, lambda_o=lambda_o,
                           objective=objective)
    table = jnp.asarray(text_table) if text_table is not None else None

    def multi(state: TrainState, split: SceneBatch, perm, rng):
        k = perm.shape[0] // batch_size
        idx = perm.reshape(k, batch_size)

        def body(st, xs):
            rows, i = xs
            b = jax.tree_util.tree_map(
                lambda a: jnp.take(a, rows, axis=0), split)
            st2, aux = step(st, _materialize_text(b, table),
                            jax.random.fold_in(rng, i))
            return st2, aux["loss"]

        state, losses = jax.lax.scan(body, state, (idx, jnp.arange(k)))
        return state, {"loss": losses[-1], "losses": losses}

    jitted = jax.jit(multi, donate_argnums=(0,) if donate else ())
    if split_batch is None:
        return jitted
    return lambda state, perm, rng: jitted(state, split_batch, perm, rng)


def stack_batches(batches) -> SceneBatch:
    """Stack K same-shape SceneBatches along a new leading axis (the input
    of ``make_multi_train_step``)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def make_eval_step(model: MMGNet, branch_3d_only: bool = False):
    """``branch_3d_only``: serving mode — only MMGNet supports it (the 2D
    branch is read-only from the 3D stream, so 3D outputs are identical);
    requesting it for another model type raises here rather than failing
    inside the first traced call."""
    if branch_3d_only and not isinstance(model, MMGNet):
        raise ValueError(
            f"branch_3d_only is an MMGNet serving mode, got {type(model).__name__}")
    kwargs = {"branch_3d_only": True} if branch_3d_only else {}

    @jax.jit
    def eval_step(params, batch_stats, batch: SceneBatch) -> Dict[str, jnp.ndarray]:
        # wire-format batches (serving ingest, streaming loaders) decode
        # to f32 here, inside the jit; f32 batches trace the identity
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            decode_wire(batch), istrain=False, **kwargs
        )

    return eval_step
