"""End-to-end train/eval step tests, incl. the 8-device data-parallel path."""

import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.parallel import make_mesh, replicate, shard_batch
from vlsat_tpu.train.optim import label_params, make_optimizer
from vlsat_tpu.train.state import create_train_state
from vlsat_tpu.train.step import make_eval_step, make_train_step


def small_model():
    return MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))


def test_train_step_decreases_loss_and_updates():
    batch = make_batch(node_counts=(4, 6), num_points=16, with_text=True,
                       num_obj_classes=20, num_rel_classes=7)
    model = small_model()
    opt = make_optimizer(lr=1e-3, max_iteration=1000)
    state = create_train_state(model, batch, opt, seed=0)
    step = make_train_step(model, opt, donate=False)

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    losses = []
    # fixed dropout rng: deterministic descent on a fixed batch
    for i in range(8):
        state, aux = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # frozen adapter unchanged; trainables moved
    adapter0 = p0["clip_adapter"]["fc1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(state.params["clip_adapter"]["fc1"]["kernel"]), adapter0
    )
    assert np.abs(np.asarray(state.params["obj_encoder"]["conv1"]["kernel"]) -
                  np.asarray(p0["obj_encoder"]["conv1"]["kernel"])).max() > 0


def test_param_group_labels():
    batch = make_batch(node_counts=(3,), num_points=8,
                       num_obj_classes=20, num_rel_classes=7)
    model = small_model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    labels = label_params(variables["params"])
    from flax import traverse_util

    flat = traverse_util.flatten_dict(labels)
    got = {}
    for path, lab in flat.items():
        got.setdefault(lab, []).append("/".join(path))
    assert any("nn_edge" in p for p in got["mmg_rel"])
    assert all("nn_edge" not in p for p in got.get("mmg_obj", []))
    assert set(p.split("/")[0] for p in got["obj_predictor"]) == {
        "obj_predictor_2d", "obj_predictor_3d"}
    assert set(p.split("/")[0] for p in got["frozen"]) == {"clip_adapter"}


def test_data_parallel_8_devices_matches_single():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    batch = make_batch(node_counts=(3,) * 8, num_points=8, bucket=4,
                       with_text=True, num_obj_classes=20, num_rel_classes=7)
    model = small_model()
    opt = make_optimizer(lr=1e-3, max_iteration=1000)
    state = create_train_state(model, batch, opt, seed=0)
    step = make_train_step(model, opt, donate=False)

    # single-device
    s1, aux1 = step(state, batch, jax.random.PRNGKey(0))

    # sharded over 8 devices
    mesh = make_mesh(jax.devices()[:8])
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, aux8 = step(state_r, batch_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    l1 = np.asarray(s1.params["obj_encoder"]["conv1"]["kernel"])
    l8 = np.asarray(s8.params["obj_encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-6)


def test_data_parallel_3step_training_equivalence():
    """3 sharded steps on fresh batches == 3 unsharded steps: certifies the
    DYNAMIC loss weights' global-batch reduction (losses.py dynamic_rel_weights)
    and the gradient psum across optimizer-state carry.  Plain SGD keeps the
    comparison tight: Adam's 1/sqrt(v) amplifies fp32 psum-reassociation
    noise ~1000x early in training, which would only obscure what this test
    certifies (the 1-step AdamW check above covers the production opt)."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    import optax

    model = small_model()
    opt = optax.sgd(1e-2)
    batches = [
        make_batch(seed=s, node_counts=(3, 4, 3, 4) * 2, num_points=8, bucket=4,
                   with_text=True, num_obj_classes=20, num_rel_classes=7)
        for s in range(3)
    ]
    state0 = create_train_state(model, batches[0], opt, seed=0)
    step = make_train_step(model, opt, donate=False)

    s1, losses1 = state0, []
    for i, b in enumerate(batches):
        s1, aux1 = step(s1, b, jax.random.PRNGKey(i))
        losses1.append(float(aux1["loss"]))

    mesh = make_mesh(jax.devices()[:8])
    s8, losses8 = replicate(state0, mesh), []
    for i, b in enumerate(batches):
        s8, aux8 = step(s8, shard_batch(b, mesh), jax.random.PRNGKey(i))
        losses8.append(float(aux8["loss"]))

    # per-step loss equality is the direct DYNAMIC-weight signal: a
    # per-shard (non-global) label-count reduction shifts weights by O(1)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
    # params carry 3 steps of fp32 reassociation noise in the gradients
    # (psum order, the one-hot-matmul gather backward, einsum contraction
    # order) — observed up to ~3e-5 absolute on small bias leaves.  The
    # failure mode this test exists for (per-shard instead of global
    # DYNAMIC-weight reduction) shifts params at the 1e-2 level, so an
    # order-of-magnitude guard band still catches it.
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


def test_shard_batch_rejects_uneven_batch():
    import pytest

    batch = make_batch(node_counts=(3,) * 6, num_points=8, bucket=4,
                       num_obj_classes=20, num_rel_classes=7)
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch(batch, mesh)


def test_eval_step():
    batch = make_batch(node_counts=(5,), num_points=16,
                       num_obj_classes=20, num_rel_classes=7)
    model = small_model()
    opt = make_optimizer()
    state = create_train_state(model, batch, opt, seed=0)
    ev = make_eval_step(model)
    out = ev(state.params, state.batch_stats, batch)
    assert out["rel_cls_3d"].shape == (1, batch.num_edges, 7)
    assert np.isfinite(np.asarray(out["obj_logits_3d"])).all()
