"""Wire-format (data/wire.py) semantics: the f16/u8 H2D narrowing must be
transparent — lossless where it claims losslessness (gt_rels), metric-
preserving on the eval suite (the streaming-vs-resident equality gate in
test_resident.py runs the f16 wire against the f32 resident split), and
disabled cleanly by VLSAT_WIRE_DTYPE=float32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.data.wire import (
    decode_wire, encode_wire, wire_dtype, wire_nbytes)
from vlsat_tpu.models import MMGNet, MMGNetConfig


def _np_batch(**kw):
    """make_batch yields jnp leaves; the wire encodes HOST batches."""
    b = make_batch(**kw)
    return jax.tree_util.tree_map(np.asarray, b)


def test_encode_decode_roundtrip_f16():
    b = _np_batch(seed=0, node_counts=(3, 5), num_points=16, bucket=8)
    enc = encode_wire(b, dtype="float16")
    assert enc.obj_points.dtype == np.float16
    assert enc.obj_2d_feats.dtype == np.float16
    assert enc.gt_rels.dtype == np.uint8          # lossless: multi-hot
    assert enc.descriptor.dtype == np.float32     # stays wide
    assert enc.edge_index.dtype == np.int32
    dec = decode_wire(jax.device_put(enc))
    assert dec.obj_points.dtype == jnp.float32
    assert dec.gt_rels.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dec.gt_rels), b.gt_rels)
    np.testing.assert_allclose(np.asarray(dec.obj_points), b.obj_points,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(dec.obj_mask), b.obj_mask)


def test_f32_wire_is_identity():
    b = _np_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    assert encode_wire(b, dtype="float32") is b
    dev = jax.device_put(b)
    assert decode_wire(dev) is dev  # no replaced leaves -> same object


def test_soft_labels_keep_f32():
    b = _np_batch(seed=2, node_counts=(4,), num_points=8, bucket=4)
    soft = b.replace(gt_rels=b.gt_rels * 0.5 + 0.1)
    enc = encode_wire(soft, dtype="float16")
    assert enc.gt_rels.dtype == np.float32  # non-integral: not narrowed


def test_wire_nbytes_cut_at_least_2x():
    """The byte accounting the bench link models use, and the headline
    claim: >= 2x H2D cut on the production streaming shape."""
    b = _np_batch(seed=3, node_counts=(13, 14, 15, 16) * 8,
                  num_points=128, bucket=16)
    f32 = wire_nbytes(b, dtype="float32")
    f16 = wire_nbytes(b, dtype="float16")
    assert f32 == sum(l.nbytes for l in jax.tree_util.tree_leaves(b))
    assert f16 == sum(l.nbytes
                      for l in jax.tree_util.tree_leaves(
                          encode_wire(b, dtype="float16")))
    assert f32 / f16 >= 2.0, (f32, f16)


def test_wire_dtype_env(monkeypatch):
    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")
    assert wire_dtype() == "float32"
    b = _np_batch(seed=4, node_counts=(4,), num_points=8, bucket=4)
    assert encode_wire(b) is b
    monkeypatch.delenv("VLSAT_WIRE_DTYPE")
    assert wire_dtype() == "float16"


@pytest.fixture(scope="module")
def model_vars():
    model = MMGNet(cfg=MMGNetConfig())
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tiny, istrain=True)
    return model, v["params"], v.get("batch_stats", {})


def test_eval_step_decodes_wire(model_vars):
    """make_eval_step consumes an encoded batch (the serving ingest path)
    and its outputs match the f32 batch to f16-input-noise tolerance."""
    from vlsat_tpu.train.step import make_eval_step

    model, params, bstats = model_vars
    b = _np_batch(seed=5, node_counts=(3, 6), num_points=32, bucket=8)
    step = make_eval_step(model)
    out32 = step(params, bstats, jax.device_put(b))
    out16 = step(params, bstats, jax.device_put(encode_wire(b, "float16")))
    for k in out32:
        a, c = np.asarray(out32[k]), np.asarray(out16[k])
        assert np.isfinite(c[np.isfinite(a)]).all()
        np.testing.assert_allclose(c, a, rtol=5e-2, atol=5e-2, err_msg=k)


def test_train_step_decodes_wire(model_vars):
    """The train step accepts a wire batch; loss matches f32 within cast
    noise and gradients stay finite."""
    from vlsat_tpu.train.optim import make_optimizer
    from vlsat_tpu.train.state import create_train_state
    from vlsat_tpu.train.step import make_train_step

    model, params, bstats = model_vars
    tiny = make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4)
    opt = make_optimizer(lr=1e-4, max_iteration=10)
    state = create_train_state(model, tiny, opt, seed=0)
    step = make_train_step(model, opt, donate=False)
    b = _np_batch(seed=6, node_counts=(3, 5), num_points=16, bucket=8,
                  with_text=True)
    key = jax.random.PRNGKey(0)
    _, aux32 = step(state, jax.device_put(b), key)
    _, aux16 = step(state, jax.device_put(encode_wire(b, "float16")), key)
    l32, l16 = float(aux32["loss"]), float(aux16["loss"])
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=2e-2, atol=2e-2)


def test_evaluate_metrics_equal_f16_vs_f32_wire(tmp_path, monkeypatch):
    """The EXACTNESS GATE the round-5 wire slimming ships under: the full
    eval metric suite over the streaming loader is IDENTICAL with the f16
    wire and the bit-exact f32 wire on the synthetic split (rank metrics
    are discrete; the f16 input perturbation must not flip any of them).
    """
    from vlsat_tpu.data.packed import PackedLoader, PackedScenes, pack_scenes
    from vlsat_tpu.data.synthetic import make_synthetic_split
    from vlsat_tpu.data.dataset import SSGScenes
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.train.step import make_eval_step

    root, scans, cache = make_synthetic_split(
        str(tmp_path / "split"), num_scans=12, insts_per_scan=(4, 8),
        vertices_per_inst=60, rels_per_scan=4, seed=0)
    ds = SSGScenes(root, scans, "validation_scans", cache_root=cache)
    pack_scenes(ds, str(tmp_path / "pack"), seed=0)
    packed = PackedScenes(str(tmp_path / "pack"))

    model, params, bstats = (lambda m, v: (m, v["params"],
                                           v.get("batch_stats", {})))(
        MMGNet(cfg=MMGNetConfig()),
        MMGNet(cfg=MMGNetConfig()).init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            make_batch(seed=1, node_counts=(4,), num_points=8, bucket=4),
            istrain=True))
    eval_fn = make_eval_step(model)

    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float32")
    m32 = evaluate(eval_fn, params, bstats,
                   PackedLoader(packed, batch_size=4), verbose=False)
    monkeypatch.setenv("VLSAT_WIRE_DTYPE", "float16")
    m16 = evaluate(eval_fn, params, bstats,
                   PackedLoader(packed, batch_size=4), verbose=False)
    assert m32.keys() == m16.keys()
    for k in m32:
        np.testing.assert_array_equal(np.asarray(m32[k]),
                                      np.asarray(m16[k]), err_msg=k)
