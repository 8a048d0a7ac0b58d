"""Torch-checkpoint importer tests.

Structure: fabricated state dicts with reference module naming must import
into exactly the flax tree MMGNet.init produces (same leaves and shapes).
Numerics: the shipped reference adapter checkpoint drives our AdapterModel
and must reproduce alpha*fc2(relu(fc1 x)) + (1-alpha)*x computed in NumPy
with the same weights.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlsat_tpu.interop import torch_import as ti

REF_ADAPTER = "/root/reference/clip_adapter/checkpoint/origin_mean.pth"


def test_adapter_import_numeric(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sd = {
        "fc1.weight": torch.tensor(rng.randn(256, 512).astype(np.float32)),
        "fc1.bias": torch.tensor(rng.randn(256).astype(np.float32)),
        "fc2.weight": torch.tensor(rng.randn(512, 256).astype(np.float32)),
        "fc2.bias": torch.tensor(rng.randn(512).astype(np.float32)),
    }
    p = str(tmp_path / "adapter.pth")
    torch.save(sd, p)
    params = ti.import_adapter(ti.load_state_dict(p))

    from vlsat_tpu.models.layers import AdapterModel

    x = rng.randn(4, 512).astype(np.float32)
    out = AdapterModel(alpha=0.5).apply({"params": params}, jnp.asarray(x))
    w1, b1 = sd["fc1.weight"].numpy(), sd["fc1.bias"].numpy()
    w2, b2 = sd["fc2.weight"].numpy(), sd["fc2.bias"].numpy()
    want = 0.5 * (np.maximum(x @ w1.T + b1, 0) @ w2.T + b2) + 0.5 * x
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REF_ADAPTER), reason="reference adapter absent")
def test_shipped_adapter_loads():
    sd = ti.load_state_dict(REF_ADAPTER)
    params = ti.import_adapter(sd)
    assert params["fc1"]["kernel"].shape == (512, 256)
    assert params["fc2"]["kernel"].shape == (256, 512)
    from vlsat_tpu.models.layers import AdapterModel

    out = AdapterModel().apply({"params": params}, jnp.ones((2, 512)))
    assert np.isfinite(np.asarray(out)).all()


def _fab_linear(rng, din, dout, prefix):
    return {f"{prefix}weight" if not prefix else f"{prefix}.weight":
            rng.randn(dout, din).astype(np.float32),
            f"{prefix}bias" if not prefix else f"{prefix}.bias":
            rng.randn(dout).astype(np.float32)}


def _fab(rng, spec):
    """spec: list of (prefix, din, dout) for Linears; returns one dict."""
    out = {}
    for prefix, din, dout in spec:
        out.update(_fab_linear(rng, din, dout, prefix))
    return out


def test_full_mmgnet_import_structure():
    rng = np.random.RandomState(1)
    D, H = 512, 8
    da = 256
    dn = D // H  # 64
    do = da // H  # 32

    def pointnet(cin, cout):
        return _fab(rng, [("conv1", cin, 64), ("conv2", 64, 128), ("conv3", 128, cout)])

    def mha(prefix_dim):
        d = prefix_dim
        sd = _fab(rng, [("attention.fc_q", d, d), ("attention.fc_k", d, d),
                        ("attention.fc_v", d, d), ("attention.fc_o", d, d)])
        sd["layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd["layer_norm.bias"] = rng.randn(d).astype(np.float32)
        return sd

    def gean(prefix):
        sd = {}
        for k, v in _fab(rng, [
            (f"{prefix}.edgeatten.nn_edge.0", 3 * D, 2 * D),
            (f"{prefix}.edgeatten.nn_edge.2", 2 * D, D),
            (f"{prefix}.edgeatten.proj_query.0", D, D),
            (f"{prefix}.edgeatten.proj_edge.0", D, D),
            (f"{prefix}.edgeatten.proj_value.0", D, da),
            (f"{prefix}.edgeatten.nn.0", 2 * dn, 2 * dn),
            (f"{prefix}.edgeatten.nn.3", 2 * dn, do),
            (f"{prefix}.prop.0", D + da, D + da),
            (f"{prefix}.prop.2", D + da, D),
        ]).items():
            sd[k] = v
        return sd

    mmg_sd = {}
    for i in range(2):
        for name, d in (("self_attn", D), ("cross_attn", D), ("cross_attn_rel", D)):
            for k, v in mha(d).items():
                mmg_sd[f"{name}.{i}.{k}"] = v
        mmg_sd.update(gean(f"gcn_3ds.{i}"))
        mmg_sd.update(gean(f"gcn_2ds.{i}"))
    mmg_sd.update(_fab(rng, [("self_attn_fc.0", 4, 32), ("self_attn_fc.3", 32, 32),
                             ("self_attn_fc.6", 32, H)]))
    for idx in (2, 5):
        mmg_sd[f"self_attn_fc.{idx}.weight"] = rng.randn(32).astype(np.float32)
        mmg_sd[f"self_attn_fc.{idx}.bias"] = rng.randn(32).astype(np.float32)

    mlp3d = _fab(rng, [("0", 768, 504)])
    mlp3d["1.weight"] = rng.randn(504).astype(np.float32)
    mlp3d["1.bias"] = rng.randn(504).astype(np.float32)
    mlp3d["1.running_mean"] = rng.randn(504).astype(np.float32)
    mlp3d["1.running_var"] = np.abs(rng.randn(504)).astype(np.float32)

    sds = {
        "obj_encoder": pointnet(3, 768),
        "rel_encoder_2d": pointnet(11, D),
        "rel_encoder_3d": pointnet(11, D),
        "mmg": mmg_sd,
        "clip_adapter": _fab(rng, [("fc1", D, 256), ("fc2", 256, D)]),
        "rel_predictor_2d": _fab(rng, [("fc1", D, 512), ("fc2", 512, 256), ("fc3", 256, 26)]),
        "rel_predictor_3d": _fab(rng, [("fc1", D, 512), ("fc2", 512, 256), ("fc3", 256, 26)]),
        "obj_predictor_2d": _fab(rng, [("", D, 160)]),
        "obj_predictor_3d": _fab(rng, [("", D, 160)]),
        "mlp_3d": mlp3d,
        "triplet_projector_2d": _fab(rng, [("0", 3 * D, 1024), ("3", 1024, D)]),
        "obj_logit_scale": {"obj_logit_scale": np.asarray(2.65926, np.float32)},
    }
    variables = ti.import_mmgnet(sds, depth=2)

    # compare against flax-initialized tree
    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    batch = make_batch(node_counts=(3,), num_points=8)
    model = MMGNet(cfg=MMGNetConfig())
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True,
    )
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_vars["params"])[0])
    flat_imp = dict(jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    missing = set(map(str, flat_init)) - set(map(str, flat_imp))
    extra = set(map(str, flat_imp)) - set(map(str, flat_init))
    assert not missing, f"importer missing leaves: {sorted(missing)[:10]}"
    assert not extra, f"importer extra leaves: {sorted(extra)[:10]}"
    for path, leaf in flat_init.items():
        assert flat_imp[path].shape == leaf.shape, (path, flat_imp[path].shape, leaf.shape)

    # imported params actually run
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, istrain=False,
    )
    assert np.isfinite(np.asarray(out["rel_cls_3d"])).all()


def test_gean_split_matches_concat_matmul():
    """The nn_edge fc0 split (node_i | edge | node_j rows) must reproduce
    relu(cat([x_i, e, x_j]) @ W + b) @ W1 exactly."""
    import jax.numpy as jnp
    from vlsat_tpu.models.gnn import GraphEdgeAttenNetwork
    from vlsat_tpu.scene import full_edge_index

    rng = np.random.RandomState(0)
    D, da, H, n = 8, 4, 2, 4
    hid = 2 * D
    W = rng.randn(3 * D, hid).astype(np.float32)
    b0 = rng.randn(hid).astype(np.float32)
    W1 = rng.randn(hid, D).astype(np.float32)
    b1 = rng.randn(D).astype(np.float32)

    gean = GraphEdgeAttenNetwork(num_heads=H, dim_node=D, dim_edge=D,
                                 dim_atten=da, dropout_atten=None)
    x = jnp.asarray(rng.randn(1, n, D).astype(np.float32))
    ei = jnp.asarray(full_edge_index(n)[None])
    em = jnp.ones((1, ei.shape[1]), bool)
    e = jnp.asarray(rng.randn(1, ei.shape[1], D).astype(np.float32))
    variables = gean.init(jax.random.PRNGKey(0), x, e, ei, em)
    p = variables["params"]
    p["edgeatten_nn_edge_fc0_node_i"]["kernel"] = jnp.asarray(W[:D])
    p["edgeatten"]["nn_edge_fc0_edge"]["kernel"] = jnp.asarray(W[D:2 * D])
    p["edgeatten"]["nn_edge_fc0_edge"]["bias"] = jnp.asarray(b0)
    p["edgeatten_nn_edge_fc0_node_j"]["kernel"] = jnp.asarray(W[2 * D:])
    p["edgeatten"]["nn_edge_fc1"]["kernel"] = jnp.asarray(W1)
    p["edgeatten"]["nn_edge_fc1"]["bias"] = jnp.asarray(b1)
    _, edge_new = gean.apply({"params": p}, x, e, ei, em)

    xi = np.asarray(x[0])[np.asarray(ei[0])[:, 0]]
    xj = np.asarray(x[0])[np.asarray(ei[0])[:, 1]]
    cat = np.concatenate([xi, np.asarray(e[0]), xj], -1)
    want = np.maximum(cat @ W + b0, 0) @ W1 + b1
    np.testing.assert_allclose(np.asarray(edge_new[0]), want, rtol=2e-4, atol=2e-4)
