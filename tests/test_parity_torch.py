"""Full-model numeric parity vs a PyTorch oracle of the reference forward.

The reference's own verification idiom is same-input → two-implementations
→ allclose (op_utils.py:283-303); the oracle in interop/torch_oracle.py is
a PyG-free torch twin of the reference ``Mmgnet`` with the reference's
exact state-dict layout, so a randomly initialized oracle can be imported
through interop/torch_import.py and both implementations run on identical
weights and inputs.  Single-scene batches make the reference's unmasked
edge cross-attention (network_MMG.py:231) equivalent to our per-scene
masked one, isolating genuine numeric differences.

Gate: rtol 1e-3 in fp32 on CPU (the op_utils.py:283-303 gate).  atol is
1e-4 rather than the single-op 1e-5: the composed forward chains ~30
matmuls/reductions whose fp32 accumulation order differs between XLA and
torch, and the observed worst-case drift on near-zero logits is ~2e-5.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vlsat_tpu.data.synthetic import make_batch
from vlsat_tpu.interop.torch_import import import_gean, import_mmgnet
from vlsat_tpu.interop.torch_oracle import TorchMmgnetOracle, module_state_dicts
from vlsat_tpu.models import MMGNet, MMGNetConfig
from vlsat_tpu.scene import edge_count

RTOL, ATOL = 1e-3, 1e-4


def _unpadded(batch, n):
    """Extract the oracle's unpadded torch inputs from a 1-scene SceneBatch."""
    e = edge_count(n)
    t = lambda x: torch.from_numpy(np.asarray(x)).float()
    return dict(
        obj_points=t(batch.obj_points[0, :n]),
        obj_2d_feats=t(batch.obj_2d_feats[0, :n]),
        edge_index=torch.from_numpy(np.asarray(batch.edge_index[0, :e])).long(),
        descriptor=t(batch.descriptor[0, :n]),
        batch_ids=torch.zeros(n, dtype=torch.long),
    )


def _build_pair(seed: int):
    torch.manual_seed(seed)
    oracle = TorchMmgnetOracle().eval()
    # non-trivial BN running stats so the eval-mode BN path is actually tested
    g = torch.Generator().manual_seed(seed + 1)
    bn = oracle.mlp_3d[1]
    bn.running_mean.copy_(torch.randn(504, generator=g) * 0.5)
    bn.running_var.copy_(torch.rand(504, generator=g) + 0.5)
    variables = import_mmgnet(module_state_dicts(oracle))
    model = MMGNet(cfg=MMGNetConfig())
    return oracle, model, variables


def _check_flagship(n: int, bucket: int, seed: int):
    batch = make_batch(seed=seed, node_counts=(n,), num_points=32, bucket=bucket)
    oracle, model, variables = _build_pair(seed)
    with torch.no_grad():
        ref = oracle(istrain=True, **_unpadded(batch, n))
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, istrain=True, deterministic=True,
    )
    e = edge_count(n)
    slices = {
        "obj_logits_3d": n, "obj_logits_2d": n,
        "rel_cls_3d": e, "rel_cls_2d": e,
        "obj_feature_3d_mimic": n, "obj_features_2d_mimic": n,
        "edge_feature_2d_dis": e,
    }
    for key, k in slices.items():
        got = np.asarray(out[key])[0, :k]
        want = ref[key].numpy()
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL, err_msg=key)
    np.testing.assert_allclose(
        float(out["logit_scale"]), float(ref["logit_scale"]), rtol=RTOL)


def test_flagship_parity_small_bucket():
    _check_flagship(n=9, bucket=12, seed=0)


def test_flagship_parity_padded_bucket16():
    _check_flagship(n=13, bucket=16, seed=7)


def test_mmgnet_single_parity():
    from vlsat_tpu.interop.torch_import import import_mmgnet_single
    from vlsat_tpu.interop.torch_oracle import (
        TorchMmgnetSingleOracle, single_module_state_dicts)
    from vlsat_tpu.models.variants import MMGNetSingle

    n, bucket, seed = 10, 12, 4
    batch = make_batch(seed=seed, node_counts=(n,), num_points=32, bucket=bucket)
    torch.manual_seed(seed)
    oracle = TorchMmgnetSingleOracle().eval()
    g = torch.Generator().manual_seed(seed + 1)
    oracle.mlp_3d[1].running_mean.copy_(torch.randn(504, generator=g) * 0.5)
    oracle.mlp_3d[1].running_var.copy_(torch.rand(504, generator=g) + 0.5)
    variables = import_mmgnet_single(single_module_state_dicts(oracle))

    inp = _unpadded(batch, n)
    with torch.no_grad():
        ref = oracle(inp["obj_points"], inp["edge_index"], inp["descriptor"],
                     istrain=True)
    out = MMGNetSingle(cfg=MMGNetConfig()).apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, istrain=True, deterministic=True)
    e = edge_count(n)
    for key, k in [("obj_logits_3d", n), ("rel_cls_3d", e),
                   ("edge_feature_3d_dis", e)]:
        np.testing.assert_allclose(np.asarray(out[key])[0, :k], ref[key].numpy(),
                                   rtol=RTOL, atol=ATOL, err_msg=key)


def test_sgfn_parity():
    from vlsat_tpu.interop.torch_import import import_sgfn
    from vlsat_tpu.interop.torch_oracle import (
        TorchSGFNOracle, sgfn_module_state_dicts)
    from vlsat_tpu.models.variants import SGFN, SGFNConfig

    n, bucket, seed = 11, 12, 6
    batch = make_batch(seed=seed, node_counts=(n,), num_points=32, bucket=bucket)
    torch.manual_seed(seed)
    oracle = TorchSGFNOracle().eval()
    variables = import_sgfn(sgfn_module_state_dicts(oracle))

    inp = _unpadded(batch, n)
    with torch.no_grad():
        ref = oracle(inp["obj_points"], inp["edge_index"], inp["descriptor"],
                     inp["batch_ids"])
    out = SGFN(cfg=SGFNConfig()).apply(
        {"params": variables["params"]}, batch, istrain=False)
    e = edge_count(n)
    for key, k in [("obj_logits_3d", n), ("rel_cls_3d", e)]:
        np.testing.assert_allclose(np.asarray(out[key])[0, :k], ref[key].numpy(),
                                   rtol=RTOL, atol=ATOL, err_msg=key)


def test_triplet_gcn_parity():
    """TripletGCN block vs the reference semantics (source_to_target flow,
    sum aggregation onto the target, BN placements), eval mode."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_import import import_triplet_gcn
    from vlsat_tpu.interop.torch_oracle import _TripletGCN
    from vlsat_tpu.models.gnn import TripletGCN
    from vlsat_tpu.scene import full_edge_index

    torch.manual_seed(5)
    twin = _TripletGCN(dim_node=32, dim_edge=16, dim_hidden=64).eval()
    # non-trivial BN running stats
    g = torch.Generator().manual_seed(6)
    for m in twin.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = import_triplet_gcn(sd)

    rng = np.random.RandomState(2)
    n, bucket = 6, 8
    ei_v = full_edge_index(n)
    ev, e_max = len(ei_v), edge_count(bucket)
    x = rng.randn(1, bucket, 32).astype(np.float32)
    e_feat = rng.randn(1, e_max, 16).astype(np.float32)
    ei = np.zeros((1, e_max, 2), np.int32)
    ei[0, :ev] = ei_v
    em = np.zeros((1, e_max), bool)
    em[0, :ev] = True

    mod = TripletGCN(dim_node=32, dim_edge=16, dim_hidden=64)
    x_new, e_new = mod.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.asarray(e_feat), jnp.asarray(ei), jnp.asarray(em),
        deterministic=True)
    with torch.no_grad():
        xr, er = twin(torch.from_numpy(x[0, :n]), torch.from_numpy(e_feat[0, :ev]),
                      torch.from_numpy(ei_v).long())
    np.testing.assert_allclose(np.asarray(x_new)[0, :n], xr.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="node update")
    np.testing.assert_allclose(np.asarray(e_new)[0, :ev], er.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="edge update")


@pytest.mark.parametrize("nn_edge_mode", ["edge", "onehot", "gather"])
def test_gean_block_parity_two_scenes(nn_edge_mode):
    """The fat-attention GCN layer in isolation, 2 scenes padded vs looped.

    All three nn_edge node-projection placements (models/gnn.py) must
    produce the same numbers — they differ only in FLOP/memory layout."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_oracle import _GraphEdgeAttenNetwork
    from vlsat_tpu.models.gnn import GraphEdgeAttenNetwork

    torch.manual_seed(3)
    twin = _GraphEdgeAttenNetwork().eval()
    sd = {f"g.{k}": v.detach().numpy() for k, v in twin.state_dict().items()}
    params = import_gean(sd, "g")

    batch = make_batch(seed=11, node_counts=(5, 7), num_points=8, bucket=8)
    rng = np.random.RandomState(5)
    B, N, E = 2, 8, edge_count(8)
    x = rng.randn(B, N, 512).astype(np.float32)
    e_feat = rng.randn(B, E, 512).astype(np.float32)

    flax_mod = GraphEdgeAttenNetwork(
        num_heads=8, dim_node=512, dim_edge=512, dim_atten=256,
        nn_edge_mode=nn_edge_mode)
    x_new, e_new = flax_mod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(e_feat),
        batch.edge_index, batch.edge_mask, deterministic=True)

    for b, n in enumerate((5, 7)):
        e = edge_count(n)
        ei = torch.from_numpy(np.asarray(batch.edge_index[b, :e])).long()
        with torch.no_grad():
            xr, er = twin(torch.from_numpy(x[b, :n]),
                          torch.from_numpy(e_feat[b, :e]), ei)
        np.testing.assert_allclose(
            np.asarray(x_new)[b, :n], xr.numpy(), rtol=RTOL, atol=ATOL,
            err_msg=f"node update, scene {b}")
        np.testing.assert_allclose(
            np.asarray(e_new)[b, :e], er.numpy(), rtol=RTOL, atol=ATOL,
            err_msg=f"edge update, scene {b}")


def test_edgegcn_parity():
    """SGGpoint EdgeGCN (GCNConv streams + edge/node gates) vs a PyG-free
    torch twin, padded scene vs flat graph, eval mode."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_import import _dense
    from vlsat_tpu.interop.torch_oracle import _EdgeGCN
    from vlsat_tpu.models.sggpoint import EdgeGCN
    from vlsat_tpu.scene import full_edge_index

    torch.manual_seed(8)
    dim, n, bucket = 64, 6, 8
    twin = _EdgeGCN(dim=dim).eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = {
        "edge_attentionND": _dense(sd, "edge_attentionND"),
        "node_GConv1_fc": _dense(sd, "node_GConv1.lin"),
        "node_GConv2_fc": _dense(sd, "node_GConv2.lin"),
        "node_attentionND": _dense(sd, "node_attentionND"),
        "node_indicator_reduction": _dense(sd, "node_indicator_reduction"),
        "edge_MLP1_fc": _dense(sd, "edge_MLP1"),
        "edge_MLP2_fc": _dense(sd, "edge_MLP2"),
    }

    rng = np.random.RandomState(4)
    ei_v = full_edge_index(n)
    ev, e_max = len(ei_v), edge_count(bucket)
    x = rng.randn(1, bucket, dim).astype(np.float32)
    e = rng.randn(1, e_max, dim).astype(np.float32)
    ei = np.zeros((1, e_max, 2), np.int32)
    ei[0, :ev] = ei_v
    em = np.zeros((1, e_max), bool)
    em[0, :ev] = True

    x_new, e_new = EdgeGCN(dim=dim).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(e), jnp.asarray(ei),
        jnp.asarray(em), deterministic=True)
    with torch.no_grad():
        xr, er = twin(torch.from_numpy(x[0, :n]), torch.from_numpy(e[0, :ev]),
                      torch.from_numpy(ei_v.T).long())
    np.testing.assert_allclose(np.asarray(x_new)[0, :n], xr.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="nodes")
    np.testing.assert_allclose(np.asarray(e_new)[0, :ev], er.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="edges")


def test_dgcnn_backbone_parity():
    """DGCNN EdgeConv chain (kNN graph features, BN eval, max pools) vs the
    official-layout torch twin."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_oracle import _DGCNN
    from vlsat_tpu.models.sggpoint import DGCNN

    torch.manual_seed(9)
    n, p, k, emb = 3, 24, 8, 64
    twin = _DGCNN(input_channel=3, embeddings=emb, k=k).eval()
    g = torch.Generator().manual_seed(10)
    for m in twin.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    sd = {key: v.detach().numpy() for key, v in twin.state_dict().items()}

    params, stats = {}, {}
    for i in range(1, 6):
        w = sd[f"conv{i}.0.weight"]
        w = w.reshape(w.shape[0], w.shape[1])  # Conv k=1 -> (out, in)
        params[f"conv{i}_fc"] = {"kernel": w.T.astype(np.float32)}
        params[f"conv{i}_bn"] = {"scale": sd[f"conv{i}.1.weight"],
                                 "bias": sd[f"conv{i}.1.bias"]}
        stats[f"conv{i}_bn"] = {"mean": sd[f"conv{i}.1.running_mean"],
                                "var": sd[f"conv{i}.1.running_var"]}

    rng = np.random.RandomState(6)
    pts = rng.randn(1, n, p, 3).astype(np.float32)
    out = DGCNN(embeddings=emb, k=k).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.ones((1, n), bool), deterministic=True)
    with torch.no_grad():
        ref = twin(torch.from_numpy(pts[0]).permute(0, 2, 1))  # (n, C, P)
    np.testing.assert_allclose(
        np.asarray(out)[0], ref.permute(0, 2, 1).numpy(),
        rtol=RTOL, atol=ATOL)


def test_flagship_parity_single_label():
    """multi_rel_outputs=False: the PointNetRelCls log_softmax head path
    (single-label mode, reference config multi_rel_outputs)."""
    n, bucket, seed = 9, 12, 11
    batch = make_batch(seed=seed, node_counts=(n,), num_points=32,
                       bucket=bucket, num_rel_classes=27)
    torch.manual_seed(seed)
    oracle = TorchMmgnetOracle(num_rel=27, multi_rel=False).eval()
    variables = import_mmgnet(module_state_dicts(oracle))
    model = MMGNet(cfg=MMGNetConfig(num_rel_classes=27, multi_rel_outputs=False))
    with torch.no_grad():
        ref = oracle(istrain=False, **_unpadded(batch, n))
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, istrain=False)
    e = edge_count(n)
    for key, k in [("obj_logits_3d", n), ("rel_cls_3d", e), ("rel_cls_2d", e)]:
        np.testing.assert_allclose(np.asarray(out[key])[0, :k], ref[key].numpy(),
                                   rtol=RTOL, atol=ATOL, err_msg=key)


def _gcn_stack_params(sd, depth):
    return {f"gcn_{i}": import_gean(sd, f"gcns.{i}") for i in range(depth)}


def test_mmg_teacher_core_parity():
    """MMG_teacher core: 4-way attention, fusion MLP (BN eval), GCN stack."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_import import (
        _batchnorm, _dense, import_dist_mlp, import_mha)
    from vlsat_tpu.interop.torch_oracle import _MMGTeacherCore
    from vlsat_tpu.models.mmteacher import MMGTeacherCore
    from vlsat_tpu.scene import full_edge_index

    torch.manual_seed(12)
    depth = 2
    twin = _MMGTeacherCore(depth=depth).eval()
    g = torch.Generator().manual_seed(13)
    for m in twin.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    params = {
        "self_attn_fc": import_dist_mlp(sd, "self_attn_fc"),
        "self_attn_3d": import_mha(sd, "self_attn_3d"),
        "self_attn_2d": import_mha(sd, "self_attn_2d"),
        "cross_attn_3d": import_mha(sd, "cross_attn_3d"),
        "cross_attn_2d": import_mha(sd, "cross_attn_2d"),
        "fusion_fc0": _dense(sd, "fusion_module.0"),
        "fusion_fc1": _dense(sd, "fusion_module.4"),
        "gcns": _gcn_stack_params(sd, depth),
    }
    stats = {}
    params["fusion_bn0"], stats["fusion_bn0"] = _batchnorm(sd, "fusion_module.2")
    params["fusion_bn1"], stats["fusion_bn1"] = _batchnorm(sd, "fusion_module.6")

    rng = np.random.RandomState(3)
    n, bucket = 7, 8
    ei_v = full_edge_index(n)
    ev, e_max = len(ei_v), edge_count(bucket)
    f3d = rng.randn(1, bucket, 512).astype(np.float32)
    f2d = rng.randn(1, bucket, 512).astype(np.float32)
    e = rng.randn(1, e_max, 512).astype(np.float32)
    centers = rng.randn(1, bucket, 3).astype(np.float32)
    ei = np.zeros((1, e_max, 2), np.int32)
    ei[0, :ev] = ei_v
    em = np.zeros((1, e_max), bool)
    em[0, :ev] = True
    om = np.zeros((1, bucket), bool)
    om[0, :n] = True

    obj, e_new, mimic = MMGTeacherCore(depth=depth).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(f3d), jnp.asarray(f2d), jnp.asarray(e), jnp.asarray(ei),
        jnp.asarray(om), jnp.asarray(em), jnp.asarray(centers),
        deterministic=True)
    with torch.no_grad():
        ref_obj, ref_e, ref_mimic = twin(
            torch.from_numpy(f3d[0, :n]), torch.from_numpy(f2d[0, :n]),
            torch.from_numpy(e[0, :ev]), torch.from_numpy(ei_v).long(),
            torch.from_numpy(centers[0, :n]))
    np.testing.assert_allclose(np.asarray(obj)[0, :n], ref_obj.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="obj")
    np.testing.assert_allclose(np.asarray(e_new)[0, :ev], ref_e.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="edge")
    np.testing.assert_allclose(np.asarray(mimic)[0, :n], ref_mimic.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="mimic")


def test_mmg_student_core_parity():
    """MMG_student core: self-attn before (mimic tap) / after + GCN stack."""
    import jax.numpy as jnp

    from vlsat_tpu.interop.torch_import import import_dist_mlp, import_mha
    from vlsat_tpu.interop.torch_oracle import _MMGStudentCore
    from vlsat_tpu.models.mmteacher import MMGStudentCore
    from vlsat_tpu.scene import full_edge_index

    torch.manual_seed(14)
    depth = 2
    twin = _MMGStudentCore(depth=depth).eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = {
        "self_attn_fc": import_dist_mlp(sd, "self_attn_fc"),
        "self_attn_before": import_mha(sd, "self_attn_before"),
        "self_attn_after": import_mha(sd, "self_attn_after"),
        "gcns": _gcn_stack_params(sd, depth),
    }

    rng = np.random.RandomState(5)
    n, bucket = 6, 8
    ei_v = full_edge_index(n)
    ev, e_max = len(ei_v), edge_count(bucket)
    f = rng.randn(1, bucket, 512).astype(np.float32)
    e = rng.randn(1, e_max, 512).astype(np.float32)
    centers = rng.randn(1, bucket, 3).astype(np.float32)
    ei = np.zeros((1, e_max, 2), np.int32)
    ei[0, :ev] = ei_v
    em = np.zeros((1, e_max), bool)
    em[0, :ev] = True
    om = np.zeros((1, bucket), bool)
    om[0, :n] = True

    f_new, e_new, mimic = MMGStudentCore(depth=depth).apply(
        {"params": params},
        jnp.asarray(f), jnp.asarray(e), jnp.asarray(ei), jnp.asarray(om),
        jnp.asarray(em), jnp.asarray(centers), deterministic=True)
    with torch.no_grad():
        ref_f, ref_e, ref_mimic = twin(
            torch.from_numpy(f[0, :n]), torch.from_numpy(e[0, :ev]),
            torch.from_numpy(ei_v).long(), torch.from_numpy(centers[0, :n]))
    np.testing.assert_allclose(np.asarray(f_new)[0, :n], ref_f.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="nodes")
    np.testing.assert_allclose(np.asarray(e_new)[0, :ev], ref_e.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="edges")
    np.testing.assert_allclose(np.asarray(mimic)[0, :n], ref_mimic.numpy(),
                               rtol=RTOL, atol=ATOL, err_msg="mimic")


def test_flagship_gradient_parity():
    """d loss / d params parity: the reference process_train loss stack
    (model.py:337-420 — CE obj, DYNAMIC-weighted BCE rel, cosine mimic,
    normalized-L1 rel mimic, lambda mixing) differentiated through the
    full flagship forward must produce the same gradients in torch
    autograd and jax.grad on identical weights + inputs.  Eval-stat BN /
    no dropout on both sides (torch eval() keeps autograd on); the frozen
    adapter gets no grad on either side (requires_grad=False vs
    stop_gradient)."""
    import jax
    import torch.nn.functional as TF

    from vlsat_tpu.train.losses import vlsat_total_loss

    n, bucket, seed = 7, 8, 21
    batch = make_batch(seed=seed, node_counts=(n,), num_points=16,
                       bucket=bucket, with_text=True)
    oracle, model, variables = _build_pair(seed)
    oracle.clip_adapter.requires_grad_(False)  # reference freezes it
    inp = _unpadded(batch, n)
    e = edge_count(n)
    gt_cls = torch.from_numpy(np.asarray(batch.gt_class[0, :n])).long()
    gt_rels = torch.from_numpy(np.asarray(batch.gt_rels[0, :e])).float()
    rel_text = torch.from_numpy(np.asarray(batch.rel_text_feat[0, :e])).float()

    # ---- torch side: reference loss verbatim semantics ------------------
    ref = oracle(istrain=True, **inp)
    ce3 = TF.cross_entropy(ref["obj_logits_3d"], gt_cls)
    ce2 = TF.cross_entropy(ref["obj_logits_2d"], gt_cls)
    batch_mean = gt_rels.sum(0)
    zeros = (gt_rels.sum(-1) == 0).sum().unsqueeze(0)
    w = torch.abs(1.0 / (torch.log(torch.cat([zeros, batch_mean]) + 1) + 1))
    w = torch.where(w == 0, w[0].clone(), w)[1:]
    bce3 = TF.binary_cross_entropy(ref["rel_cls_3d"], gt_rels, weight=w)
    bce2 = TF.binary_cross_entropy(ref["rel_cls_2d"], gt_rels, weight=w)
    m3 = TF.normalize(ref["obj_feature_3d_mimic"], dim=-1)
    m2 = TF.normalize(ref["obj_features_2d_mimic"], dim=-1)
    mimic = torch.clamp(0.8 - (m3 * m2).sum(-1), min=0).mean()
    dis = TF.normalize(ref["edge_feature_2d_dis"], dim=-1)
    rel_mimic = TF.l1_loss(dis, rel_text)
    total_t = 0.1 * (ce2 + ce3) + 3.0 * (bce2 + bce3) + 0.1 * (mimic + rel_mimic)
    total_t.backward()

    # ---- flax side ------------------------------------------------------
    bs = variables["batch_stats"]

    def lossfn(params):
        out = model.apply({"params": params, "batch_stats": bs}, batch,
                          istrain=True, deterministic=True)
        loss, _ = vlsat_total_loss(out, batch)
        return loss

    total_j, grads = jax.value_and_grad(lossfn)(variables["params"])
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-4)

    def t_grad(p):
        g = p.grad
        assert g is not None
        g = g.detach().numpy()
        if g.ndim == 3 and g.shape[-1] == 1:  # Conv1d k=1
            g = g[..., 0]
        return g.T if g.ndim == 2 else g

    gcn = oracle.mmg.gcn_3ds[0]
    nn_edge0 = gcn.edgeatten.nn_edge[0].weight.grad.detach().numpy()  # (1024, 1536)
    checks = [
        ("obj_encoder/conv1", grads["obj_encoder"]["conv1"]["kernel"],
         t_grad(oracle.obj_encoder.conv1.weight)),
        ("mlp_3d_fc", grads["mlp_3d_fc"]["kernel"],
         t_grad(oracle.mlp_3d[0].weight)),
        ("mlp_3d_bn scale", grads["mlp_3d_bn"]["scale"],
         oracle.mlp_3d[1].weight.grad.detach().numpy()),
        ("obj_predictor_3d", grads["obj_predictor_3d"]["kernel"],
         t_grad(oracle.obj_predictor_3d.weight)),
        ("obj_logit_scale", grads["obj_logit_scale"],
         oracle.obj_logit_scale.grad.detach().numpy()),
        ("rel_predictor_3d/fc3", grads["rel_predictor_3d"]["fc3"]["kernel"],
         t_grad(oracle.rel_predictor_3d.fc3.weight)),
        # fed exclusively by the L1 rel-mimic loss, whose subgradient sign
        # flips where |dis - text| ~ float eps — allow 0.5% outliers
        ("triplet_projector/fc0", grads["triplet_projector_2d"]["fc0"]["kernel"],
         t_grad(oracle.triplet_projector_2d[0].weight), 0.995),
        ("mmg self_attn_0/fc_q",
         grads["mmg"]["self_attn_0"]["fc_q"]["kernel"],
         t_grad(oracle.mmg.self_attn[0].attention.fc_q.weight)),
        # diagonal distance is sqrt(0) in torch vs sqrt(1e-24) here and the
        # 128-entry kernel accumulates over B*N*N*32 products — tolerate a
        # few fp-reassociation outliers (observed max |diff| ~2e-6)
        ("mmg dist-bias fc0", grads["mmg"]["self_attn_fc"]["fc0"]["kernel"],
         t_grad(oracle.mmg.self_attn_fc[0].weight), 0.95),
        ("gcn_3d_0 nn_edge node_i",
         grads["mmg"]["gcn_3d_0"]["edgeatten_nn_edge_fc0_node_i"]["kernel"],
         nn_edge0[:, :512].T),
        ("gcn_3d_0 nn_edge edge",
         grads["mmg"]["gcn_3d_0"]["edgeatten"]["nn_edge_fc0_edge"]["kernel"],
         nn_edge0[:, 512:1024].T),
        ("gcn_3d_0 nn_edge node_j",
         grads["mmg"]["gcn_3d_0"]["edgeatten_nn_edge_fc0_node_j"]["kernel"],
         nn_edge0[:, 1024:].T),
        ("gcn_3d_0 prop fc1",
         grads["mmg"]["gcn_3d_0"]["prop"]["fc1"]["kernel"],
         t_grad(gcn.prop[2].weight)),
        ("gcn_3d_0 gate conv0",
         grads["mmg"]["gcn_3d_0"]["edgeatten"]["nn"]["conv0"]["kernel"],
         t_grad(gcn.edgeatten.nn[0].weight)),
    ]
    for name, got, want, *rest in checks:
        got = np.asarray(got)
        scale = max(np.abs(want).max(), 1e-8)
        min_frac = rest[0] if rest else 1.0
        ok = np.isclose(got, want, rtol=2e-3, atol=2e-3 * scale)
        assert ok.mean() >= min_frac, (
            name, float(ok.mean()),
            float(np.abs(got - want).max()))
    # frozen adapter: zero grad on the flax side
    assert float(np.abs(np.asarray(
        grads["clip_adapter"]["fc1"]["kernel"])).max()) == 0.0
