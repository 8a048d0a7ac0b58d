"""SGGpoint model family (reference src/model/SGGpoint/model.py).

DGCNN point backbone + EdgeGCN graph reasoning, in the VL-SAT-ified
dual-branch form (``MMEdgeGCN`` with cross-attention and CLIP-text cosine
classifiers) and the vanilla baseline (``SGGpointBaseline``).

TPU re-design notes: the kNN/EdgeConv machinery runs batched over padded
(B, N, P, C) tensors (ops.dgcnn); GCNConv becomes the segment-op propagate
in ops.gcn; BatchNorms over concatenated nodes/edges become masked batch
norms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.models.layers import AdapterModel, MaskedBatchNorm
from vlsat_tpu.models.mmgnet import TripletProjector, _text_kernel_init
from vlsat_tpu.models.transformer import DistanceBiasMLP, MultiHeadAttention
from vlsat_tpu.ops.attention import pairwise_distance_bias
from vlsat_tpu.ops.descriptor import edge_descriptor
from vlsat_tpu.ops.dgcnn import graph_feature
from vlsat_tpu.ops.gcn import gcn_propagate
from vlsat_tpu.ops.graph import gather_edge_endpoints, scatter_edges_to_nodes
from vlsat_tpu.ops.norm import safe_normalize
from vlsat_tpu.scene import SceneBatch
from vlsat_tpu.train.losses import (
    cosine_mimic_loss,
    cross_entropy,
    dynamic_rel_weights,
    rel_mimic_l1,
    weighted_bce,
)


class DGCNN(nn.Module):
    """Official DGCNN backbone (model.py:97-128): 4 EdgeConv stages +
    bottleneck conv; per-point embeddings, pooled by the caller."""

    embeddings: int = 768
    k: int = 20

    @nn.compact
    def __call__(self, pts, node_mask, *, deterministic: bool = True):
        # pts: (B, N, P, C); node_mask: (B, N)
        def edge_conv(x, out, name):
            g = graph_feature(x, k=self.k)                    # (B,N,P,k,2C)
            h = nn.Dense(out, use_bias=False, name=f"{name}_fc")(g)
            h = MaskedBatchNorm(out, name=f"{name}_bn")(
                h, node_mask[..., None, None] & jnp.ones(h.shape[:-1], bool),
                use_running_average=deterministic)
            h = nn.leaky_relu(h, 0.2)
            return h.max(axis=-2)                             # max over k

        x1 = edge_conv(pts, 64, "conv1")
        x2 = edge_conv(x1, 64, "conv2")
        x3 = edge_conv(x2, 128, "conv3")
        x4 = edge_conv(x3, 256, "conv4")
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)        # (B,N,P,512)
        h = nn.Dense(self.embeddings, use_bias=False, name="conv5_fc")(x)
        h = MaskedBatchNorm(self.embeddings, name="conv5_bn")(
            h, node_mask[..., None] & jnp.ones(h.shape[:-1], bool),
            use_running_average=deterministic)
        return nn.leaky_relu(h, 0.2)                          # (B,N,P,emb)


class EdgeGCN(nn.Module):
    """Node/edge co-evolution layer (model.py:136-206)."""

    dim: int = 512
    attn_edge: bool = True
    attn_node: bool = True
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, e, edge_index, edge_mask, *, deterministic: bool = True):
        mid = self.dim // 2
        n = x.shape[1]

        if self.attn_edge:
            ind = nn.Dense(mid, name="edge_attentionND")(e)   # (B,E,mid)
            row = scatter_edges_to_nodes(ind, edge_index, edge_mask, n,
                                         aggr="mean", target=0)
            col = scatter_edges_to_nodes(ind, edge_index, edge_mask, n,
                                         aggr="mean", target=1)
            edge_gate = nn.sigmoid(row * col)                 # (B,N,mid)
        else:
            edge_gate = 1.0

        h = nn.relu(nn.Dense(mid, use_bias=True, name="node_GConv1_fc")(
            gcn_propagate(x, edge_index, edge_mask))) * edge_gate
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x_new = nn.relu(nn.Dense(self.dim, use_bias=True, name="node_GConv2_fc")(
            gcn_propagate(h, edge_index, edge_mask)))

        if self.attn_node:
            nind = nn.relu(nn.Dense(mid, name="node_attentionND")(x_new))
            ni, nj = gather_edge_endpoints(nind, edge_index)
            node_gate = nn.sigmoid(nn.Dense(mid, name="node_indicator_reduction")(
                jnp.concatenate([ni, nj], axis=-1)))          # (B,E,mid)
        else:
            node_gate = 1.0

        he = nn.relu(nn.Dense(mid, name="edge_MLP1_fc")(e))
        he = nn.Dropout(self.dropout, deterministic=deterministic)(he) * node_gate
        e_new = nn.relu(nn.Dense(self.dim, name="edge_MLP2_fc")(he))
        return x_new, e_new


class EdgeMLPHead(nn.Module):
    """Sigmoid relation head (model.py:309-325): Linear-BN-LeakyReLU-
    Dropout-Linear, bias-free linears."""

    num_classes: int

    @nn.compact
    def __call__(self, e, edge_mask, *, deterministic: bool = True):
        mid = e.shape[-1] // 2
        h = nn.Dense(mid, use_bias=False, name="edge_linear1")(e)
        h = MaskedBatchNorm(mid, name="edge_bn")(h, edge_mask,
                                                 use_running_average=deterministic)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return nn.sigmoid(nn.Dense(self.num_classes, use_bias=False,
                                   name="edge_linear2")(h))


class MMEdgeGCN(nn.Module):
    """Dual-branch EdgeGCN with cross-attention (model.py:208-291)."""

    dim_node: int = 512
    dim_edge: int = 512
    num_heads: int = 8

    @nn.compact
    def __call__(self, f3d, f2d, e3d, e2d, edge_index, obj_mask, edge_mask,
                 obj_center, *, deterministic: bool = True):
        mask = obj_mask[:, None, None, :] & obj_mask[:, None, :, None]
        emask = edge_mask[:, None, None, :] & edge_mask[:, None, :, None]
        bias = DistanceBiasMLP(self.num_heads, name="self_attn_fc")(
            pairwise_distance_bias(jax.lax.stop_gradient(obj_center)))
        f3d = MultiHeadAttention(self.num_heads, self.dim_node, name="self_attn")(
            f3d, f3d, f3d, mask=mask, bias=bias, deterministic=deterministic)
        f2d = MultiHeadAttention(self.num_heads, self.dim_node, name="cross_attn")(
            f2d, f3d, f3d, mask=mask, bias=bias, deterministic=deterministic)
        f3d, e3d = EdgeGCN(self.dim_node, name="edgegcn_3d")(
            f3d, e3d, edge_index, edge_mask, deterministic=deterministic)
        f2d, e2d = EdgeGCN(self.dim_node, name="edgegcn_2d")(
            f2d, e2d, edge_index, edge_mask, deterministic=deterministic)
        e2d = MultiHeadAttention(self.num_heads, self.dim_edge, name="cross_attn_rel")(
            e2d, e3d, e3d, mask=emask, deterministic=deterministic)
        return f3d, e3d, f2d, e2d


def _edge_init(node_feats, edge_index):
    """[subject, object - subject] per edge (model.py:347-359)."""
    fi, fj = gather_edge_endpoints(node_feats, edge_index)
    return jnp.concatenate([fi, fj - fi], axis=-1)


@dataclasses.dataclass(frozen=True)
class SGGpointConfig:
    num_obj_classes: int = 160
    num_rel_classes: int = 26
    dim: int = 512
    num_heads: int = 8
    use_spatial: bool = True
    knn_k: int = 20


class SGGpoint(nn.Module):
    """VL-SAT-ified SGGpoint (model.py:347-692)."""

    cfg: SGGpointConfig = SGGpointConfig()
    obj_text_features: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        D = cfg.dim

        x = DGCNN(embeddings=768, k=min(cfg.knn_k, batch.obj_points.shape[2]),
                  name="backbone")(batch.obj_points, batch.obj_mask,
                                   deterministic=det)
        f3d = x.max(axis=2)                                   # pool points
        mimic_3d = f3d[..., :512]
        f3d = nn.Dense(D - 8, name="mlp_3d")(f3d)
        if cfg.use_spatial:
            sp = batch.descriptor[..., 3:]
            sp = jnp.concatenate([sp[..., :6], jnp.log(sp[..., 6:])], axis=-1)
            f3d = jnp.concatenate([f3d, sp], axis=-1)

        ed = jax.lax.stop_gradient(edge_descriptor(batch.descriptor, batch.edge_index))
        e3d = nn.Dense(D - 11, name="edge_mlp_3d")(_edge_init(f3d, batch.edge_index))
        e3d = jnp.concatenate([e3d, ed], axis=-1)

        obj_2d = jax.lax.stop_gradient(
            AdapterModel(alpha=0.5, name="clip_adapter")(batch.obj_2d_feats))
        mimic_2d = obj_2d
        e2d = nn.Dense(D - 11, name="edge_mlp_2d")(_edge_init(obj_2d, batch.edge_index))
        e2d = jnp.concatenate([e2d, ed], axis=-1)

        f3d_res, f2d_res, e3d_res, e2d_res = f3d, obj_2d, e3d, e2d
        g3, ge3, g2, ge2 = MMEdgeGCN(D, D, cfg.num_heads, name="edge_gcn")(
            f3d, obj_2d, e3d, e2d, batch.edge_index, batch.obj_mask,
            batch.edge_mask, batch.descriptor[..., :3], deterministic=det)

        g3 = nn.Dense(D, name="obj_mlp_3d")(jnp.concatenate([f3d_res, g3], -1))
        g2 = nn.Dense(D, name="obj_mlp_2d")(jnp.concatenate([f2d_res, g2], -1))
        ge3 = nn.Dense(D, name="rel_mlp_3d")(jnp.concatenate([e3d_res, ge3], -1))
        ge2 = nn.Dense(D, name="rel_mlp_2d")(jnp.concatenate([e2d_res, ge2], -1))

        scale = jnp.exp(self.param("obj_logit_scale",
                                   lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)))
        kinit = _text_kernel_init(self.obj_text_features)
        obj_logits_3d = scale * nn.Dense(cfg.num_obj_classes, use_bias=False,
                                         kernel_init=kinit, name="obj_classifier_3d")(
            safe_normalize(g3))
        obj_logits_2d = scale * nn.Dense(cfg.num_obj_classes, use_bias=False,
                                         kernel_init=kinit, name="obj_classifier_2d")(
            safe_normalize(g2))
        rel_cls_3d = EdgeMLPHead(cfg.num_rel_classes, name="rel_classifier_3d")(
            ge3, batch.edge_mask, deterministic=det)
        rel_cls_2d = EdgeMLPHead(cfg.num_rel_classes, name="rel_classifier_2d")(
            ge2, batch.edge_mask, deterministic=det)

        out = {"obj_logits_3d": obj_logits_3d, "obj_logits_2d": obj_logits_2d,
               "rel_cls_3d": rel_cls_3d, "rel_cls_2d": rel_cls_2d}
        if istrain:
            def pair(g, ge, name):
                gi, gj = gather_edge_endpoints(g, batch.edge_index)
                return TripletProjector(name=name)(
                    jnp.concatenate([gi, gj, ge], -1), deterministic=det)

            out.update(
                obj_feature_3d_mimic=mimic_3d,
                obj_features_2d_mimic=mimic_2d,
                edge_feature_3d_dis=pair(g3, ge3, "triplet_projector_3d"),
                edge_feature_2d_dis=pair(g2, ge2, "triplet_projector_2d"),
                logit_scale=scale,
            )
        return out


def sggpoint_loss(outputs, batch: SceneBatch):
    """model.py:600-626: 0.1*(obj3d+obj2d) + 3*(rel3d+rel2d)
    + 0.1*(mimic + rel_mimic_2d), DYNAMIC weights."""
    obj3 = cross_entropy(outputs["obj_logits_3d"], batch.gt_class, batch.obj_mask)
    obj2 = cross_entropy(outputs["obj_logits_2d"], batch.gt_class, batch.obj_mask)
    w = dynamic_rel_weights(batch.gt_rels, batch.edge_mask)
    rel3 = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
    rel2 = weighted_bce(outputs["rel_cls_2d"], batch.gt_rels, w, batch.edge_mask)
    mimic = cosine_mimic_loss(outputs["obj_feature_3d_mimic"],
                              outputs["obj_features_2d_mimic"], batch.obj_mask)
    if batch.rel_text_feat is not None:
        rm = rel_mimic_l1(outputs["edge_feature_2d_dis"], batch.rel_text_feat,
                          batch.edge_mask)
    else:
        rm = jnp.asarray(0.0)
    total = 0.1 * (obj3 + obj2) + 3.0 * (rel3 + rel2) + 0.1 * (mimic + rm)
    return total, dict(loss=total, obj_loss=obj3, obj_loss_2d=obj2,
                       rel_loss=rel3, rel_loss_2d=rel2, mimic_loss=mimic,
                       rel_mimic_loss_2d=rm)


class SGGpointBaseline(nn.Module):
    """Vanilla SGGpoint (src/model/SGGpoint/baseline.py:267-390): DGCNN
    backbone, single-branch EdgeGCN, NodeMLP/EdgeMLP heads."""

    cfg: SGGpointConfig = SGGpointConfig()

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        D = cfg.dim
        x = DGCNN(embeddings=D, k=min(cfg.knn_k, batch.obj_points.shape[2]),
                  name="backbone")(batch.obj_points, batch.obj_mask,
                                   deterministic=det)
        f = x.max(axis=2)
        e = _edge_init(f, batch.edge_index)
        e = nn.Dense(D, name="edge_proj")(e)
        f, e = EdgeGCN(D, name="edge_gcn")(f, e, batch.edge_index,
                                           batch.edge_mask, deterministic=det)
        # NodeMLP: Linear-BN-LeakyReLU-Dropout-Linear (bias-free)
        mid = D // 2
        h = nn.Dense(mid, use_bias=False, name="node_linear1")(f)
        h = MaskedBatchNorm(mid, name="node_bn")(h, batch.obj_mask,
                                                 use_running_average=det)
        h = nn.Dropout(0.5, deterministic=det)(nn.leaky_relu(h, 0.2))
        obj_logits = nn.Dense(cfg.num_obj_classes, use_bias=False,
                              name="node_linear2")(h)
        rel_cls = EdgeMLPHead(cfg.num_rel_classes, name="rel_classifier")(
            e, batch.edge_mask, deterministic=det)
        return {"obj_logits_3d": obj_logits, "obj_logits_2d": obj_logits,
                "rel_cls_3d": rel_cls, "rel_cls_2d": rel_cls}


def sggpoint_baseline_loss(outputs, batch: SceneBatch):
    obj = cross_entropy(outputs["obj_logits_3d"], batch.gt_class, batch.obj_mask)
    w = dynamic_rel_weights(batch.gt_rels, batch.edge_mask)
    rel = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
    total = 0.1 * obj + rel
    return total, dict(loss=total, obj_loss=obj, rel_loss=rel)
