"""Teacher/student variant (reference src/model/SGFN_MMG/mmteacher.py).

A multi-modal *teacher* tower fuses 3D and 2D features through 4-way
self/cross attention + a fusion MLP before its GCN stack; a 3D-only
*student* tower runs self-attention before/after a mimic tap and its own
GCN stack.  Training distills: the student's pre-GNN 512-d feature mimics
the adapted 2D features, the student's post-attention feature mimics the
teacher's (detached) fused feature, and both towers' projected pair
features regress CLIP triplet text embeddings.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.models.gnn import GraphEdgeAttenNetwork
from vlsat_tpu.models.layers import AdapterModel, MaskedBatchNorm, PointNetEncoder
from vlsat_tpu.models.mmgnet import MMGNetConfig, RelPredictor, TripletProjector, _text_kernel_init
from vlsat_tpu.models.transformer import DistanceBiasMLP, MultiHeadAttention
from vlsat_tpu.ops.attention import pairwise_distance_bias
from vlsat_tpu.ops.descriptor import edge_descriptor
from vlsat_tpu.ops.graph import gather_edge_endpoints
from vlsat_tpu.ops.norm import safe_normalize
from vlsat_tpu.scene import SceneBatch
from vlsat_tpu.train.losses import (
    cosine_mimic_loss,
    cross_entropy,
    dynamic_rel_weights,
    rel_mimic_l1,
    weighted_bce,
)


class _GCNStack(nn.Module):
    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    aggr: str = "max"
    dropout_atten: float = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, x, e, edge_index, edge_mask, *, deterministic=True):
        drop = lambda v: nn.Dropout(self.dropout_atten, deterministic=deterministic)(v)
        for i in range(self.depth):
            x, e = GraphEdgeAttenNetwork(
                num_heads=self.num_heads, dim_node=self.dim_node,
                dim_edge=self.dim_edge, dim_atten=self.dim_atten, aggr=self.aggr,
                dropout_atten=self.dropout_atten, use_edge=self.use_edge,
                name=f"gcn_{i}")(x, e, edge_index, edge_mask,
                                 deterministic=deterministic)
            if i < self.depth - 1 or self.depth == 1:
                x, e = drop(nn.relu(x)), drop(nn.relu(e))
        return x, e


class MMGTeacherCore(nn.Module):
    """MMG_teacher (network_MMG.py:298-416): 4-way attention + fusion MLP
    + GCN stack; returns (obj, edge, detached fused mimic)."""

    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    aggr: str = "max"
    dropout_atten: float = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, f3d, f2d, e, edge_index, obj_mask, edge_mask, obj_center,
                 *, deterministic: bool = True):
        mask = obj_mask[:, None, None, :] & obj_mask[:, None, :, None]
        bias = DistanceBiasMLP(self.num_heads, name="self_attn_fc")(
            pairwise_distance_bias(jax.lax.stop_gradient(obj_center)))
        mha = lambda name: MultiHeadAttention(self.num_heads, self.dim_node, name=name)
        f3d_sa = mha("self_attn_3d")(f3d, f3d, f3d, mask=mask, bias=bias,
                                     deterministic=deterministic)
        f2d_sa = mha("self_attn_2d")(f2d, f2d, f2d, mask=mask, bias=bias,
                                     deterministic=deterministic)
        f3d_ca = mha("cross_attn_3d")(f3d_sa, f2d_sa, f2d_sa, mask=mask, bias=bias,
                                      deterministic=deterministic)
        f2d_ca = mha("cross_attn_2d")(f2d_sa, f3d_sa, f3d_sa, mask=mask, bias=bias,
                                      deterministic=deterministic)
        fused = jnp.concatenate([f3d_sa, f2d_sa, f3d_ca, f2d_ca], axis=-1)
        # fusion MLP: Linear-ReLU-BN-Dropout-Linear-ReLU-BN (mmteacher-side)
        h = nn.relu(nn.Dense(2 * self.dim_node, name="fusion_fc0")(fused))
        h = MaskedBatchNorm(2 * self.dim_node, name="fusion_bn0")(
            h, obj_mask, use_running_average=deterministic)
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = nn.relu(nn.Dense(self.dim_node, name="fusion_fc1")(h))
        obj = MaskedBatchNorm(self.dim_node, name="fusion_bn1")(
            h, obj_mask, use_running_average=deterministic)
        mimic = jax.lax.stop_gradient(obj)
        obj, e = _GCNStack(
            dim_node=self.dim_node, dim_edge=self.dim_edge, dim_atten=self.dim_atten,
            num_heads=self.num_heads, depth=self.depth, aggr=self.aggr,
            dropout_atten=self.dropout_atten, use_edge=self.use_edge, name="gcns",
        )(obj, e, edge_index, edge_mask, deterministic=deterministic)
        return obj, e, mimic


class MMGStudentCore(nn.Module):
    """MMG_student (network_MMG.py:419-529): self-attn before (mimic tap)
    and after, then GCN stack."""

    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    aggr: str = "max"
    dropout_atten: float = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, f, e, edge_index, obj_mask, edge_mask, obj_center,
                 *, deterministic: bool = True):
        mask = obj_mask[:, None, None, :] & obj_mask[:, None, :, None]
        bias = DistanceBiasMLP(self.num_heads, name="self_attn_fc")(
            pairwise_distance_bias(jax.lax.stop_gradient(obj_center)))
        f = MultiHeadAttention(self.num_heads, self.dim_node, name="self_attn_before")(
            f, f, f, mask=mask, bias=bias, deterministic=deterministic)
        mimic = f
        f = MultiHeadAttention(self.num_heads, self.dim_node, name="self_attn_after")(
            f, f, f, mask=mask, bias=bias, deterministic=deterministic)
        f, e = _GCNStack(
            dim_node=self.dim_node, dim_edge=self.dim_edge, dim_atten=self.dim_atten,
            num_heads=self.num_heads, depth=self.depth, aggr=self.aggr,
            dropout_atten=self.dropout_atten, use_edge=self.use_edge, name="gcns",
        )(f, e, edge_index, edge_mask, deterministic=deterministic)
        return f, e, mimic


class MMTeacher(nn.Module):
    """Full teacher/student model (reference ``MMteacher``)."""

    cfg: MMGNetConfig = MMGNetConfig()
    obj_text_features: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        D = cfg.dim_node

        f_t = PointNetEncoder(D - 8, name="obj_encoder_teacher")(batch.obj_points)
        f_s = PointNetEncoder(cfg.point_feature_size, name="obj_encoder_student")(
            batch.obj_points)
        f_s_mimic_before = f_s[..., :512]
        f_s = nn.Dense(D - 8, name="mlp_student_fc")(f_s)
        f_s = MaskedBatchNorm(D - 8, name="mlp_student_bn")(
            f_s, batch.obj_mask, use_running_average=det)
        f_s = nn.relu(f_s)
        f_s = nn.Dropout(0.1, deterministic=det)(f_s)

        if cfg.use_spatial:
            spatial = batch.descriptor[..., 3:]
            spatial = jnp.concatenate([spatial[..., :6], jnp.log(spatial[..., 6:])], axis=-1)
            f_t = jnp.concatenate([f_t, spatial], axis=-1)
            f_s = jnp.concatenate([f_s, spatial], axis=-1)

        ed = jax.lax.stop_gradient(edge_descriptor(batch.descriptor, batch.edge_index))
        e_t = PointNetEncoder(D, name="rel_encoder_teacher")(ed[..., None, :])
        e_s = PointNetEncoder(D, name="rel_encoder_student")(ed[..., None, :])

        obj_2d = jax.lax.stop_gradient(
            AdapterModel(alpha=cfg.adapter_alpha, name="clip_adapter")(batch.obj_2d_feats))

        center = batch.descriptor[..., :3]
        core_kw = dict(dim_node=D, dim_edge=D, dim_atten=cfg.dim_atten,
                       num_heads=cfg.num_heads, depth=cfg.depth, aggr=cfg.gcn_aggr,
                       dropout_atten=cfg.dropout_atten, use_edge=cfg.use_gcn_edge)
        g_t, ge_t, mimic_t = MMGTeacherCore(**core_kw, name="mmg_teacher")(
            f_t, obj_2d, e_t, batch.edge_index, batch.obj_mask, batch.edge_mask,
            center, deterministic=det)
        g_s, ge_s, mimic_s = MMGStudentCore(**core_kw, name="mmg_student")(
            f_s, e_s, batch.edge_index, batch.obj_mask, batch.edge_mask,
            center, deterministic=det)

        rel_t = RelPredictor(cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                             name="rel_predictor_teacher")(ge_t, deterministic=det)
        rel_s = RelPredictor(cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                             name="rel_predictor_student")(ge_s, deterministic=det)

        kinit = _text_kernel_init(self.obj_text_features)
        scale_t = jnp.exp(self.param("obj_teacher_logit_scale",
                                     lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)))
        scale_s = jnp.exp(self.param("obj_student_logit_scale",
                                     lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)))
        obj_t = scale_t * nn.Dense(cfg.num_obj_classes, kernel_init=kinit,
                                   name="obj_predictor_teacher")(safe_normalize(g_t))
        obj_s = scale_s * nn.Dense(cfg.num_obj_classes, kernel_init=kinit,
                                   name="obj_predictor_student")(safe_normalize(g_s))

        # student is the deployed branch -> "3d"; teacher reported as "2d"
        out = {"obj_logits_3d": obj_s, "rel_cls_3d": rel_s,
               "obj_logits_2d": obj_t, "rel_cls_2d": rel_t}
        if istrain:
            def pair(g, ge, name):
                gi, gj = gather_edge_endpoints(g, batch.edge_index)
                return TripletProjector(name=name)(
                    jnp.concatenate([gi, gj, ge], axis=-1), deterministic=det)

            out.update(
                obj_feature_teacher_mimic=mimic_t,
                obj_feature_student_mimic=mimic_s,
                obj_feature_student_mimic_before=f_s_mimic_before,
                obj_2d_feats_mimic=obj_2d,
                edge_feature_teacher_dis=pair(g_t, ge_t, "triplet_projector_teacher"),
                edge_feature_student_dis=pair(g_s, ge_s, "triplet_projector_student"),
                logit_scale=scale_s,
            )
        return out


def mmteacher_loss(outputs: Dict[str, jnp.ndarray], batch: SceneBatch,
                   lambda_o: float = 0.1) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """mmteacher.py:428-454: lambda_o*(obj_s+obj_t) + 3*(rel_s+rel_t)
    + 0.1*(mimic_before + mimic_after + rel_mimic_t + rel_mimic_s)."""
    lambda_r = 1.0
    lam = max(lambda_r, lambda_o)
    lambda_r, lambda_o = lambda_r / lam, lambda_o / lam
    obj_s = cross_entropy(outputs["obj_logits_3d"], batch.gt_class, batch.obj_mask)
    obj_t = cross_entropy(outputs["obj_logits_2d"], batch.gt_class, batch.obj_mask)
    w = dynamic_rel_weights(batch.gt_rels, batch.edge_mask)
    rel_s = weighted_bce(outputs["rel_cls_3d"], batch.gt_rels, w, batch.edge_mask)
    rel_t = weighted_bce(outputs["rel_cls_2d"], batch.gt_rels, w, batch.edge_mask)
    mimic_before = cosine_mimic_loss(outputs["obj_feature_student_mimic_before"],
                                     outputs["obj_2d_feats_mimic"], batch.obj_mask)
    mimic_after = cosine_mimic_loss(outputs["obj_feature_student_mimic"],
                                    outputs["obj_feature_teacher_mimic"], batch.obj_mask)
    if batch.rel_text_feat is not None:
        rm_t = rel_mimic_l1(outputs["edge_feature_teacher_dis"], batch.rel_text_feat,
                            batch.edge_mask)
        rm_s = rel_mimic_l1(outputs["edge_feature_student_dis"], batch.rel_text_feat,
                            batch.edge_mask)
    else:
        rm_t = rm_s = jnp.asarray(0.0)
    total = (lambda_o * (obj_s + obj_t) + 3.0 * lambda_r * (rel_s + rel_t)
             + 0.1 * (mimic_before + mimic_after + rm_t + rm_s))
    return total, dict(loss=total, obj_loss=obj_s, obj_loss_teacher=obj_t,
                       rel_loss=rel_s, rel_loss_teacher=rel_t,
                       mimic_before=mimic_before, mimic_after=mimic_after,
                       rel_mimic_teacher=rm_t, rel_mimic_student=rm_s)
