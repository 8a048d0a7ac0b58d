"""Model-zoo variants: 3D-only Mmgnet, SGFN and SGPN baselines.

Counterparts of src/model/SGFN_MMG/{model_single,baseline_sgfn,
baseline_sgpn}.py, sharing the padded SceneBatch layout and the building
blocks of the flagship model.

  * MMGNetSingle — flagship skeleton minus the 2D branch: PointNet ->
    mlp_3d+spatial -> MMG_single GCN stack -> sigmoid rel head + CLIP-text
    cosine object classifier; train-time extra is the projected 3D pair
    feature for the rel-mimic loss (model_single.py:247-285).
  * SGFN — SceneGraphFusion-style baseline: PointNet(504)+spatial,
    edge-size-256 encoder, per-layer [distance-biased self-attention +
    fat-gated GCN] (network_GNN.py:197-284), log-softmax object head.
  * SGPN — no-GNN baseline over per-edge *union point clouds* (the 4-channel
    joint-bbox clouds the dataset emits with with_union_points=True);
    log-softmax object head, loss 0.1*obj + rel (baseline_sgpn.py:92-112).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.models.gnn import GraphEdgeAttenNetwork
from vlsat_tpu.models.layers import MaskedBatchNorm, PointNetEncoder
from vlsat_tpu.models.mmg import MMGSingle
from vlsat_tpu.models.mmgnet import MMGNetConfig, RelPredictor, TripletProjector, _text_kernel_init
from vlsat_tpu.models.transformer import DistanceBiasMLP, MultiHeadAttention
from vlsat_tpu.ops.attention import pairwise_distance_bias
from vlsat_tpu.ops.descriptor import edge_descriptor
from vlsat_tpu.ops.graph import gather_edge_endpoints
from vlsat_tpu.ops.norm import safe_normalize
from vlsat_tpu.scene import SceneBatch


class ObjClsHead(nn.Module):
    """PointNetCls: fc(512) - relu - fc(256) - dropout - relu - fc(k) -
    log_softmax (network_PointNet.py:197-248)."""

    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.Dense(256, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        return nn.log_softmax(nn.Dense(self.num_classes, name="fc3")(x), axis=-1)


class MMGNetSingle(nn.Module):
    """3D-only VL-SAT (reference model_single.py Mmgnet)."""

    cfg: MMGNetConfig = MMGNetConfig()
    obj_text_features: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic

        f = PointNetEncoder(cfg.point_feature_size, name="obj_encoder")(batch.obj_points)
        f = nn.Dense(cfg.dim_node - 8, name="mlp_3d_fc")(f)
        f = MaskedBatchNorm(cfg.dim_node - 8, name="mlp_3d_bn")(
            f, batch.obj_mask, use_running_average=det)
        f = nn.relu(f)
        f = nn.Dropout(0.1, deterministic=det)(f)
        if cfg.use_spatial:
            spatial = batch.descriptor[..., 3:]
            spatial = jnp.concatenate([spatial[..., :6], jnp.log(spatial[..., 6:])], axis=-1)
            f = jnp.concatenate([f, spatial], axis=-1)

        ed = jax.lax.stop_gradient(edge_descriptor(batch.descriptor, batch.edge_index))
        e3 = PointNetEncoder(cfg.dim_edge, name="rel_encoder_3d")(ed[..., None, :])

        f3d, e3d = MMGSingle(
            dim_node=cfg.dim_node, dim_edge=cfg.dim_edge, dim_atten=cfg.dim_atten,
            num_heads=cfg.num_heads, depth=cfg.depth, aggr=cfg.gcn_aggr,
            dropout_atten=cfg.dropout_atten, use_edge=cfg.use_gcn_edge, name="mmg",
        )(f, e3, batch.edge_index, batch.edge_mask, deterministic=det)

        rel_cls_3d = RelPredictor(cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                                  name="rel_predictor_3d")(e3d, deterministic=det)
        logit_scale = jnp.exp(self.param(
            "obj_logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)))
        obj_logits_3d = logit_scale * nn.Dense(
            cfg.num_obj_classes, kernel_init=_text_kernel_init(self.obj_text_features),
            name="obj_predictor_3d",
        )(safe_normalize(f3d))

        out = {"obj_logits_3d": obj_logits_3d, "rel_cls_3d": rel_cls_3d,
               "obj_logits_2d": obj_logits_3d, "rel_cls_2d": rel_cls_3d}
        if istrain:
            fi, fj = gather_edge_endpoints(f3d, batch.edge_index)
            pair = jnp.concatenate([fi, fj, e3d], axis=-1)
            out.update(
                edge_feature_3d_dis=TripletProjector(name="triplet_projector_3d")(
                    pair, deterministic=det),
                logit_scale=logit_scale,
            )
        return out


class GraphEdgeAttenNetworkLayers(nn.Module):
    """Self-attention (distance bias, 8 heads fixed as in the reference,
    network_GNN.py:210-211) + fat-gated GCN per layer."""

    dim_node: int = 512
    dim_edge: int = 256
    dim_atten: int = 256
    num_layers: int = 2
    num_heads: int = 8
    aggr: str = "max"
    dropout_atten: float | None = 0.5
    use_edge: bool = True

    @nn.compact
    def __call__(self, x, e, edge_index, obj_mask, edge_mask, obj_center, *,
                 deterministic: bool = True):
        node_mask = obj_mask[:, None, None, :] & obj_mask[:, None, :, None]
        bias = DistanceBiasMLP(8, name="self_attn_fc")(
            pairwise_distance_bias(jax.lax.stop_gradient(obj_center)))
        for i in range(self.num_layers):
            x = MultiHeadAttention(8, self.dim_node, name=f"self_attn_{i}")(
                x, x, x, mask=node_mask, bias=bias, deterministic=deterministic)
            x, e = GraphEdgeAttenNetwork(
                num_heads=self.num_heads, dim_node=self.dim_node,
                dim_edge=self.dim_edge, dim_atten=self.dim_atten, aggr=self.aggr,
                dropout_atten=self.dropout_atten, use_edge=self.use_edge,
                name=f"gconv_{i}",
            )(x, e, edge_index, edge_mask, deterministic=deterministic)
            if i < self.num_layers - 1 or self.num_layers == 1:
                x = nn.Dropout(self.dropout_atten or 0.0, deterministic=deterministic)(nn.relu(x))
                e = nn.Dropout(self.dropout_atten or 0.0, deterministic=deterministic)(nn.relu(e))
        return x, e


@dataclasses.dataclass(frozen=True)
class SGFNConfig:
    num_obj_classes: int = 160
    num_rel_classes: int = 26
    dim_node: int = 512
    edge_feature_size: int = 256
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    gcn_aggr: str = "max"
    dropout_atten: float = 0.5
    use_spatial: bool = True
    use_gcn_edge: bool = True
    multi_rel_outputs: bool = True


class SGFN(nn.Module):
    cfg: SGFNConfig = SGFNConfig()

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        out_size = cfg.dim_node - (8 if cfg.use_spatial else 0)
        f = PointNetEncoder(out_size, name="obj_encoder")(batch.obj_points)
        if cfg.use_spatial:
            spatial = batch.descriptor[..., 3:]
            spatial = jnp.concatenate([spatial[..., :6], jnp.log(spatial[..., 6:])], axis=-1)
            f = jnp.concatenate([f, spatial], axis=-1)
        ed = jax.lax.stop_gradient(edge_descriptor(batch.descriptor, batch.edge_index))
        e = PointNetEncoder(cfg.edge_feature_size, name="rel_encoder")(ed[..., None, :])

        f, e = GraphEdgeAttenNetworkLayers(
            dim_node=cfg.dim_node, dim_edge=cfg.edge_feature_size,
            dim_atten=cfg.dim_atten, num_layers=cfg.depth, num_heads=cfg.num_heads,
            aggr=cfg.gcn_aggr, dropout_atten=cfg.dropout_atten,
            use_edge=cfg.use_gcn_edge, name="gcn",
        )(f, e, batch.edge_index, batch.obj_mask, batch.edge_mask,
          batch.descriptor[..., :3], deterministic=det)

        obj_logits = ObjClsHead(cfg.num_obj_classes, name="obj_predictor")(f, deterministic=det)
        rel_cls = RelPredictor(cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                               name="rel_predictor")(e, deterministic=det)
        return {"obj_logits_3d": obj_logits, "rel_cls_3d": rel_cls,
                "obj_logits_2d": obj_logits, "rel_cls_2d": rel_cls}


@dataclasses.dataclass(frozen=True)
class SGPNConfig:
    num_obj_classes: int = 160
    num_rel_classes: int = 26
    point_feature_size: int = 512
    edge_feature_size: int = 256
    multi_rel_outputs: bool = True


class SGPN(nn.Module):
    """Union-point-cloud baseline: consumes ``batch.rel_points`` (B,E,P,4),
    produced by the dataset with ``with_union_points=True``."""

    cfg: SGPNConfig = SGPNConfig()

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        if batch.rel_points is None:
            raise ValueError(
                "SGPN needs batch.rel_points — enable dataset.with_union_points")
        f = PointNetEncoder(cfg.point_feature_size, name="obj_encoder")(batch.obj_points)
        e = PointNetEncoder(cfg.edge_feature_size, name="rel_encoder")(batch.rel_points)
        obj_logits = ObjClsHead(cfg.num_obj_classes, name="obj_predictor")(f, deterministic=det)
        rel_cls = RelPredictor(cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                               name="rel_predictor")(e, deterministic=det)
        return {"obj_logits_3d": obj_logits, "rel_cls_3d": rel_cls,
                "obj_logits_2d": obj_logits, "rel_cls_2d": rel_cls}
