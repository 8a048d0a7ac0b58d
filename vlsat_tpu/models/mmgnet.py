"""The flagship VL-SAT model (reference ``Mmgnet``, src/SGFN_MMG/model.py).

Dual-branch scene-graph predictor over a padded :class:`SceneBatch`:

  obj_points --PointNet(3->768)--> mlp_3d(768->504) ++ spatial(8) -> (N, 512)
  descriptor --edge_descriptor (stop_grad)--> rel encoders (11->512) x2
  obj_2d_feats --frozen CLIP adapter (stop_grad)--> (N, 512)
  MMG dual-branch GNN -> heads:
      rel_predictor_{3d,2d}: 512->512->256->26 sigmoid
      obj_logits = logit_scale * CLIP-text-initialized cosine classifier

Train-time extras (for the distillation losses): the pre-GNN 3D feature's
first 512 dims (mimic target), the adapted 2D features, and the projected
2D pair features (triplet_projector_2d) that are pulled toward CLIP text
embeddings of GT triplet sentences.

Reference fidelity notes:
  * spatial concat applies log to volume/length only
    (SGFN_MMG/model.py:296-299);
  * the edge descriptor is computed under stop_gradient (":302-303"), and
    the adapter under stop_gradient (":309-310");
  * rel head layer order is fc1-relu / fc2-dropout-relu / fc3-sigmoid
    (network_PointNet.py:328-341);
  * triplet projector order is Linear-Dropout-ReLU-Linear
    (SGFN_MMG/model.py:88-100).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlsat_tpu.models.layers import AdapterModel, MaskedBatchNorm, PointNetEncoder
from vlsat_tpu.models.mmg import MMG
from vlsat_tpu.ops.descriptor import edge_descriptor
from vlsat_tpu.ops.graph import gather_edge_endpoints
from vlsat_tpu.ops.norm import safe_normalize
from vlsat_tpu.scene import SceneBatch


@dataclasses.dataclass(frozen=True)
class MMGNetConfig:
    num_obj_classes: int = 160
    num_rel_classes: int = 26
    point_feature_size: int = 768
    dim_node: int = 512
    dim_edge: int = 512
    dim_atten: int = 256
    num_heads: int = 8
    depth: int = 2
    gcn_aggr: str = "max"
    dropout_atten: float = 0.5
    use_gcn_edge: bool = True
    use_spatial: bool = True
    clip_feat_dim: int = 512
    adapter_alpha: float = 0.5
    multi_rel_outputs: bool = True
    fused_pointnet: bool = False  # Pallas fused object encoder (inference)
    # nn_edge first-layer node-projection placement (see models/gnn.py):
    # "onehot" projects per node and gathers via one-hot matmul — exact
    # same math as "edge" at ~N/2x fewer FLOPs on the hot projections
    nn_edge_mode: str = "edge"
    # gate-path layout ("channel" | "head_major") — same math and SAME
    # parameter tree; see FatEdgeAttention.gate_layout
    gate_layout: str = "channel"
    # in21k-variant switches (reference model_in21k.py: dim_node 768,
    # no adapter, plain Linear classifiers, no 768->504 bottleneck):
    cosine_classifier: bool = True
    use_adapter: bool = True
    use_mlp_3d: bool = True


class RelPredictor(nn.Module):
    """Multi-label relation head (reference ``PointNetRelClsMulti``)."""

    num_classes: int
    dropout: float = 0.3
    multi_label: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.Dense(256, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        if self.multi_label:
            return nn.sigmoid(x)
        return nn.log_softmax(x, axis=-1)


class RelPredictorMulti2(nn.Module):
    """Alternate multi-label head (reference ``PointNetRelClsMulti2``,
    network_PointNet.py:359-400, unused by the shipped configs):
    256 -> 512 widths with an L2-normalize before the final layer."""

    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        x = nn.Dense(512, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        return nn.sigmoid(nn.Dense(self.num_classes, name="fc3")(safe_normalize(x)))


class TripletProjector(nn.Module):
    """Linear(3*512 -> 1024) - Dropout(0.5) - ReLU - Linear(1024 -> 512)."""

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(1024, name="fc0")(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(x)
        return nn.Dense(512, name="fc1")(x)


def _text_kernel_init(table: Optional[np.ndarray]):
    """Kernel initializer for the cosine classifiers.

    ``table`` is (num_classes, feat) normalized CLIP text embeddings (the
    torch Linear weight layout); flax kernels are (in, out), so transpose.
    Falls back to the default init when no table is supplied (tests,
    from-scratch runs without CLIP assets).
    """
    if table is None:
        return nn.initializers.lecun_normal()
    t = jnp.asarray(table).T

    def init(key, shape, dtype=jnp.float32):
        assert shape == t.shape, (shape, t.shape)
        return t.astype(dtype)

    return init


class MMGNet(nn.Module):
    """Flagship dual-branch model.  Apply to a SceneBatch.

    ``obj_text_features``: optional (num_obj_classes, clip_feat_dim) array
    of normalized CLIP text embeddings used to initialize both cosine
    classifiers (reference init_weight, SGFN_MMG/model.py:161-184).
    """

    cfg: MMGNetConfig = MMGNetConfig()
    obj_text_features: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: SceneBatch, *, istrain: bool = False,
                 deterministic: Optional[bool] = None,
                 branch_3d_only: bool = False) -> Dict[str, Any]:
        """``branch_3d_only=True`` is the deployment/serving mode: at eval
        time the 3D branch runs alone (the paper's protocol — the 2D branch
        exists to distill into it at train time), skipping the 2D encoders,
        adapter, cross-attentions, GCNs and heads.  The 3D outputs are
        bit-identical to the full forward; ~2x eval throughput (the hot
        edge-update GEMMs run once instead of twice).  Not valid with
        ``istrain`` (the losses need the 2D stream)."""
        cfg = self.cfg
        det = (not istrain) if deterministic is None else deterministic
        if branch_3d_only and istrain:
            raise ValueError("branch_3d_only is an inference mode")
        with_2d = not branch_3d_only

        # --- 3D object branch -------------------------------------------------
        obj_feature = PointNetEncoder(
            cfg.point_feature_size, fused=cfg.fused_pointnet and det,
            name="obj_encoder",
        )(batch.obj_points)
        obj_feature_3d_mimic = obj_feature[..., : cfg.clip_feat_dim]

        if cfg.use_mlp_3d:
            obj_feature = nn.Dense(cfg.dim_node - 8, name="mlp_3d_fc")(obj_feature)
            obj_feature = MaskedBatchNorm(cfg.dim_node - 8, name="mlp_3d_bn")(
                obj_feature, batch.obj_mask, use_running_average=det
            )
            obj_feature = nn.relu(obj_feature)
            obj_feature = nn.Dropout(0.1, deterministic=det)(obj_feature)

        if cfg.use_spatial:
            spatial = batch.descriptor[..., 3:]
            spatial = jnp.concatenate(
                [spatial[..., :6], jnp.log(spatial[..., 6:])], axis=-1
            )
            obj_feature = jnp.concatenate([obj_feature, spatial], axis=-1)

        # --- edge features ----------------------------------------------------
        edge_feat = jax.lax.stop_gradient(
            edge_descriptor(batch.descriptor, batch.edge_index)
        )
        rel_feature_2d = None
        if with_2d:
            rel_feature_2d = PointNetEncoder(cfg.dim_edge, name="rel_encoder_2d")(
                edge_feat[..., None, :]
            )
        rel_feature_3d = PointNetEncoder(cfg.dim_edge, name="rel_encoder_3d")(
            edge_feat[..., None, :]
        )

        # --- 2D branch (frozen adapter; in21k feeds features directly) -------
        obj_2d = None
        if with_2d:
            if cfg.use_adapter:
                obj_2d = jax.lax.stop_gradient(
                    AdapterModel(alpha=cfg.adapter_alpha, name="clip_adapter")(
                        batch.obj_2d_feats
                    )
                )
            else:
                obj_2d = batch.obj_2d_feats
        obj_features_2d_mimic = obj_2d

        obj_center = batch.descriptor[..., :3]
        f3d, f2d, e3d, e2d = MMG(
            dim_node=cfg.dim_node,
            dim_edge=cfg.dim_edge,
            dim_atten=cfg.dim_atten,
            num_heads=cfg.num_heads,
            depth=cfg.depth,
            aggr=cfg.gcn_aggr,
            dropout_atten=cfg.dropout_atten,
            use_edge=cfg.use_gcn_edge,
            nn_edge_mode=cfg.nn_edge_mode,
            gate_layout=cfg.gate_layout,
            name="mmg",
        )(
            obj_feature, obj_2d, rel_feature_3d, rel_feature_2d,
            batch.edge_index, batch.obj_mask, batch.edge_mask, obj_center,
            deterministic=det, with_2d=with_2d,
        )

        # --- heads ------------------------------------------------------------
        rel_cls_3d = RelPredictor(
            cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
            name="rel_predictor_3d",
        )(e3d, deterministic=det)
        rel_cls_2d = None
        if with_2d:
            rel_cls_2d = RelPredictor(
                cfg.num_rel_classes, multi_label=cfg.multi_rel_outputs,
                name="rel_predictor_2d",
            )(e2d, deterministic=det)

        if cfg.cosine_classifier:
            logit_scale = jnp.exp(
                self.param("obj_logit_scale",
                           lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32))
            )
            kinit = _text_kernel_init(self.obj_text_features)

            def obj_logits(x, name):
                return logit_scale * nn.Dense(
                    cfg.num_obj_classes, kernel_init=kinit, name=name
                )(safe_normalize(x))
        else:
            logit_scale = jnp.asarray(1.0)

            def obj_logits(x, name):
                return nn.Dense(cfg.num_obj_classes, name=name)(x)

        obj_logits_3d = obj_logits(f3d, "obj_predictor_3d")
        if branch_3d_only:
            return {"obj_logits_3d": obj_logits_3d, "rel_cls_3d": rel_cls_3d}
        obj_logits_2d = obj_logits(f2d, "obj_predictor_2d")

        out = {
            "obj_logits_3d": obj_logits_3d,
            "obj_logits_2d": obj_logits_2d,
            "rel_cls_3d": rel_cls_3d,
            "rel_cls_2d": rel_cls_2d,
        }
        if istrain:
            # projected 2D pair features for the rel-mimic loss
            f2d_i, f2d_j = gather_edge_endpoints(f2d, batch.edge_index)
            pair_2d = jnp.concatenate([f2d_i, f2d_j, e2d], axis=-1)
            out.update(
                obj_feature_3d_mimic=obj_feature_3d_mimic,
                obj_features_2d_mimic=obj_features_2d_mimic,
                edge_feature_2d_dis=TripletProjector(name="triplet_projector_2d")(
                    pair_2d, deterministic=det
                ),
                logit_scale=logit_scale,
            )
        return out
