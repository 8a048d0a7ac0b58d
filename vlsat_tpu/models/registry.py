"""Model zoo registry: config NAME -> (model builder, train loss fn).

The reference wires only Mmgnet into its runner (src/model/model.py:13);
the other model files are swap-in variants.  Here every variant is
selectable by config NAME.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from vlsat_tpu.models.mmgnet import MMGNet, MMGNetConfig
from vlsat_tpu.models.variants import (
    MMGNetSingle,
    SGFN,
    SGFNConfig,
    SGPN,
    SGPNConfig,
)
from vlsat_tpu.train import losses


def build_model(name: str, num_obj: int, num_rel: int, mcfg,
                obj_text_features: Optional[np.ndarray] = None):
    """mcfg is the config.MODEL sub-config (attribute access)."""
    if name in ("Mmgnet", "MmgnetSingle"):
        cfg = MMGNetConfig(
            num_obj_classes=num_obj, num_rel_classes=num_rel,
            point_feature_size=mcfg.point_feature_size,
            dim_atten=mcfg.DIM_ATTEN, num_heads=mcfg.NUM_HEADS,
            depth=mcfg.N_LAYERS, gcn_aggr=mcfg.GCN_AGGR,
            dropout_atten=mcfg.DROP_OUT_ATTEN, use_gcn_edge=mcfg.USE_GCN_EDGE,
            use_spatial=mcfg.USE_SPATIAL, clip_feat_dim=mcfg.clip_feat_dim,
            adapter_alpha=mcfg.adapter_alpha,
            multi_rel_outputs=mcfg.multi_rel_outputs,
            nn_edge_mode=mcfg.get("nn_edge_mode", "edge"),
        )
        from functools import partial

        if name == "Mmgnet":
            loss = partial(losses.vlsat_total_loss, multi_rel=mcfg.multi_rel_outputs)
            return MMGNet(cfg=cfg, obj_text_features=obj_text_features), loss
        loss = partial(losses.vlsat_single_loss, multi_rel=mcfg.multi_rel_outputs)
        return MMGNetSingle(cfg=cfg, obj_text_features=obj_text_features), loss
    if name == "SGFN":
        cfg = SGFNConfig(
            num_obj_classes=num_obj, num_rel_classes=num_rel,
            edge_feature_size=mcfg.get("edge_feature_size", 256),
            dim_atten=mcfg.DIM_ATTEN, num_heads=mcfg.NUM_HEADS,
            depth=mcfg.N_LAYERS, gcn_aggr=mcfg.GCN_AGGR,
            dropout_atten=mcfg.DROP_OUT_ATTEN, use_spatial=mcfg.USE_SPATIAL,
            use_gcn_edge=mcfg.USE_GCN_EDGE,
            multi_rel_outputs=mcfg.multi_rel_outputs,
        )
        from functools import partial

        return SGFN(cfg=cfg), partial(losses.sgfn_loss,
                                      multi_rel=mcfg.multi_rel_outputs)
    if name == "SGPN":
        cfg = SGPNConfig(
            num_obj_classes=num_obj, num_rel_classes=num_rel,
            edge_feature_size=mcfg.get("edge_feature_size", 256),
            multi_rel_outputs=mcfg.multi_rel_outputs,
        )
        return SGPN(cfg=cfg), losses.sgpn_loss
    if name == "MMteacher":
        from vlsat_tpu.models.mmteacher import MMTeacher, mmteacher_loss

        cfg = MMGNetConfig(
            num_obj_classes=num_obj, num_rel_classes=num_rel,
            dim_atten=mcfg.DIM_ATTEN, num_heads=mcfg.NUM_HEADS,
            depth=mcfg.N_LAYERS, gcn_aggr=mcfg.GCN_AGGR,
            dropout_atten=mcfg.DROP_OUT_ATTEN, use_gcn_edge=mcfg.USE_GCN_EDGE,
            use_spatial=mcfg.USE_SPATIAL,
            multi_rel_outputs=mcfg.multi_rel_outputs,
        )
        return MMTeacher(cfg=cfg, obj_text_features=obj_text_features), mmteacher_loss
    if name == "MmgnetIn21k":
        # 768-d ImageNet-21k features, no adapter, plain classifiers
        # (reference model_in21k.py:45,76,144-156,295-296)
        cfg = MMGNetConfig(
            num_obj_classes=num_obj, num_rel_classes=num_rel,
            point_feature_size=760, dim_node=768, dim_edge=768,
            dim_atten=mcfg.DIM_ATTEN, num_heads=mcfg.NUM_HEADS,
            depth=mcfg.N_LAYERS, gcn_aggr=mcfg.GCN_AGGR,
            dropout_atten=mcfg.DROP_OUT_ATTEN, use_gcn_edge=mcfg.USE_GCN_EDGE,
            use_spatial=mcfg.USE_SPATIAL, clip_feat_dim=768,
            multi_rel_outputs=mcfg.multi_rel_outputs,
            cosine_classifier=False, use_adapter=False, use_mlp_3d=False,
        )
        from functools import partial

        # in21k drops the mimic terms from the total (model_in21k.py
        # comments them out of the sum, :368-375); point_feature_size 760
        # < clip_feat_dim means the 512-d mimic tap does not exist here
        loss = partial(losses.vlsat_total_loss,
                       multi_rel=mcfg.multi_rel_outputs, with_mimic=False)
        return MMGNet(cfg=cfg), loss
    if name == "SGGpoint":
        from vlsat_tpu.models.sggpoint import SGGpoint, SGGpointConfig, sggpoint_loss

        cfg = SGGpointConfig(num_obj_classes=num_obj, num_rel_classes=num_rel,
                             num_heads=mcfg.NUM_HEADS,
                             use_spatial=mcfg.USE_SPATIAL)
        return SGGpoint(cfg=cfg, obj_text_features=obj_text_features), sggpoint_loss
    if name == "SGGpointBaseline":
        from vlsat_tpu.models.sggpoint import (
            SGGpointBaseline, SGGpointConfig, sggpoint_baseline_loss)

        cfg = SGGpointConfig(num_obj_classes=num_obj, num_rel_classes=num_rel)
        return SGGpointBaseline(cfg=cfg), sggpoint_baseline_loss
    raise ValueError(f"unknown model NAME {name!r}")
