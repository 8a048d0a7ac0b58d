from vlsat_tpu.ops.descriptor import gen_descriptor, edge_descriptor  # noqa: F401
from vlsat_tpu.ops.graph import (  # noqa: F401
    gather_edge_endpoints,
    scatter_edges_to_nodes,
)
from vlsat_tpu.ops.attention import masked_attention, pairwise_distance_bias  # noqa: F401
from vlsat_tpu.ops.pointnet import pointnet_encode  # noqa: F401
