from vlsat_tpu.models.layers import (  # noqa: F401
    AdapterModel,
    DenseStack,
    HeadMLP,
    MaskedBatchNorm,
    PointNetEncoder,
)
from vlsat_tpu.models.transformer import DistanceBiasMLP, MultiHeadAttention  # noqa: F401
from vlsat_tpu.models.gnn import FatEdgeAttention, GraphEdgeAttenNetwork  # noqa: F401
from vlsat_tpu.models.mmg import MMG, MMGSingle  # noqa: F401
from vlsat_tpu.models.mmgnet import MMGNet, MMGNetConfig, RelPredictor  # noqa: F401
