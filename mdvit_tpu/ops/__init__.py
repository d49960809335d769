from mdvit_tpu.ops.resize import resize_bilinear
from mdvit_tpu.ops.norm import DomainBatchNorm, DomainLayerNorm
from mdvit_tpu.ops.layers import (
    ConvBN,
    DWConvBN,
    DropPath,
    Dropout2d,
    Mlp,
)

__all__ = [
    "resize_bilinear",
    "DomainBatchNorm",
    "DomainLayerNorm",
    "ConvBN",
    "DWConvBN",
    "DropPath",
    "Dropout2d",
    "Mlp",
]
