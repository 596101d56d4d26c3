"""Milli op set (~40 ops; reference src/milli_graph/ops/mod.rs:368-409)."""

from .basic import (Cast, CastLike, ClampMin, Constant, ConstantOfShape,
                    MatMul, Pow, SimpleBinary, SimpleUnary, Where)
from .conv import (Conv, ConvBiasGrad, ConvInputGrad, ConvWeightGrad, Pool,
                   Resize)
from .index import (Gather, GatherElements, GatherGrad, GatherND, Range,
                    ScatterND)
from .misc import EyeLikeMilli, OneHotMilli, TileMilli, TriluMilli
from .random import RandomNormalLike
from .reduce import ArgMinMax, CumSum, NonZero, Reduce, SizeOf, TopK
from .shape import (Concat, Expand, GatherShape, Pad, Reshape, Shape, Slice,
                    Split, Squeeze, SumTo, Transpose, Unsqueeze)

__all__ = [
    "Cast", "CastLike", "ClampMin", "Constant", "ConstantOfShape", "MatMul",
    "Pow", "SimpleBinary", "SimpleUnary", "Where",
    "Conv", "ConvBiasGrad", "ConvInputGrad", "ConvWeightGrad", "Resize",
    "Gather", "GatherElements", "GatherGrad", "GatherND", "Range", "ScatterND",
    "RandomNormalLike",
    "EyeLikeMilli", "OneHotMilli", "TileMilli", "TriluMilli",
    "ArgMinMax", "CumSum", "NonZero", "Reduce", "SizeOf", "TopK",
    "Concat", "Expand", "GatherShape", "Pad", "Reshape", "Shape", "Slice",
    "Split", "Squeeze", "SumTo", "Transpose", "Unsqueeze",
]
