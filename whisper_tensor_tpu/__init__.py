"""whisper-tensor-tpu: a TPU-native ML runtime.

A from-scratch rebuild of the capabilities of
computer-whisperer/whisper-tensor (ONNX ingest -> Symbolic Graph ->
Milli-Op Graph -> pluggable backends; Super Graph job orchestration;
import recipes; training; server/CLI) designed for TPU hardware:
the compute path is JAX/XLA with Pallas kernels, scaling is
jax.sharding over device meshes, and the reference CPU interpreter
survives as the bit-exact correctness oracle.
"""

__version__ = "0.1.0"

from .dtype import DType, AnyDType
from .packed_format import PackedFormat
from .symbolic import SymbolicScalar, SymbolicResolver
from .scalar_info import ScalarInfo
from .tensor_info import TensorInfo, Level
from .tensor import NumericTensor, PackedTensor, as_tensor

__all__ = [
    "DType", "AnyDType", "PackedFormat",
    "SymbolicScalar", "SymbolicResolver", "ScalarInfo",
    "TensorInfo", "Level",
    "NumericTensor", "PackedTensor", "as_tensor",
]
