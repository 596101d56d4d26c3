"""Dtype system for whisper-tensor-tpu.

Functional equivalent of the reference dtype enum (reference:
src/dtype.rs:22-40) — 17 scalar dtypes plus packed (block-quantized)
formats — redesigned for a JAX/TPU stack: every dtype knows its numpy
dtype (oracle representation), its jax dtype (device representation),
and its accumulation dtype for matmul-like contractions (the reference
makes accumulate-dtype explicit in its MilliOp MatMul,
src/milli_graph/ops/binary.rs:530-620; on TPU this maps to
``preferred_element_type`` on the MXU).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

import numpy as np

try:  # ml_dtypes ships with jax and provides bf16/f8 numpy views
    import ml_dtypes

    _HAVE_ML_DTYPES = True
except ImportError:  # pragma: no cover
    _HAVE_ML_DTYPES = False

from .packed_format import PackedFormat


class DType(enum.Enum):
    """Scalar element types. Mirrors ONNX TensorProto.DataType coverage."""

    F64 = "f64"
    F32 = "f32"
    BF16 = "bf16"
    F16 = "f16"
    F8E4M3 = "f8e4m3"
    F8E5M2 = "f8e5m2"
    I64 = "i64"
    I32 = "i32"
    I16 = "i16"
    I8 = "i8"
    U64 = "u64"
    U32 = "u32"
    U16 = "u16"
    U8 = "u8"
    BOOL = "bool"
    STRING = "string"
    # U4/I4 sub-byte types (ONNX 21+); stored unpacked as u8/i8 on host.
    U4 = "u4"
    I4 = "i4"
    # FLOAT4E2M1 (ONNX 23); ml_dtypes float4_e2m1fn host representation
    F4E2M1 = "f4e2m1"

    # ------------------------------------------------------------------
    def __repr__(self) -> str:
        return f"DType.{self.name}"

    @property
    def is_float(self) -> bool:
        return self in _FLOATS

    @property
    def is_signed_int(self) -> bool:
        return self in (DType.I64, DType.I32, DType.I16, DType.I8, DType.I4)

    @property
    def is_unsigned_int(self) -> bool:
        return self in (DType.U64, DType.U32, DType.U16, DType.U8, DType.U4)

    @property
    def is_int(self) -> bool:
        return self.is_signed_int or self.is_unsigned_int

    @property
    def is_numeric(self) -> bool:
        return self is not DType.STRING

    @property
    def size_bytes(self) -> Optional[float]:
        """Bytes per element; fractional for sub-byte types; None for STRING."""
        return _SIZES.get(self)

    @property
    def bits(self) -> Optional[int]:
        s = _SIZES.get(self)
        return None if s is None else int(s * 8)

    # -- numpy / jax mappings ------------------------------------------
    def to_numpy(self) -> np.dtype:
        """The numpy dtype used by the CPU oracle backend."""
        if self is DType.STRING:
            return np.dtype(object)
        return np.dtype(_NP_MAP[self])

    def to_jax(self):
        """The jax dtype used on device. STRING is host-only."""
        if self is DType.STRING:
            raise ValueError("STRING tensors cannot live on device")
        import jax.numpy as jnp  # local import: keep module importable w/o jax

        return jnp.dtype(_NP_MAP[self])

    @staticmethod
    def from_numpy(dt) -> "DType":
        dt = np.dtype(dt)
        if dt == np.dtype(object) or dt.kind in ("U", "S"):
            return DType.STRING
        for k, v in _NP_MAP.items():
            if np.dtype(v) == dt and k not in (DType.U4, DType.I4):
                return k
        raise ValueError(f"no DType for numpy dtype {dt}")

    # -- matmul accumulation -------------------------------------------
    def accumulate_dtype(self) -> "DType":
        """Default accumulation dtype for contractions of this element type.

        bf16/f16/f8 accumulate in f32 (matches the reference's NDArray
        fast path, src/backends/ndarray_backend/specialized_matmul.rs:14-60,
        and the TPU MXU's native f32 accumulator); small ints accumulate
        in i32/i64.
        """
        if self in (DType.BF16, DType.F16, DType.F8E4M3, DType.F8E5M2,
                    DType.F4E2M1):
            return DType.F32
        if self in (DType.I8, DType.I16, DType.U8, DType.U16, DType.I4, DType.U4):
            return DType.I32
        return self


_FLOATS = (DType.F64, DType.F32, DType.BF16, DType.F16, DType.F8E4M3,
           DType.F8E5M2, DType.F4E2M1)

_SIZES = {
    DType.F64: 8.0, DType.F32: 4.0, DType.BF16: 2.0, DType.F16: 2.0,
    DType.F8E4M3: 1.0, DType.F8E5M2: 1.0, DType.F4E2M1: 0.5,
    DType.I64: 8.0, DType.I32: 4.0, DType.I16: 2.0, DType.I8: 1.0,
    DType.U64: 8.0, DType.U32: 4.0, DType.U16: 2.0, DType.U8: 1.0,
    DType.BOOL: 1.0, DType.U4: 0.5, DType.I4: 0.5,
}

_NP_MAP = {
    DType.F64: np.float64,
    DType.F32: np.float32,
    DType.F16: np.float16,
    DType.I64: np.int64,
    DType.I32: np.int32,
    DType.I16: np.int16,
    DType.I8: np.int8,
    DType.U64: np.uint64,
    DType.U32: np.uint32,
    DType.U16: np.uint16,
    DType.U8: np.uint8,
    DType.BOOL: np.bool_,
    # sub-byte types are stored widened on host
    DType.U4: np.uint8,
    DType.I4: np.int8,
}
if _HAVE_ML_DTYPES:
    _NP_MAP[DType.BF16] = ml_dtypes.bfloat16
    _NP_MAP[DType.F8E4M3] = ml_dtypes.float8_e4m3fn
    _NP_MAP[DType.F8E5M2] = ml_dtypes.float8_e5m2
    _NP_MAP[DType.F4E2M1] = getattr(ml_dtypes, "float4_e2m1fn",
                                    ml_dtypes.float8_e4m3fn)
else:  # pragma: no cover - ml_dtypes ships with jax in this image
    _NP_MAP[DType.BF16] = np.float32
    _NP_MAP[DType.F8E4M3] = np.float32
    _NP_MAP[DType.F8E5M2] = np.float32
    _NP_MAP[DType.F4E2M1] = np.float32


# ---------------------------------------------------------------------------
# ONNX TensorProto.DataType <-> DType
# ---------------------------------------------------------------------------
# Enum values are the public ONNX IR constants.
ONNX_TO_DTYPE = {
    1: DType.F32,
    2: DType.U8,
    3: DType.I8,
    4: DType.U16,
    5: DType.I16,
    6: DType.I32,
    7: DType.I64,
    8: DType.STRING,
    9: DType.BOOL,
    10: DType.F16,
    11: DType.F64,
    12: DType.U32,
    13: DType.U64,
    16: DType.BF16,
    17: DType.F8E4M3,
    19: DType.F8E5M2,
    21: DType.U4,
    22: DType.I4,
    23: DType.F4E2M1,
}
DTYPE_TO_ONNX = {v: k for k, v in ONNX_TO_DTYPE.items()}


@dataclass(frozen=True)
class AnyDType:
    """Either a scalar DType or a Packed quantized format.

    Equivalent of the reference's ``DType::Packed(PackedFormat)`` arm
    (src/dtype.rs:22-40). Scalar dtypes are represented by ``scalar``;
    packed block-quant formats by ``packed``.
    """

    scalar: Optional[DType] = None
    packed: Optional[PackedFormat] = None

    def __post_init__(self):
        if (self.scalar is None) == (self.packed is None):
            raise ValueError("exactly one of scalar/packed must be set")

    @property
    def is_packed(self) -> bool:
        return self.packed is not None

    def __repr__(self) -> str:
        return repr(self.scalar) if self.scalar else f"AnyDType({self.packed})"


def promote(a: DType, b: DType) -> DType:
    """Numpy-style type promotion restricted to our dtype set."""
    if a == b:
        return a
    if a is DType.STRING or b is DType.STRING:
        raise ValueError("cannot promote STRING")
    ra = np.result_type(a.to_numpy(), b.to_numpy())
    return DType.from_numpy(ra)
