"""Conformance cases: unary, binary, cast, clip, activation composites.

Expected outputs come from torch (independent implementation) wherever
torch has the op; otherwise from per-case numpy formulas.
"""

import numpy as np
import torch

import ml_dtypes

from .harness import Case

rng = np.random.default_rng(42)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# unary over f32 and f64
# ---------------------------------------------------------------------------
_X32 = (rng.standard_normal((3, 5)) * 2).astype(np.float32)
_XPOS = (np.abs(rng.standard_normal((3, 5))) + 0.1).astype(np.float32)
_X01 = rng.uniform(-0.95, 0.95, (3, 5)).astype(np.float32)
_XGE1 = (np.abs(rng.standard_normal((3, 5))) + 1.01).astype(np.float32)

_UNARY_TORCH = {
    "Neg": (torch.neg, _X32), "Abs": (torch.abs, _X32),
    "Exp": (torch.exp, _X32), "Log": (torch.log, _XPOS),
    "Sqrt": (torch.sqrt, _XPOS), "Sin": (torch.sin, _X32),
    "Cos": (torch.cos, _X32), "Tan": (torch.tan, _X01),
    "Asin": (torch.asin, _X01), "Acos": (torch.acos, _X01),
    "Atan": (torch.atan, _X32), "Sinh": (torch.sinh, _X32),
    "Cosh": (torch.cosh, _X32), "Tanh": (torch.tanh, _X32),
    "Asinh": (torch.asinh, _X32), "Acosh": (torch.acosh, _XGE1),
    "Atanh": (torch.atanh, _X01), "Sigmoid": (torch.sigmoid, _X32),
    "Erf": (torch.erf, _X32), "Floor": (torch.floor, _X32),
    "Ceil": (torch.ceil, _X32), "Round": (torch.round, _X32),
    "Reciprocal": (torch.reciprocal, _XPOS), "Sign": (torch.sign, _X32),
    "Relu": (torch.relu, _X32), "Softplus": (torch.nn.functional.softplus, _X32),
    "Softsign": (torch.nn.functional.softsign, _X32),
    "Mish": (torch.nn.functional.mish, _X32),
}
for op, (fn, x) in _UNARY_TORCH.items():
    add(f"{op.lower()}_f32", op, {"x": x}, fn(t(x)).numpy())
    x64 = x.astype(np.float64)
    add(f"{op.lower()}_f64", op, {"x": x64}, fn(t(x64)).numpy())

# bf16 unary: contract = compute in f32, round back
for op in ("Exp", "Tanh", "Sigmoid", "Relu", "Sqrt"):
    xb = (_XPOS if op == "Sqrt" else _X32).astype(ml_dtypes.bfloat16)
    ref = _UNARY_TORCH[op][0](t(xb.astype(np.float32))).numpy().astype(ml_dtypes.bfloat16)
    add(f"{op.lower()}_bf16", op, {"x": xb}, ref, rtol=1e-2, atol=1e-3)

add("not_bool", "Not", {"x": np.asarray([True, False, True])},
    np.asarray([False, True, False]))
add("isnan_f32", "IsNaN",
    {"x": np.asarray([1.0, np.nan, np.inf], dtype=np.float32)},
    np.asarray([False, True, False]))
add("isinf_f32", "IsInf",
    {"x": np.asarray([1.0, np.inf, -np.inf, np.nan], dtype=np.float32)},
    np.asarray([False, True, True, False]))
add("isinf_pos_only", "IsInf",
    {"x": np.asarray([np.inf, -np.inf], dtype=np.float32)},
    np.asarray([True, False]), attrs={"detect_negative": 0})

# ---------------------------------------------------------------------------
# binary + broadcasting
# ---------------------------------------------------------------------------
_A = rng.standard_normal((2, 3, 4)).astype(np.float32)
_B = rng.standard_normal((3, 4)).astype(np.float32)
_BPOS = (np.abs(_B) + 0.2).astype(np.float32)
_SCALAR = np.asarray(1.7, dtype=np.float32)

for op, fn, b in [("Add", np.add, _B), ("Sub", np.subtract, _B),
                  ("Mul", np.multiply, _B), ("Div", np.divide, _BPOS)]:
    add(f"{op.lower()}_bcast", op, {"a": _A, "b": b}, fn(_A, b))
    add(f"{op.lower()}_scalar", op, {"a": _A, "b": _SCALAR}, fn(_A, _SCALAR))

_I = rng.integers(-20, 20, (4, 5)).astype(np.int32)
_J = rng.integers(1, 9, (4, 5)).astype(np.int32)
add("add_i32", "Add", {"a": _I, "b": _J}, _I + _J)
add("div_i32_trunc", "Div", {"a": _I, "b": _J},
    (np.sign(_I) * np.sign(_J) * (np.abs(_I) // np.abs(_J))).astype(np.int32))
add("mod_i32", "Mod", {"a": _I, "b": _J}, np.mod(_I, _J))
add("mod_fmod_f32", "Mod", {"a": _A[0], "b": _BPOS}, np.fmod(_A[0], _BPOS),
    attrs={"fmod": 1})
add("pow_f32", "Pow", {"a": np.abs(_A) + 0.1, "b": _B},
    np.power(np.abs(_A) + 0.1, _B))
add("pow_int_exp", "Pow", {"a": _A, "b": np.asarray(2.0, dtype=np.float32)},
    _A ** 2)

for op, fn in [("Equal", np.equal), ("Less", np.less),
               ("LessOrEqual", np.less_equal), ("Greater", np.greater),
               ("GreaterOrEqual", np.greater_equal)]:
    add(f"{op.lower()}_f32", op, {"a": _A[0], "b": _B}, fn(_A[0], _B))

_BOOL1 = rng.integers(0, 2, (4,)).astype(bool)
_BOOL2 = rng.integers(0, 2, (4,)).astype(bool)
for op, fn in [("And", np.logical_and), ("Or", np.logical_or),
               ("Xor", np.logical_xor)]:
    add(f"{op.lower()}_bool", op, {"a": _BOOL1, "b": _BOOL2}, fn(_BOOL1, _BOOL2))

_U = rng.integers(0, 255, (4,)).astype(np.uint8)
_V = rng.integers(0, 255, (4,)).astype(np.uint8)
add("bitwiseand_u8", "BitwiseAnd", {"a": _U, "b": _V}, _U & _V)
add("bitwiseor_u8", "BitwiseOr", {"a": _U, "b": _V}, _U | _V)
add("bitwisexor_u8", "BitwiseXor", {"a": _U, "b": _V}, _U ^ _V)
add("bitshift_left", "BitShift", {"a": _U.astype(np.uint32),
                                  "b": np.full(4, 2, dtype=np.uint32)},
    _U.astype(np.uint32) << 2, attrs={"direction": "LEFT"})
add("bitshift_right", "BitShift", {"a": _U.astype(np.uint32),
                                   "b": np.full(4, 1, dtype=np.uint32)},
    _U.astype(np.uint32) >> 1, attrs={"direction": "RIGHT"})

for op, fn in [("Max", np.maximum), ("Min", np.minimum)]:
    add(f"{op.lower()}_2", op, {"a": _A[0], "b": _B}, fn(_A[0], _B))
    c = rng.standard_normal((4,)).astype(np.float32)
    add(f"{op.lower()}_3", op, {"a": _A[0], "b": _B, "c": c},
        fn(fn(_A[0], _B), c))
add("sum_3", "Sum", {"a": _A[0], "b": _B, "c": _B}, _A[0] + _B + _B)
add("mean_3", "Mean", {"a": _A[0], "b": _B, "c": _B}, (_A[0] + _B + _B) / 3)

add("where_f32", "Where", {"c": _A[0] > 0, "a": _A[0], "b": _B},
    np.where(_A[0] > 0, _A[0], _B))

# bf16 binary exactness
_ABF = _A[0].astype(ml_dtypes.bfloat16)
_BBF = _B.astype(ml_dtypes.bfloat16)
add("add_bf16_exact", "Add", {"a": _ABF, "b": _BBF},
    (_ABF.astype(np.float32) + _BBF.astype(np.float32)).astype(ml_dtypes.bfloat16),
    rtol=0, atol=0)
add("mul_bf16_exact", "Mul", {"a": _ABF, "b": _BBF},
    (_ABF.astype(np.float32) * _BBF.astype(np.float32)).astype(ml_dtypes.bfloat16),
    rtol=0, atol=0)

# ---------------------------------------------------------------------------
# cast matrix
# ---------------------------------------------------------------------------
from whisper_tensor_tpu.dtype import DTYPE_TO_ONNX, DType

_CAST_SRC = {
    DType.F32: _A[0], DType.F64: _A[0].astype(np.float64),
    DType.I64: _I.astype(np.int64), DType.I32: _I,
    DType.U8: _U, DType.BOOL: _BOOL1,
    DType.F16: _A[0].astype(np.float16),
    DType.BF16: _A[0].astype(ml_dtypes.bfloat16),
}
for src, arr in _CAST_SRC.items():
    for dst in (DType.F32, DType.F64, DType.I64, DType.I32, DType.BOOL,
                DType.F16, DType.BF16):
        if src == dst:
            continue
        if dst is DType.BOOL:
            exp = np.asarray(arr).astype(bool)
        else:
            exp = np.asarray(arr).astype(dst.to_numpy())
        add(f"cast_{src.name}_{dst.name}".lower(), "Cast", {"x": np.asarray(arr)},
            exp, attrs={"to": DTYPE_TO_ONNX[dst]}, rtol=1e-2, atol=1e-6)

add("castlike_f32_to_i64", "CastLike",
    {"x": _A[0], "like": np.zeros(1, dtype=np.int64)},
    _A[0].astype(np.int64))

# ---------------------------------------------------------------------------
# clip & activations with attrs
# ---------------------------------------------------------------------------
add("clip_both", "Clip", {"x": _A[0], "mn": np.asarray(-0.5, dtype=np.float32),
                          "mx": np.asarray(0.5, dtype=np.float32)},
    np.clip(_A[0], -0.5, 0.5))
add("clip_min_only", "Clip", {"x": _A[0], "mn": np.asarray(0.0, dtype=np.float32)},
    np.maximum(_A[0], 0.0))
add("leakyrelu", "LeakyRelu", {"x": _A[0]},
    torch.nn.functional.leaky_relu(t(_A[0]), 0.3).numpy(), attrs={"alpha": 0.3})
add("elu", "Elu", {"x": _A[0]},
    torch.nn.functional.elu(t(_A[0]), 1.5).numpy(), attrs={"alpha": 1.5})
add("selu", "Selu", {"x": _A[0]}, torch.nn.functional.selu(t(_A[0])).numpy())
add("prelu", "PRelu", {"x": _A[0], "slope": np.asarray(0.25, dtype=np.float32)},
    torch.nn.functional.prelu(t(_A[0]), torch.tensor(0.25)).numpy())
add("hardsigmoid", "HardSigmoid", {"x": _A[0]},
    np.clip(_A[0] / 6 + 0.5, 0, 1).astype(np.float32),
    attrs={"alpha": 1.0 / 6.0, "beta": 0.5})
add("hardswish", "HardSwish", {"x": _A[0]},
    torch.nn.functional.hardswish(t(_A[0])).numpy(), rtol=1e-3, atol=1e-6)
add("gelu_exact", "Gelu", {"x": _A[0]},
    torch.nn.functional.gelu(t(_A[0])).numpy())
add("gelu_tanh", "Gelu", {"x": _A[0]},
    torch.nn.functional.gelu(t(_A[0]), approximate="tanh").numpy(),
    attrs={"approximate": "tanh"})
add("biasgelu", "BiasGelu", {"x": _A[0], "b": _B[0]},
    torch.nn.functional.gelu(t(_A[0] + _B[0])).numpy(), domain="wt")

# quantize / dequantize
_QX = rng.standard_normal((3, 4)).astype(np.float32) * 3
_SC = np.asarray(0.05, dtype=np.float32)
_ZP = np.asarray(3, dtype=np.int8)
add("quantizelinear_i8", "QuantizeLinear", {"x": _QX, "s": _SC, "z": _ZP},
    np.clip(np.round(_QX / 0.05) + 3, -128, 127).astype(np.int8))
_QI = rng.integers(-100, 100, (3, 4)).astype(np.int8)
add("dequantizelinear_i8", "DequantizeLinear", {"x": _QI, "s": _SC, "z": _ZP},
    ((_QI.astype(np.float32) - 3) * 0.05).astype(np.float32))
_SCV = np.asarray([0.1, 0.2, 0.3, 0.4], dtype=np.float32)
add("dequantizelinear_axis", "DequantizeLinear",
    {"x": _QI.T.copy(), "s": _SCV},
    (_QI.T.astype(np.float32) * _SCV[:, None]).astype(np.float32),
    attrs={"axis": 0})
