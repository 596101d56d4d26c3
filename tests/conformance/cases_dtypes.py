"""Conformance cases: dtype-lattice sweeps.

Every case's expected output comes from an independent referee
(torch where it has the op+dtype, otherwise a per-case numpy formula
computed in f32/f64 and rounded to the target dtype — the framework's
own documented contract for sub-32-bit floats). Mirrors the dtype
breadth of the official ONNX node corpus
(reference tests/onnx_testing.rs:1960-1990).
"""

import ml_dtypes
import numpy as np
import torch

from whisper_tensor_tpu.dtype import DTYPE_TO_ONNX, DType

from .harness import Case

rng = np.random.default_rng(1234)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# unary sweep over f16 and bf16: contract = compute in f32, round back
# ---------------------------------------------------------------------------
_X = (rng.standard_normal((3, 5)) * 2).astype(np.float32)
_XP = (np.abs(rng.standard_normal((3, 5))) + 0.1).astype(np.float32)
_X01 = rng.uniform(-0.9, 0.9, (3, 5)).astype(np.float32)
_XG1 = (np.abs(rng.standard_normal((3, 5))) + 1.01).astype(np.float32)

_UNARY = {
    "Neg": (lambda v: -v, _X), "Abs": (np.abs, _X),
    "Exp": (np.exp, _X01), "Log": (np.log, _XP),
    "Sqrt": (np.sqrt, _XP), "Sin": (np.sin, _X), "Cos": (np.cos, _X),
    "Tan": (np.tan, _X01), "Asin": (np.arcsin, _X01),
    "Acos": (np.arccos, _X01), "Atan": (np.arctan, _X),
    "Sinh": (np.sinh, _X01), "Cosh": (np.cosh, _X01),
    "Tanh": (np.tanh, _X), "Asinh": (np.arcsinh, _X),
    "Acosh": (np.arccosh, _XG1), "Atanh": (np.arctanh, _X01),
    "Sigmoid": (lambda v: 1 / (1 + np.exp(-v)), _X),
    "Floor": (np.floor, _X), "Ceil": (np.ceil, _X),
    "Round": (lambda v: np.round(v), _X),
    "Reciprocal": (lambda v: 1 / v, _XP), "Sign": (np.sign, _X),
    "Relu": (lambda v: np.maximum(v, 0), _X),
    "Softplus": (lambda v: np.log1p(np.exp(v)), _X),
    "Softsign": (lambda v: v / (1 + np.abs(v)), _X),
}
for dt, dname, rtol in ((np.float16, "f16", 2e-3), (ml_dtypes.bfloat16, "bf16", 2e-2)):
    for op, (fn, src) in _UNARY.items():
        xv = src.astype(dt)
        ref = fn(xv.astype(np.float32)).astype(dt)
        # composite lowerings round per-op (documented contract), so the
        # single-rounding referee can differ by a couple of ulps
        add(f"u_{op.lower()}_{dname}", op, {"x": xv}, ref,
            rtol=rtol, atol=1e-3 if dt == np.float16 else 8e-3)

# int unaries
_I8 = rng.integers(-100, 100, (4, 5)).astype(np.int8)
_I16 = rng.integers(-3000, 3000, (4, 5)).astype(np.int16)
_I32 = rng.integers(-9000, 9000, (4, 5)).astype(np.int32)
_I64 = rng.integers(-9000, 9000, (4, 5)).astype(np.int64)
for dn, iv in (("i8", _I8), ("i16", _I16), ("i32", _I32), ("i64", _I64)):
    add(f"u_neg_{dn}", "Neg", {"x": iv}, -iv)
    add(f"u_abs_{dn}", "Abs", {"x": iv}, np.abs(iv))
    add(f"u_sign_{dn}", "Sign", {"x": iv}, np.sign(iv))
    add(f"u_relu_{dn}", "Relu", {"x": iv}, np.maximum(iv, 0))

# ---------------------------------------------------------------------------
# binary sweep over the integer/float lattice
# ---------------------------------------------------------------------------
_BIN_DTS = {
    "i8": (np.int8, (-50, 50)), "i16": (np.int16, (-999, 999)),
    "i32": (np.int32, (-9999, 9999)), "i64": (np.int64, (-99999, 99999)),
    "u8": (np.uint8, (0, 200)), "u16": (np.uint16, (0, 999)),
    "u32": (np.uint32, (0, 9999)), "u64": (np.uint64, (0, 99999)),
}
for dn, (dt, (lo, hi)) in _BIN_DTS.items():
    a = rng.integers(lo, hi, (3, 4)).astype(dt)
    b = rng.integers(max(lo, 1) if lo == 0 else lo, hi, (3, 4)).astype(dt)
    b[b == 0] = 1
    add(f"b_add_{dn}", "Add", {"a": a, "b": b},
        (a.astype(np.int64) + b.astype(np.int64)).astype(dt))
    add(f"b_sub_{dn}", "Sub", {"a": a, "b": b},
        (a.astype(np.int64) - b.astype(np.int64)).astype(dt))
    add(f"b_mul_{dn}", "Mul", {"a": a, "b": b},
        (a.astype(np.int64) * b.astype(np.int64)).astype(dt))
    # ONNX integer Div truncates toward zero (C semantics)
    q = np.trunc(a.astype(np.float64) / b.astype(np.float64)).astype(dt)
    add(f"b_div_{dn}", "Div", {"a": a, "b": b}, q)
    add(f"b_max_{dn}", "Max", {"a": a, "b": b}, np.maximum(a, b))
    add(f"b_min_{dn}", "Min", {"a": a, "b": b}, np.minimum(a, b))

for dn, dt, rtol in (("f16", np.float16, 2e-3), ("bf16", ml_dtypes.bfloat16, 2e-2),
                     ("f64", np.float64, 1e-12)):
    a = rng.standard_normal((3, 4)).astype(dt)
    b = (rng.standard_normal((3, 4)) + 3.0).astype(dt)
    af, bf = a.astype(np.float64), b.astype(np.float64)
    for op, fn in (("Add", np.add), ("Sub", np.subtract),
                   ("Mul", np.multiply), ("Div", np.divide)):
        add(f"b_{op.lower()}_{dn}", op, {"a": a, "b": b},
            fn(af, bf).astype(dt), rtol=rtol, atol=1e-3 if dt != np.float64 else 1e-12)
    add(f"b_pow_{dn}", "Pow", {"a": np.abs(a) + np.asarray(0.5, dt), "b": b},
        np.power((np.abs(a) + np.asarray(0.5, dt)).astype(np.float64), bf)
        .astype(dt), rtol=max(rtol, 5e-2), atol=2e-2)

# comparisons over several dtypes
for dn, a, b in (
    ("i32", _I32, np.roll(_I32, 1)),
    ("i64", _I64, np.roll(_I64, 1)),
    ("u8", rng.integers(0, 255, (4, 5)).astype(np.uint8),
     rng.integers(0, 255, (4, 5)).astype(np.uint8)),
    ("f64", _X.astype(np.float64), np.roll(_X.astype(np.float64), 1)),
    ("f16", _X.astype(np.float16), np.roll(_X.astype(np.float16), 1)),
):
    for op, fn in (("Equal", np.equal), ("Less", np.less),
                   ("Greater", np.greater), ("LessOrEqual", np.less_equal),
                   ("GreaterOrEqual", np.greater_equal)):
        add(f"c_{op.lower()}_{dn}", op, {"a": a, "b": b}, fn(a, b))

# Mod over int and float dtypes (both fmod semantics)
for dn, dt in (("i8", np.int8), ("i64", np.int64), ("u8", np.uint8)):
    a = rng.integers(0 if dt == np.uint8 else -20, 20, (3, 4)).astype(dt)
    b = rng.integers(1, 9, (3, 4)).astype(dt)
    add(f"b_mod_{dn}", "Mod", {"a": a, "b": b}, np.mod(a, b))
    add(f"b_mod_fmod_{dn}", "Mod", {"a": a, "b": b}, np.fmod(a, b),
        attrs={"fmod": 1})
add("b_mod_fmod_f64", "Mod",
    {"a": _X.astype(np.float64),
     "b": np.abs(np.roll(_X.astype(np.float64), 2)) + 0.3},
    None, attrs={"fmod": 1})
CASES[-1].expected = [np.fmod(CASES[-1].inputs["a"], CASES[-1].inputs["b"])]

# Where over dtype lattice
for dn, arr in (("i8", _I8), ("i64", _I64), ("f16", _X.astype(np.float16)),
                ("bf16", _X.astype(ml_dtypes.bfloat16)), ("bool", _X > 0)):
    c = rng.integers(0, 2, arr.shape).astype(bool)
    other = np.roll(arr, 1)
    add(f"where_{dn}", "Where", {"c": c, "a": arr, "b": other},
        np.where(c, arr, other))

# Clip over int dtypes + attribute form (opset 6)
add("clip_i32", "Clip", {"x": _I32, "mn": np.asarray(-100, np.int32),
                         "mx": np.asarray(100, np.int32)},
    np.clip(_I32, -100, 100))
add("clip_i64", "Clip", {"x": _I64, "mn": np.asarray(-500, np.int64),
                         "mx": np.asarray(500, np.int64)},
    np.clip(_I64, -500, 500))
add("clip_attr_form", "Clip", {"x": _X}, np.clip(_X, -0.5, 0.5),
    attrs={"min": -0.5, "max": 0.5}, opset=6)
add("clip_attr_min_only", "Clip", {"x": _X}, np.maximum(_X, 0.0),
    attrs={"min": 0.0}, opset=6)

# ---------------------------------------------------------------------------
# cast matrix: wider source/destination coverage incl. fp8
# ---------------------------------------------------------------------------
_CAST_SRC = {
    DType.I8: _I8, DType.I16: _I16,
    DType.U16: rng.integers(0, 999, (3, 4)).astype(np.uint16),
    DType.U32: rng.integers(0, 9999, (3, 4)).astype(np.uint32),
    DType.U64: rng.integers(0, 9999, (3, 4)).astype(np.uint64),
}
for src, arr in _CAST_SRC.items():
    for dst in (DType.F32, DType.F64, DType.I64, DType.I32, DType.BOOL,
                DType.F16, DType.BF16):
        exp = (np.asarray(arr).astype(bool) if dst is DType.BOOL
               else np.asarray(arr).astype(dst.to_numpy()))
        add(f"cast2_{src.name}_{dst.name}".lower(), "Cast",
            {"x": np.asarray(arr)}, exp,
            attrs={"to": DTYPE_TO_ONNX[dst]}, rtol=1e-2, atol=1e-2)

# fp8 casts (values chosen exactly representable to keep the check exact)
_F8VALS = np.asarray([0.0, 0.5, -1.0, 2.0, -4.0, 8.0], dtype=np.float32)
add("cast_f32_f8e4m3", "Cast", {"x": _F8VALS},
    _F8VALS.astype(ml_dtypes.float8_e4m3fn),
    attrs={"to": DTYPE_TO_ONNX[DType.F8E4M3]}, rtol=0, atol=0)
add("cast_f8e4m3_f32", "Cast", {"x": _F8VALS.astype(ml_dtypes.float8_e4m3fn)},
    _F8VALS, attrs={"to": DTYPE_TO_ONNX[DType.F32]}, rtol=0, atol=0)
add("cast_f32_f8e5m2", "Cast", {"x": _F8VALS},
    _F8VALS.astype(ml_dtypes.float8_e5m2),
    attrs={"to": DTYPE_TO_ONNX[DType.F8E5M2]}, rtol=0, atol=0)
add("cast_f8e5m2_f32", "Cast", {"x": _F8VALS.astype(ml_dtypes.float8_e5m2)},
    _F8VALS, attrs={"to": DTYPE_TO_ONNX[DType.F32]}, rtol=0, atol=0)

# CastLike across the lattice (non-negative sources for unsigned
# targets: float->unsigned of negatives is implementation-defined)
for dn, like in (("i8", _I8), ("u16", _CAST_SRC[DType.U16]),
                 ("f16", _X.astype(np.float16)),
                 ("bf16", _X.astype(ml_dtypes.bfloat16))):
    dt = np.asarray(like).dtype
    src = np.abs(_X) * 10 if dn.startswith("u") else _X
    add(f"castlike_f32_{dn}", "CastLike",
        {"x": src, "like": np.zeros(1, dtype=dt)},
        src.astype(dt), rtol=1e-2, atol=1e-2)

# variadic Max/Min/Sum/Mean over f64 and int
_V64 = [rng.standard_normal((2, 3)).astype(np.float64) for _ in range(4)]
add("max_4_f64", "Max", {f"x{i}": v for i, v in enumerate(_V64)},
    np.maximum.reduce(_V64))
add("min_4_f64", "Min", {f"x{i}": v for i, v in enumerate(_V64)},
    np.minimum.reduce(_V64))
add("sum_4_f64", "Sum", {f"x{i}": v for i, v in enumerate(_V64)},
    np.add.reduce(_V64))
add("mean_4_f64", "Mean", {f"x{i}": v for i, v in enumerate(_V64)},
    np.add.reduce(_V64) / 4)
_VI = [rng.integers(-50, 50, (2, 3)).astype(np.int32) for _ in range(3)]
add("max_3_i32", "Max", {f"x{i}": v for i, v in enumerate(_VI)},
    np.maximum.reduce(_VI))
add("min_3_i32", "Min", {f"x{i}": v for i, v in enumerate(_VI)},
    np.minimum.reduce(_VI))
add("sum_3_i32", "Sum", {f"x{i}": v for i, v in enumerate(_VI)},
    # np.add.reduce promotes i32 sums to i64; ONNX Sum keeps the dtype
    np.add.reduce(_VI).astype(np.int32))
# single-operand variadic edge case
add("max_1", "Max", {"a": _X}, _X)
add("sum_1", "Sum", {"a": _X}, _X)

# scalar (rank-0) elementwise edge cases
_S0 = np.asarray(2.5, dtype=np.float32)
add("add_scalar_scalar", "Add", {"a": _S0, "b": np.asarray(0.5, np.float32)},
    np.asarray(3.0, np.float32))
add("sqrt_scalar", "Sqrt", {"x": np.asarray(9.0, np.float32)},
    np.asarray(3.0, np.float32))
add("neg_scalar_i64", "Neg", {"x": np.asarray(7, np.int64)},
    np.asarray(-7, np.int64))

# empty-tensor edge cases
_E = np.zeros((0, 3), dtype=np.float32)
add("add_empty", "Add", {"a": _E, "b": np.ones((1, 3), np.float32)}, _E)
add("relu_empty", "Relu", {"x": _E}, _E)
add("concat_with_empty", "Concat",
    {"a": _E, "b": rng.standard_normal((2, 3)).astype(np.float32)}, None,
    attrs={"axis": 0})
CASES[-1].expected = [np.concatenate([_E, CASES[-1].inputs["b"]], axis=0)]

# PRelu with per-channel slope
_PX = rng.standard_normal((2, 4, 3)).astype(np.float32)
_PS = np.abs(rng.standard_normal((4, 1))).astype(np.float32)
add("prelu_per_channel", "PRelu", {"x": _PX, "slope": _PS},
    np.where(_PX > 0, _PX, _PX * _PS))

# Celu / Shrink / ThresholdedRelu (torch referees)
add("celu_default", "Celu", {"x": _X},
    torch.nn.functional.celu(t(_X)).numpy(), atol=1e-6)
add("celu_alpha2", "Celu", {"x": _X},
    torch.nn.functional.celu(t(_X), alpha=2.0).numpy(),
    attrs={"alpha": 2.0}, atol=1e-6)
# ONNX Shrink default bias=0 (NOT torch softshrink, which is bias=lambd)
add("shrink_default", "Shrink", {"x": _X},
    np.where(np.abs(_X) > 0.5, _X, 0.0).astype(np.float32))
add("shrink_softshrink_equiv", "Shrink", {"x": _X},
    torch.nn.functional.softshrink(t(_X), lambd=0.5).numpy(),
    attrs={"bias": 0.5, "lambd": 0.5})
add("shrink_bias", "Shrink", {"x": _X},
    np.where(_X < -0.3, _X + 0.1, np.where(_X > 0.3, _X - 0.1, 0.0)).astype(np.float32),
    attrs={"bias": 0.1, "lambd": 0.3})
add("thresholdedrelu", "ThresholdedRelu", {"x": _X},
    np.where(_X > 0.7, _X, 0.0).astype(np.float32), attrs={"alpha": 0.7})
add("hardmax_last", "Hardmax", {"x": _X}, None)
CASES[-1].expected = [np.eye(5, dtype=np.float32)[_X.argmax(-1)]]
add("hardmax_ax0", "Hardmax", {"x": _X}, None, attrs={"axis": 0})
CASES[-1].expected = [(np.eye(3, dtype=np.float32)[_X.argmax(0)]).T]
