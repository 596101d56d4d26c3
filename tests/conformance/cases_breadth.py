"""Conformance cases: breadth expansion to exceed the reference's
~1,276 active node tests per backend (tests/onnx_testing.rs:1960-1990).

Sections: unary edge-shape sweeps (0-d scalars, empty tensors, 4-D),
binary broadcast matrix, Gemm attribute matrix, normalization-family
attribute matrices, activation alpha/beta matrices, n-ary variadic ops,
reduce dtype sweeps, conv/convtranspose extras, pad modes, scatter /
gather extras, quantize per-channel, and assorted attribute forms.

Referees are independent: numpy formulas written per-case or torch —
never the framework itself.
"""

import ml_dtypes
import numpy as np
import torch

from .harness import Case

rng = np.random.default_rng(31415)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# 1. unary sweep over edge shapes: 0-d scalar, empty, 4-D
# ---------------------------------------------------------------------------
_U_FNS = {
    "Neg": lambda v: -v,
    "Abs": np.abs,
    "Exp": np.exp,
    "Sigmoid": lambda v: 1 / (1 + np.exp(-v)),
    "Tanh": np.tanh,
    "Relu": lambda v: np.maximum(v, 0),
    "Floor": np.floor,
    "Ceil": np.ceil,
    "Round": np.round,
    "Sign": np.sign,
    "Softplus": lambda v: np.log1p(np.exp(v)),
    "Softsign": lambda v: v / (1 + np.abs(v)),
    "Sin": np.sin,
    "Cos": np.cos,
    "Erf": lambda v: torch.erf(t(v)).numpy().reshape(np.shape(v)),
}
_SC0 = np.float32(0.7321)            # 0-d scalar
_E0 = np.zeros((0, 3), np.float32)   # empty
_X4 = rng.standard_normal((2, 3, 2, 4)).astype(np.float32)
for op, fn in _U_FNS.items():
    add(f"u_{op.lower()}_scalar0d", op, {"x": np.asarray(_SC0)},
        np.asarray(fn(np.asarray(_SC0))))
    add(f"u_{op.lower()}_empty", op, {"x": _E0}, fn(_E0))
    add(f"u_{op.lower()}_4d", op, {"x": _X4}, fn(_X4))

# f64 sweep of the same unaries
_X64 = rng.standard_normal((3, 4)).astype(np.float64)
for op, fn in _U_FNS.items():
    if op == "Erf":
        ref = torch.erf(t(_X64)).numpy()
    else:
        ref = fn(_X64)
    add(f"u_{op.lower()}_f64", op, {"x": _X64}, ref, rtol=1e-10, atol=1e-12)

# ---------------------------------------------------------------------------
# 2. binary broadcast matrix
# ---------------------------------------------------------------------------
_BCASTS = [
    ("r1xc1", (3, 1), (1, 4)),
    ("sxt", (), (2, 3)),
    ("vec_tail", (2, 3, 4), (4,)),
    ("mid1", (2, 1, 4), (3, 1)),
    ("deg1", (1,), (5,)),
]
_BOPS = {
    "Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
    "Div": np.divide, "Pow": None, "Max": np.maximum, "Min": np.minimum,
}
for bn, sa, sb in _BCASTS:
    a = rng.standard_normal(sa).astype(np.float32)
    b = (rng.standard_normal(sb) + 2.5).astype(np.float32)
    for op, fn in _BOPS.items():
        if op == "Pow":
            base = np.abs(a) + 0.5
            add(f"bc_pow_{bn}", "Pow", {"a": base.astype(np.float32), "b": b},
                np.power(base.astype(np.float64), b.astype(np.float64))
                .astype(np.float32), rtol=2e-3)
        else:
            add(f"bc_{op.lower()}_{bn}", op, {"a": a, "b": b}, fn(a, b))

# ---------------------------------------------------------------------------
# 3. Gemm attribute matrix
# ---------------------------------------------------------------------------
_GM, _GK, _GN = 4, 5, 3
_A_NN = rng.standard_normal((_GM, _GK)).astype(np.float32)
_B_NN = rng.standard_normal((_GK, _GN)).astype(np.float32)
_C_FULL = rng.standard_normal((_GM, _GN)).astype(np.float32)
_C_ROW = rng.standard_normal((_GN,)).astype(np.float32)
_C_COL = rng.standard_normal((_GM, 1)).astype(np.float32)
_C_1 = rng.standard_normal((1,)).astype(np.float32)


def _gemm_ref(a, b, c, alpha=1.0, beta=1.0, transA=0, transB=0):
    aa = a.T if transA else a
    bb = b.T if transB else b
    y = alpha * (aa.astype(np.float64) @ bb.astype(np.float64))
    if c is not None:
        y = y + beta * c.astype(np.float64)
    return y.astype(np.float32)


for nm, c in (("cfull", _C_FULL), ("crow", _C_ROW), ("ccol", _C_COL),
              ("c1", _C_1)):
    add(f"gemm_ab_{nm}", "Gemm", {"a": _A_NN, "b": _B_NN, "c": c},
        _gemm_ref(_A_NN, _B_NN, c), rtol=2e-3)
    add(f"gemm_alpha_beta_{nm}", "Gemm", {"a": _A_NN, "b": _B_NN, "c": c},
        _gemm_ref(_A_NN, _B_NN, c, alpha=0.5, beta=2.0),
        attrs={"alpha": 0.5, "beta": 2.0}, rtol=2e-3)
add("gemm_noc", "Gemm", {"a": _A_NN, "b": _B_NN},
    _gemm_ref(_A_NN, _B_NN, None), rtol=2e-3)
add("gemm_ta", "Gemm", {"a": _A_NN.T.copy(), "b": _B_NN, "c": _C_ROW},
    _gemm_ref(_A_NN.T.copy(), _B_NN, _C_ROW, transA=1),
    attrs={"transA": 1}, rtol=2e-3)
add("gemm_tb", "Gemm", {"a": _A_NN, "b": _B_NN.T.copy(), "c": _C_ROW},
    _gemm_ref(_A_NN, _B_NN.T.copy(), _C_ROW, transB=1),
    attrs={"transB": 1}, rtol=2e-3)
add("gemm_ta_tb_alpha", "Gemm",
    {"a": _A_NN.T.copy(), "b": _B_NN.T.copy(), "c": _C_FULL},
    _gemm_ref(_A_NN.T.copy(), _B_NN.T.copy(), _C_FULL, alpha=0.25,
              transA=1, transB=1),
    attrs={"transA": 1, "transB": 1, "alpha": 0.25}, rtol=2e-3)
# dtype spread
for dn, dt, tol in (("f64", np.float64, 1e-10),
                    ("f16", np.float16, 2e-3),
                    ("bf16", ml_dtypes.bfloat16, 2e-2)):
    av, bv, cv = _A_NN.astype(dt), _B_NN.astype(dt), _C_ROW.astype(dt)
    ref = (av.astype(np.float64) @ bv.astype(np.float64)
           + cv.astype(np.float64)).astype(dt)
    add(f"br_gemm_{dn}", "Gemm", {"a": av, "b": bv, "c": cv}, ref,
        rtol=max(tol, 1e-10), atol=2e-2 if dn == "bf16" else 1e-3)

# ---------------------------------------------------------------------------
# 4. normalization family attribute matrices
# ---------------------------------------------------------------------------
# BatchNormalization (inference): y = scale*(x-mean)/sqrt(var+eps)+bias
for nm, shape in (("1d", (2, 3, 5)), ("2d", (2, 3, 4, 4)),
                  ("3d", (1, 2, 3, 3, 3))):
    C = shape[1]
    x = rng.standard_normal(shape).astype(np.float32)
    sc = rng.standard_normal((C,)).astype(np.float32)
    bi = rng.standard_normal((C,)).astype(np.float32)
    mu = rng.standard_normal((C,)).astype(np.float32)
    var = (np.abs(rng.standard_normal((C,))) + 0.5).astype(np.float32)
    for eps in (1e-5, 1e-2):
        bshape = (1, C) + (1,) * (len(shape) - 2)
        ref = (sc.reshape(bshape) * (x - mu.reshape(bshape))
               / np.sqrt(var.reshape(bshape) + eps) + bi.reshape(bshape))
        add(f"bn_{nm}_eps{eps:g}", "BatchNormalization",
            {"x": x, "scale": sc, "bias": bi, "mean": mu, "var": var},
            ref.astype(np.float32), attrs={"epsilon": float(eps)}, rtol=2e-3)

# GroupNormalization (opset 18+): scale/bias per channel
_GNX = rng.standard_normal((2, 6, 4, 4)).astype(np.float32)
_GNS = rng.standard_normal((6,)).astype(np.float32)
_GNB = rng.standard_normal((6,)).astype(np.float32)
for g in (1, 2, 6):
    ref = torch.nn.functional.group_norm(
        t(_GNX), g, t(_GNS), t(_GNB), eps=1e-5).numpy()
    add(f"gn_groups{g}", "GroupNormalization",
        {"x": _GNX, "scale": _GNS, "bias": _GNB}, ref,
        attrs={"num_groups": g, "epsilon": 1e-5}, rtol=2e-3, atol=1e-5)

# InstanceNormalization across ranks
for nm, shape in (("1d", (2, 3, 7)), ("2d", (2, 3, 4, 5)),
                  ("3d", (1, 2, 3, 4, 3))):
    C = shape[1]
    x = rng.standard_normal(shape).astype(np.float32)
    sc = rng.standard_normal((C,)).astype(np.float32)
    bi = rng.standard_normal((C,)).astype(np.float32)
    ref = torch.nn.functional.instance_norm(
        t(x), weight=t(sc), bias=t(bi), eps=1e-5).numpy()
    add(f"in_{nm}", "InstanceNormalization",
        {"x": x, "scale": sc, "bias": bi}, ref,
        attrs={"epsilon": 1e-5}, rtol=2e-3, atol=1e-5)

# LayerNormalization axis / no-bias matrix
_LNX = rng.standard_normal((2, 3, 8)).astype(np.float32)
for axis in (-1, 1, 0):
    norm_shape = _LNX.shape[axis if axis >= 0 else _LNX.ndim + axis:]
    w = rng.standard_normal(norm_shape).astype(np.float32)
    b = rng.standard_normal(norm_shape).astype(np.float32)
    ref = torch.nn.functional.layer_norm(
        t(_LNX), norm_shape, t(w), t(b), eps=1e-5).numpy()
    add(f"ln_axis{axis}", "LayerNormalization",
        {"x": _LNX, "scale": w, "bias": b}, ref,
        attrs={"axis": axis, "epsilon": 1e-5}, rtol=2e-3, atol=1e-5)
_LNW = rng.standard_normal((8,)).astype(np.float32)
add("ln_nobias", "LayerNormalization", {"x": _LNX, "scale": _LNW},
    torch.nn.functional.layer_norm(t(_LNX), (8,), t(_LNW), None,
                                   eps=1e-5).numpy(),
    attrs={"axis": -1, "epsilon": 1e-5}, rtol=2e-3, atol=1e-5)

# MeanVarianceNormalization axes forms
_MVX = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)


def _mvn(x, axes):
    mu = x.mean(axis=axes, keepdims=True)
    sd = x.std(axis=axes, keepdims=True)
    return ((x - mu) / (sd + 1e-9)).astype(np.float32)


add("mvn_default", "MeanVarianceNormalization", {"x": _MVX},
    _mvn(_MVX, (0, 2, 3)), rtol=2e-3, atol=1e-4)
add("mvn_axes_23", "MeanVarianceNormalization", {"x": _MVX},
    _mvn(_MVX, (2, 3)), attrs={"axes": [2, 3]}, rtol=2e-3, atol=1e-4)

# RMSNormalization axis variant
_RMX = rng.standard_normal((2, 4, 6)).astype(np.float32)
_RMW = rng.standard_normal((4, 6)).astype(np.float32)
_rm = _RMX / np.sqrt((_RMX ** 2).mean(axis=(1, 2), keepdims=True) + 1e-5)
add("rms_axis1", "RMSNormalization", {"x": _RMX, "scale": _RMW},
    (_rm * _RMW).astype(np.float32), attrs={"axis": 1, "epsilon": 1e-5},
    rtol=2e-3, atol=1e-5)

# LpNormalization p/axis matrix
_LPX = (rng.standard_normal((3, 5)) + 0.1).astype(np.float32)
for p in (1, 2):
    for ax in (0, 1, -1):
        den = np.sum(np.abs(_LPX) ** p, axis=ax, keepdims=True) ** (1.0 / p)
        add(f"lpn_p{p}_ax{ax}", "LpNormalization", {"x": _LPX},
            (_LPX / den).astype(np.float32), attrs={"p": p, "axis": ax},
            rtol=2e-3, atol=1e-5)

# ---------------------------------------------------------------------------
# 5. activation alpha/beta matrices
# ---------------------------------------------------------------------------
_AX = rng.standard_normal((3, 5)).astype(np.float32) * 2
for alpha in (0.5, 2.0):
    add(f"elu_a{alpha:g}", "Elu", {"x": _AX},
        np.where(_AX > 0, _AX, alpha * (np.exp(_AX) - 1)).astype(np.float32),
        attrs={"alpha": alpha}, rtol=2e-3)
    add(f"leakyrelu_a{alpha:g}", "LeakyRelu", {"x": _AX},
        np.where(_AX > 0, _AX, alpha * _AX).astype(np.float32),
        attrs={"alpha": alpha})
    add(f"celu_a{alpha:g}", "Celu", {"x": _AX},
        (np.maximum(_AX, 0)
         + np.minimum(0, alpha * (np.exp(_AX / alpha) - 1))).astype(np.float32),
        attrs={"alpha": alpha}, rtol=2e-3)
    add(f"thresholdedrelu_a{alpha:g}", "ThresholdedRelu", {"x": _AX},
        np.where(_AX > alpha, _AX, 0).astype(np.float32),
        attrs={"alpha": alpha})
for a, b in ((0.2, 0.5), (0.25, 0.6)):
    add(f"hardsigmoid_{a:g}_{b:g}", "HardSigmoid", {"x": _AX},
        np.clip(a * _AX + b, 0, 1).astype(np.float32),
        attrs={"alpha": a, "beta": b})
# Selu custom gamma/alpha
_SELU_A, _SELU_G = 1.5, 1.2
add("selu_custom", "Selu", {"x": _AX},
    (_SELU_G * np.where(_AX > 0, _AX, _SELU_A * (np.exp(_AX) - 1))
     ).astype(np.float32),
    attrs={"alpha": _SELU_A, "gamma": _SELU_G}, rtol=2e-3)
# Shrink bias/lambd
for lam, bias in ((0.5, 0.0), (0.5, 0.2), (1.0, 0.5)):
    ref = np.where(_AX < -lam, _AX + bias,
                   np.where(_AX > lam, _AX - bias, 0)).astype(np.float32)
    add(f"shrink_l{lam:g}_b{bias:g}", "Shrink", {"x": _AX}, ref,
        attrs={"lambd": lam, "bias": bias})
# PRelu slope broadcast forms
for nm, sshape in (("chan", (5,)), ("full", (3, 5)), ("scalar", (1,))):
    slope = np.abs(rng.standard_normal(sshape)).astype(np.float32)
    add(f"prelu_{nm}", "PRelu", {"x": _AX, "slope": slope},
        np.where(_AX > 0, _AX, slope * _AX).astype(np.float32))
add("br_mish_f32", "Mish", {"x": _AX},
    (_AX * np.tanh(np.log1p(np.exp(_AX)))).astype(np.float32), rtol=2e-3)
add("hardswish_f32", "HardSwish", {"x": _AX},
    (_AX * np.clip(_AX / 6 + 0.5, 0, 1)).astype(np.float32), rtol=2e-3)
add("br_gelu_tanh", "Gelu", {"x": _AX},
    torch.nn.functional.gelu(t(_AX), approximate="tanh").numpy(),
    attrs={"approximate": "tanh"}, rtol=2e-3, atol=1e-5)
add("gelu_none_f64", "Gelu", {"x": _AX.astype(np.float64)},
    torch.nn.functional.gelu(t(_AX.astype(np.float64))).numpy(),
    rtol=1e-6, atol=1e-8)  # erf special-fn accuracy bounds f64 gelu

# Clip variants
_CX = (rng.standard_normal((3, 4)) * 3).astype(np.float32)
add("br_clip_min_only", "Clip", {"x": _CX, "mn": np.float32(-1.0)},
    np.maximum(_CX, -1.0))
add("clip_max_only", "Clip",
    {"x": _CX, "mn": None, "mx": np.float32(1.0)},
    np.minimum(_CX, 1.0), oracle_only=False)
_CI = rng.integers(-50, 50, (3, 4)).astype(np.int8)
add("clip_i8", "Clip",
    {"x": _CI, "mn": np.int8(-10), "mx": np.int8(10)},
    np.clip(_CI, -10, 10))
add("clip_f16", "Clip",
    {"x": _CX.astype(np.float16), "mn": np.float16(-0.5),
     "mx": np.float16(0.5)},
    np.clip(_CX.astype(np.float16), np.float16(-0.5), np.float16(0.5)))

# ---------------------------------------------------------------------------
# 6. variadic n-ary ops
# ---------------------------------------------------------------------------
_V1 = rng.standard_normal((2, 3)).astype(np.float32)
_V2 = rng.standard_normal((2, 3)).astype(np.float32)
_V3 = rng.standard_normal((3,)).astype(np.float32)
_V4 = rng.standard_normal((1, 3)).astype(np.float32)
_V5 = rng.standard_normal(()).astype(np.float32)
for op, fn in (("Sum", lambda *xs: np.sum(np.broadcast_arrays(
                    *[x + np.zeros((2, 3), np.float32) for x in xs]), axis=0)),
               ("Mean", None), ("Max", None), ("Min", None)):
    sets = [("3in", (_V1, _V2, _V3)), ("4in", (_V1, _V2, _V3, _V4)),
            ("5in", (_V1, _V2, _V3, _V4, _V5))]
    for nm, xs in sets:
        bx = [np.broadcast_to(x, (2, 3)).astype(np.float64) for x in xs]
        if op == "Sum":
            ref = np.sum(bx, axis=0)
        elif op == "Mean":
            ref = np.mean(bx, axis=0)
        elif op == "Max":
            ref = np.max(bx, axis=0)
        else:
            ref = np.min(bx, axis=0)
        add(f"nary_{op.lower()}_{nm}", op,
            {f"x{i}": x for i, x in enumerate(xs)},
            ref.astype(np.float32), rtol=2e-3)

# single-input forms
add("nary_sum_1in", "Sum", {"x0": _V1}, _V1)
add("nary_max_1in", "Max", {"x0": _V1}, _V1)

# logical ops broadcast
_BA = rng.integers(0, 2, (3, 4)).astype(bool)
_BB = rng.integers(0, 2, (4,)).astype(bool)
add("br_not_2d", "Not", {"x": _BA}, ~_BA)
add("br_and_bcast", "And", {"a": _BA, "b": _BB}, _BA & _BB)
add("br_or_bcast", "Or", {"a": _BA, "b": _BB}, _BA | _BB)
add("br_xor_bcast", "Xor", {"a": _BA, "b": _BB}, _BA ^ _BB)

# bitwise dtype spread
_WA = rng.integers(-100, 100, (3, 4)).astype(np.int16)
_WB = rng.integers(-100, 100, (3, 4)).astype(np.int16)
add("bitwise_and_i16", "BitwiseAnd", {"a": _WA, "b": _WB}, _WA & _WB)
add("bitwise_or_i16", "BitwiseOr", {"a": _WA, "b": _WB}, _WA | _WB)
add("bitwise_xor_i16", "BitwiseXor", {"a": _WA, "b": _WB}, _WA ^ _WB)
_WU = rng.integers(0, 2**32 - 1, (3, 4)).astype(np.uint32)
_WV = rng.integers(0, 2**32 - 1, (3, 4)).astype(np.uint32)
add("bitwise_and_u32", "BitwiseAnd", {"a": _WU, "b": _WV}, _WU & _WV)
add("bitwise_xor_u32", "BitwiseXor", {"a": _WU, "b": _WV}, _WU ^ _WV)

# ---------------------------------------------------------------------------
# 7. reduce dtype sweeps + noop_with_empty_axes
# ---------------------------------------------------------------------------
_RI32 = rng.integers(-50, 50, (2, 3, 4)).astype(np.int32)
_RI64 = rng.integers(-50, 50, (2, 3, 4)).astype(np.int64)
_RI8 = rng.integers(-10, 10, (2, 3, 4)).astype(np.int8)
_RU8 = rng.integers(0, 20, (2, 3, 4)).astype(np.uint8)
for dn, x in (("i32", _RI32), ("i64", _RI64), ("u8", _RU8)):
    wide = x.astype(np.int64)
    add(f"red_sum_{dn}", "ReduceSum",
        {"x": x, "axes": np.asarray([1], np.int64)},
        wide.sum(axis=1, keepdims=True).astype(x.dtype))
    add(f"red_max_{dn}", "ReduceMax",
        {"x": x, "axes": np.asarray([2], np.int64)},
        x.max(axis=2, keepdims=True))
    add(f"red_min_{dn}", "ReduceMin",
        {"x": x, "axes": np.asarray([0], np.int64)},
        x.min(axis=0, keepdims=True))
    add(f"red_prod_{dn}", "ReduceProd",
        {"x": x, "axes": np.asarray([1], np.int64)},
        wide.prod(axis=1, keepdims=True).astype(x.dtype))
add("red_max_i8", "ReduceMax", {"x": _RI8, "axes": np.asarray([1], np.int64)},
    _RI8.max(axis=1, keepdims=True))
# f16/bf16 mean with f32 accumulation contract
for dn, dt, tol in (("f16", np.float16, 2e-3), ("bf16", ml_dtypes.bfloat16, 2e-2)):
    xv = rng.standard_normal((2, 3, 4)).astype(dt)
    ref = xv.astype(np.float32).mean(axis=2, keepdims=True).astype(dt)
    add(f"red_mean_{dn}", "ReduceMean",
        {"x": xv, "axes": np.asarray([2], np.int64)}, ref,
        rtol=tol, atol=2e-2 if dn == "bf16" else 2e-3)
# noop_with_empty_axes=1: empty axes input -> identity
_RF = rng.standard_normal((2, 3)).astype(np.float32)
for op in ("ReduceSum", "ReduceMax", "ReduceMean"):
    add(f"red_noop_{op.lower()}", op,
        {"x": _RF, "axes": np.zeros((0,), np.int64)}, _RF,
        attrs={"noop_with_empty_axes": 1})

# ---------------------------------------------------------------------------
# 8. conv / convtranspose extras (torch referees)
# ---------------------------------------------------------------------------
_CX2 = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
_CW_G2 = rng.standard_normal((6, 2, 3, 3)).astype(np.float32)
add("conv_group2", "Conv", {"x": _CX2, "w": _CW_G2},
    torch.nn.functional.conv2d(t(_CX2), t(_CW_G2), groups=2,
                               padding=1).numpy(),
    attrs={"group": 2, "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]},
    rtol=2e-3, atol=1e-4)
_CW_DW = rng.standard_normal((4, 1, 3, 3)).astype(np.float32)
add("conv_depthwise", "Conv", {"x": _CX2, "w": _CW_DW},
    torch.nn.functional.conv2d(t(_CX2), t(_CW_DW), groups=4).numpy(),
    attrs={"group": 4, "kernel_shape": [3, 3]}, rtol=2e-3, atol=1e-4)
_CX1 = rng.standard_normal((2, 3, 16)).astype(np.float32)
_CW1 = rng.standard_normal((5, 3, 3)).astype(np.float32)
add("conv1d_dilated", "Conv", {"x": _CX1, "w": _CW1},
    torch.nn.functional.conv1d(t(_CX1), t(_CW1), dilation=2).numpy(),
    attrs={"dilations": [2], "kernel_shape": [3]}, rtol=2e-3, atol=1e-4)
_CX3 = rng.standard_normal((1, 2, 5, 6, 5)).astype(np.float32)
_CW3 = rng.standard_normal((3, 2, 2, 2, 2)).astype(np.float32)
add("conv3d_s2", "Conv", {"x": _CX3, "w": _CW3},
    torch.nn.functional.conv3d(t(_CX3), t(_CW3), stride=2).numpy(),
    attrs={"strides": [2, 2, 2], "kernel_shape": [2, 2, 2]},
    rtol=2e-3, atol=1e-4)
_CB = rng.standard_normal((5,)).astype(np.float32)
add("conv1d_bias_pad", "Conv", {"x": _CX1, "w": _CW1, "b": _CB},
    torch.nn.functional.conv1d(t(_CX1), t(_CW1), t(_CB), padding=2).numpy(),
    attrs={"pads": [2, 2], "kernel_shape": [3]}, rtol=2e-3, atol=1e-4)
# ConvTranspose
_TX = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
_TW = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)
add("convt_s2_outpad", "ConvTranspose", {"x": _TX, "w": _TW},
    torch.nn.functional.conv_transpose2d(t(_TX), t(_TW), stride=2,
                                         output_padding=1).numpy(),
    attrs={"strides": [2, 2], "output_padding": [1, 1],
           "kernel_shape": [3, 3]}, rtol=2e-3, atol=1e-4)
add("convt_pads", "ConvTranspose", {"x": _TX, "w": _TW},
    torch.nn.functional.conv_transpose2d(t(_TX), t(_TW), padding=1).numpy(),
    attrs={"pads": [1, 1, 1, 1], "kernel_shape": [3, 3]},
    rtol=2e-3, atol=1e-4)
_TWG = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)
_TXG = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
add("convt_group2", "ConvTranspose", {"x": _TXG, "w": _TWG},
    torch.nn.functional.conv_transpose2d(t(_TXG), t(_TWG), groups=2).numpy(),
    attrs={"group": 2, "kernel_shape": [3, 3]}, rtol=2e-3, atol=1e-4)
_TX1 = rng.standard_normal((2, 3, 7)).astype(np.float32)
_TW1 = rng.standard_normal((3, 2, 4)).astype(np.float32)
add("convt_1d", "ConvTranspose", {"x": _TX1, "w": _TW1},
    torch.nn.functional.conv_transpose1d(t(_TX1), t(_TW1), stride=3).numpy(),
    attrs={"strides": [3], "kernel_shape": [4]}, rtol=2e-3, atol=1e-4)

# global pools 1d/3d
add("gap_1d", "GlobalAveragePool", {"x": _CX1},
    _CX1.mean(axis=2, keepdims=True), rtol=2e-3)
add("gap_3d", "GlobalAveragePool", {"x": _CX3},
    _CX3.mean(axis=(2, 3, 4), keepdims=True), rtol=2e-3)
add("gmp_1d", "GlobalMaxPool", {"x": _CX1},
    _CX1.max(axis=2, keepdims=True))
add("gmp_3d", "GlobalMaxPool", {"x": _CX3},
    _CX3.max(axis=(2, 3, 4), keepdims=True))

# LpPool p variants — ONNX pools sum(|x|^p)^(1/p) (torch lp_pool omits
# the abs, so for odd p the referee is a hand-written numpy formula)
_LPP = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
for p in (1, 3):
    blocks = np.abs(_LPP.reshape(1, 2, 3, 2, 3, 2)) ** p
    ref = (blocks.sum(axis=(3, 5)) ** (1.0 / p)).astype(np.float32)
    add(f"lppool_p{p}", "LpPool", {"x": _LPP}, ref,
        attrs={"p": p, "kernel_shape": [2, 2], "strides": [2, 2]},
        rtol=2e-3, atol=1e-4)

# ---------------------------------------------------------------------------
# 9. pad modes
# ---------------------------------------------------------------------------
_PX = rng.standard_normal((2, 3, 4)).astype(np.float32)
for mode, npmode in (("reflect", "reflect"), ("edge", "edge"),
                     ("wrap", "wrap")):
    pads = np.asarray([0, 1, 1, 0, 2, 1], np.int64)
    ref = np.pad(_PX, [(0, 0), (1, 2), (1, 1)], mode=npmode)
    add(f"br_pad_{mode}", "Pad", {"x": _PX, "pads": pads}, ref,
        attrs={"mode": mode})
add("pad_axes_input", "Pad",
    {"x": _PX, "pads": np.asarray([1, 2], np.int64),
     "cval": np.float32(0.5), "axes": np.asarray([2], np.int64)},
    np.pad(_PX, [(0, 0), (0, 0), (1, 2)], constant_values=0.5))
add("pad_i32", "Pad",
    {"x": _RI32[:, :, 0], "pads": np.asarray([1, 0, 0, 1], np.int64)},
    np.pad(_RI32[:, :, 0], [(1, 0), (0, 1)]))
add("pad_bool", "Pad",
    {"x": _BA, "pads": np.asarray([0, 1, 0, 1], np.int64)},
    np.pad(_BA, [(0, 0), (1, 1)]))

# ---------------------------------------------------------------------------
# 10. gather / scatter extras
# ---------------------------------------------------------------------------
_GX = rng.standard_normal((3, 4, 5)).astype(np.float32)
add("gather_neg_indices", "Gather",
    {"x": _GX, "i": np.asarray([[-1, 0], [1, -2]], np.int64)},
    _GX[np.asarray([[-1, 0], [1, -2]])], attrs={"axis": 0})
add("gatherelements_negax", "GatherElements",
    {"x": _GX[:, :, 0], "i": np.asarray([[0, 1, 2, 3], [3, 2, 1, 0],
                                         [1, 1, 2, 2]], np.int64)},
    np.take_along_axis(_GX[:, :, 0],
                       np.asarray([[0, 1, 2, 3], [3, 2, 1, 0],
                                   [1, 1, 2, 2]]), axis=-1),
    attrs={"axis": -1})
# GatherND batch_dims
_GND = rng.standard_normal((2, 3, 4)).astype(np.float32)
_GNDI = np.asarray([[[1], [0], [2]], [[2], [2], [1]]], np.int64)
ref = np.stack([np.stack([_GND[b, _GNDI[b, i, 0]] for i in range(3)])
                for b in range(2)])
add("gathernd_batch1", "GatherND", {"x": _GND, "i": _GNDI}, ref,
    attrs={"batch_dims": 1})
_GNDI0 = np.asarray([[0, 1], [1, 2]], np.int64)
add("gathernd_rank2", "GatherND", {"x": _GND, "i": _GNDI0},
    np.stack([_GND[0, 1], _GND[1, 2]]))
# ScatterND min/max reductions
_SNX = rng.standard_normal((5, 3)).astype(np.float32)
_SNI = np.asarray([[0], [2], [0]], np.int64)
_SNU = rng.standard_normal((3, 3)).astype(np.float32)
for red, fn in (("min", np.minimum), ("max", np.maximum)):
    ref = _SNX.copy()
    for k in range(3):
        ref[_SNI[k, 0]] = fn(ref[_SNI[k, 0]], _SNU[k])
    add(f"scatternd_{red}", "ScatterND",
        {"x": _SNX, "i": _SNI, "u": _SNU}, ref, attrs={"reduction": red})
# Scatter (deprecated alias of ScatterElements) axis 1
_SCX = np.zeros((3, 4), np.float32)
_SCI = np.asarray([[1, 3], [0, 2], [2, 0]], np.int64)
_SCU = rng.standard_normal((3, 2)).astype(np.float32)
_ref = _SCX.copy()
for r in range(3):
    for c in range(2):
        _ref[r, _SCI[r, c]] = _SCU[r, c]
add("scatter_axis1", "Scatter", {"x": _SCX, "i": _SCI, "u": _SCU}, _ref,
    attrs={"axis": 1}, opset=10)

# ---------------------------------------------------------------------------
# 11. quantize per-channel / more dtypes
# ---------------------------------------------------------------------------
_QX = (rng.standard_normal((4, 6)) * 4).astype(np.float32)
_QS = np.asarray([0.1, 0.2, 0.05, 0.3], np.float32)
_QZ = np.asarray([1, -2, 0, 3], np.int8)
ref = np.clip(np.round(_QX / _QS[:, None]) + _QZ[:, None],
              -128, 127).astype(np.int8)
add("quantize_perchan_ax0", "QuantizeLinear",
    {"x": _QX, "s": _QS, "z": _QZ}, ref, attrs={"axis": 0})
_DQ = rng.integers(-120, 120, (4, 6)).astype(np.int8)
add("dequantize_perchan_ax0", "DequantizeLinear",
    {"x": _DQ, "s": _QS, "z": _QZ},
    ((_DQ.astype(np.float32) - _QZ[:, None]) * _QS[:, None]),
    attrs={"axis": 0})
_QU16 = rng.integers(0, 60000, (3, 4)).astype(np.uint16)
add("dequantize_u16", "DequantizeLinear",
    {"x": _QU16, "s": np.float32(0.25), "z": np.uint16(32768)},
    (_QU16.astype(np.float32) - 32768) * 0.25)

# ---------------------------------------------------------------------------
# 12. shape-op attribute forms
# ---------------------------------------------------------------------------
_SHX = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
add("shape_start1", "Shape", {"x": _SHX},
    np.asarray([3, 4, 5], np.int64), attrs={"start": 1})
add("shape_end2", "Shape", {"x": _SHX},
    np.asarray([2, 3], np.int64), attrs={"end": 2})
add("shape_start_neg", "Shape", {"x": _SHX},
    np.asarray([4, 5], np.int64), attrs={"start": -2})
add("size_4d", "Size", {"x": _SHX}, np.asarray(120, np.int64))
add("size_scalar", "Size", {"x": np.float32(3.0)}, np.asarray(1, np.int64))

for ax in (0, 2, -1):
    add(f"br_flatten_ax{ax}", "Flatten", {"x": _SHX},
        _SHX.reshape(int(np.prod(_SHX.shape[:ax if ax >= 0 else 3])), -1),
        attrs={"axis": ax})
add("flatten_default", "Flatten", {"x": _SHX}, _SHX.reshape(2, -1))

add("transpose_default_rev", "Transpose", {"x": _SHX},
    _SHX.transpose(3, 2, 1, 0))
add("transpose_4d_perm", "Transpose", {"x": _SHX},
    _SHX.transpose(0, 2, 3, 1), attrs={"perm": [0, 2, 3, 1]})

add("reshape_zero_copy", "Reshape",
    {"x": _SHX, "s": np.asarray([0, 0, 20], np.int64)},
    _SHX.reshape(2, 3, 20))
add("reshape_minus1_mid", "Reshape",
    {"x": _SHX, "s": np.asarray([2, -1, 5], np.int64)},
    _SHX.reshape(2, 12, 5))
add("br_reshape_allowzero", "Reshape",
    {"x": np.zeros((0, 4), np.float32), "s": np.asarray([0, 4], np.int64)},
    np.zeros((0, 4), np.float32), attrs={"allowzero": 1})

# Squeeze/Unsqueeze negative axes (input form)
_SQX = rng.standard_normal((1, 3, 1, 4)).astype(np.float32)
add("squeeze_negax", "Squeeze",
    {"x": _SQX, "axes": np.asarray([-2], np.int64)}, _SQX.squeeze(2))
add("unsqueeze_negax", "Unsqueeze",
    {"x": _SQX.squeeze(), "axes": np.asarray([-1, 0], np.int64)},
    _SQX.squeeze()[None, ..., None])
add("unsqueeze_multi_sorted", "Unsqueeze",
    {"x": rng.standard_normal((3,)).astype(np.float32),
     "axes": np.asarray([0, 2], np.int64)}, None)
CASES[-1].expected = [CASES[-1].inputs["x"][None, :, None]]

# Split: num_outputs attr, uneven
_SPX = rng.standard_normal((7, 4)).astype(np.float32)
add("split_num_outputs_uneven", "Split", {"x": _SPX},
    [_SPX[:3], _SPX[3:6], _SPX[6:]], attrs={"num_outputs": 3})
add("split_sizes_negax", "Split",
    {"x": _SPX, "sizes": np.asarray([1, 3], np.int64)},
    [_SPX[:, :1], _SPX[:, 1:]], attrs={"axis": -1})

# Concat: negative axis, many inputs
add("concat_negax_3in", "Concat",
    {"a": _V1, "b": _V2, "c": _V4},
    np.concatenate([_V1, _V2, _V4], axis=-1) if False else
    np.concatenate([_V1, _V2, np.broadcast_to(_V4, (1, 3))], axis=0),
    attrs={"axis": 0})
CASES[-1].inputs = {"a": _V1, "b": _V2, "c": _V4}
CASES[-1].expected = [np.concatenate([_V1, _V2, _V4], axis=0)]
add("concat_1d_4in", "Concat",
    {"a": np.asarray([1.0], np.float32), "b": np.asarray([2.0], np.float32),
     "c": np.asarray([3.0], np.float32), "d": np.asarray([4.0], np.float32)},
    np.asarray([1, 2, 3, 4], np.float32), attrs={"axis": 0})

# Slice: negative steps both axes, out-of-range clamping, i32 starts
_SLX = rng.standard_normal((5, 6)).astype(np.float32)
add("slice_negstep_both", "Slice",
    {"x": _SLX, "starts": np.asarray([4, 5], np.int64),
     "ends": np.asarray([-6, -7], np.int64),
     "axes": np.asarray([0, 1], np.int64),
     "steps": np.asarray([-2, -1], np.int64)},
    _SLX[4::-2, 5::-1])
add("br_slice_clamp_oob", "Slice",
    {"x": _SLX, "starts": np.asarray([-100], np.int64),
     "ends": np.asarray([100], np.int64)},
    _SLX)
add("slice_i32_starts", "Slice",
    {"x": _SLX, "starts": np.asarray([1], np.int32),
     "ends": np.asarray([4], np.int32)},
    _SLX[1:4])

# Expand with 1 -> n and equal-shape no-op
add("expand_noop", "Expand",
    {"x": _V1, "s": np.asarray([2, 3], np.int64)}, _V1)
add("expand_scalar", "Expand",
    {"x": np.float32(2.5), "s": np.asarray([2, 2], np.int64)},
    np.full((2, 2), 2.5, np.float32))

# Tile with zero-rep? (keep positive reps; zero-size output is legal)
add("br_tile_3d", "Tile",
    {"x": _V1[None], "reps": np.asarray([2, 1, 3], np.int64)},
    np.tile(_V1[None], (2, 1, 3)))

# ---------------------------------------------------------------------------
# 13. misc: ConstantOfShape dtypes, CastLike, Where, EyeLike, OneHot,
#           Identity, IsInf, NonZero, Trilu k-input, TopK axes
# ---------------------------------------------------------------------------
for dn, val in (("f16", np.float16(2.5)), ("i8", np.int8(-3)),
                ("u8", np.uint8(7)), ("bool", np.bool_(True)),
                ("i64", np.int64(-9))):
    add(f"constantofshape_{dn}", "ConstantOfShape",
        {"s": np.asarray([2, 2], np.int64)},
        np.full((2, 2), val),
        attrs={"value": np.asarray([val])})
add("constantofshape_default", "ConstantOfShape",
    {"s": np.asarray([3], np.int64)}, np.zeros((3,), np.float32))
add("constantofshape_empty", "ConstantOfShape",
    {"s": np.asarray([0], np.int64)}, np.zeros((0,), np.float32))

for an, bn, a, b in (
    ("f32", "f16", _V1, np.float16(0)),
    ("i32", "f32", _RI32[:, :, 0], np.float32(0)),
    ("f64", "bf16", _X64, ml_dtypes.bfloat16(0)),
    ("i8", "i32", _CI, np.int32(0)),
):
    add(f"castlike_{an}_to_{bn}", "CastLike",
        {"x": a, "target": np.asarray(b)}, a.astype(np.asarray(b).dtype),
        rtol=2e-2, atol=2e-2)

_WC = rng.integers(0, 2, (3, 4)).astype(bool)
add("br_where_f16", "Where",
    {"c": _WC, "a": _V1.astype(np.float16)[:, :3].T.copy().astype(np.float16),
     "b": np.float16(0)}, None)
CASES[-1].inputs = {"c": _WC,
                    "a": rng.standard_normal((3, 4)).astype(np.float16),
                    "b": np.float16(0)}
CASES[-1].expected = [np.where(_WC, CASES[-1].inputs["a"], np.float16(0))]
_WI = rng.integers(-5, 5, (3, 4)).astype(np.int64)
add("where_i64_bcast", "Where",
    {"c": _WC, "a": _WI, "b": np.asarray([0, 1, 2, 3], np.int64)},
    np.where(_WC, _WI, np.asarray([0, 1, 2, 3], np.int64)))
add("where_scalar_cond", "Where",
    {"c": np.bool_(True), "a": _V1, "b": _V2}, _V1)

add("eyelike_dtype_override", "EyeLike",
    {"x": np.zeros((3, 4), np.float32)},
    np.eye(3, 4, dtype=np.int32), attrs={"dtype": 6})  # 6 = INT32
add("eyelike_kneg", "EyeLike", {"x": np.zeros((4, 4), np.float32)},
    np.eye(4, 4, k=-1, dtype=np.float32), attrs={"k": -1})

add("onehot_axis1", "OneHot",
    {"i": np.asarray([[0, 2], [1, 1]], np.int64),
     "depth": np.asarray(3, np.int64),
     "vals": np.asarray([0.0, 1.0], np.float32)},
    np.transpose(np.eye(3, dtype=np.float32)[
        np.asarray([[0, 2], [1, 1]])], (0, 2, 1)),
    attrs={"axis": 1})

add("identity_bool", "Identity", {"x": _BA}, _BA)
add("identity_i8", "Identity", {"x": _CI}, _CI)

_SPEC = np.asarray([1.0, -np.inf, np.inf, np.nan, 0.0], np.float32)
add("br_isinf_pos_only", "IsInf", {"x": _SPEC},
    np.asarray([False, False, True, False, False]),
    attrs={"detect_negative": 0})
add("isnan_bf16", "IsNaN", {"x": _SPEC.astype(ml_dtypes.bfloat16)},
    np.isnan(_SPEC))

add("nonzero_bool", "NonZero", {"x": _BA},
    np.stack(np.nonzero(_BA)).astype(np.int64), oracle_only=False)
add("nonzero_1d", "NonZero", {"x": np.asarray([0, 3, 0, 5], np.float32)},
    np.stack(np.nonzero(np.asarray([0, 3, 0, 5], np.float32))
             ).astype(np.int64), oracle_only=False)

_TRX = rng.standard_normal((2, 4, 4)).astype(np.float32)
add("trilu_k_input", "Trilu",
    {"x": _TRX, "k": np.asarray(1, np.int64)},
    np.stack([np.triu(_TRX[i], 1) for i in range(2)]))

_TKX = rng.standard_normal((4, 6)).astype(np.float32)
tv, ti = torch.topk(t(_TKX), 2, dim=0)
add("topk_axis0", "TopK", {"x": _TKX, "k": np.asarray([2], np.int64)},
    [tv.numpy(), ti.numpy().astype(np.int64)], attrs={"axis": 0})
_TKI = rng.permutation(24).reshape(4, 6).astype(np.int64)
tvi, tii = torch.topk(t(_TKI), 3)
add("topk_i64", "TopK", {"x": _TKI, "k": np.asarray([3], np.int64)},
    [tvi.numpy(), tii.numpy().astype(np.int64)])
tvs, tis = torch.topk(t(_TKX), 2, largest=False)
add("topk_smallest_sorted", "TopK",
    {"x": _TKX, "k": np.asarray([2], np.int64)},
    [tvs.numpy(), tis.numpy().astype(np.int64)],
    attrs={"largest": 0, "sorted": 1})

# Hardmax axes
_HMX = rng.standard_normal((3, 4, 5)).astype(np.float32)


def _hardmax(x, axis):
    am = np.argmax(x, axis=axis)
    out = np.zeros_like(x)
    np.put_along_axis(out, np.expand_dims(am, axis), 1.0, axis)
    return out


for ax in (0, 1, -1):
    add(f"br_hardmax_ax{ax}", "Hardmax", {"x": _HMX}, _hardmax(_HMX, ax),
        attrs={"axis": ax})

# Dropout inference forms
add("dropout_notraining_mask", "Dropout",
    {"x": _V1, "ratio": np.float32(0.5),
     "training": np.asarray(False)},
    [_V1, np.ones_like(_V1, dtype=bool)])
add("dropout_default_f64", "Dropout", {"x": _X64}, _X64)

# Softmax f16/bf16 numerics
for dn, dt, tol in (("f16", np.float16, 2e-3), ("bf16", ml_dtypes.bfloat16, 2e-2)):
    xv = (rng.standard_normal((2, 8)) * 4).astype(dt)
    e = np.exp(xv.astype(np.float32)
               - xv.astype(np.float32).max(-1, keepdims=True))
    add(f"softmax_{dn}", "Softmax", {"x": xv},
        (e / e.sum(-1, keepdims=True)).astype(dt), rtol=tol, atol=2e-2)

# CumSum i32 / f64
_CSX = rng.integers(-5, 5, (3, 4)).astype(np.int32)
add("cumsum_i32", "CumSum", {"x": _CSX, "axis": np.asarray(1, np.int32)},
    np.cumsum(_CSX, axis=1, dtype=np.int32))
add("cumsum_f64_rev", "CumSum",
    {"x": _X64, "axis": np.asarray(0, np.int64)},
    np.flip(np.cumsum(np.flip(_X64, 0), axis=0), 0),
    attrs={"reverse": 1}, rtol=1e-10)

# Range f64 / fractional step
add("range_f64_frac", "Range",
    {"start": np.float64(0.5), "limit": np.float64(3.1),
     "delta": np.float64(0.7)},
    np.arange(0.5, 3.1, 0.7, dtype=np.float64), rtol=1e-10)

# ArgMax/ArgMin select_last_index with ties
_TIE = np.asarray([[1, 3, 3, 2], [5, 5, 0, 5]], np.float32)
add("argmax_last_tie", "ArgMax", {"x": _TIE},
    np.asarray([[2], [3]], np.int64),
    attrs={"axis": 1, "select_last_index": 1})
add("argmin_last_tie", "ArgMin", {"x": -_TIE},
    np.asarray([[2], [3]], np.int64),
    attrs={"axis": 1, "select_last_index": 1})

# ---------------------------------------------------------------------------
# 14. Constant node attribute forms (output-only node)
# ---------------------------------------------------------------------------
_CONST_T = rng.standard_normal((2, 3)).astype(np.float32)
add("constant_value_tensor", "Constant", {}, _CONST_T,
    attrs={"value": _CONST_T})
add("constant_value_tensor_i64", "Constant", {},
    np.asarray([[1, -2], [3, 4]], np.int64),
    attrs={"value": np.asarray([[1, -2], [3, 4]], np.int64)})
add("constant_value_float", "Constant", {}, np.asarray(2.5, np.float32),
    attrs={"value_float": 2.5})
add("constant_value_int", "Constant", {}, np.asarray(-7, np.int64),
    attrs={"value_int": -7})
add("constant_value_ints", "Constant", {},
    np.asarray([1, 2, 3], np.int64), attrs={"value_ints": [1, 2, 3]})
add("constant_value_floats", "Constant", {},
    np.asarray([0.5, 1.5], np.float32), attrs={"value_floats": [0.5, 1.5]})

# Softmax1 (custom wt domain): softmax with +1 in the denominator
_SM1 = rng.standard_normal((2, 5)).astype(np.float32)
_e1 = np.exp(_SM1 - _SM1.max(-1, keepdims=True))
_sm1_ref = _e1 / (_e1.sum(-1, keepdims=True)
                  + np.exp(-_SM1.max(-1, keepdims=True)))
add("softmax1_2d", "Softmax1", {"x": _SM1}, _sm1_ref.astype(np.float32),
    domain="wt", rtol=2e-3, atol=1e-5)
