"""Misc official-name conformance cases: Clip, Trilu, Max/Min dtype
sweeps, Mod, Pow type combos, Flatten, Reshape, Gelu, Dropout,
RotaryEmbedding, Shape windows, CumSum, Gemm, Hardmax, Softmax /
LogSoftmax axes, Concat, Split, TfIdfVectorizer — 1:1 with the
reference's enumerated list (tests/onnx_testing.rs).

Oracles: numpy float64 formulas (torch for gelu_tanh)."""

from __future__ import annotations

import numpy as np
import torch

from .harness import Case

CASES = []
_rng = np.random.default_rng(11)


def add(name, op, inputs, expected, init=(), oracle_only=False,
        opset=23, **attrs):
    CASES.append(Case(name, op, inputs, expected, attrs=attrs,
                      initializer_names=init, oracle_only=oracle_only,
                      opset=opset, atol=1e-5))


def clone(name, twins=("_expanded",)):
    src = next(c for c in CASES if c.name == name)
    for t in twins:
        CASES.append(Case(src.name + t, src.op_type, src.inputs,
                          src.expected, attrs=src.attrs,
                          initializer_names=src.initializer_names,
                          oracle_only=src.oracle_only, opset=src.opset,
                          atol=src.atol))


# --- Clip --------------------------------------------------------------------

_CX = _rng.standard_normal(16).astype(np.float32) * 3


def _clip(name, x, lo=None, hi=None, dtype=np.float32):
    x = np.asarray(x, dtype)
    inputs = {"x": x}
    inputs["min"] = None if lo is None else np.asarray(lo, dtype)
    if hi is not None:
        inputs["max"] = np.asarray(hi, dtype)
    y = x.copy()
    if lo is not None:
        y = np.maximum(y, dtype(lo))
    if hi is not None:
        y = np.minimum(y, dtype(hi))
    add(name, "Clip", inputs, [y])
    clone(name)


_clip("clip", _CX, -1.0, 1.0)
_clip("clip_example", np.array([-2, 0, 2], np.float32), -1.0, 1.0)
_clip("clip_inbounds", np.array([-1, 0, 1], np.float32), -2.0, 2.0)
_clip("clip_outbounds", np.array([-6, 0, 6], np.float32), -5.0, 5.0)
_clip("clip_splitbounds", np.array([-1, 0, 6], np.float32), -5.0, 5.0)
_clip("clip_default_min", _CX, lo=0.0)
_clip("clip_default_max", _CX, hi=0.0)
_clip("clip_default_inbounds", np.array([-1, 0, 1], np.float32))
_clip("clip_default_int8_min", (_CX * 2).astype(np.int8), lo=0,
      dtype=np.int8)
_clip("clip_default_int8_max", (_CX * 2).astype(np.int8), hi=0,
      dtype=np.int8)
_clip("clip_default_int8_inbounds", np.array([-1, 0, 1], np.int8),
      dtype=np.int8)
# min > max: ONNX clamps to max (min applied first, then max)
add("clip_min_greater_than_max", "Clip",
    {"x": _CX, "min": np.float32(1.0), "max": np.float32(-1.0)},
    [np.minimum(np.maximum(_CX, 1.0), -1.0)])
clone("clip_min_greater_than_max")

# --- Trilu -------------------------------------------------------------------


def _trilu(name, x, upper, k=None):
    inputs = {"x": x}
    if k is not None:
        inputs["k"] = np.asarray(k, np.int64)
    y = (np.triu(x, k or 0) if upper else np.tril(x, k or 0))
    add(name, "Trilu", inputs, [y], init=("k",) if k is not None else (),
        upper=int(upper))


_TX = _rng.integers(0, 10, (4, 5)).astype(np.int64)
_TSQ = _rng.integers(0, 10, (2, 3, 3)).astype(np.int64)
_T1R = _rng.integers(0, 10, (3, 1, 5)).astype(np.int64)
_trilu("tril", _TX, False)
_trilu("tril_neg", _TX, False, -1)
_trilu("tril_pos", _TX, False, 2)
_trilu("tril_out_neg", _TX, False, -7)
_trilu("tril_out_pos", _TX, False, 6)
_trilu("tril_square", _TSQ, False)
_trilu("tril_square_neg", _TSQ, False, -1)
_trilu("tril_one_row_neg", _T1R, False, -1)
_trilu("tril_zero", np.zeros((3, 0), np.int64), False, 6)
_trilu("triu", _TX, True)
_trilu("triu_neg", _TX, True, -1)
_trilu("triu_pos", _TX, True, 2)
_trilu("triu_out_neg_out", _TX, True, -7)
_trilu("triu_out_pos", _TX, True, 6)
_trilu("triu_square", _TSQ, True)
_trilu("triu_square_neg", _TSQ, True, -1)
_trilu("triu_one_row", _T1R, True)
_trilu("triu_zero", np.zeros((0, 5), np.int64), True, 6)

# --- Max / Min variadic + dtype sweep ---------------------------------------

for op, fn in (("Max", np.maximum), ("Min", np.minimum)):
    low = op.lower()
    a = np.array([3, 2, 1], np.float32)
    b = np.array([1, 4, 4], np.float32)
    c = np.array([2, 5, 0], np.float32)
    add(f"{low}_example", op, {"a": a, "b": b, "c": c},
        [fn(fn(a, b), c)])
    add(f"{low}_one_input", op, {"a": a}, [a])
    add(f"{low}_two_inputs", op, {"a": a, "b": b}, [fn(a, b)])
    for ty in (np.float16, np.float32, np.float64, np.int8, np.int16,
               np.int32, np.int64, np.uint8, np.uint16, np.uint32,
               np.uint64):
        nm = np.dtype(ty).name
        av = np.array([3, 2, 1], ty)
        bv = np.array([1, 4, 4], ty)
        add(f"{low}_{nm}", op, {"a": av, "b": bv}, [fn(av, bv)])

# --- Mod ---------------------------------------------------------------------


def _mod(name, a, b, fmod=0):
    y = np.fmod(a, b) if fmod else np.mod(a, b)
    attrs = {"fmod": 1} if fmod else {}
    add(name, "Mod", {"a": a, "b": b}, [y], **attrs)


_mod("mod_broadcast", np.arange(-4, 8, dtype=np.int32).reshape(3, 4),
     np.array([3], np.int32))
_mod("mod_int64_fmod", np.array([-4, 7, 5, 4, -7, 8], np.int64),
     np.array([2, -3, 8, -2, 3, 5], np.int64), fmod=1)
for ty in (np.float16, np.float32, np.float64):
    _mod(f"mod_mixed_sign_{np.dtype(ty).name}",
         np.array([-4.3, 7.2, 5.0, 4.3, -7.2, 8.0], ty),
         np.array([2.1, -3.4, 8.0, -2.1, 3.4, 5.0], ty), fmod=1)
for ty in (np.uint8, np.uint16, np.uint32, np.uint64):
    _mod(f"mod_{np.dtype(ty).name}", np.array([4, 7, 5], ty),
         np.array([2, 3, 8], ty))
_mod("mod_mixed_sign_int8", np.array([-4, 7, 5, 4, -7, 8], np.int8),
     np.array([2, -3, 8, -2, 3, 5], np.int8))
_mod("mod_mixed_sign_int16", np.array([-4, 7, 5, 4, -7, 8], np.int16),
     np.array([2, -3, 8, -2, 3, 5], np.int16))
_mod("mod_mixed_sign_int32", np.array([-4, 7, 5, 4, -7, 8], np.int32),
     np.array([2, -3, 8, -2, 3, 5], np.int32))
_mod("mod_mixed_sign_int64", np.array([-4, 7, 5, 4, -7, 8], np.int64),
     np.array([2, -3, 8, -2, 3, 5], np.int64))

# --- Pow type combos ----------------------------------------------------------


def _pow(name, a, b):
    y = np.power(a.astype(np.float64), b.astype(np.float64))
    add(name, "Pow", {"a": a, "b": b}, [y.astype(a.dtype)])


_pow("pow_bcast_scalar", np.array([1, 2, 3], np.float32),
     np.float32(2.0))
_pow("pow_bcast_array", np.array([[1, 2, 3], [4, 5, 6]], np.float32),
     np.array([1.0, 2.0, 3.0], np.float32))
_pow("pow_types_float32_int32", np.array([1, 2, 3], np.float32),
     np.array([4, 5, 6], np.int32))
_pow("pow_types_float32_int64", np.array([1, 2, 3], np.float32),
     np.array([4, 5, 6], np.int64))
_pow("pow_types_float32_uint32", np.array([1, 2, 3], np.float32),
     np.array([4, 5, 6], np.uint32))
_pow("pow_types_float32_uint64", np.array([1, 2, 3], np.float32),
     np.array([4, 5, 6], np.uint64))
_pow("pow_types_int32_float32", np.array([1, 2, 3], np.int32),
     np.array([4.0, 5.0, 6.0], np.float32))
_pow("pow_types_int32_int32", np.array([1, 2, 3], np.int32),
     np.array([4, 5, 6], np.int32))
_pow("pow_types_int64_float32", np.array([1, 2, 3], np.int64),
     np.array([4.0, 5.0, 6.0], np.float32))
_pow("pow_types_int64_int64", np.array([1, 2, 3], np.int64),
     np.array([4, 5, 6], np.int64))

# --- Flatten / Reshape ---------------------------------------------------------

_FLX = _rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
for ax in (0, 1, 2, 3):
    add(f"flatten_axis{ax}", "Flatten", {"x": _FLX},
        [_FLX.reshape(int(np.prod(_FLX.shape[:ax])), -1)], axis=ax)
for ax in (1, 2, 3, 4):
    add(f"flatten_negative_axis{ax}", "Flatten", {"x": _FLX},
        [_FLX.reshape(int(np.prod(_FLX.shape[:-ax])), -1)], axis=-ax)
add("flatten_default_axis", "Flatten", {"x": _FLX},
    [_FLX.reshape(2, -1)])

_RSX = _rng.standard_normal((2, 3, 4)).astype(np.float32)
for nm, shp in (("reshape_reordered_all_dims", [4, 2, 3]),
                ("reshape_reordered_last_dims", [2, 4, 3]),
                ("reshape_reduced_dims", [2, 12]),
                ("reshape_extended_dims", [2, 3, 2, 2]),
                ("reshape_one_dim", [24]),
                ("reshape_negative_dim", [2, -1, 2]),
                ("reshape_negative_extended_dims", [-1, 2, 3, 4]),
                ("reshape_zero_dim", [2, 0, 4, 1]),
                ("reshape_zero_and_negative_dim", [2, 0, 1, -1])):
    spec = np.asarray(shp, np.int64)
    tgt = [int(_RSX.shape[i]) if s == 0 else int(s)
           for i, s in enumerate(shp)]
    add(nm, "Reshape", {"x": _RSX, "shape": spec},
        [_RSX.reshape(tgt)], init=("shape",))

# --- Gelu ---------------------------------------------------------------------

_G1 = np.array([-1.0, 0.0, 1.0], np.float32)
_G2 = _rng.standard_normal((3, 4, 5)).astype(np.float32)
for nm, data, approx in (("gelu_default_1", _G1, None),
                         ("gelu_default_2", _G2, None),
                         ("gelu_tanh_1", _G1, "tanh"),
                         ("gelu_tanh_2", _G2, "tanh")):
    ref = torch.nn.functional.gelu(
        torch.tensor(data), approximate=approx or "none").numpy()
    attrs = {"approximate": approx} if approx else {}
    add(nm, "Gelu", {"x": data}, [ref], **attrs)
    clone(nm)

# --- Dropout ------------------------------------------------------------------

_DRX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
add("dropout_default", "Dropout", {"x": _DRX}, [_DRX])
add("dropout_default_ratio", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.1)}, [_DRX], init=("ratio",))
add("dropout_default_mask", "Dropout", {"x": _DRX},
    [_DRX, np.ones(_DRX.shape, bool)])
add("dropout_default_mask_ratio", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.1)},
    [_DRX, np.ones(_DRX.shape, bool)], init=("ratio",))
add("dropout_default_old", "Dropout", {"x": _DRX}, [_DRX], opset=11)
add("dropout_random_old", "Dropout", {"x": _DRX}, [_DRX], opset=11,
    ratio=0.2)


def _train_dropout(x, ratio, seed):
    np.random.seed(seed)
    mask = np.random.uniform(0.0, 1.0, x.shape) >= ratio
    return (mask * x / (1 - ratio)).astype(x.dtype), mask


_TDY, _TDM = _train_dropout(_DRX, 0.75, 0)
add("training_dropout_default", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.5),
     "training_mode": np.asarray(True)},
    [_train_dropout(_DRX, 0.5, 0)[0]], init=("ratio", "training_mode"),
    oracle_only=False, seed=0)
add("training_dropout_default_mask", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.5),
     "training_mode": np.asarray(True)},
    list(_train_dropout(_DRX, 0.5, 0)), init=("ratio", "training_mode"),
    oracle_only=False, seed=0)
add("training_dropout", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.75),
     "training_mode": np.asarray(True)},
    [_TDY], init=("ratio", "training_mode"), oracle_only=False, seed=0)
add("training_dropout_mask", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.75),
     "training_mode": np.asarray(True)},
    [_TDY, _TDM], init=("ratio", "training_mode"), oracle_only=False,
    seed=0)
add("training_dropout_zero_ratio", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.0),
     "training_mode": np.asarray(True)},
    [_DRX], init=("ratio", "training_mode"))
add("training_dropout_zero_ratio_mask", "Dropout",
    {"x": _DRX, "ratio": np.float32(0.0),
     "training_mode": np.asarray(True)},
    [_DRX, np.ones(_DRX.shape, bool)], init=("ratio", "training_mode"))

# --- RotaryEmbedding -----------------------------------------------------------


def _rope_ref(x, cos, sin, pos=None, interleaved=False, rd=0,
              num_heads=0):
    was_3d = x.ndim == 3
    xf = x.astype(np.float64)
    if was_3d:
        B, S = xf.shape[:2]
        xf = xf.reshape(B, S, num_heads, -1).transpose(0, 2, 1, 3)
    B, H, S, D = xf.shape
    rd = rd or D
    half = rd // 2
    if pos is not None:
        c, s = cos[pos], sin[pos]
    elif cos.ndim == 3:
        c, s = cos, sin
    else:
        c, s = cos[:S], sin[:S]
    while c.ndim < 3:
        c, s = c[None], s[None]
    c = c[:, None, :, :half]
    s = s[:, None, :, :half]
    xr, xp = xf[..., :rd], xf[..., rd:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        rot = np.empty_like(xr)
        rot[..., 0::2] = x1 * c - x2 * s
        rot[..., 1::2] = x2 * c + x1 * s
    else:
        x1, x2 = xr[..., :half], xr[..., half:]
        rot = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
    out = np.concatenate([rot, xp], -1) if rd < D else rot
    if was_3d:
        out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    return out.astype(np.float32)


_RB, _RH, _RS, _RD = 2, 4, 3, 8
_RX4 = _rng.standard_normal((_RB, _RH, _RS, _RD)).astype(np.float32)
_RX3 = _rng.standard_normal((_RB, _RS, _RH * _RD)).astype(np.float32)
_RCOS = _rng.standard_normal((16, _RD // 2)).astype(np.float32)
_RSIN = _rng.standard_normal((16, _RD // 2)).astype(np.float32)
_RPOS = _rng.integers(0, 16, (_RB, _RS)).astype(np.int64)
_RCOS3 = _rng.standard_normal((_RB, _RS, _RD // 2)).astype(np.float32)
_RSIN3 = _rng.standard_normal((_RB, _RS, _RD // 2)).astype(np.float32)

add("rotary_embedding", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS, "sin": _RSIN, "pos": _RPOS},
    [_rope_ref(_RX4, _RCOS, _RSIN, _RPOS)])
clone("rotary_embedding")
add("rotary_embedding_3d_input", "RotaryEmbedding",
    {"x": _RX3, "cos": _RCOS, "sin": _RSIN, "pos": _RPOS},
    [_rope_ref(_RX3, _RCOS, _RSIN, _RPOS, num_heads=_RH)],
    num_heads=_RH)
clone("rotary_embedding_3d_input")
add("rotary_embedding_interleaved", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS, "sin": _RSIN, "pos": _RPOS},
    [_rope_ref(_RX4, _RCOS, _RSIN, _RPOS, interleaved=True)],
    interleaved=1)
clone("rotary_embedding_interleaved")
add("rotary_embedding_with_rotary_dim", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS, "sin": _RSIN, "pos": _RPOS},
    [_rope_ref(_RX4, _RCOS, _RSIN, _RPOS, rd=4)],
    rotary_embedding_dim=4)
clone("rotary_embedding_with_rotary_dim")
add("rotary_embedding_no_position_ids", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS3, "sin": _RSIN3},
    [_rope_ref(_RX4, _RCOS3, _RSIN3)])
clone("rotary_embedding_no_position_ids")
add("rotary_embedding_no_position_ids_rotary_dim", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS3, "sin": _RSIN3},
    [_rope_ref(_RX4, _RCOS3, _RSIN3, rd=4)], rotary_embedding_dim=4)
clone("rotary_embedding_no_position_ids_rotary_dim")
add("rotary_embedding_no_position_ids_interleaved", "RotaryEmbedding",
    {"x": _RX4, "cos": _RCOS3, "sin": _RSIN3},
    [_rope_ref(_RX4, _RCOS3, _RSIN3, interleaved=True)], interleaved=1)
clone("rotary_embedding_no_position_ids_interleaved")

# --- Shape windows --------------------------------------------------------------

_SHX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
for nm, st, en in (("shape_start_1", 1, None),
                   ("shape_end_1", None, 1),
                   ("shape_start_1_end_2", 1, 2),
                   ("shape_start_1_end_negative_1", 1, -1),
                   ("shape_start_negative_1", -1, None),
                   ("shape_end_negative_1", None, -1),
                   ("shape_clip_start", -10, None),
                   ("shape_clip_end", None, 10)):
    attrs = {}
    if st is not None:
        attrs["start"] = st
    if en is not None:
        attrs["end"] = en
    sl = slice(st if st is None or st >= -3 else 0,
               en if en is None or en <= 3 else 3)
    exp = np.asarray(_SHX.shape, np.int64)[
        slice(np.clip(st, -3, 3) if st is not None else None,
              np.clip(en, -3, 3) if en is not None else None)]
    add(nm, "Shape", {"x": _SHX}, [exp], **attrs)

# --- CumSum ----------------------------------------------------------------------

_CS1 = np.array([1., 2., 3., 4., 5.], np.float64)
_CS2 = np.arange(1, 7, dtype=np.float64).reshape(2, 3)


def _cum(name, x, axis, exclusive=0, reverse=0):
    xf = x
    if reverse:
        xf = np.flip(xf, axis)
    y = np.cumsum(xf, axis)
    if exclusive:
        y = y - xf
    if reverse:
        y = np.flip(y, axis)
    attrs = {}
    if exclusive:
        attrs["exclusive"] = 1
    if reverse:
        attrs["reverse"] = 1
    add(name, "CumSum", {"x": x, "axis": np.asarray(axis, np.int32)},
        [y], init=("axis",), **attrs)


_cum("cumsum_1d", _CS1, 0)
_cum("cumsum_1d_exclusive", _CS1, 0, exclusive=1)
_cum("cumsum_1d_reverse", _CS1, 0, reverse=1)
_cum("cumsum_1d_reverse_exclusive", _CS1, 0, exclusive=1, reverse=1)
_cum("cumsum_2d_axis_0", _CS2, 0)
_cum("cumsum_2d_axis_1", _CS2, 1)
_cum("cumsum_2d_negative_axis", _CS2, -1)

# --- Gemm -------------------------------------------------------------------------

_GA = _rng.standard_normal((3, 5)).astype(np.float32)
_GB = _rng.standard_normal((5, 4)).astype(np.float32)


def _gemm(name, a, b, c=None, **attrs):
    af = a.T if attrs.get("transA") else a
    bf = b.T if attrs.get("transB") else b
    y = attrs.get("alpha", 1.0) * (af.astype(np.float64)
                                   @ bf.astype(np.float64))
    if c is not None:
        y = y + attrs.get("beta", 1.0) * c.astype(np.float64)
    inputs = {"a": a, "b": b}
    if c is not None:
        inputs["c"] = c
    add(name, "Gemm", inputs, [y.astype(np.float32)], **attrs)


_gemm("gemm_default_no_bias", _GA, _GB)
_gemm("gemm_default_zero_bias", _GA, _GB, np.zeros((3, 4), np.float32))
_gemm("gemm_default_scalar_bias", _GA, _GB, np.float32(3.14))
_gemm("gemm_default_single_elem_vector_bias", _GA, _GB,
      np.array([2.5], np.float32))
_gemm("gemm_default_vector_bias", _GA, _GB,
      _rng.standard_normal(4).astype(np.float32))
_gemm("gemm_default_matrix_bias", _GA, _GB,
      _rng.standard_normal((3, 4)).astype(np.float32))
_gemm("gemm_all_attributes", _rng.standard_normal((5, 3)).astype(np.float32),
      _rng.standard_normal((4, 5)).astype(np.float32),
      _rng.standard_normal((1, 4)).astype(np.float32),
      alpha=0.25, beta=0.35, transA=1, transB=1)
_gemm("gemm_alpha", _GA, _GB, np.zeros((3, 4), np.float32), alpha=0.5)
_gemm("gemm_beta", _GA, _GB, _rng.standard_normal((1, 4)).astype(np.float32),
      beta=0.5)
_gemm("gemm_transposeA", _GA.T.copy(), _GB,
      np.zeros((3, 4), np.float32), transA=1)
_gemm("gemm_transposeB", _GA, _GB.T.copy(),
      np.zeros((3, 4), np.float32), transB=1)

# --- Hardmax / Softmax / LogSoftmax ------------------------------------------------


def _hardmax_ref(x, axis):
    y = np.zeros_like(x)
    idx = np.argmax(x, axis)
    np.put_along_axis(y, np.expand_dims(idx, axis), 1.0, axis)
    return y


_HX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
add("hardmax_example", "Hardmax",
    {"x": np.array([[3, 0, 1, 2], [2, 5, 1, 0], [0, 1, 3, 2],
                    [0, 1, 2, 3]], np.float32)},
    [_hardmax_ref(np.array([[3, 0, 1, 2], [2, 5, 1, 0], [0, 1, 3, 2],
                            [0, 1, 2, 3]], np.float32), -1)])
add("hardmax_one_hot", "Hardmax",
    {"x": np.array([[1.0, 1.0, 1.0, 1.0]], np.float32)},
    [np.array([[1.0, 0, 0, 0]], np.float32)])
for ax in (0, 1, 2, -1):
    nm = f"hardmax_axis_{ax}" if ax >= 0 else "hardmax_negative_axis"
    add(nm, "Hardmax", {"x": _HX}, [_hardmax_ref(_HX, ax)], axis=ax)
add("hardmax_default_axis", "Hardmax", {"x": _HX},
    [_hardmax_ref(_HX, -1)])


def _softmax_ref(x, axis, log=False):
    xf = x.astype(np.float64)
    m = xf.max(axis=axis, keepdims=True)
    e = np.exp(xf - m)
    p = e / e.sum(axis=axis, keepdims=True)
    return (np.log(p) if log else p).astype(np.float32)


_SMX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
for op, log in (("Softmax", False), ("LogSoftmax", True)):
    low = op.lower()
    add(f"{low}_example{'_1' if log else ''}", op,
        {"x": np.array([[-1, 0, 1]], np.float32)},
        [_softmax_ref(np.array([[-1, 0, 1]], np.float32), -1, log)])
    add(f"{low}_large_number", op,
        {"x": np.array([[0, 1, 2, 3], [10000, 10001, 10002, 10003]],
                       np.float32)},
        [_softmax_ref(np.array([[0, 1, 2, 3],
                                [10000, 10001, 10002, 10003]],
                               np.float32), -1, log)])
    for ax in (0, 1, 2, -1):
        nm = (f"{low}_axis_{ax}" if ax >= 0 else f"{low}_negative_axis")
        add(nm, op, {"x": _SMX}, [_softmax_ref(_SMX, ax, log)], axis=ax)
    add(f"{low}_default_axis", op, {"x": _SMX},
        [_softmax_ref(_SMX, -1, log)])

# --- Concat ------------------------------------------------------------------------

for nd, shp in (("1d", (4,)), ("2d", (2, 3)), ("3d", (2, 2, 3))):
    a = _rng.standard_normal(shp).astype(np.float32)
    b = _rng.standard_normal(shp).astype(np.float32)
    for ax in range(len(shp)):
        add(f"concat_{nd}_axis_{ax}", "Concat", {"a": a, "b": b},
            [np.concatenate([a, b], ax)], axis=ax)
        add(f"concat_{nd}_axis_negative_{len(shp) - ax}", "Concat",
            {"a": a, "b": b}, [np.concatenate([a, b], ax)],
            axis=ax - len(shp))

# --- Split --------------------------------------------------------------------------

_SP1 = np.arange(1, 7, dtype=np.float32)
_SP2 = np.arange(1, 13, dtype=np.float32).reshape(2, 6)
add("split_equal_parts_1d_opset18", "Split", {"x": _SP1},
    list(np.split(_SP1, 3)), num_outputs=3)
add("split_equal_parts_default_axis_opset18", "Split", {"x": _SP1},
    list(np.split(_SP1, 3)), num_outputs=3)
add("split_equal_parts_2d", "Split", {"x": _SP2},
    list(np.split(_SP2, 2, axis=1)), axis=1, num_outputs=2)
add("split_variable_parts_1d_opset18", "Split",
    {"x": _SP1, "split": np.array([2, 4], np.int64)},
    [_SP1[:2], _SP1[2:]], init=("split",))
add("split_variable_parts_2d_opset18", "Split",
    {"x": _SP2, "split": np.array([2, 4], np.int64)},
    [_SP2[:, :2], _SP2[:, 2:]], init=("split",), axis=1)
add("split_variable_parts_default_axis_opset18", "Split",
    {"x": _SP1, "split": np.array([2, 4], np.int64)},
    [_SP1[:2], _SP1[2:]], init=("split",))
add("split_1d_uneven_split_opset18", "Split",
    {"x": np.arange(1, 8, dtype=np.float32)},
    [np.array([1, 2], np.float32), np.array([3, 4], np.float32),
     np.array([5, 6], np.float32), np.array([7], np.float32)],
    num_outputs=4)
add("split_2d_uneven_split_opset18", "Split",
    {"x": np.arange(1, 17, dtype=np.float32).reshape(2, 8)},
    [np.arange(1, 17, dtype=np.float32).reshape(2, 8)[:, :3],
     np.arange(1, 17, dtype=np.float32).reshape(2, 8)[:, 3:6],
     np.arange(1, 17, dtype=np.float32).reshape(2, 8)[:, 6:]],
    axis=1, num_outputs=3)
add("split_zero_size_splits_opset18", "Split",
    {"x": np.zeros(0, np.float32),
     "split": np.array([0, 0, 0], np.int64)},
    [np.zeros(0, np.float32)] * 3, init=("split",))
for nm13, nm18 in (("split_variable_parts_1d_opset13",
                    "split_variable_parts_1d_opset18"),
                   ("split_variable_parts_2d_opset13",
                    "split_variable_parts_2d_opset18"),
                   ("split_variable_parts_default_axis_opset13",
                    "split_variable_parts_default_axis_opset18"),
                   ("split_zero_size_splits_opset13",
                    "split_zero_size_splits_opset18")):
    src = next(c for c in CASES if c.name == nm18)
    CASES.append(Case(nm13, src.op_type, src.inputs, src.expected,
                      attrs=src.attrs, opset=13,
                      initializer_names=src.initializer_names,
                      atol=src.atol))

# --- TfIdfVectorizer -----------------------------------------------------------------

# pool: 1-grams [2,3,5,4]; 2-grams [5,6, 7,8, 6,7]
_TFI = dict(ngram_counts=[0, 4], ngram_indexes=[0, 1, 2, 3, 4, 5, 6],
            pool_int64s=[2, 3, 5, 4, 5, 6, 7, 8, 6, 7])


def _tfidf(name, x, min_g, max_g, skip, counts=None, idxs=None,
           pool=None):
    cfg = dict(_TFI)
    if counts is not None:
        cfg = dict(ngram_counts=counts, ngram_indexes=idxs,
                   pool_int64s=pool)
    n_out = max(cfg["ngram_indexes"]) + 1
    table = {}
    bounds = list(cfg["ngram_counts"]) + [len(cfg["pool_int64s"])]
    ip = 0
    for lvl in range(len(cfg["ngram_counts"])):
        n = lvl + 1
        sec = cfg["pool_int64s"][bounds[lvl]:bounds[lvl + 1]]
        for off in range(0, len(sec), n):
            table[tuple(sec[off:off + n])] = cfg["ngram_indexes"][ip]
            ip += 1
    xs = x if x.ndim == 2 else x[None]
    out = np.zeros((xs.shape[0], n_out), np.float32)
    for r in range(xs.shape[0]):
        row = xs[r]
        for n in range(min_g, max_g + 1):
            for s in (range(skip + 1) if n > 1 else [0]):
                st = s + 1
                span = (n - 1) * st
                for i in range(0, len(row) - span):
                    g = tuple(int(row[i + j * st]) for j in range(n))
                    if g in table:
                        out[r, table[g]] += 1
    exp = out if x.ndim == 2 else out[0]
    add(name, "TfIdfVectorizer", {"x": x}, [exp], oracle_only=False,
        min_gram_length=min_g, max_gram_length=max_g,
        max_skip_count=skip, mode="TF", **cfg)


_TX1 = np.array([1, 1, 3, 3, 3, 7, 8, 6, 7, 5, 6, 8], np.int64)
_TX2 = np.array([[1, 1, 3, 3, 3, 7], [8, 6, 7, 5, 6, 8]], np.int64)
_tfidf("tfidfvectorizer_tf_only_bigrams_skip0", _TX1, 2, 2, 0)
_tfidf("tfidfvectorizer_tf_onlybigrams_skip5", _TX1, 2, 2, 5)
_tfidf("tfidfvectorizer_tf_uniandbigrams_skip5", _TX1, 1, 2, 5)
_tfidf("tfidfvectorizer_tf_batch_onlybigrams_skip0", _TX2, 2, 2, 0)
_tfidf("tfidfvectorizer_tf_batch_onlybigrams_skip5", _TX2, 2, 2, 5)
_tfidf("tfidfvectorizer_tf_batch_uniandbigrams_skip5", _TX2, 1, 2, 5)
# levelempty: no 1-grams in the pool (ngram_counts [0,0])
_tfidf("tfidfvectorizer_tf_onlybigrams_levelempty", _TX1, 2, 2, 0,
       counts=[0, 0], idxs=[0, 1, 2],
       pool=[5, 6, 7, 8, 6, 7])
