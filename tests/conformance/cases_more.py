"""Conformance cases: remaining breadth — bitwise/bool matrices, shape-op
sweeps (Gather/Slice/Pad/Transpose/Concat/Split/Reshape), quantize
variants, linear-Resize coordinate modes, activation f16/bf16 sweeps,
attention scale, conv edge forms.
"""

import ml_dtypes
import numpy as np
import torch

from .harness import Case

rng = np.random.default_rng(2468)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# bitwise / bool matrices
# ---------------------------------------------------------------------------
for dn, dt in (("u8", np.uint8), ("u16", np.uint16), ("u32", np.uint32),
               ("i8", np.int8), ("i32", np.int32)):
    info = np.iinfo(dt)
    a = rng.integers(max(info.min, -100), min(info.max, 200), (3, 4)).astype(dt)
    b = rng.integers(max(info.min, -100), min(info.max, 200), (3, 4)).astype(dt)
    add(f"bw_and_{dn}", "BitwiseAnd", {"a": a, "b": b}, a & b)
    add(f"bw_or_{dn}", "BitwiseOr", {"a": a, "b": b}, a | b)
    add(f"bw_xor_{dn}", "BitwiseXor", {"a": a, "b": b}, a ^ b)

for dn, dt in (("u8", np.uint8), ("u16", np.uint16), ("u64", np.uint64)):
    a = rng.integers(0, 60, (4,)).astype(dt)
    s = rng.integers(0, 3, (4,)).astype(dt)
    add(f"bs_left_{dn}", "BitShift", {"a": a, "b": s}, a << s,
        attrs={"direction": "LEFT"})
    add(f"bs_right_{dn}", "BitShift", {"a": a, "b": s}, a >> s,
        attrs={"direction": "RIGHT"})

_B1 = rng.integers(0, 2, (3, 4)).astype(bool)
_B2 = rng.integers(0, 2, (4,)).astype(bool)
add("and_bcast", "And", {"a": _B1, "b": _B2}, _B1 & _B2)
add("or_bcast", "Or", {"a": _B1, "b": _B2}, _B1 | _B2)
add("xor_bcast", "Xor", {"a": _B1, "b": _B2}, _B1 ^ _B2)
add("not_2d", "Not", {"x": _B1}, ~_B1)

# ---------------------------------------------------------------------------
# shape-op sweeps
# ---------------------------------------------------------------------------
_G = rng.standard_normal((4, 5, 6)).astype(np.float32)
for ax in (0, 1, 2, -1, -2):
    idx = rng.integers(0, _G.shape[ax], (2, 3)).astype(np.int64)
    add(f"gather_sweep_ax{ax}", "Gather", {"x": _G, "i": idx},
        np.take(_G, idx, axis=ax), attrs={"axis": ax})
_GI8 = rng.integers(-40, 40, (4, 5)).astype(np.int8)
add("gather_i8_data", "Gather",
    {"x": _GI8, "i": np.asarray([2, 0], np.int64)}, _GI8[[2, 0]])
add("gather_i32_indices", "Gather",
    {"x": _G, "i": np.asarray([[1, 3]], np.int32)}, _G[[[1, 3]]])
add("gather_scalar_index", "Gather",
    {"x": _G, "i": np.asarray(2, np.int64)}, _G[2])

_SL = rng.standard_normal((6, 8)).astype(np.float32)
add("slice_step2", "Slice",
    {"x": _SL, "st": np.asarray([0], np.int64), "en": np.asarray([6], np.int64),
     "ax": np.asarray([0], np.int64), "sp": np.asarray([2], np.int64)},
    _SL[::2])
add("slice_neg_step", "Slice",
    {"x": _SL, "st": np.asarray([5], np.int64), "en": np.asarray([1], np.int64),
     "ax": np.asarray([1], np.int64), "sp": np.asarray([-1], np.int64)},
    _SL[:, 5:1:-1])
add("slice_neg_step2", "Slice",
    {"x": _SL, "st": np.asarray([-1], np.int64),
     "en": np.asarray([-20], np.int64),
     "ax": np.asarray([0], np.int64), "sp": np.asarray([-2], np.int64)},
    _SL[-1::-2])
add("slice_both_axes_steps", "Slice",
    {"x": _SL, "st": np.asarray([1, 1], np.int64),
     "en": np.asarray([6, 7], np.int64),
     "ax": np.asarray([0, 1], np.int64), "sp": np.asarray([2, 3], np.int64)},
    _SL[1:6:2, 1:7:3])

for mode in ("reflect", "edge", "wrap"):
    add(f"pad_{mode}_2d_big", "Pad",
        {"x": _SL, "p": np.asarray([2, 3, 1, 2], np.int64)},
        np.pad(_SL, [(2, 1), (3, 2)], mode={"reflect": "reflect",
                                            "edge": "edge",
                                            "wrap": "wrap"}[mode]),
        attrs={"mode": mode})
add("pad_constant_f64", "Pad",
    {"x": _SL.astype(np.float64), "p": np.asarray([0, 1, 1, 0], np.int64),
     "v": np.asarray(2.5, np.float64)},
    np.pad(_SL.astype(np.float64), [(0, 1), (1, 0)], constant_values=2.5))
add("pad_i64", "Pad",
    {"x": rng.integers(0, 9, (3, 3)).astype(np.int64),
     "p": np.asarray([1, 1, 1, 1], np.int64)}, None)
CASES[-1].expected = [np.pad(CASES[-1].inputs["x"], [(1, 1), (1, 1)])]

_T3 = rng.standard_normal((2, 3, 4)).astype(np.float32)
for pname, perm in (("p021", (0, 2, 1)), ("p120", (1, 2, 0)),
                    ("p210", (2, 1, 0)), ("p201", (2, 0, 1))):
    add(f"transpose_{pname}", "Transpose", {"x": _T3},
        np.transpose(_T3, perm), attrs={"perm": list(perm)})
_T4 = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
add("transpose_4d", "Transpose", {"x": _T4},
    np.transpose(_T4, (0, 2, 3, 1)), attrs={"perm": [0, 2, 3, 1]})

for ax in (1, 2, -1):
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4)).astype(np.float32)
    c = rng.standard_normal((2, 3, 4)).astype(np.float32)
    add(f"concat3_ax{ax}", "Concat", {"a": a, "b": b, "c": c},
        np.concatenate([a, b, c], axis=ax), attrs={"axis": ax})
add("concat_i16", "Concat",
    {"a": rng.integers(0, 9, (2, 2)).astype(np.int16),
     "b": rng.integers(0, 9, (2, 3)).astype(np.int16)}, None,
    attrs={"axis": 1})
CASES[-1].expected = [np.concatenate([CASES[-1].inputs["a"],
                                      CASES[-1].inputs["b"]], axis=1)]

_SP = rng.standard_normal((7, 4)).astype(np.float32)
add("split_uneven_last", "Split", {"x": _SP},
    [_SP[:3], _SP[3:6], _SP[6:]], attrs={"num_outputs": 3, "axis": 0})
add("split_axis1_sizes", "Split",
    {"x": _SP, "sizes": np.asarray([1, 3], np.int64)},
    [_SP[:, :1], _SP[:, 1:]], attrs={"axis": 1})

_R = rng.standard_normal((2, 3, 4)).astype(np.float32)
add("reshape_merge", "Reshape",
    {"x": _R, "s": np.asarray([6, 4], np.int64)}, _R.reshape(6, 4))
add("reshape_expandrank", "Reshape",
    {"x": _R, "s": np.asarray([2, 3, 2, 2], np.int64)}, _R.reshape(2, 3, 2, 2))
add("reshape_zero_neg1", "Reshape",
    {"x": _R, "s": np.asarray([0, -1], np.int64)}, _R.reshape(2, 12))
add("flatten_neg_axis", "Flatten", {"x": _R}, _R.reshape(6, 4),
    attrs={"axis": -1})

# ---------------------------------------------------------------------------
# quantize / dequantize variants
# ---------------------------------------------------------------------------
_Q = (rng.standard_normal((4, 6)) * 4).astype(np.float32)
add("quantize_u8", "QuantizeLinear",
    {"x": _Q, "s": np.asarray(0.1, np.float32), "z": np.asarray(128, np.uint8)},
    np.clip(np.round(_Q / 0.1) + 128, 0, 255).astype(np.uint8))
add("quantize_i8_axis", "QuantizeLinear",
    {"x": _Q, "s": np.asarray([0.1, 0.2, 0.3, 0.4], np.float32),
     "z": np.zeros(4, np.int8)},
    np.clip(np.round(_Q / np.asarray([0.1, 0.2, 0.3, 0.4],
                                     np.float32)[:, None]), -128, 127)
    .astype(np.int8), attrs={"axis": 0})
_QU = rng.integers(0, 255, (4, 6)).astype(np.uint8)
add("dequantize_u8", "DequantizeLinear",
    {"x": _QU, "s": np.asarray(0.05, np.float32),
     "z": np.asarray(100, np.uint8)},
    ((_QU.astype(np.float32) - 100) * 0.05).astype(np.float32))
_QI32 = rng.integers(-2000, 2000, (3, 4)).astype(np.int32)
add("dequantize_i32", "DequantizeLinear",
    {"x": _QI32, "s": np.asarray(0.01, np.float32)},
    (_QI32.astype(np.float32) * 0.01).astype(np.float32))

# ---------------------------------------------------------------------------
# linear Resize coordinate-mode matrix (2-D, torch referees)
# ---------------------------------------------------------------------------
_RZ = rng.standard_normal((1, 2, 5, 4)).astype(np.float32)
_E = np.zeros(0, dtype=np.float32)
add("rzl_half_pixel_up3", "Resize",
    {"x": _RZ, "roi": _E, "s": np.asarray([1, 1, 3, 3], np.float32)},
    torch.nn.functional.interpolate(t(_RZ), scale_factor=3,
                                    mode="bilinear").numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
add("rzl_align_up3", "Resize",
    {"x": _RZ, "roi": _E, "s": np.asarray([1, 1, 3, 3], np.float32)},
    torch.nn.functional.interpolate(t(_RZ), scale_factor=3, mode="bilinear",
                                    align_corners=True).numpy(),
    attrs={"mode": "linear",
           "coordinate_transformation_mode": "align_corners"}, atol=1e-5)
add("rzl_asym_down", "Resize",
    {"x": _RZ, "roi": _E, "s": _E, "sz": np.asarray([1, 2, 3, 2], np.int64)},
    None, attrs={"mode": "linear",
                 "coordinate_transformation_mode": "asymmetric"}, atol=1e-5)


def _linear_asym_ref(x, out_hw):
    N, C, H, W = x.shape
    oh, ow = out_hw
    sh, sw = oh / H, ow / W
    ys = np.arange(oh) / sh
    xs = np.arange(ow) / sw
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    ty = (ys - np.floor(ys))[None, None, :, None]
    tx = (xs - np.floor(xs))[None, None, None, :]
    g = x[:, :, y0][:, :, :, x0] * (1 - ty) * (1 - tx) \
        + x[:, :, y1][:, :, :, x0] * ty * (1 - tx) \
        + x[:, :, y0][:, :, :, x1] * (1 - ty) * tx \
        + x[:, :, y1][:, :, :, x1] * ty * tx
    return g.astype(np.float32)


CASES[-1].expected = [_linear_asym_ref(_RZ, (3, 2))]

# ---------------------------------------------------------------------------
# activation f16/bf16 sweep (composites)
# ---------------------------------------------------------------------------
_A = rng.standard_normal((3, 5)).astype(np.float32)
for dn, dt, tol in (("f16", np.float16, 4e-3), ("bf16", ml_dtypes.bfloat16, 3e-2)):
    xv = _A.astype(dt)
    xf = xv.astype(np.float32)
    add(f"act_gelu_{dn}", "Gelu", {"x": xv},
        torch.nn.functional.gelu(t(xf)).numpy().astype(dt),
        rtol=tol, atol=tol)
    add(f"act_elu_{dn}", "Elu", {"x": xv},
        torch.nn.functional.elu(t(xf)).numpy().astype(dt),
        rtol=tol, atol=tol)
    add(f"act_leakyrelu_{dn}", "LeakyRelu", {"x": xv},
        torch.nn.functional.leaky_relu(t(xf), 0.01).numpy().astype(dt),
        rtol=tol, atol=tol)
    add(f"act_hardsigmoid_{dn}", "HardSigmoid", {"x": xv},
        np.clip(xf / 6 + 0.5, 0, 1).astype(dt),
        attrs={"alpha": 1.0 / 6.0, "beta": 0.5}, rtol=tol, atol=tol)
    add(f"act_mish_{dn}", "Mish", {"x": xv},
        torch.nn.functional.mish(t(xf)).numpy().astype(dt),
        rtol=tol, atol=tol)
    add(f"act_erf_{dn}", "Erf", {"x": xv},
        torch.erf(t(xf)).numpy().astype(dt), rtol=tol, atol=tol)
    add(f"act_softmax_{dn}", "Softmax", {"x": xv},
        torch.softmax(t(xf), -1).numpy().astype(dt), rtol=tol, atol=tol)

# ---------------------------------------------------------------------------
# attention scale attr + wider GQA + f64 gemm/matmul
# ---------------------------------------------------------------------------
_Q = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
_K = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
_V = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
add("attention_scale_attr", "Attention", {"q": _Q, "k": _K, "v": _V},
    torch.nn.functional.scaled_dot_product_attention(
        t(_Q), t(_K), t(_V), scale=0.25).numpy(),
    attrs={"scale": 0.25}, atol=1e-5)
_K3 = rng.standard_normal((1, 3, 4, 8)).astype(np.float32)
_V3 = rng.standard_normal((1, 3, 4, 8)).astype(np.float32)
_Q6 = rng.standard_normal((1, 6, 4, 8)).astype(np.float32)
add("attention_gqa_h6kv3", "Attention", {"q": _Q6, "k": _K3, "v": _V3},
    torch.nn.functional.scaled_dot_product_attention(
        t(_Q6), t(_K3), t(_V3), enable_gqa=True).numpy(), atol=1e-5)
_GA = rng.standard_normal((3, 4)).astype(np.float64)
_GB = rng.standard_normal((4, 5)).astype(np.float64)
add("gemm_f64", "Gemm",
    {"a": _GA, "b": _GB, "c": rng.standard_normal((3, 5))},
    None, atol=1e-12)
CASES[-1].expected = [_GA @ _GB + CASES[-1].inputs["c"]]

# conv edge forms
_CX = rng.standard_normal((1, 2, 7, 7)).astype(np.float32)
_CW1 = rng.standard_normal((4, 2, 1, 1)).astype(np.float32)
add("conv_1x1", "Conv", {"x": _CX, "w": _CW1},
    torch.conv2d(t(_CX), t(_CW1)).numpy(), atol=1e-5)
add("conv_auto_pad_valid", "Conv", {"x": _CX,
                                    "w": rng.standard_normal((3, 2, 3, 3)).astype(np.float32)},
    None, attrs={"auto_pad": "VALID"}, atol=1e-4)
CASES[-1].expected = [torch.conv2d(t(_CX), t(CASES[-1].inputs["w"])).numpy()]
add("conv_stride3", "Conv", {"x": _CX,
                             "w": rng.standard_normal((3, 2, 2, 2)).astype(np.float32)},
    None, attrs={"strides": [3, 3]}, atol=1e-4)
CASES[-1].expected = [torch.conv2d(t(_CX), t(CASES[-1].inputs["w"]),
                                   stride=3).numpy()]
add("convtranspose_grouped", "ConvTranspose",
    {"x": rng.standard_normal((1, 4, 5, 5)).astype(np.float32),
     "w": rng.standard_normal((4, 2, 3, 3)).astype(np.float32)},
    None, attrs={"group": 2}, atol=1e-4)
CASES[-1].expected = [torch.conv_transpose2d(
    t(CASES[-1].inputs["x"]), t(CASES[-1].inputs["w"]), groups=2).numpy()]
add("conv_bf16", "Conv",
    {"x": rng.standard_normal((1, 2, 6, 6)).astype(ml_dtypes.bfloat16),
     "w": rng.standard_normal((3, 2, 3, 3)).astype(ml_dtypes.bfloat16)},
    None, rtol=3e-2, atol=3e-2)
CASES[-1].expected = [torch.conv2d(
    t(CASES[-1].inputs["x"].astype(np.float32)),
    t(CASES[-1].inputs["w"].astype(np.float32))).numpy().astype(ml_dtypes.bfloat16)]

# LpNormalization variants
_LN = rng.standard_normal((3, 6)).astype(np.float32)
add("lpnorm_l1", "LpNormalization", {"x": _LN},
    torch.nn.functional.normalize(t(_LN), p=1, dim=-1).numpy(),
    attrs={"p": 1}, atol=1e-5)
add("lpnorm_ax0", "LpNormalization", {"x": _LN},
    torch.nn.functional.normalize(t(_LN), p=2, dim=0).numpy(),
    attrs={"axis": 0}, atol=1e-5)

# GRU / RNN with initial hidden state
S, B, I, H = 3, 2, 3, 4
_GX = rng.standard_normal((S, B, I)).astype(np.float32)
_GW = (rng.standard_normal((1, 3 * H, I)) / 2).astype(np.float32)
_GR = (rng.standard_normal((1, 3 * H, H)) / 2).astype(np.float32)
_GH0 = (rng.standard_normal((1, B, H)) / 2).astype(np.float32)


def _gru_h0_ref():
    sig = lambda v: 1 / (1 + np.exp(-v))
    h = _GH0[0].copy()
    Y = np.zeros((S, 1, B, H), np.float32)
    for tt in range(S):
        gx = _GX[tt] @ _GW[0].T
        gh = h @ _GR[0].T
        z = sig(gx[:, :H] + gh[:, :H])
        r = sig(gx[:, H:2*H] + gh[:, H:2*H])
        hh = np.tanh(gx[:, 2*H:] + r * gh[:, 2*H:])
        h = (1 - z) * hh + z * h
        Y[tt, 0] = h
    return Y, h[None]


_gy, _gh = _gru_h0_ref()
add("gru_initial_h", "GRU",
    {"x": _GX, "w": _GW, "r": _GR,
     "b": np.zeros((1, 6 * H), np.float32),
     "sl": np.full(B, S, np.int32), "h0": _GH0},
    [_gy, _gh], attrs={"hidden_size": H, "linear_before_reset": 1},
    rtol=1e-4, atol=1e-5)

# ---------------------------------------------------------------------------
# broadcasting-shape matrix and leftover sweeps (pushes the corpus
# past the 1,000-case bar of VERDICT round-1 ask #3)
# ---------------------------------------------------------------------------
_M = rng.standard_normal((3, 4)).astype(np.float32)
_BCASTS = {
    "scalar": np.asarray(1.25, np.float32),
    "row": rng.standard_normal((1, 4)).astype(np.float32),
    "col": rng.standard_normal((3, 1)).astype(np.float32),
    "vec": rng.standard_normal((4,)).astype(np.float32),
}
for bn, bv in _BCASTS.items():
    for op, fn in (("Add", np.add), ("Sub", np.subtract),
                   ("Mul", np.multiply), ("Div", lambda a, b: a / (np.abs(b) + 0.5))):
        rhs = bv if op != "Div" else bv
        exp = fn(_M, rhs) if op != "Div" else _M / (np.abs(bv) + 0.5)
        inp = {"a": _M, "b": rhs if op != "Div" else np.abs(bv) + 0.5}
        exp = (np.add(_M, inp["b"]) if op == "Add" else
               np.subtract(_M, inp["b"]) if op == "Sub" else
               np.multiply(_M, inp["b"]) if op == "Mul" else
               np.divide(_M, inp["b"]))
        add(f"bc_{op.lower()}_{bn}", op, inp, exp, rtol=1e-5, atol=1e-6)

_H4 = rng.standard_normal((2, 3, 2, 4)).astype(np.float32)
for mode, fn in (("ReduceSum", np.sum), ("ReduceMean", np.mean),
                 ("ReduceMax", np.max), ("ReduceMin", np.min),
                 ("ReduceProd", np.prod)):
    for kd in (0, 1):
        add(f"r4_{mode.lower()}_kd{kd}", mode,
            {"x": _H4, "axes": np.asarray([1, 3], np.int64)},
            np.asarray(fn(_H4, axis=(1, 3), keepdims=bool(kd)),
                       dtype=np.float32),
            attrs={"keepdims": kd}, rtol=1e-4, atol=1e-5)

for ax in (0, 1, 2):
    d = rng.standard_normal((3, 4, 5)).astype(np.float32)
    i = rng.integers(0, d.shape[ax], (3, 4, 5)).astype(np.int64)
    add(f"ge_sweep_ax{ax}", "GatherElements", {"d": d, "i": i},
        np.take_along_axis(d, i, axis=ax), attrs={"axis": ax})

add("tile_3d", "Tile",
    {"x": _H4[0], "reps": np.asarray([2, 1, 3], np.int64)},
    np.tile(_H4[0], (2, 1, 3)))
add("expand_same_rank", "Expand",
    {"x": _BCASTS["col"], "shape": np.asarray([3, 5], np.int64)},
    np.broadcast_to(_BCASTS["col"], (3, 5)).copy())
add("squeeze_noop_no_axes", "Squeeze",
    {"x": rng.standard_normal((1, 3, 1)).astype(np.float32)}, None)
CASES[-1].expected = [CASES[-1].inputs["x"].squeeze()]

from whisper_tensor_tpu.dtype import DTYPE_TO_ONNX as _D2O, DType as _DT

_CPAIRS = [
    (np.int64, _DT.U8), (np.int64, _DT.I8), (np.float64, _DT.F16),
    (np.float16, _DT.F64), (np.uint8, _DT.I8), (np.int8, _DT.U8),
    (np.int32, _DT.I16), (np.uint32, _DT.I64), (np.float32, _DT.U8),
]
for src, dst in _CPAIRS:
    v = np.abs(rng.standard_normal((2, 3)) * 20).astype(src)
    add(f"cast3_{np.dtype(src).name}_{dst.name}".lower(), "Cast", {"x": v},
        v.astype(dst.to_numpy()), attrs={"to": _D2O[dst]},
        rtol=1e-2, atol=1e-2)

add("pow_i64_exp", "Pow",
    {"a": rng.integers(1, 5, (3,)).astype(np.int64),
     "b": rng.integers(0, 4, (3,)).astype(np.int64)}, None)
CASES[-1].expected = [CASES[-1].inputs["a"] ** CASES[-1].inputs["b"]]
add("equal_bool", "Equal", {"a": _B1, "b": np.broadcast_to(_B2, _B1.shape).copy()},
    _B1 == _B2)
for vn in ("f32", "i64"):
    v = (_M if vn == "f32" else rng.integers(-9, 9, (3, 4)).astype(np.int64))
    add(f"identity_{vn}", "Identity", {"x": v}, v)
