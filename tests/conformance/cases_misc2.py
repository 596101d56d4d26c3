"""Conformance cases: Resize mode matrix, older-opset attribute forms,
shape-op and generator variants, einsum forms.

The Resize referee is an independent numpy implementation of the ONNX
coordinate-transformation + nearest-mode spec written here (the
framework shares its own index computation between backends, so an
external referee is required).
"""

import numpy as np
import torch

from .harness import Case

rng = np.random.default_rng(31337)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# Resize: nearest-mode x coordinate-transformation matrix
# (independent numpy implementation of the ONNX spec)
# ---------------------------------------------------------------------------
def _coord(x_out, scale, in_sz, out_sz, mode):
    if mode == "half_pixel":
        return (x_out + 0.5) / scale - 0.5
    if mode == "asymmetric":
        return x_out / scale
    if mode == "align_corners":
        if out_sz == 1:
            return np.zeros_like(x_out, dtype=np.float64)
        return x_out * (in_sz - 1) / (out_sz - 1)
    if mode == "pytorch_half_pixel":
        if out_sz > 1:
            return (x_out + 0.5) / scale - 0.5
        return np.zeros_like(x_out, dtype=np.float64)
    raise ValueError(mode)


def _nearest_pick(c, mode):
    if mode == "floor":
        return np.floor(c)
    if mode == "ceil":
        return np.ceil(c)
    if mode == "round_prefer_floor":
        return np.where(c == np.floor(c) + 0.5, np.floor(c), np.round(c))
    if mode == "round_prefer_ceil":
        return np.floor(c + 0.5)
    raise ValueError(mode)


def _resize_nearest_ref(x, scales, coord_mode, nearest_mode):
    # the ONNX scales tensor is f32: round-trip through f32 so exact
    # coordinate boundaries (e.g. 1.5/0.6) resolve the same way
    scales = [float(np.float32(s)) for s in scales]
    in_sh = x.shape
    out_sh = tuple(int(np.floor(s * f)) for s, f in zip(in_sh, scales))
    out = np.empty(out_sh, dtype=x.dtype)
    grids = np.indices(out_sh).astype(np.float64)
    src = []
    for d in range(len(in_sh)):
        c = _coord(grids[d], scales[d], in_sh[d], out_sh[d], coord_mode)
        i = _nearest_pick(c, nearest_mode)
        src.append(np.clip(i, 0, in_sh[d] - 1).astype(np.int64))
    return x[tuple(src)]


_RX = rng.standard_normal((1, 2, 4, 5)).astype(np.float32)
_E = np.zeros(0, dtype=np.float32)
for cmode in ("half_pixel", "asymmetric", "align_corners",
              "pytorch_half_pixel"):
    for nmode in ("floor", "ceil", "round_prefer_floor",
                  "round_prefer_ceil"):
        for sname, sc in (("up2", [1, 1, 2.0, 2.0]),
                          ("down", [1, 1, 0.6, 0.7])):
            scales = np.asarray(sc, dtype=np.float32)
            ref = _resize_nearest_ref(_RX, sc, cmode, nmode)
            add(f"rz_nearest_{cmode}_{nmode}_{sname}", "Resize",
                {"x": _RX, "roi": _E, "s": scales}, ref,
                attrs={"mode": "nearest",
                       "coordinate_transformation_mode": cmode,
                       "nearest_mode": nmode})

# linear upsampling on 1-D and 3-D spatial (torch referees)
_R1 = rng.standard_normal((2, 3, 6)).astype(np.float32)
add("rz_linear_1d", "Resize",
    {"x": _R1, "roi": _E, "s": np.asarray([1, 1, 2], np.float32)},
    torch.nn.functional.interpolate(t(_R1), scale_factor=2,
                                    mode="linear").numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
_R3 = rng.standard_normal((1, 1, 3, 4, 5)).astype(np.float32)
add("rz_linear_3d", "Resize",
    {"x": _R3, "roi": _E, "s": np.asarray([1, 1, 2, 2, 2], np.float32)},
    torch.nn.functional.interpolate(t(_R3), scale_factor=2,
                                    mode="trilinear").numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
add("rz_linear_align_1d", "Resize",
    {"x": _R1, "roi": _E, "s": np.asarray([1, 1, 3], np.float32)},
    torch.nn.functional.interpolate(t(_R1), scale_factor=3, mode="linear",
                                    align_corners=True).numpy(),
    attrs={"mode": "linear",
           "coordinate_transformation_mode": "align_corners"}, atol=1e-5)
# cubic with non-default cubic coefficient (torch uses a=-0.75)
add("rz_cubic_a075", "Resize",
    {"x": _RX, "roi": _E, "s": np.asarray([1, 1, 2, 2], np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="bicubic",
                                    align_corners=False).numpy(),
    attrs={"mode": "cubic", "cubic_coeff_a": -0.75}, rtol=1e-3, atol=1e-4)
# sizes + linear downscale
add("rz_sizes_linear", "Resize",
    {"x": _RX, "roi": _E, "s": _E, "sz": np.asarray([1, 2, 2, 3], np.int64)},
    torch.nn.functional.interpolate(t(_RX), size=(2, 3),
                                    mode="bilinear").numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
# dynamic scales (a graph input, not foldable): exercises the
# graph-partition fallback end-to-end in "xla" mode
add("rz_dynamic_scales", "Resize",
    {"x": _RX, "roi": _E, "s_dyn": np.asarray([1, 1, 2, 2], np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="nearest").numpy(),
    attrs={"mode": "nearest", "coordinate_transformation_mode": "asymmetric",
           "nearest_mode": "floor"})

# ---------------------------------------------------------------------------
# older-opset attribute forms
# ---------------------------------------------------------------------------
_SX = rng.standard_normal((1, 3, 1, 5)).astype(np.float32)
add("squeeze_attr_form", "Squeeze", {"x": _SX},
    _SX.squeeze(2), attrs={"axes": [2]}, opset=11)
add("squeeze_attr_multi", "Squeeze", {"x": _SX},
    _SX.squeeze(2).squeeze(0), attrs={"axes": [0, 2]}, opset=11)
add("unsqueeze_attr_form", "Unsqueeze", {"x": _SX.squeeze()},
    _SX.squeeze()[None, :, None], attrs={"axes": [0, 2]}, opset=11)
_SL = rng.standard_normal((4, 6)).astype(np.float32)
add("slice_attr_form", "Slice", {"x": _SL}, _SL[1:3, 2:5],
    attrs={"starts": [1, 2], "ends": [3, 5]}, opset=9)
add("slice_attr_axes", "Slice", {"x": _SL}, _SL[:, 1:4],
    attrs={"starts": [1], "ends": [4], "axes": [1]}, opset=9)
add("pad_attr_form", "Pad", {"x": _SL},
    np.pad(_SL, [(1, 0), (0, 2)], constant_values=1.5),
    attrs={"pads": [1, 0, 0, 2], "value": 1.5}, opset=2)
_SPL = rng.standard_normal((6, 4)).astype(np.float32)
add("split_attr_form", "Split", {"x": _SPL},
    [_SPL[:2], _SPL[2:6]], attrs={"split": [2, 4], "axis": 0}, opset=11)

# ---------------------------------------------------------------------------
# generator / shape-op variants
# ---------------------------------------------------------------------------
_TR = rng.standard_normal((4, 4)).astype(np.float32)
add("trilu_upper_kneg", "Trilu",
    {"x": _TR, "k": np.asarray(-1, np.int64)}, np.triu(_TR, -1))
add("trilu_lower_kpos", "Trilu",
    {"x": _TR, "k": np.asarray(1, np.int64)}, np.tril(_TR, 1),
    attrs={"upper": 0})
add("trilu_batched", "Trilu",
    {"x": np.stack([_TR, _TR * 2])}, np.stack([np.triu(_TR), np.triu(_TR * 2)]))
add("eyelike_k1", "EyeLike", {"x": np.zeros((3, 5), np.float32)},
    np.eye(3, 5, k=1, dtype=np.float32), attrs={"k": 1})
add("eyelike_i64", "EyeLike", {"x": np.zeros((4, 4), np.int64)},
    np.eye(4, dtype=np.int64))
add("range_negative_step", "Range",
    {"start": np.asarray(10.0, np.float32), "lim": np.asarray(2.0, np.float32),
     "delta": np.asarray(-2.5, np.float32)},
    np.arange(10.0, 2.0, -2.5, dtype=np.float32))
add("range_i32", "Range",
    {"start": np.asarray(-3, np.int32), "lim": np.asarray(9, np.int32),
     "delta": np.asarray(3, np.int32)},
    np.arange(-3, 9, 3, dtype=np.int32))
_OHI = np.asarray([[1, 4], [0, 2]], dtype=np.int64)
add("onehot_axis0", "OneHot",
    {"i": _OHI, "depth": np.asarray(5, np.int64),
     "vals": np.asarray([0.0, 1.0], np.float32)},
    np.moveaxis(np.eye(5, dtype=np.float32)[_OHI], -1, 0),
    attrs={"axis": 0})
_OHI2 = np.asarray([[1, 2], [0, 2]], dtype=np.int64)
add("onehot_offvals", "OneHot",
    {"i": _OHI2, "depth": np.asarray(3, np.int64),
     "vals": np.asarray([2.0, 7.0], np.float32)},
    # output dtype follows `vals` (f32); python-float where() gives f64
    np.where(np.eye(3, dtype=np.float32)[_OHI2] > 0, 7.0, 2.0)
    .astype(np.float32))
# negative indices in OneHot count from depth
_OHN = np.asarray([-1, 1, -3], dtype=np.int64)
_ohn = np.zeros((3, 4), np.float32)
_ohn[0, 3] = _ohn[1, 1] = _ohn[2, 1] = 1.0
add("onehot_negative", "OneHot",
    {"i": _OHN, "depth": np.asarray(4, np.int64),
     "vals": np.asarray([0.0, 1.0], np.float32)}, _ohn)
_D2S = rng.standard_normal((1, 8, 2, 3)).astype(np.float32)
add("depthtospace_crd", "DepthToSpace", {"x": _D2S},
    _D2S.reshape(1, 2, 2, 2, 2, 3).transpose(0, 1, 4, 2, 5, 3)
    .reshape(1, 2, 4, 6), attrs={"blocksize": 2, "mode": "CRD"})
_S2D = rng.standard_normal((1, 2, 6, 9)).astype(np.float32)
add("spacetodepth_b3", "SpaceToDepth", {"x": _S2D},
    _S2D.reshape(1, 2, 2, 3, 3, 3).transpose(0, 3, 5, 1, 2, 4)
    .reshape(1, 18, 2, 3), attrs={"blocksize": 3})
_TLX = rng.standard_normal((2, 3)).astype(np.float32)
add("tile_2d", "Tile", {"x": _TLX, "reps": np.asarray([2, 3], np.int64)},
    np.tile(_TLX, (2, 3)))
add("expand_to_larger_rank", "Expand",
    {"x": _TLX, "shape": np.asarray([4, 2, 3], np.int64)},
    np.broadcast_to(_TLX, (4, 2, 3)).copy())

# ---------------------------------------------------------------------------
# einsum forms
# ---------------------------------------------------------------------------
_EA = rng.standard_normal((3, 4)).astype(np.float32)
_EB = rng.standard_normal((4, 5)).astype(np.float32)
_EC = rng.standard_normal((2, 3, 4)).astype(np.float32)
add("einsum_transpose", "Einsum", {"a": _EA}, _EA.T,
    attrs={"equation": "ij->ji"})
add("einsum_outer", "Einsum",
    {"a": _EA[0], "b": _EB[:, 0]}, np.outer(_EA[0], _EB[:, 0]),
    attrs={"equation": "i,j->ij"}, atol=1e-6)
add("einsum_reduce_axis", "Einsum", {"a": _EC}, _EC.sum(axis=1),
    attrs={"equation": "bij->bj"}, atol=1e-5)
add("einsum_bmm_transposed", "Einsum",
    {"a": _EC, "b": rng.standard_normal((2, 5, 4)).astype(np.float32)}, None,
    attrs={"equation": "bij,bkj->bik"}, atol=1e-5)
CASES[-1].expected = [np.einsum("bij,bkj->bik", _EC, CASES[-1].inputs["b"])]
add("einsum_ellipsis", "Einsum", {"a": _EC, "b": _EB}, None,
    attrs={"equation": "...j,jk->...k"}, atol=1e-5)
CASES[-1].expected = [np.einsum("...j,jk->...k", _EC, _EB)]
add("einsum_diag_sum", "Einsum", {"a": _TR}, np.trace(_TR),
    attrs={"equation": "ii->"}, atol=1e-6)

# ---------------------------------------------------------------------------
# gemm / matmul edge forms
# ---------------------------------------------------------------------------
_GA = rng.standard_normal((3, 4)).astype(np.float32)
_GB = rng.standard_normal((4, 5)).astype(np.float32)
_GC = rng.standard_normal((3, 5)).astype(np.float32)
add("gemm_both_trans", "Gemm",
    {"a": _GA.T.copy(), "b": _GB.T.copy(), "c": _GC},
    _GA @ _GB + _GC, attrs={"transA": 1, "transB": 1}, atol=1e-5)
add("gemm_beta0", "Gemm", {"a": _GA, "b": _GB, "c": _GC},
    _GA @ _GB, attrs={"beta": 0.0}, atol=1e-5)
add("gemm_scalar_c", "Gemm",
    {"a": _GA, "b": _GB, "c": np.asarray(0.5, np.float32)},
    _GA @ _GB + 0.5, atol=1e-5)
add("matmul_4d_bcast", "MatMul",
    {"a": rng.standard_normal((2, 1, 3, 4)).astype(np.float32),
     "b": rng.standard_normal((1, 5, 4, 2)).astype(np.float32)}, None,
    atol=1e-5)
CASES[-1].expected = [CASES[-1].inputs["a"] @ CASES[-1].inputs["b"]]

# softmax / logsoftmax axis matrix
_SMX = rng.standard_normal((2, 3, 4)).astype(np.float32)
for ax in (0, 1, 2, -2):
    add(f"softmax3d_ax{ax}", "Softmax", {"x": _SMX},
        torch.softmax(t(_SMX), ax).numpy(), attrs={"axis": ax}, atol=1e-6)
    add(f"logsoftmax3d_ax{ax}", "LogSoftmax", {"x": _SMX},
        torch.log_softmax(t(_SMX), ax).numpy(), attrs={"axis": ax},
        atol=1e-5)
add("softmax_f64", "Softmax", {"x": _SMX.astype(np.float64)},
    torch.softmax(t(_SMX.astype(np.float64)), -1).numpy(), atol=1e-12)

# dropout with ratio input (inference) + mask output
add("dropout_ratio_input", "Dropout",
    {"x": _SMX, "ratio": np.asarray(0.5, np.float32),
     "training": np.asarray(False)}, _SMX)

# IsInf / IsNaN over f64 and f16
_SPEC = np.asarray([1.0, np.inf, -np.inf, np.nan, 0.0])
add("isnan_f64", "IsNaN", {"x": _SPEC}, np.isnan(_SPEC))
add("isinf_f64", "IsInf", {"x": _SPEC}, np.isinf(_SPEC))
add("isnan_f16", "IsNaN", {"x": _SPEC.astype(np.float16)},
    np.isnan(_SPEC.astype(np.float16)))
add("isinf_neg_only", "IsInf", {"x": _SPEC},
    np.asarray([False, False, True, False, False]),
    attrs={"detect_positive": 0})
