"""Final official-name conformance batch: conv (incl auto_pad SAME),
slice, transpose permutations, unsqueeze, scatter_elements, topk,
gather(+elements/nd), onehot, eyelike, equal (incl STRING),
greater/less_equal expanded twins, batchnorm (incl training),
group_normalization, einsum, constantofshape, broadcast and/or/xor,
the small activations (+_expanded/_ver18 twins), bitwise and/or/xor,
gru/lstm (incl batchwise layout + peepholes), and the pooling trio
(maxpool incl argmax + SAME pads, averagepool incl
count_include_pad/dilations, lppool).

Oracles: torch for pooling/conv/rnn; numpy formulas elsewhere."""

from __future__ import annotations

import numpy as np
import torch

from .harness import Case

CASES = []
_rng = np.random.default_rng(23)


def add(name, op, inputs, expected, init=(), oracle_only=False, opset=23,
        atol=1e-5, **attrs):
    CASES.append(Case(name, op, inputs, expected, attrs=attrs,
                      initializer_names=init, oracle_only=oracle_only,
                      opset=opset, atol=atol))


def clone(name, twins=("_expanded",)):
    src = next(c for c in CASES if c.name == name)
    for t in twins:
        CASES.append(Case(src.name + t, src.op_type, src.inputs,
                          src.expected, attrs=src.attrs,
                          initializer_names=src.initializer_names,
                          oracle_only=src.oracle_only, opset=src.opset,
                          atol=src.atol))


# --- Conv ---------------------------------------------------------------------


def _conv(name, x, w, pads=None, strides=None, auto_pad=None):
    t_pad = 0
    xt = torch.tensor(x)
    if pads is not None:
        xt = torch.nn.functional.pad(
            xt, (pads[1], pads[3], pads[0], pads[2]))
    elif auto_pad == "SAME_UPPER":
        # emulate: total pad to keep out=ceil(in/s)
        k = w.shape[2]
        s = (strides or [1, 1])[0]
        o = -(-x.shape[2] // s)
        tot = max((o - 1) * s + k - x.shape[2], 0)
        xt = torch.nn.functional.pad(
            xt, (tot // 2, tot - tot // 2, tot // 2, tot - tot // 2))
    y = torch.nn.functional.conv2d(
        xt, torch.tensor(w), stride=tuple(strides or (1, 1))).numpy()
    attrs = {"kernel_shape": list(w.shape[2:])}
    if pads is not None:
        attrs["pads"] = pads
    if strides is not None:
        attrs["strides"] = strides
    if auto_pad:
        attrs["auto_pad"] = auto_pad
    add(name, "Conv", {"x": x, "w": w}, [y], **attrs)


_CVX = _rng.standard_normal((1, 1, 5, 5)).astype(np.float32)
_CVW = _rng.standard_normal((1, 1, 3, 3)).astype(np.float32)
_CVX7 = _rng.standard_normal((1, 1, 7, 5)).astype(np.float32)
_conv("basic_conv_with_padding", _CVX, _CVW, pads=[1, 1, 1, 1])
_conv("basic_conv_without_padding", _CVX, _CVW)
_conv("conv_with_autopad_same", _CVX, _CVW, strides=[2, 2],
      auto_pad="SAME_UPPER")
_conv("conv_with_strides_padding", _CVX7, _CVW, pads=[1, 1, 1, 1],
      strides=[2, 2])
_conv("conv_with_strides_no_padding", _CVX7, _CVW, strides=[2, 2])
add("conv_with_strides_and_asymmetric_padding", "Conv",
    {"x": _CVX7, "w": _CVW},
    [torch.nn.functional.conv2d(
        torch.nn.functional.pad(torch.tensor(_CVX7), (0, 0, 1, 1)),
        torch.tensor(_CVW), stride=(2, 2)).numpy()],
    kernel_shape=[3, 3], pads=[1, 0, 1, 0], strides=[2, 2])

# --- Slice ---------------------------------------------------------------------

_SLX = _rng.standard_normal((20, 10, 5)).astype(np.float32)


def _slice(name, x, starts, ends, axes=None, steps=None):
    inputs = {"x": x, "starts": np.asarray(starts, np.int64),
              "ends": np.asarray(ends, np.int64)}
    init = ["starts", "ends"]
    if axes is not None:
        inputs["axes"] = np.asarray(axes, np.int64)
        init.append("axes")
    if steps is not None:
        inputs["steps"] = np.asarray(steps, np.int64)
        init.append("steps")
    sl = [slice(None)] * x.ndim
    for i in range(len(starts)):
        a = axes[i] if axes is not None else i
        sl[a] = slice(starts[i], ends[i],
                      steps[i] if steps is not None else None)
    add(name, "Slice", inputs, [x[tuple(sl)]], init=tuple(init))


_slice("slice", _SLX, [0, 0], [3, 10], axes=[0, 1], steps=[1, 1])
_slice("slice_default_axes", _SLX, [0, 0, 3], [20, 10, 4])
_slice("slice_default_steps", _SLX, [0, 0, 3], [20, 10, 4],
       axes=[0, 1, 2])
_slice("slice_neg", _SLX, [0], [-1], axes=[1])
_slice("slice_neg_steps", _SLX, [20, 10, 4], [0, 0, 1],
       axes=[0, 1, 2], steps=[-1, -3, -2])
_slice("slice_negative_axes", _SLX, [0, 0, 3], [20, 10, 4],
       axes=[0, -2, -1])
_slice("slice_start_out_of_bounds", _SLX, [1000], [1000], axes=[1])
_slice("slice_end_out_of_bounds", _SLX, [1], [1000], axes=[1])

# --- Transpose permutations -------------------------------------------------------

_TRX = _rng.standard_normal((2, 3, 4)).astype(np.float32)
import itertools as _it

for i, perm in enumerate(_it.permutations((0, 1, 2))):
    add(f"transpose_all_permutations_{i}", "Transpose", {"x": _TRX},
        [np.transpose(_TRX, perm)], perm=list(perm))
add("transpose_default", "Transpose", {"x": _TRX}, [_TRX.T])

# --- Unsqueeze ---------------------------------------------------------------------

_UQX = _rng.standard_normal((3, 4, 5)).astype(np.float32)


def _unsq(name, axes):
    y = _UQX
    rank = _UQX.ndim + len(axes)
    norm = sorted(a % rank for a in axes)
    for a in norm:
        y = np.expand_dims(y, a)
    add(name, "Unsqueeze", {"x": _UQX, "axes": np.asarray(axes, np.int64)},
        [y], init=("axes",))


_unsq("unsqueeze_axis_0", [0])
_unsq("unsqueeze_axis_1", [1])
_unsq("unsqueeze_axis_2", [2])
_unsq("unsqueeze_negative_axes", [-2])
_unsq("unsqueeze_two_axes", [1, 4])
_unsq("unsqueeze_three_axes", [2, 4, 5])
_unsq("unsqueeze_unsorted_axes", [5, 4, 2])

# --- ScatterElements ----------------------------------------------------------------


def _scatter_ref(data, idx, upd, axis=0, reduction="none"):
    out = data.copy()
    for pos in np.ndindex(idx.shape):
        tgt = list(pos)
        tgt[axis] = idx[pos] % data.shape[axis]
        tgt = tuple(tgt)
        if reduction == "none":
            out[tgt] = upd[pos]
        elif reduction == "add":
            out[tgt] += upd[pos]
        elif reduction == "max":
            out[tgt] = max(out[tgt], upd[pos])
        elif reduction == "min":
            out[tgt] = min(out[tgt], upd[pos])
    return out


_SCD = np.zeros((3, 3), np.float32)
_SCI = np.array([[1, 0, 2], [0, 2, 1]], np.int64)
_SCU = np.array([[1.0, 1.1, 1.2], [2.0, 2.1, 2.2]], np.float32)
add("scatter_elements_without_axis", "ScatterElements",
    {"data": _SCD, "idx": _SCI, "upd": _SCU},
    [_scatter_ref(_SCD, _SCI, _SCU)])
_SCD1 = np.array([[1.0, 2, 3, 4, 5]], np.float32)
_SCI1 = np.array([[1, 3]], np.int64)
_SCU1 = np.array([[1.1, 2.1]], np.float32)
add("scatter_elements_with_axis", "ScatterElements",
    {"data": _SCD1, "idx": _SCI1, "upd": _SCU1},
    [_scatter_ref(_SCD1, _SCI1, _SCU1, axis=1)], axis=1)
add("scatter_elements_with_negative_indices", "ScatterElements",
    {"data": _SCD1, "idx": np.array([[1, -3]], np.int64), "upd": _SCU1},
    [_scatter_ref(_SCD1, np.array([[1, -3]], np.int64), _SCU1, axis=1)],
    axis=1)
_SCID = np.array([[1, 1]], np.int64)
add("scatter_elements_with_duplicate_indices", "ScatterElements",
    {"data": _SCD1, "idx": _SCID, "upd": _SCU1},
    [_scatter_ref(_SCD1, _SCID, _SCU1, axis=1, reduction="add")],
    axis=1, reduction="add")
add("scatter_elements_with_reduction_max", "ScatterElements",
    {"data": _SCD1, "idx": _SCID, "upd": _SCU1},
    [_scatter_ref(_SCD1, _SCID, _SCU1, axis=1, reduction="max")],
    axis=1, reduction="max")
add("scatter_elements_with_reduction_min", "ScatterElements",
    {"data": _SCD1, "idx": _SCID, "upd": _SCU1},
    [_scatter_ref(_SCD1, _SCID, _SCU1, axis=1, reduction="min")],
    axis=1, reduction="min")

# --- TopK ----------------------------------------------------------------------------


def _topk(name, x, k, axis=-1, largest=1, dtype=np.float32):
    xt = torch.tensor(x.astype(np.float64))
    v, i = torch.topk(xt, k, dim=axis, largest=bool(largest), sorted=True)
    add(name, "TopK", {"x": x, "k": np.asarray([k], np.int64)},
        [v.numpy().astype(x.dtype), i.numpy().astype(np.int64)],
        init=("k",), axis=axis, largest=largest)


_TKX = np.array([[0, 1, 2, 3], [4, 5, 6, 7], [11, 10, 9, 8]], np.float32)
_topk("top_k", _TKX, 3)
_topk("top_k_negative_axis", _TKX, 3, axis=-1)
_topk("top_k_smallest", _TKX, 3, largest=0)
_topk("top_k_uint64", _TKX.astype(np.uint64), 3)
# ties: stable smallest-index-first per ONNX
_TKS = np.array([0., 1., 1., 2.], np.float32)
add("top_k_same_values", "TopK",
    {"x": _TKS, "k": np.asarray([3], np.int64)},
    [np.array([2., 1., 1.], np.float32), np.array([3, 1, 2], np.int64)],
    init=("k",), largest=1)
add("top_k_same_values_largest", "TopK",
    {"x": _TKS, "k": np.asarray([3], np.int64)},
    [np.array([2., 1., 1.], np.float32), np.array([3, 1, 2], np.int64)],
    init=("k",), largest=1)
_TKS2 = np.array([[1., 1., 2.], [3., 3., 2.]], np.float32)
add("top_k_same_values_2d", "TopK",
    {"x": _TKS2, "k": np.asarray([2], np.int64)},
    [np.array([[2., 1.], [3., 3.]], np.float32),
     np.array([[2, 0], [0, 1]], np.int64)], init=("k",), largest=1)

# --- Gather family ---------------------------------------------------------------------

_GTX = _rng.standard_normal((5, 4, 3)).astype(np.float32)
add("gather_0", "Gather",
    {"x": _GTX, "i": np.array([0, 1, 3], np.int64)},
    [np.take(_GTX, [0, 1, 3], axis=0)], axis=0)
add("gather_1", "Gather",
    {"x": _GTX, "i": np.array([0, 1, 3], np.int64)},
    [np.take(_GTX, [0, 1, 3], axis=1)], axis=1)
add("gather_2d_indices", "Gather",
    {"x": _GTX, "i": np.array([[0, 2]], np.int64)},
    [np.take(_GTX, np.array([[0, 2]]), axis=1)], axis=1)
add("gather_negative_indices", "Gather",
    {"x": _GTX, "i": np.array([0, -1, -2], np.int64)},
    [np.take(_GTX, [0, -1, -2], axis=0)], axis=0)

_GEX = np.array([[1, 2], [3, 4]], np.float32)
add("gather_elements_0", "GatherElements",
    {"x": _GEX, "i": np.array([[0, 0], [1, 0]], np.int64)},
    [np.take_along_axis(_GEX, np.array([[0, 0], [1, 0]]), 1)], axis=1)
add("gather_elements_1", "GatherElements",
    {"x": _GEX, "i": np.array([[0, 0], [1, 0]], np.int64)},
    [np.take_along_axis(_GEX, np.array([[0, 0], [1, 0]]), 0)], axis=0)
add("gather_elements_negative_indices", "GatherElements",
    {"x": _GEX, "i": np.array([[-1, -2], [-2, -1]], np.int64)},
    [np.take_along_axis(_GEX, np.array([[1, 0], [0, 1]]), 0)], axis=0)

add("gathernd_example_float32", "GatherND",
    {"x": np.array([[[0., 1.], [2., 3.]], [[4., 5.], [6., 7.]]],
                   np.float32),
     "i": np.array([[[0, 1]], [[1, 0]]], np.int64)},
    [np.array([[[2., 3.]], [[4., 5.]]], np.float32)])
add("gathernd_example_int32", "GatherND",
    {"x": np.array([[0, 1], [2, 3]], np.int32),
     "i": np.array([[0, 0], [1, 1]], np.int64)},
    [np.array([0, 3], np.int32)])
add("gathernd_example_int32_batch_dim1", "GatherND",
    {"x": np.array([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], np.int32),
     "i": np.array([[1], [0]], np.int64)},
    [np.array([[2, 3], [4, 5]], np.int32)], batch_dims=1)

# --- OneHot / EyeLike -------------------------------------------------------------------


def _onehot_ref(indices, depth, values, axis=-1):
    on, off = values[1], values[0]
    rank = indices.ndim + 1
    ax = axis % rank
    shape = list(indices.shape)
    shape.insert(ax, depth)
    out = np.full(shape, off, dtype=np.asarray(values).dtype)
    for pos in np.ndindex(indices.shape):
        i = int(indices[pos])
        if i < 0:
            i += depth
        if 0 <= i < depth:
            tgt = list(pos)
            tgt.insert(ax, i)
            out[tuple(tgt)] = on
    return out


_OHI = np.array([[1, 9], [2, 4]], np.float32)
_OHV = np.array([1.0, 3.0], np.float32)
add("onehot_without_axis", "OneHot",
    {"i": np.array([5, -2, 3], np.int64), "d": np.float32(10),
     "v": _OHV},
    [_onehot_ref(np.array([5, -2, 3]), 10, _OHV)], init=("d", "v"))
add("onehot_with_axis", "OneHot",
    {"i": _OHI, "d": np.float32(10), "v": _OHV},
    [_onehot_ref(_OHI, 10, _OHV, axis=1)], init=("d", "v"), axis=1)
add("onehot_with_negative_axis", "OneHot",
    {"i": _OHI, "d": np.float32(10), "v": _OHV},
    [_onehot_ref(_OHI, 10, _OHV, axis=-2)], init=("d", "v"), axis=-2)
add("onehot_negative_indices", "OneHot",
    {"i": np.array([0, -7, -8], np.int64), "d": np.float32(10),
     "v": _OHV},
    [_onehot_ref(np.array([0, -7, -8]), 10, _OHV)], init=("d", "v"))

_EYX = _rng.integers(0, 100, (4, 5)).astype(np.int32)
add("eyelike_without_dtype", "EyeLike", {"x": _EYX},
    [np.eye(4, 5, dtype=np.int32)])
add("eyelike_with_dtype", "EyeLike",
    {"x": _EYX.astype(np.int64)}, [np.eye(4, 5, dtype=np.float64)],
    dtype=11)
add("eyelike_populate_off_main_diagonal", "EyeLike", {"x": _EYX},
    [np.eye(4, 5, k=1, dtype=np.int32)], k=1)

# --- Equal (incl STRING) / GreaterOrEqual expanded ---------------------------------------

_EQA = _rng.integers(0, 3, (3, 4, 5)).astype(np.int32)
_EQB = _rng.integers(0, 3, (5,)).astype(np.int32)
add("equal_bcast", "Equal", {"a": _EQA, "b": _EQB}, [_EQA == _EQB])
_EQS = np.asarray(["hello", "world", "x"], dtype=object)
_EQS2 = np.asarray(["hello", "foo", "x"], dtype=object)
add("equal_string", "Equal", {"a": _EQS, "b": _EQS2},
    [np.array([True, False, True])], oracle_only=False)
add("equal_string_broadcast", "Equal",
    {"a": _EQS, "b": np.asarray(["hello"], dtype=object)},
    [np.array([True, False, False])], oracle_only=False)

_GEA = _rng.standard_normal((3, 4, 5)).astype(np.float32)
_GEB = _rng.standard_normal((5,)).astype(np.float32)
add("greater_equal", "GreaterOrEqual", {"a": _GEA, "b": _GEA.copy()},
    [_GEA >= _GEA])
clone("greater_equal")
add("greater_equal_bcast", "GreaterOrEqual", {"a": _GEA, "b": _GEB},
    [_GEA >= _GEB])
clone("greater_equal_bcast")
add("less_equal", "LessOrEqual", {"a": _GEA, "b": _GEA.copy()},
    [_GEA <= _GEA])
clone("less_equal")
add("less_equal_bcast", "LessOrEqual", {"a": _GEA, "b": _GEB},
    [_GEA <= _GEB])
clone("less_equal_bcast")

# --- BatchNorm / GroupNorm ----------------------------------------------------------------

_BNX = _rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
_BNS = _rng.standard_normal(3).astype(np.float32) + 1
_BNB = _rng.standard_normal(3).astype(np.float32)
_BNM = _rng.standard_normal(3).astype(np.float32)
_BNV = (_rng.random(3).astype(np.float32) + 0.5)


def _bn_ref(x, s, b, m, v, eps=1e-5, training=False, momentum=0.9):
    if training:
        axes = (0, 2, 3)
        cm = x.mean(axes)
        cv = x.var(axes)
        y = ((x - cm[None, :, None, None])
             / np.sqrt(cv[None, :, None, None] + eps)
             * s[None, :, None, None] + b[None, :, None, None])
        rm = m * momentum + cm * (1 - momentum)
        rv = v * momentum + cv * (1 - momentum)
        return y.astype(np.float32), rm, rv
    y = ((x - m[None, :, None, None])
         / np.sqrt(v[None, :, None, None] + eps)
         * s[None, :, None, None] + b[None, :, None, None])
    return (y.astype(np.float32),)


add("batchnorm_example", "BatchNormalization",
    {"x": _BNX, "s": _BNS, "b": _BNB, "m": _BNM, "v": _BNV},
    list(_bn_ref(_BNX, _BNS, _BNB, _BNM, _BNV)), atol=1e-4)
add("batchnorm_epsilon", "BatchNormalization",
    {"x": _BNX, "s": _BNS, "b": _BNB, "m": _BNM, "v": _BNV},
    list(_bn_ref(_BNX, _BNS, _BNB, _BNM, _BNV, eps=1e-2)), atol=1e-4,
    epsilon=1e-2)
add("batchnorm_example_training_mode", "BatchNormalization",
    {"x": _BNX, "s": _BNS, "b": _BNB, "m": _BNM, "v": _BNV},
    list(_bn_ref(_BNX, _BNS, _BNB, _BNM, _BNV, training=True)),
    atol=1e-4, training_mode=1)
add("batchnorm_epsilon_training_mode", "BatchNormalization",
    {"x": _BNX, "s": _BNS, "b": _BNB, "m": _BNM, "v": _BNV},
    list(_bn_ref(_BNX, _BNS, _BNB, _BNM, _BNV, eps=1e-2, training=True)),
    atol=1e-4, epsilon=1e-2, training_mode=1)

_GNX = _rng.standard_normal((3, 4, 2, 2)).astype(np.float32)
_GNS = _rng.standard_normal(4).astype(np.float32) + 1
_GNB = _rng.standard_normal(4).astype(np.float32)


def _gn_ref(x, s, b, groups, eps):
    N, C = x.shape[:2]
    xg = x.reshape(N, groups, -1)
    m = xg.mean(-1, keepdims=True)
    v = xg.var(-1, keepdims=True)
    y = ((xg - m) / np.sqrt(v + eps)).reshape(x.shape)
    return (y * s[None, :, None, None]
            + b[None, :, None, None]).astype(np.float32)


add("group_normalization_example", "GroupNormalization",
    {"x": _GNX, "s": _GNS, "b": _GNB},
    [_gn_ref(_GNX, _GNS, _GNB, 2, 1e-5)], num_groups=2, atol=1e-4)
clone("group_normalization_example")
add("group_normalization_epsilon", "GroupNormalization",
    {"x": _GNX, "s": _GNS, "b": _GNB},
    [_gn_ref(_GNX, _GNS, _GNB, 2, 1e-2)], num_groups=2, epsilon=1e-2,
    atol=1e-4)
clone("group_normalization_epsilon")

# --- Einsum / ConstantOfShape ----------------------------------------------------------------

_EIA = _rng.standard_normal((3, 5, 5)).astype(np.float32)
add("einsum_batch_diagonal", "Einsum", {"a": _EIA},
    [np.einsum("...ii->...i", _EIA)], equation="...ii ->...i")
_EIB1 = _rng.standard_normal((5, 2, 3)).astype(np.float32)
_EIB2 = _rng.standard_normal((5, 3, 4)).astype(np.float32)
add("einsum_batch_matmul", "Einsum", {"a": _EIB1, "b": _EIB2},
    [np.einsum("bij,bjk->bik", _EIB1, _EIB2)], equation="bij,bjk->bik")
_EIV = _rng.standard_normal(5).astype(np.float32)
add("einsum_inner_prod", "Einsum", {"a": _EIV, "b": _EIV.copy()},
    [np.einsum("i,i", _EIV, _EIV)[None][0].reshape(())],
    equation="i,i")

add("constantofshape_float_ones", "ConstantOfShape",
    {"shape": np.array([4, 3, 2], np.int64)},
    [np.ones((4, 3, 2), np.float32)], init=("shape",),
    value=np.ones(1, np.float32))
add("constantofshape_int_zeros", "ConstantOfShape",
    {"shape": np.array([10, 6], np.int64)},
    [np.zeros((10, 6), np.int32)], init=("shape",),
    value=np.zeros(1, np.int32))
add("constantofshape_int_shape_zero", "ConstantOfShape",
    {"shape": np.array([0], np.int64)},
    [np.zeros((0,), np.int32)], init=("shape",),
    value=np.zeros(1, np.int32))

# --- broadcast And/Or/Xor + Bitwise -----------------------------------------------------------

for opname, fn in (("and", np.logical_and), ("or", np.logical_or),
                   ("xor", np.logical_xor)):
    op = "Xor" if opname == "xor" else opname.capitalize()
    for suffix, sa, sb in (("bcast3v1d", (3, 4, 5), (5,)),
                           ("bcast3v2d", (3, 4, 5), (4, 5)),
                           ("bcast4v2d", (2, 3, 4, 5), (4, 5)),
                           ("bcast4v3d", (2, 3, 4, 5), (3, 4, 5)),
                           ("bcast4v4d", (1, 3, 1, 5), (2, 1, 4, 5))):
        a = _rng.random(sa) > 0.5
        b = _rng.random(sb) > 0.5
        add(f"{opname}_{suffix}", op, {"a": a, "b": b}, [fn(a, b)])

for opname, fn in (("and", np.bitwise_and), ("or", np.bitwise_or),
                   ("xor", np.bitwise_xor)):
    op = "Bitwise" + ("Xor" if opname == "xor" else opname.capitalize())
    for suffix, ty, sa, sb in (
            ("i16_3d", np.int16, (3, 4, 5), (3, 4, 5)),
            ("i32_2d", np.int32, (3, 4), (3, 4)),
            ("ui64_bcast_3v1d", np.uint64, (3, 4, 5), (5,)),
            ("ui8_bcast_4v3d", np.uint8, (2, 3, 4, 5), (3, 4, 5))):
        a = _rng.integers(0, 100, sa).astype(ty)
        b = _rng.integers(0, 100, sb).astype(ty)
        add(f"bitwise_{opname}_{suffix}", op, {"a": a, "b": b},
            [fn(a, b)])

# --- small activations (+ expanded/ver18 twins) ------------------------------------------------

_ACT = _rng.standard_normal((3, 4, 5)).astype(np.float32) * 2
_A3 = np.array([-1.0, 0.0, 1.0], np.float32)


def _act(name, op, data, ref, twins, **attrs):
    add(name, op, {"x": data}, [ref.astype(np.float32)], **attrs)
    clone(name, twins)


_act("elu", "Elu", _ACT, np.where(_ACT > 0, _ACT, 2.0 * (np.exp(_ACT) - 1)),
     ("_expanded_ver18",), alpha=2.0)
_act("elu_default", "Elu", _ACT,
     np.where(_ACT > 0, _ACT, np.exp(_ACT) - 1), ("_expanded_ver18",))
_act("elu_example", "Elu", _A3,
     np.where(_A3 > 0, _A3, 2.0 * (np.exp(_A3) - 1)),
     ("_expanded_ver18",), alpha=2.0)
_act("leakyrelu", "LeakyRelu", _ACT, np.where(_ACT > 0, _ACT, 0.1 * _ACT),
     ("_expanded",), alpha=0.1)
_act("leakyrelu_default", "LeakyRelu", _ACT,
     np.where(_ACT > 0, _ACT, 0.01 * _ACT), ("_expanded",))
_act("leakyrelu_example", "LeakyRelu", _A3,
     np.where(_A3 > 0, _A3, 0.1 * _A3), ("_expanded",), alpha=0.1)
_SELU_A, _SELU_G = 2.0, 3.0
_act("selu", "Selu", _ACT,
     np.where(_ACT > 0, _SELU_G * _ACT,
              _SELU_G * (_SELU_A * np.exp(_ACT) - _SELU_A)),
     ("_expanded_ver18",), alpha=_SELU_A, gamma=_SELU_G)
_DA, _DG = 1.6732632423543772, 1.0507009873554805
_act("selu_default", "Selu", _ACT,
     np.where(_ACT > 0, _DG * _ACT, _DG * (_DA * np.exp(_ACT) - _DA)),
     ("_expanded_ver18",))
_act("selu_example", "Selu", _A3,
     np.where(_A3 > 0, _SELU_G * _A3,
              _SELU_G * (_SELU_A * np.exp(_A3) - _SELU_A)),
     ("_expanded_ver18",), alpha=_SELU_A, gamma=_SELU_G)
_act("thresholdedrelu", "ThresholdedRelu", _ACT,
     np.where(_ACT > 2.0, _ACT, 0.0), ("_expanded_ver18",), alpha=2.0)
_act("thresholdedrelu_default", "ThresholdedRelu", _ACT,
     np.where(_ACT > 1.0, _ACT, 0.0), ("_expanded_ver18",))
_act("thresholdedrelu_example", "ThresholdedRelu",
     np.array([-1.5, 0., 1.2, 2.0, 2.2], np.float32),
     np.where(np.array([-1.5, 0., 1.2, 2.0, 2.2]) > 2.0,
              np.array([-1.5, 0., 1.2, 2.0, 2.2]), 0.0),
     ("_expanded_ver18",), alpha=2.0)
_act("shrink_hard", "Shrink", _ACT,
     np.where(np.abs(_ACT) > 1.5, _ACT, 0.0), ("_expanded_ver18",),
     lambd=1.5)
_act("shrink_soft", "Shrink", _ACT,
     np.where(_ACT > 1.5, _ACT - 1.5,
              np.where(_ACT < -1.5, _ACT + 1.5, 0.0)),
     ("_expanded_ver18",), lambd=1.5, bias=1.5)
_act("hardsigmoid", "HardSigmoid", _ACT,
     np.clip(0.5 * _ACT + 0.6, 0, 1), ("_expanded_ver18",),
     alpha=0.5, beta=0.6)
_act("hardsigmoid_default", "HardSigmoid", _ACT,
     np.clip(0.2 * _ACT + 0.5, 0, 1), ("_expanded_ver18",))
_act("hardsigmoid_example", "HardSigmoid", _A3,
     np.clip(0.5 * _A3 + 0.6, 0, 1), ("_expanded_ver18",),
     alpha=0.5, beta=0.6)

# --- GRU / LSTM ----------------------------------------------------------------------------------


def _rnn_torch(kind, X, W, R, B=None, h0=None, c0=None, layout=0, P=None):
    """torch referee for forward single-direction GRU/LSTM with ONNX
    weight layouts. ONNX gate orders: GRU zrh -> torch rzn; LSTM iofc
    -> torch ifgo."""
    H = R.shape[2]
    if kind == "gru":
        z, r, h = np.split(W[0], 3, axis=0)
        w_ih = np.concatenate([r, z, h], axis=0)
        z, r, h = np.split(R[0], 3, axis=0)
        w_hh = np.concatenate([r, z, h], axis=0)
        if B is not None:
            wb, rb = B[0][:3 * H], B[0][3 * H:]
            z, r, h = np.split(wb, 3)
            b_ih = np.concatenate([r, z, h])
            z, r, h = np.split(rb, 3)
            b_hh = np.concatenate([r, z, h])
        m = torch.nn.GRU(W.shape[2], H)
    else:
        i, o, f, c = np.split(W[0], 4, axis=0)
        w_ih = np.concatenate([i, f, c, o], axis=0)
        i, o, f, c = np.split(R[0], 4, axis=0)
        w_hh = np.concatenate([i, f, c, o], axis=0)
        if B is not None:
            wb, rb = B[0][:4 * H], B[0][4 * H:]
            i, o, f, c = np.split(wb, 4)
            b_ih = np.concatenate([i, f, c, o])
            i, o, f, c = np.split(rb, 4)
            b_hh = np.concatenate([i, f, c, o])
        m = torch.nn.LSTM(W.shape[2], H)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.tensor(w_ih))
        m.weight_hh_l0.copy_(torch.tensor(w_hh))
        if B is not None:
            m.bias_ih_l0.copy_(torch.tensor(b_ih))
            m.bias_hh_l0.copy_(torch.tensor(b_hh))
        else:
            m.bias_ih_l0.zero_()
            m.bias_hh_l0.zero_()
    xs = torch.tensor(X)  # torch is seq-first; layout only remaps the
    # ONNX-side input/output tensors
    with torch.no_grad():
        if kind == "gru":
            y, hT = m(xs)
            outs = (y.numpy()[:, None], hT.numpy())
        else:
            y, (hT, cT) = m(xs)
            outs = (y.numpy()[:, None], hT.numpy(), cT.numpy())
    if layout:  # (S,nd=1,B,H) -> (B,S,nd,H); (nd,B,H) -> (B,nd,H)
        outs = tuple(np.swapaxes(o, 0, 2).swapaxes(1, 2) if o.ndim == 4
                     else np.swapaxes(o, 0, 1) for o in outs)
    return outs


_RS, _RB2, _RI, _RH2 = 4, 3, 2, 5
_RNX = _rng.standard_normal((_RS, _RB2, _RI)).astype(np.float32)
_GW = _rng.standard_normal((1, 3 * _RH2, _RI)).astype(np.float32) * 0.4
_GR = _rng.standard_normal((1, 3 * _RH2, _RH2)).astype(np.float32) * 0.4
_GB = _rng.standard_normal((1, 6 * _RH2)).astype(np.float32) * 0.4
_LW = _rng.standard_normal((1, 4 * _RH2, _RI)).astype(np.float32) * 0.4
_LR = _rng.standard_normal((1, 4 * _RH2, _RH2)).astype(np.float32) * 0.4
_LB = _rng.standard_normal((1, 8 * _RH2)).astype(np.float32) * 0.4

y, hT = _rnn_torch("gru", _RNX, _GW, _GR)
add("gru_defaults", "GRU", {"x": _RNX, "w": _GW, "r": _GR}, [y, hT],
    hidden_size=_RH2, atol=1e-4, linear_before_reset=1)
y, hT = _rnn_torch("gru", _RNX, _GW, _GR, _GB)
add("gru_with_initial_bias", "GRU",
    {"x": _RNX, "w": _GW, "r": _GR, "b": _GB}, [y, hT],
    hidden_size=_RH2, atol=1e-4, linear_before_reset=1)
y, hT = _rnn_torch("gru", _RNX, _GW, _GR, _GB)
add("gru_seq_length", "GRU",
    {"x": _RNX, "w": _GW, "r": _GR, "b": _GB,
     "lens": np.full(_RB2, _RS, np.int32)}, [y, hT],
    hidden_size=_RH2, atol=1e-4, linear_before_reset=1, init=("lens",))
y, hT = _rnn_torch("gru", _RNX, _GW, _GR, layout=1)
add("gru_batchwise", "GRU",
    {"x": np.swapaxes(_RNX, 0, 1).copy(), "w": _GW, "r": _GR}, [y, hT],
    hidden_size=_RH2, atol=1e-4, layout=1, linear_before_reset=1,
    oracle_only=False)

y, hT, cT = _rnn_torch("lstm", _RNX, _LW, _LR)
add("lstm_defaults", "LSTM", {"x": _RNX, "w": _LW, "r": _LR},
    [y, hT, cT], hidden_size=_RH2, atol=1e-4)
y, hT, cT = _rnn_torch("lstm", _RNX, _LW, _LR, _LB)
add("lstm_with_initial_bias", "LSTM",
    {"x": _RNX, "w": _LW, "r": _LR, "b": _LB}, [y, hT, cT],
    hidden_size=_RH2, atol=1e-4)
y, hT, cT = _rnn_torch("lstm", _RNX, _LW, _LR, layout=1)
add("lstm_batchwise", "LSTM",
    {"x": np.swapaxes(_RNX, 0, 1).copy(), "w": _LW, "r": _LR},
    [y, hT, cT], hidden_size=_RH2, atol=1e-4, layout=1,
    oracle_only=False)


def _lstm_peephole_ref(X, W, R, B, P):
    """Loop referee for LSTM with peepholes (iofc ONNX order)."""
    H = R.shape[2]
    S, Bn, _ = X.shape
    h = np.zeros((Bn, H), np.float64)
    c = np.zeros((Bn, H), np.float64)
    bias = B[0][:4 * H] + B[0][4 * H:]
    pi, po, pf = P[0][:H], P[0][H:2 * H], P[0][2 * H:]
    ys = []

    def sig(v):
        return 1 / (1 + np.exp(-v))

    for t in range(S):
        g = X[t] @ W[0].T + h @ R[0].T + bias
        i = sig(g[:, :H] + pi * c)
        f = sig(g[:, 2 * H:3 * H] + pf * c)
        cc = np.tanh(g[:, 3 * H:])
        c = f * c + i * cc
        o = sig(g[:, H:2 * H] + po * c)
        h = o * np.tanh(c)
        ys.append(h.copy())
    Y = np.stack(ys)[:, None].astype(np.float32)
    return Y, h[None].astype(np.float32), c[None].astype(np.float32)


_LP = _rng.standard_normal((1, 3 * _RH2)).astype(np.float32) * 0.4
y, hT, cT = _lstm_peephole_ref(_RNX.astype(np.float64), _LW, _LR, _LB,
                               _LP)
add("lstm_with_peepholes", "LSTM",
    {"x": _RNX, "w": _LW, "r": _LR, "b": _LB,
     "lens": np.full(_RB2, _RS, np.int32),
     "h0": np.zeros((1, _RB2, _RH2), np.float32),
     "c0": np.zeros((1, _RB2, _RH2), np.float32), "p": _LP},
    [y, hT, cT], hidden_size=_RH2, atol=1e-4, oracle_only=False,
    init=("lens",))

# --- pooling trio ---------------------------------------------------------------------------------


def _avgpool_ref(x, k, strides=None, pads=None, dil=None, ceil=0, cip=0,
                 auto_pad=None):
    """Loop avg-pool referee for the variants torch can't express
    (dilations, SAME, ceil last-window rules)."""
    import itertools as it

    nsp = x.ndim - 2
    k = list(k)
    s = strides or [1] * nsp
    d = dil or [1] * nsp
    if auto_pad:
        pb, pe = [], []
        for i in range(nsp):
            eff = (k[i] - 1) * d[i] + 1
            o = -(-x.shape[2 + i] // s[i])
            tot = max((o - 1) * s[i] + eff - x.shape[2 + i], 0)
            sm, bg = tot // 2, tot - tot // 2
            pb.append(sm if auto_pad == "SAME_UPPER" else bg)
            pe.append(bg if auto_pad == "SAME_UPPER" else sm)
    else:
        pads = pads or [0] * (2 * nsp)
        pb, pe = pads[:nsp], pads[nsp:]
    osp = []
    for i in range(nsp):
        eff = (k[i] - 1) * d[i] + 1
        num = x.shape[2 + i] + pb[i] + pe[i] - eff
        o = (-(-num // s[i]) if ceil else num // s[i]) + 1
        if ceil and (o - 1) * s[i] >= x.shape[2 + i] + pb[i]:
            o -= 1
        osp.append(o)
    N, C = x.shape[:2]
    out = np.zeros((N, C) + tuple(osp), np.float64)
    for n, c in it.product(range(N), range(C)):
        for opos in it.product(*[range(o) for o in osp]):
            vals = []
            cnt = 0
            for kpos in it.product(*[range(kk) for kk in k]):
                ip = [opos[i] * s[i] - pb[i] + kpos[i] * d[i]
                      for i in range(nsp)]
                inside = all(0 <= ip[i] < x.shape[2 + i]
                             for i in range(nsp))
                in_declared = all(-pb[i] <= ip[i] < x.shape[2 + i] + pe[i]
                                  for i in range(nsp))
                if inside:
                    vals.append(x[(n, c) + tuple(ip)])
                    cnt += 1
                elif cip and in_declared:
                    vals.append(0.0)
                    cnt += 1
            out[(n, c) + opos] = sum(vals) / max(cnt, 1)
    return out.astype(np.float32)


_APD = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)

def _mp(name, x, k, op="MaxPool", strides=None, pads=None, dilations=None,
        ceil=0, auto_pad=None, cip=0, p=None, oracle_only=False):
    xt = torch.tensor(x.astype(np.float64))
    nsp = x.ndim - 2
    t_pads = tuple((pads or [0] * (2 * nsp))[:nsp])
    attrs = {"kernel_shape": list(k)}
    if strides:
        attrs["strides"] = strides
    if pads:
        attrs["pads"] = pads
    if dilations:
        attrs["dilations"] = dilations
    if ceil:
        attrs["ceil_mode"] = 1
    if auto_pad:
        attrs["auto_pad"] = auto_pad
    if cip:
        attrs["count_include_pad"] = 1
    if p is not None:
        attrs["p"] = p
    # torch referee (symmetric small pads only; others manual-padded)
    sym = pads is None or (tuple(pads[:nsp]) == tuple(pads[nsp:])
                           and all(pads[i] <= k[i] // 2
                                   for i in range(nsp)))
    if auto_pad:
        # compute SAME pads by hand, then manual-pad (torch lacks SAME)
        s = strides or [1] * nsp
        d = dilations or [1] * nsp
        pb, pe = [], []
        for i in range(nsp):
            eff = (k[i] - 1) * d[i] + 1
            o = -(-x.shape[2 + i] // s[i])
            tot = max((o - 1) * s[i] + eff - x.shape[2 + i], 0)
            sm, bg = tot // 2, tot - tot // 2
            if auto_pad == "SAME_UPPER":
                pb.append(sm)
                pe.append(bg)
            else:
                pb.append(bg)
                pe.append(sm)
        pads_eff, sym = pb + pe, False
    else:
        pads_eff = pads
    if not sym and op == "MaxPool":
        padspec = []
        for i in reversed(range(nsp)):
            padspec += [pads_eff[i], pads_eff[nsp + i]]
        xt = torch.nn.functional.pad(xt, padspec, value=-np.inf)
        t_pads = 0
    fn = {1: torch.nn.functional.max_pool1d,
          2: torch.nn.functional.max_pool2d,
          3: torch.nn.functional.max_pool3d}[nsp] if op == "MaxPool" else \
        {1: torch.nn.functional.avg_pool1d,
         2: torch.nn.functional.avg_pool2d,
         3: torch.nn.functional.avg_pool3d}[nsp]
    # ONNX default stride is 1 (torch defaults to kernel_size)
    kw = dict(stride=tuple(strides or [1] * nsp),
              padding=t_pads, ceil_mode=bool(ceil))
    if op == "AveragePool":
        y = _avgpool_ref(x, k, strides=strides, pads=pads, dil=dilations,
                         ceil=ceil, cip=cip, auto_pad=auto_pad)
        add(name, op, {"x": x}, [y], oracle_only=oracle_only, **attrs)
        return
    if dilations:
        kw["dilation"] = tuple(dilations)
    y = fn(xt, tuple(k), **kw)
    add(name, op if p is None else "LpPool", {"x": x},
        [y.numpy().astype(np.float32)], oracle_only=oracle_only, **attrs)


_P1 = _rng.standard_normal((1, 3, 32)).astype(np.float32)
_P2 = _rng.standard_normal((1, 3, 9, 9)).astype(np.float32)
_P5 = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5) + 1
_P3 = _rng.standard_normal((1, 2, 6, 6, 6)).astype(np.float32)

_mp("maxpool_1d_default", _P1, [2])
_mp("maxpool_2d_default", _P2, [2, 2])
_mp("maxpool_2d_strides", _P2, [5, 5], strides=[3, 3])
_mp("maxpool_2d_pads", _P2, [3, 3], pads=[2, 2, 2, 2])
_mp("maxpool_2d_ceil", np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4),
    [3, 3], strides=[2, 2], ceil=1)
_mp("maxpool_2d_dilations", np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4),
    [2, 2], dilations=[2, 2])
_mp("maxpool_2d_precomputed_pads", _P5, [5, 5], pads=[2, 2, 2, 2])
_mp("maxpool_2d_precomputed_strides", _P5, [2, 2], strides=[2, 2])
_mp("maxpool_2d_precomputed_same_upper", _P5, [3, 3], strides=[2, 2],
    auto_pad="SAME_UPPER")
_mp("maxpool_2d_same_upper", _P2, [2, 2], auto_pad="SAME_UPPER")
_mp("maxpool_2d_same_lower", _P2, [2, 2], auto_pad="SAME_LOWER")
_mp("maxpool_3d_default", _P3, [2, 2, 2])
_mp("maxpool_3d_dilations", np.arange(64, dtype=np.float32).reshape(1, 1, 4, 4, 4),
    [2, 2, 2], dilations=[2, 2, 2])
_mp("maxpool_3d_dilations_use_ref_impl",
    np.arange(64, dtype=np.float32).reshape(1, 1, 4, 4, 4),
    [2, 2, 2], dilations=[2, 2, 2])
_mp("maxpool_3d_dilations_use_ref_impl_large", _P3, [3, 3, 3],
    strides=[2, 2, 2], dilations=[2, 2, 2], ceil=1)
_MPU = _rng.integers(0, 255, (1, 1, 5, 5)).astype(np.uint8)
add("maxpool_2d_uint8", "MaxPool", {"x": _MPU},
    [torch.nn.functional.max_pool2d(
        torch.tensor(_MPU.astype(np.float64)), (5, 5),
        stride=1, padding=2).numpy().astype(np.uint8)],
    kernel_shape=[5, 5], pads=[2, 2, 2, 2])

# maxpool with argmax: loop-derived indices referee
_mpa_x = _P5


def _argmax_pool_ref(x, k, strides, pads):
    import itertools as it

    N, C, H, W = x.shape
    kh, kw = k
    sh, sw = strides
    oh = (H + pads[0] + pads[2] - kh) // sh + 1
    ow = (W + pads[1] + pads[3] - kw) // sw + 1
    y = np.zeros((N, C, oh, ow), x.dtype)
    idx = np.zeros((N, C, oh, ow), np.int64)
    for n, c, i, j in it.product(range(N), range(C), range(oh),
                                 range(ow)):
        best, bi = None, 0
        for di, dj in it.product(range(kh), range(kw)):
            yy = i * sh - pads[0] + di
            xx = j * sw - pads[1] + dj
            if 0 <= yy < H and 0 <= xx < W:
                v = x[n, c, yy, xx]
                if best is None or v > best:
                    best, bi = v, (n * C + c) * H * W + yy * W + xx
        y[n, c, i, j] = best
        idx[n, c, i, j] = bi
    return y, idx


y, idx = _argmax_pool_ref(_mpa_x, (5, 5), (1, 1), (2, 2, 2, 2))
add("maxpool_with_argmax_2d_precomputed_pads", "MaxPool", {"x": _mpa_x},
    [y, idx], kernel_shape=[5, 5], pads=[2, 2, 2, 2], oracle_only=False)
y, idx = _argmax_pool_ref(_mpa_x, (2, 2), (2, 2), (0, 0, 0, 0))
add("maxpool_with_argmax_2d_precomputed_strides", "MaxPool",
    {"x": _mpa_x}, [y, idx], kernel_shape=[2, 2], strides=[2, 2],
    oracle_only=False)

_mp("averagepool_1d_default", _P1, [2], op="AveragePool")
_mp("averagepool_2d_default", _P2, [2, 2], op="AveragePool")
_mp("averagepool_2d_strides", _P2, [5, 5], strides=[3, 3],
    op="AveragePool")
_mp("averagepool_2d_pads", _P2, [3, 3], pads=[2, 2, 2, 2],
    op="AveragePool")
_mp("averagepool_2d_pads_count_include_pad", _P2, [3, 3],
    pads=[2, 2, 2, 2], cip=1, op="AveragePool")
_mp("averagepool_2d_precomputed_pads", _P5, [5, 5], pads=[2, 2, 2, 2],
    op="AveragePool")
_mp("averagepool_2d_precomputed_pads_count_include_pad", _P5, [5, 5],
    pads=[2, 2, 2, 2], cip=1, op="AveragePool")
_mp("averagepool_2d_precomputed_strides", _P5, [2, 2], strides=[2, 2],
    op="AveragePool")
_mp("averagepool_2d_ceil",
    np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4), [3, 3],
    strides=[2, 2], ceil=1, op="AveragePool")
_mp("averagepool_3d_default", _P3, [2, 2, 2], op="AveragePool")


add("averagepool_2d_dilations", "AveragePool", {"x": _APD},
    [_avgpool_ref(_APD, [2, 2], dil=[2, 2])], kernel_shape=[2, 2],
    dilations=[2, 2])
add("averagepool_2d_same_upper", "AveragePool", {"x": _P2},
    [_avgpool_ref(_P2, [2, 2], auto_pad="SAME_UPPER")],
    kernel_shape=[2, 2], auto_pad="SAME_UPPER")
add("averagepool_2d_same_lower", "AveragePool", {"x": _P2},
    [_avgpool_ref(_P2, [2, 2], auto_pad="SAME_LOWER")],
    kernel_shape=[2, 2], auto_pad="SAME_LOWER")
add("averagepool_2d_precomputed_same_upper", "AveragePool", {"x": _P5},
    [_avgpool_ref(_P5, [3, 3], strides=[2, 2], auto_pad="SAME_UPPER")],
    kernel_shape=[3, 3], strides=[2, 2], auto_pad="SAME_UPPER")
add("averagepool_2d_ceil_last_window_starts_on_pad", "AveragePool",
    {"x": _P2},
    [_avgpool_ref(_P2, [3, 3], strides=[3, 3], pads=[1, 1, 1, 1],
                  ceil=1)],
    kernel_shape=[3, 3], strides=[3, 3], pads=[1, 1, 1, 1], ceil_mode=1)
add("averagepool_3d_dilations_small", "AveragePool",
    {"x": np.arange(64, dtype=np.float32).reshape(1, 1, 4, 4, 4)},
    [_avgpool_ref(np.arange(64, dtype=np.float32).reshape(1, 1, 4, 4, 4),
                  [2, 2, 2], dil=[2, 2, 2])],
    kernel_shape=[2, 2, 2], dilations=[2, 2, 2])


def _lppool_ref(x, k, p=2, strides=None, pads=None, dil=None,
                auto_pad=None):
    xp = np.abs(x.astype(np.float64)) ** p
    s = _avgpool_ref(xp, k, strides=strides, pads=pads, dil=dil,
                     cip=1, auto_pad=auto_pad)
    n = 1
    for kk in k:
        n *= kk
    return ((s * n) ** (1.0 / p)).astype(np.float32)


_LPX = _rng.standard_normal((1, 3, 9, 9)).astype(np.float32)
add("lppool_1d_default", "LpPool", {"x": _P1},
    [_lppool_ref(_P1, [2])], kernel_shape=[2])
add("lppool_2d_default", "LpPool", {"x": _LPX},
    [_lppool_ref(_LPX, [2, 2])], kernel_shape=[2, 2])
add("lppool_2d_strides", "LpPool", {"x": _LPX},
    [_lppool_ref(_LPX, [5, 5], strides=[3, 3])], kernel_shape=[5, 5],
    strides=[3, 3])
add("lppool_2d_pads", "LpPool", {"x": _LPX},
    [_lppool_ref(_LPX, [3, 3], pads=[2, 2, 2, 2])], kernel_shape=[3, 3],
    pads=[2, 2, 2, 2])
add("lppool_2d_dilations", "LpPool", {"x": _APD},
    [_lppool_ref(_APD, [2, 2], dil=[2, 2])], kernel_shape=[2, 2],
    dilations=[2, 2])
add("lppool_2d_same_upper", "LpPool", {"x": _LPX},
    [_lppool_ref(_LPX, [2, 2], auto_pad="SAME_UPPER")],
    kernel_shape=[2, 2], auto_pad="SAME_UPPER")
add("lppool_2d_same_lower", "LpPool", {"x": _LPX},
    [_lppool_ref(_LPX, [2, 2], auto_pad="SAME_LOWER")],
    kernel_shape=[2, 2], auto_pad="SAME_LOWER")
add("lppool_3d_default", "LpPool", {"x": _P3},
    [_lppool_ref(_P3, [2, 2, 2])], kernel_shape=[2, 2, 2])

# base spellings already present in the older case files — keep only
# this file's _expanded/_ver18 twins for those names
_ALREADY = {"elu", "hardsigmoid", "leakyrelu", "selu", "thresholdedrelu",
            "transpose_default"}
CASES = [c for c in CASES if c.name not in _ALREADY]
