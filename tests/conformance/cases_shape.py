"""Conformance cases: shape manipulation, indexing, reductions."""

import numpy as np
import torch

from .harness import Case

rng = np.random.default_rng(7)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


_X = rng.standard_normal((2, 3, 4)).astype(np.float32)

# -- reshape / transpose / flatten / squeeze --------------------------------
add("reshape_basic", "Reshape", {"x": _X, "s": np.asarray([4, 6], dtype=np.int64)},
    _X.reshape(4, 6))
add("reshape_neg1", "Reshape", {"x": _X, "s": np.asarray([2, -1], dtype=np.int64)},
    _X.reshape(2, 12))
add("reshape_zero", "Reshape", {"x": _X, "s": np.asarray([0, -1], dtype=np.int64)},
    _X.reshape(2, 12))
add("reshape_allowzero", "Reshape",
    {"x": np.zeros((0, 4), np.float32), "s": np.asarray([0, 4], dtype=np.int64)},
    np.zeros((0, 4), np.float32), attrs={"allowzero": 1}, oracle_only=False)
add("transpose_default", "Transpose", {"x": _X}, _X.T)
add("transpose_perm", "Transpose", {"x": _X}, np.transpose(_X, (1, 2, 0)),
    attrs={"perm": [1, 2, 0]})
add("flatten_ax1", "Flatten", {"x": _X}, _X.reshape(2, 12), attrs={"axis": 1})
add("flatten_ax0", "Flatten", {"x": _X}, _X.reshape(1, 24), attrs={"axis": 0})
add("flatten_ax2", "Flatten", {"x": _X}, _X.reshape(6, 4), attrs={"axis": 2})
_S1 = _X[:, :1, :]
add("squeeze_axes_input", "Squeeze",
    {"x": _S1, "axes": np.asarray([1], dtype=np.int64)}, _S1.squeeze(1))
add("squeeze_neg_axis", "Squeeze",
    {"x": _S1, "axes": np.asarray([-2], dtype=np.int64)}, _S1.squeeze(1))
add("unsqueeze_multi", "Unsqueeze",
    {"x": _X[0], "axes": np.asarray([0, 3], dtype=np.int64)},
    _X[0][None, :, :, None])
add("identity", "Identity", {"x": _X}, _X)

# -- shape / size ------------------------------------------------------------
add("shape_basic", "Shape", {"x": _X}, np.asarray([2, 3, 4], dtype=np.int64))
add("shape_start_end", "Shape", {"x": _X}, np.asarray([3], dtype=np.int64),
    attrs={"start": 1, "end": 2})
add("shape_neg_start", "Shape", {"x": _X}, np.asarray([3, 4], dtype=np.int64),
    attrs={"start": -2})
add("size", "Size", {"x": _X}, np.asarray(24, dtype=np.int64))

# -- expand / tile / concat / split ------------------------------------------
add("expand_bcast", "Expand",
    {"x": np.arange(3, dtype=np.float32).reshape(3, 1),
     "s": np.asarray([2, 3, 4], dtype=np.int64)},
    np.broadcast_to(np.arange(3, dtype=np.float32).reshape(3, 1), (2, 3, 4)).copy())
add("expand_onesided", "Expand",
    {"x": _X[0], "s": np.asarray([1, 1], dtype=np.int64)}, _X[0])
add("tile", "Tile", {"x": _X[0], "r": np.asarray([2, 3], dtype=np.int64)},
    np.tile(_X[0], (2, 3)))
add("concat_ax0", "Concat", {"a": _X[0], "b": _X[1]},
    np.concatenate([_X[0], _X[1]], axis=0), attrs={"axis": 0})
add("concat_neg_ax", "Concat", {"a": _X[0], "b": _X[1]},
    np.concatenate([_X[0], _X[1]], axis=-1), attrs={"axis": -1})
sp = np.split(_X, [1], axis=1)
add("split_sizes_input", "Split",
    {"x": _X, "s": np.asarray([1, 2], dtype=np.int64)},
    [sp[0], sp[1]], attrs={"axis": 1})
add("split_num_outputs", "Split", {"x": _X},
    list(np.split(_X, 2, axis=2)), attrs={"axis": 2, "num_outputs": 2})

# -- slice ---------------------------------------------------------------------
_R = np.arange(20, dtype=np.float32).reshape(4, 5)
add("slice_basic", "Slice",
    {"x": _R, "st": np.asarray([1], dtype=np.int64),
     "en": np.asarray([3], dtype=np.int64)}, _R[1:3])
add("slice_axes_steps", "Slice",
    {"x": _R, "st": np.asarray([0, 4], dtype=np.int64),
     "en": np.asarray([4, 0], dtype=np.int64),
     "ax": np.asarray([0, 1], dtype=np.int64),
     "sp": np.asarray([2, -1], dtype=np.int64)}, _R[0:4:2, 4:0:-1])
add("slice_neg_idx", "Slice",
    {"x": _R, "st": np.asarray([-2], dtype=np.int64),
     "en": np.asarray([2 ** 31], dtype=np.int64)}, _R[-2:])
add("slice_full_reverse", "Slice",
    {"x": _R, "st": np.asarray([-1], dtype=np.int64),
     "en": np.asarray([-(2 ** 31)], dtype=np.int64),
     "ax": np.asarray([0], dtype=np.int64),
     "sp": np.asarray([-1], dtype=np.int64)}, _R[::-1])
add("slice_clamp_oob", "Slice",
    {"x": _R, "st": np.asarray([2], dtype=np.int64),
     "en": np.asarray([1000], dtype=np.int64)}, _R[2:])

# -- pad ------------------------------------------------------------------------
add("pad_constant", "Pad",
    {"x": _R, "p": np.asarray([1, 0, 0, 2], dtype=np.int64),
     "v": np.asarray(9.0, dtype=np.float32)},
    np.pad(_R, ((1, 0), (0, 2)), constant_values=9.0))
add("pad_reflect", "Pad",
    {"x": _R, "p": np.asarray([0, 1, 0, 1], dtype=np.int64)},
    np.pad(_R, ((0, 0), (1, 1)), mode="reflect"), attrs={"mode": "reflect"})
add("pad_edge", "Pad",
    {"x": _R, "p": np.asarray([1, 1, 1, 1], dtype=np.int64)},
    np.pad(_R, ((1, 1), (1, 1)), mode="edge"), attrs={"mode": "edge"})
add("pad_wrap", "Pad",
    {"x": _R, "p": np.asarray([1, 0, 1, 0], dtype=np.int64)},
    np.pad(_R, ((1, 1), (0, 0)), mode="wrap"), attrs={"mode": "wrap"},
    oracle_only=False)
add("pad_axes_subset", "Pad",
    {"x": _R, "p": np.asarray([2, 1], dtype=np.int64),
     "v": np.asarray(0.0, dtype=np.float32),
     "ax": np.asarray([1], dtype=np.int64)},
    np.pad(_R, ((0, 0), (2, 1))))
add("pad_negative_crop", "Pad",
    {"x": _R, "p": np.asarray([-1, 0, 0, -2], dtype=np.int64)},
    _R[1:, :3], oracle_only=False)

# -- gather family -----------------------------------------------------------------
add("gather_ax0", "Gather", {"x": _R, "i": np.asarray([3, 0], dtype=np.int64)},
    _R[[3, 0]])
add("gather_ax1", "Gather", {"x": _R, "i": np.asarray([[0, 2], [4, 4]], dtype=np.int64)},
    np.take(_R, np.asarray([[0, 2], [4, 4]]), axis=1), attrs={"axis": 1})
add("gather_negative", "Gather", {"x": _R, "i": np.asarray([-1], dtype=np.int64)},
    _R[[-1]])
_GEI = rng.integers(0, 5, (4, 3)).astype(np.int64)
add("gatherelements", "GatherElements", {"x": _R, "i": _GEI},
    torch.gather(t(_R), 1, t(_GEI)).numpy(), attrs={"axis": 1})
add("gathernd_basic", "GatherND",
    {"x": _R, "i": np.asarray([[0, 1], [3, 4]], dtype=np.int64)},
    np.asarray([_R[0, 1], _R[3, 4]], dtype=np.float32))
add("gathernd_partial", "GatherND",
    {"x": _X, "i": np.asarray([[0], [1]], dtype=np.int64)}, _X[[0, 1]])
_SCD = np.zeros((4, 4), dtype=np.float32)
_SCI = np.asarray([[1, 1], [2, 3]], dtype=np.int64)
_SCU = np.asarray([5.0, 7.0], dtype=np.float32)
_exp = _SCD.copy()
_exp[1, 1] = 5.0
_exp[2, 3] = 7.0
add("scatternd_set", "ScatterND", {"d": _SCD, "i": _SCI, "u": _SCU}, _exp)
_exp2 = _SCD.copy()
_exp2[1, 1] += 5.0
_exp2[2, 3] += 7.0
add("scatternd_add", "ScatterND", {"d": _SCD, "i": _SCI, "u": _SCU}, _exp2,
    attrs={"reduction": "add"})

# -- range / onehot / trilu / eyelike -------------------------------------------
add("range_f32", "Range", {"s": np.asarray(1.0, dtype=np.float32),
                           "l": np.asarray(5.5, dtype=np.float32),
                           "d": np.asarray(1.5, dtype=np.float32)},
    np.arange(1.0, 5.5, 1.5, dtype=np.float32))
add("range_i64", "Range", {"s": np.asarray(10, dtype=np.int64),
                           "l": np.asarray(4, dtype=np.int64),
                           "d": np.asarray(-2, dtype=np.int64)},
    np.arange(10, 4, -2, dtype=np.int64))
_OHI = np.asarray([[1, 3], [0, -1]], dtype=np.int64)
add("onehot_last", "OneHot",
    {"i": _OHI, "d": np.asarray(4, dtype=np.int64),
     "v": np.asarray([0.0, 1.0], dtype=np.float32)},
    np.eye(4, dtype=np.float32)[_OHI % 4])
add("trilu_upper", "Trilu", {"x": _R}, np.triu(_R))
add("trilu_lower_k", "Trilu", {"x": _R, "k": np.asarray(1, dtype=np.int64)},
    np.tril(_R, 1), attrs={"upper": 0})
add("eyelike", "EyeLike", {"x": np.zeros((3, 4), np.float32)},
    np.eye(3, 4, dtype=np.float32))
add("nonzero", "NonZero", {"x": np.asarray([[1, 0], [0, 3]], dtype=np.float32)},
    np.asarray(np.nonzero(np.asarray([[1, 0], [0, 3]]))).astype(np.int64),
    oracle_only=False)
add("depthtospace_dcr", "DepthToSpace",
    {"x": np.arange(16, dtype=np.float32).reshape(1, 4, 2, 2)},
    torch.pixel_shuffle(t(np.arange(16, dtype=np.float32).reshape(1, 4, 2, 2)), 2).numpy(),
    attrs={"blocksize": 2, "mode": "CRD"})
_S2D = rng.standard_normal((1, 2, 4, 6)).astype(np.float32)
# independent reference per the ONNX SpaceToDepth formula
_s2d_exp = np.transpose(_S2D.reshape(1, 2, 2, 2, 3, 2),
                        (0, 3, 5, 1, 2, 4)).reshape(1, 8, 2, 3)
add("spacetodepth", "SpaceToDepth", {"x": _S2D}, _s2d_exp,
    attrs={"blocksize": 2})

# -- reductions --------------------------------------------------------------------
for mode, fn in [("ReduceSum", np.sum), ("ReduceMean", np.mean),
                 ("ReduceProd", np.prod), ("ReduceMin", np.min),
                 ("ReduceMax", np.max)]:
    add(f"{mode.lower()}_all", mode, {"x": _X}, fn(_X).astype(np.float32).reshape(1, 1, 1))
    add(f"{mode.lower()}_axes", mode,
        {"x": _X, "ax": np.asarray([1], dtype=np.int64)},
        fn(_X, axis=1, keepdims=True))
    add(f"{mode.lower()}_nokeep", mode,
        {"x": _X, "ax": np.asarray([0, 2], dtype=np.int64)},
        fn(_X, axis=(0, 2)), attrs={"keepdims": 0})
add("reducel2", "ReduceL2", {"x": _X, "ax": np.asarray([2], dtype=np.int64)},
    np.sqrt((_X ** 2).sum(axis=2, keepdims=True)))
add("reducel1", "ReduceL1", {"x": _X, "ax": np.asarray([2], dtype=np.int64)},
    np.abs(_X).sum(axis=2, keepdims=True))
add("reducelogsumexp", "ReduceLogSumExp",
    {"x": _X, "ax": np.asarray([1], dtype=np.int64)},
    torch.logsumexp(t(_X), dim=1, keepdim=True).numpy())
add("reducelogsum", "ReduceLogSum",
    {"x": np.abs(_X) + 0.1, "ax": np.asarray([1], dtype=np.int64)},
    np.log((np.abs(_X) + 0.1).sum(axis=1, keepdims=True)))
add("reducesumsquare", "ReduceSumSquare",
    {"x": _X, "ax": np.asarray([0], dtype=np.int64)},
    (_X ** 2).sum(axis=0, keepdims=True))
add("reducesum_noop_empty_axes", "ReduceSum",
    {"x": _X, "ax": np.zeros(0, dtype=np.int64)}, _X,
    attrs={"noop_with_empty_axes": 1})
_RSI = rng.integers(0, 9, (3, 4)).astype(np.int64)
add("reducesum_i64", "ReduceSum",
    {"x": _RSI, "ax": np.asarray([0], dtype=np.int64)},
    _RSI.sum(axis=0, keepdims=True))

add("argmax_ax1", "ArgMax", {"x": _X}, np.argmax(_X, 1)[:, None, :].astype(np.int64),
    attrs={"axis": 1})
add("argmax_nokeep", "ArgMax", {"x": _X}, np.argmax(_X, 2).astype(np.int64),
    attrs={"axis": 2, "keepdims": 0})
add("argmin_neg_ax", "ArgMin", {"x": _X},
    np.argmin(_X, -1)[..., None].astype(np.int64), attrs={"axis": -1})
_DUP = np.asarray([[1, 5, 5], [2, 2, 0]], dtype=np.float32)
add("argmax_select_last", "ArgMax", {"x": _DUP},
    np.asarray([2, 1], dtype=np.int64),
    attrs={"axis": 1, "keepdims": 0, "select_last_index": 1})

add("cumsum", "CumSum", {"x": _R, "ax": np.asarray(1, dtype=np.int64)},
    np.cumsum(_R, axis=1))
add("cumsum_exclusive", "CumSum", {"x": _R, "ax": np.asarray(0, dtype=np.int64)},
    np.concatenate([np.zeros((1, 5), np.float32), np.cumsum(_R, 0)[:-1]], 0),
    attrs={"exclusive": 1})
add("cumsum_reverse", "CumSum", {"x": _R, "ax": np.asarray(1, dtype=np.int64)},
    np.flip(np.cumsum(np.flip(_R, 1), 1), 1), attrs={"reverse": 1})

_TK = rng.standard_normal((3, 8)).astype(np.float32)
tv, ti = torch.topk(t(_TK), 3, dim=1)
add("topk", "TopK", {"x": _TK, "k": np.asarray([3], dtype=np.int64)},
    [tv.numpy(), ti.numpy().astype(np.int64)])
tv2, ti2 = torch.topk(t(_TK), 2, dim=1, largest=False)
add("topk_smallest", "TopK", {"x": _TK, "k": np.asarray([2], dtype=np.int64)},
    [tv2.numpy(), ti2.numpy().astype(np.int64)], attrs={"largest": 0})

# -- constantofshape ------------------------------------------------------------
add("constantofshape", "ConstantOfShape",
    {"s": np.asarray([2, 3], dtype=np.int64)},
    np.full((2, 3), 1.5, dtype=np.float32),
    attrs={"value": np.asarray([1.5], dtype=np.float32).reshape(())})

# einsum
_EA = rng.standard_normal((3, 4)).astype(np.float32)
_EB = rng.standard_normal((4, 5)).astype(np.float32)
add("einsum_matmul", "Einsum", {"a": _EA, "b": _EB},
    np.einsum("ij,jk->ik", _EA, _EB), attrs={"equation": "ij,jk->ik"})
add("einsum_batch", "Einsum", {"a": _X, "b": _X},
    np.einsum("bij,bkj->bik", _X, _X), attrs={"equation": "bij,bkj->bik"})
add("einsum_trace_sum", "Einsum", {"a": _EA},
    np.einsum("ij->j", _EA), attrs={"equation": "ij->j"})


# ---------------------------------------------------------------------------
# remaining reduce family + axes-as-input form
# ---------------------------------------------------------------------------
_R = rng.standard_normal((2, 3, 4)).astype(np.float32)
add("reduce_l1", "ReduceL1", {"x": _R},
    np.abs(_R).sum(axis=1, keepdims=True), attrs={"axes": [1]})
add("reduce_l2", "ReduceL2", {"x": _R},
    np.sqrt((_R ** 2).sum(axis=(0, 2), keepdims=True)),
    attrs={"axes": [0, 2]})
add("reduce_l2_axes_input", "ReduceL2",
    {"x": _R, "axes": np.asarray([2], dtype=np.int64)},
    np.sqrt((_R ** 2).sum(axis=2, keepdims=True)))
add("reduce_mean_noop_empty_axes", "ReduceMean",
    {"x": _R, "axes": np.zeros(0, dtype=np.int64)},
    _R, attrs={"noop_with_empty_axes": 1})
add("reduce_max_keepdims0", "ReduceMax", {"x": _R},
    _R.max(axis=2), attrs={"axes": [2], "keepdims": 0})
add("reduce_prod_all", "ReduceProd",
    {"x": (_R[:1, :2, :2] * 0.5)},
    np.prod(_R[:1, :2, :2] * 0.5).reshape(1, 1, 1))

# Max/Min variadic (3 inputs) + int
_M1 = rng.standard_normal((2, 3)).astype(np.float32)
_M2 = rng.standard_normal((2, 3)).astype(np.float32)
_M3 = rng.standard_normal((3,)).astype(np.float32)
add("max_variadic3", "Max", {"a": _M1, "b": _M2, "c": _M3},
    np.maximum(np.maximum(_M1, _M2), _M3))
add("min_variadic3", "Min", {"a": _M1, "b": _M2, "c": _M3},
    np.minimum(np.minimum(_M1, _M2), _M3))

# Cast lattice: f32 <-> bf16/f16/i32/u8/bool round trips
import ml_dtypes as _mld

_CF = np.asarray([[-1.6, -0.4, 0.0, 0.5, 1.5, 300.7]], dtype=np.float32)
add("cast2_f32_bf16", "Cast", {"x": _CF}, _CF.astype(_mld.bfloat16),
    attrs={"to": 16})
add("cast2_f32_f16", "Cast", {"x": _CF}, _CF.astype(np.float16),
    attrs={"to": 10})
add("cast2_f32_i32_trunc", "Cast", {"x": _CF},
    _CF.astype(np.int32), attrs={"to": 6})
add("cast2_i32_bool", "Cast", {"x": np.asarray([0, 1, -2], dtype=np.int32)},
    np.asarray([False, True, True]), attrs={"to": 9})
add("cast2_bool_f32", "Cast", {"x": np.asarray([True, False])},
    np.asarray([1.0, 0.0], dtype=np.float32), attrs={"to": 1})
add("cast2_u8_f32", "Cast", {"x": np.asarray([0, 255, 7], dtype=np.uint8)},
    np.asarray([0.0, 255.0, 7.0], dtype=np.float32), attrs={"to": 1})
