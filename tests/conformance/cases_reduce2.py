"""Conformance cases: the full reduction matrix.

Reduce{Sum,Mean,Prod,Max,Min,L1,L2,LogSum,LogSumExp,SumSquare}
x axes {None,[0],[1],[-1],[0,2]} x keepdims {0,1}, both the opset-18
axes-as-input form and the pre-13 attribute form, plus ArgMax/ArgMin,
CumSum, TopK, and integer-dtype reduces. All referees are direct numpy
formulas (independent of the framework's Reduce implementation).
"""

import numpy as np

from .harness import Case

rng = np.random.default_rng(555)
CASES = []


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


_X = (rng.standard_normal((2, 3, 4)) * 1.5).astype(np.float32)
_XPOS = (np.abs(_X) + 0.2).astype(np.float32)

_REDUCERS = {
    "ReduceSum": (np.sum, _X),
    "ReduceMean": (np.mean, _X),
    "ReduceProd": (np.prod, _XPOS * 0.9),
    "ReduceMax": (np.max, _X),
    "ReduceMin": (np.min, _X),
    "ReduceL1": (lambda v, axis, keepdims: np.sum(np.abs(v), axis=axis,
                                                  keepdims=keepdims), _X),
    "ReduceL2": (lambda v, axis, keepdims: np.sqrt(np.sum(
        v.astype(np.float64) ** 2, axis=axis, keepdims=keepdims)).astype(np.float32), _X),
    "ReduceLogSum": (lambda v, axis, keepdims: np.log(np.sum(
        v, axis=axis, keepdims=keepdims)), _XPOS),
    "ReduceLogSumExp": (lambda v, axis, keepdims: np.log(np.sum(
        np.exp(v.astype(np.float64)), axis=axis, keepdims=keepdims)).astype(np.float32), _X),
    "ReduceSumSquare": (lambda v, axis, keepdims: np.sum(
        v.astype(np.float64) ** 2, axis=axis, keepdims=keepdims).astype(np.float32), _X),
}

_AXES = {"all": None, "ax0": [0], "ax1": [1], "axneg": [-1], "ax02": [0, 2]}

for op, (fn, src) in _REDUCERS.items():
    for axname, axes in _AXES.items():
        for kd in (0, 1):
            ax = tuple(axes) if axes is not None else None
            ref = np.asarray(fn(src, axis=ax, keepdims=bool(kd)),
                             dtype=src.dtype)
            inputs = {"x": src}
            if axes is not None:
                inputs["axes"] = np.asarray(axes, dtype=np.int64)
            add(f"r_{op.lower()}_{axname}_kd{kd}", op, inputs, ref,
                attrs={"keepdims": kd}, rtol=1e-4, atol=1e-5)

# pre-13 attribute form (axes as attr, not input)
for op, (fn, src) in _REDUCERS.items():
    ref = np.asarray(fn(src, axis=(1,), keepdims=True), dtype=src.dtype)
    add(f"r_{op.lower()}_attr_form", op, {"x": src}, ref,
        attrs={"axes": [1], "keepdims": 1}, opset=11, rtol=1e-4, atol=1e-5)

# noop_with_empty_axes: empty axes input means identity
for op in ("ReduceSum", "ReduceMax", "ReduceL2"):
    add(f"r_{op.lower()}_noop", op,
        {"x": _X, "axes": np.zeros(0, dtype=np.int64)}, _X,
        attrs={"noop_with_empty_axes": 1})

# integer reduces
_XI = rng.integers(-9, 9, (2, 3, 4)).astype(np.int64)
_XI32 = rng.integers(1, 5, (2, 3, 4)).astype(np.int32)
for axname, axes in (("all", None), ("ax1", [1])):
    ax = tuple(axes) if axes is not None else None
    inp = {"x": _XI} if axes is None else {"x": _XI, "axes": np.asarray(axes, np.int64)}
    add(f"r_sum_i64_{axname}", "ReduceSum", dict(inp),
        np.sum(_XI, axis=ax, keepdims=True))
    add(f"r_max_i64_{axname}", "ReduceMax", dict(inp),
        np.max(_XI, axis=ax, keepdims=True))
    add(f"r_min_i64_{axname}", "ReduceMin", dict(inp),
        np.min(_XI, axis=ax, keepdims=True))
    inp32 = {"x": _XI32} if axes is None else {"x": _XI32, "axes": np.asarray(axes, np.int64)}
    add(f"r_prod_i32_{axname}", "ReduceProd", dict(inp32),
        np.prod(_XI32, axis=ax, keepdims=True).astype(np.int32))

# f64 reduce sweep (referees computed natively in f64)
_X64 = _X.astype(np.float64)
_F64_FNS = {
    "ReduceSum": lambda v: np.sum(v, axis=2, keepdims=True),
    "ReduceMean": lambda v: np.mean(v, axis=2, keepdims=True),
    "ReduceMax": lambda v: np.max(v, axis=2, keepdims=True),
    "ReduceL2": lambda v: np.sqrt(np.sum(v ** 2, axis=2, keepdims=True)),
    "ReduceLogSumExp": lambda v: np.log(np.sum(np.exp(v), axis=2,
                                               keepdims=True)),
}
for op, fn in _F64_FNS.items():
    add(f"r_{op.lower()}_f64", op,
        {"x": _X64, "axes": np.asarray([2], np.int64)}, fn(_X64),
        rtol=1e-10, atol=1e-12)

# bf16 reduce: accumulate wide, round back
import ml_dtypes

_XBF = _X.astype(ml_dtypes.bfloat16)
add("r_sum_bf16", "ReduceSum", {"x": _XBF, "axes": np.asarray([1], np.int64)},
    np.sum(_XBF.astype(np.float32), axis=1, keepdims=True).astype(ml_dtypes.bfloat16),
    rtol=2e-2, atol=1e-2)
add("r_max_bf16", "ReduceMax", {"x": _XBF, "axes": np.asarray([1], np.int64)},
    np.max(_XBF, axis=1, keepdims=True), rtol=0, atol=0)

# ---------------------------------------------------------------------------
# ArgMax / ArgMin matrix
# ---------------------------------------------------------------------------
_AX = rng.standard_normal((3, 4, 5)).astype(np.float32)
# inject duplicates to pin tie semantics (first index, unless select_last)
_AX[0, 1, :] = _AX[0, 0, :]
for op, np_fn in (("ArgMax", np.argmax), ("ArgMin", np.argmin)):
    for axis in (0, 1, -1, 2):
        for kd in (0, 1):
            ref = np_fn(_AX, axis=axis)
            if kd:
                ref = np.expand_dims(ref, axis=axis)
            add(f"a_{op.lower()}_ax{axis}_kd{kd}", op, {"x": _AX},
                ref.astype(np.int64), attrs={"axis": axis, "keepdims": kd})
    # select_last_index
    rev = np_fn(np.flip(_AX, axis=1), axis=1)
    ref = (_AX.shape[1] - 1 - rev).astype(np.int64)
    add(f"a_{op.lower()}_select_last", op, {"x": _AX},
        np.expand_dims(ref, 1),
        attrs={"axis": 1, "keepdims": 1, "select_last_index": 1})
# int input
add("a_argmax_i64", "ArgMax", {"x": _XI},
    np.expand_dims(np.argmax(_XI, axis=2), 2).astype(np.int64),
    attrs={"axis": 2, "keepdims": 1})

# ---------------------------------------------------------------------------
# CumSum matrix
# ---------------------------------------------------------------------------
_CX = rng.standard_normal((3, 5)).astype(np.float32)
for axis in (0, 1, -1):
    for exc in (0, 1):
        for rev in (0, 1):
            v = _CX
            if rev:
                v = np.flip(v, axis=axis)
            c = np.cumsum(v, axis=axis)
            if exc:
                c = np.roll(c, 1, axis=axis)
                sl = [slice(None)] * 2
                sl[axis % 2] = slice(0, 1)
                c[tuple(sl)] = 0
            if rev:
                c = np.flip(c, axis=axis)
            add(f"cs_ax{axis}_e{exc}_r{rev}", "CumSum",
                {"x": _CX, "axis": np.asarray(axis, np.int64)},
                c.astype(np.float32),
                attrs={"exclusive": exc, "reverse": rev},
                rtol=1e-5, atol=1e-6)
add("cs_i64", "CumSum", {"x": _XI[0], "axis": np.asarray(1, np.int64)},
    np.cumsum(_XI[0], axis=1))

# ---------------------------------------------------------------------------
# TopK matrix
# ---------------------------------------------------------------------------
_TX = rng.standard_normal((3, 8)).astype(np.float32)
for largest in (1, 0):
    for axis in (-1, 0):
        kk = 3 if axis == -1 else 2
        order = np.argsort(-_TX if largest else _TX, axis=axis, kind="stable")
        idx = np.take(order, range(kk), axis=axis)
        vals = np.take_along_axis(_TX, idx, axis=axis)
        add(f"tk_l{largest}_ax{axis}", "TopK",
            {"x": _TX, "k": np.asarray([kk], np.int64)},
            [vals, idx.astype(np.int64)],
            attrs={"axis": axis, "largest": largest})
_TI = rng.integers(-99, 99, (4, 6)).astype(np.int64)
order = np.argsort(-_TI, axis=1, kind="stable")
idx = order[:, :2]
add("tk_i64", "TopK", {"x": _TI, "k": np.asarray([2], np.int64)},
    [np.take_along_axis(_TI, idx, axis=1), idx.astype(np.int64)])
