"""Last official-name conformance batch: the remaining singles —
arithmetic dtype variants, variadic Sum/Mean, quantize/dequantize
dtype + blocked forms (int16/uint16, int4/uint4, float8 e4m3fn/e5m2,
float4e2m1, block_size), isinf/isnan f16, instancenorm, mvn/prelu/
hardswish/relu/softsign expanded twins, expand, global pools, range,
scatternd multiply + deprecated Scatter, depthtospace, pad negative
axes, stft with window, simple RNN, tree ensemble, and the control-flow
corpus entries (if/if_seq-like, loop11, scan9_sum).
"""

from __future__ import annotations

import numpy as np

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder, WeightStorage

from .harness import Case

try:
    import ml_dtypes
except ImportError:  # pragma: no cover
    ml_dtypes = None

CASES = []
_rng = np.random.default_rng(31)


def add(name, op, inputs, expected, init=(), oracle_only=False, opset=23,
        atol=1e-5, domain="", **attrs):
    CASES.append(Case(name, op, inputs, expected, attrs=attrs,
                      initializer_names=init, oracle_only=oracle_only,
                      opset=opset, domain=domain, atol=atol))


# --- arithmetic dtype variants -------------------------------------------------

for opname, fn in (("add", np.add), ("sub", np.subtract),
                   ("mul", np.multiply), ("div", np.floor_divide)):
    a = _rng.integers(1, 100, 8).astype(np.uint8)
    b = _rng.integers(1, 20, 8).astype(np.uint8)
    add(f"{opname}_uint8", opname.capitalize(), {"a": a, "b": b},
        [fn(a, b)])
_AE = np.array([1.0, 2.0, 3.0], np.float32)
_BE = np.array([4.0, 5.0, 6.0], np.float32)
add("div_example", "Div", {"a": _AE, "b": _BE}, [_AE / _BE])
add("mul_example", "Mul", {"a": _AE, "b": _BE}, [_AE * _BE])
add("sub_example", "Sub", {"a": _AE, "b": _BE}, [_AE - _BE])

for opname, red in (("sum", lambda xs: xs[0] + xs[1] + xs[2]),
                    ("mean", lambda xs: (xs[0] + xs[1] + xs[2]) / 3)):
    xs = [_rng.standard_normal(5).astype(np.float32) for _ in range(3)]
    add(f"{opname}_example", opname.capitalize(),
        {"a": xs[0], "b": xs[1], "c": xs[2]}, [red(xs)])
    add(f"{opname}_one_input", opname.capitalize(), {"a": xs[0]},
        [xs[0]])
    add(f"{opname}_two_inputs", opname.capitalize(),
        {"a": xs[0], "b": xs[1]},
        [(xs[0] + xs[1]) / (2 if opname == "mean" else 1)])

# --- quantize / dequantize dtype + blocked forms --------------------------------


def _dq(name, x, scale, zp=None, axis=None, block=None, atol=1e-5):
    attrs = {}
    if axis is not None:
        attrs["axis"] = axis
    if block is not None:
        attrs["block_size"] = block
    ax = axis if axis is not None else 1
    sf = np.asarray(scale, np.float32)
    zf = (np.asarray(zp).astype(np.float32) if zp is not None else 0.0)
    if block:
        rep_s = np.repeat(sf, block, axis=ax)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, x.shape[ax])
        rep_s = rep_s[tuple(sl)]
        rep_z = (np.repeat(zf, block, axis=ax)[tuple(sl)]
                 if zp is not None else 0.0)
    else:
        shape = [1] * x.ndim
        if sf.ndim:
            shape[ax] = -1
        rep_s = sf.reshape(shape) if sf.ndim else sf
        rep_z = (zf.reshape(shape) if getattr(zf, "ndim", 0) else zf)
    y = (x.astype(np.float32) - rep_z) * rep_s
    inputs = {"x": x, "scale": sf}
    if zp is not None:
        inputs["zp"] = zp
    add(name, "DequantizeLinear", inputs, [y.astype(np.float32)],
        atol=atol, **attrs)


_dq("dequantizelinear_int16",
    np.array([-300, -30, -1025, 1270], np.int16), np.float32(2.0),
    np.int16(-1024))
_dq("dequantizelinear_uint16",
    np.array([30000, 31000, 32768, 33000], np.uint16), np.float32(2.0),
    np.uint16(32767))
_dq("dequantizelinear_int4",
    np.array([-8, -3, 0, 7], np.int8), np.float32(2.0), np.int8(1))
_dq("dequantizelinear_uint4",
    np.array([0, 3, 8, 15], np.uint8), np.float32(2.0), np.uint8(1))
if ml_dtypes is not None:
    _f8 = ml_dtypes.float8_e4m3fn
    _f852 = ml_dtypes.float8_e5m2
    _dq("dequantizelinear_e4m3fn",
        np.array([0, 0.5, 1, 448, -104], _f8), np.float32(2.0),
        atol=1e-3)
    _dq("dequantizelinear_e4m3fn_zero_point",
        np.array([0, 0.5, 1, 448, -104], _f8), np.float32(2.0),
        np.asarray(0.0, _f8), atol=1e-3)
    _dq("dequantizelinear_e4m3fn_float16",
        np.array([-0.5, -0.25, 0, 0.25, 0.5], _f8),
        np.float16(2.0), atol=1e-2)
    _dq("dequantizelinear_e5m2",
        np.array([0, 0.5, 1, 49152, -96], _f852), np.float32(2.0),
        atol=1e-3)
    _f4 = getattr(ml_dtypes, "float4_e2m1fn", None)
    if _f4 is not None:
        _dq("dequantizelinear_float4e2m1",
            np.array([0, 1, -1, 1.5, -4], _f4), np.float32(2.0),
            atol=1e-3)
_BQX = _rng.integers(-100, 100, (3, 8)).astype(np.int8)
_BQS = (_rng.random((3, 2)).astype(np.float32) + 0.5)
_dq("dequantizelinear_blocked", _BQX, _BQS,
    _rng.integers(-10, 10, (3, 2)).astype(np.int8), axis=1, block=4)


def _q(name, x, scale, zp=None, out_dtype=None, axis=None, block=None,
       atol=1e-5):
    """Quantize case: expected derived with the spec formula."""
    attrs = {}
    if axis is not None:
        attrs["axis"] = axis
    if block is not None:
        attrs["block_size"] = block
    if out_dtype is not None:
        attrs["output_dtype"] = out_dtype
    ax = axis if axis is not None else 1
    sf = np.asarray(scale, np.float32)
    zf = (np.asarray(zp).astype(np.float32) if zp is not None else 0.0)
    if block:
        rep_s = np.repeat(sf, block, axis=ax)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, x.shape[ax])
        rep_s = rep_s[tuple(sl)]
        rep_z = (np.repeat(zf, block, axis=ax)[tuple(sl)]
                 if zp is not None else 0.0)
    else:
        shape = [1] * x.ndim
        if sf.ndim:
            shape[ax] = -1
        rep_s = sf.reshape(shape) if sf.ndim else sf
        rep_z = (zf.reshape(shape) if getattr(zf, "ndim", 0) else zf)
    from whisper_tensor_tpu.dtype import ONNX_TO_DTYPE
    tgt = (ONNX_TO_DTYPE[out_dtype] if out_dtype is not None
           else DType.from_numpy(np.asarray(zp).dtype))
    np_t = tgt.to_numpy()
    if tgt.is_float:
        import ml_dtypes as _mld
        try:
            fi = np.finfo(np_t)
        except ValueError:
            fi = _mld.finfo(np_t)
        y = np.clip(x.astype(np.float32) / rep_s + rep_z,
                    float(fi.min), float(fi.max)).astype(np_t)
    else:
        rng_lo, rng_hi = ((-8, 7) if tgt is DType.I4 else
                          (0, 15) if tgt is DType.U4 else
                          (np.iinfo(np_t).min, np.iinfo(np_t).max))
        y = np.clip(np.round(x.astype(np.float32) / rep_s) + rep_z,
                    rng_lo, rng_hi).astype(np_t)
    inputs = {"x": x, "scale": sf}
    if zp is not None:
        inputs["zp"] = zp
    add(name, "QuantizeLinear", inputs, [y], atol=atol, **attrs)


_QX = np.array([-1000., -200., -3., 0., 3., 200., 1000.], np.float32)
_q("quantizelinear_int16", _QX, np.float32(4.0), np.int16(-10))
_q("quantizelinear_uint16", np.abs(_QX), np.float32(4.0),
   np.uint16(100))
_q("quantizelinear_int4", np.array([-20., -4., 0., 4., 20.], np.float32),
   np.float32(2.0), out_dtype=22)
_q("quantizelinear_uint4", np.array([0., 4., 12., 40.], np.float32),
   np.float32(2.0), out_dtype=21)
if ml_dtypes is not None:
    _q("quantizelinear_e4m3fn",
       np.array([0., 1., 2., 1000., -254.], np.float32),
       np.float32(2.0), out_dtype=17, atol=0.5)
    _q("quantizelinear_e5m2",
       np.array([0., 1., 2., 100000., -254.], np.float32),
       np.float32(2.0), out_dtype=19, atol=8.0)
    if getattr(ml_dtypes, "float4_e2m1fn", None) is not None:
        _q("quantizelinear_float4e2m1",
           np.array([0., 1., 2., 8., -4.], np.float32),
           np.float32(2.0), out_dtype=23, atol=1.0)
_BQF = _rng.standard_normal((3, 8)).astype(np.float32) * 10
_q("quantizelinear_blocked_asymmetric", _BQF, _BQS,
   _rng.integers(0, 10, (3, 2)).astype(np.uint8), axis=1, block=4)
_q("quantizelinear_blocked_symmetric", _BQF, _BQS,
   np.zeros((3, 2), np.int8), axis=1, block=4)

# --- misc singles -----------------------------------------------------------------

_WX = _rng.random((3, 4, 5)) > 0.5
_WA = _rng.integers(-100, 100, (3, 4, 5)).astype(np.int64)
_WB = _rng.integers(-100, 100, (3, 4, 5)).astype(np.int64)
add("where_long_example", "Where", {"c": _WX, "a": _WA, "b": _WB},
    [np.where(_WX, _WA, _WB)])
add("size_example", "Size",
    {"x": _rng.standard_normal((2, 3)).astype(np.float32)},
    [np.asarray(6, np.int64)])
_SQX = _rng.standard_normal((1, 3, 1, 5)).astype(np.float32)
add("squeeze_negative_axes", "Squeeze",
    {"x": _SQX, "axes": np.array([-2], np.int64)},
    [np.squeeze(_SQX, -2)], init=("axes",))
_M3A = _rng.standard_normal((2, 3, 4)).astype(np.float32)
_M3B = _rng.standard_normal((2, 4, 5)).astype(np.float32)
add("matmul_3d", "MatMul", {"a": _M3A, "b": _M3B}, [_M3A @ _M3B],
    atol=1e-4)
_NZX = np.array([[1, 0], [1, 1]], np.float32)
add("nonzero_example", "NonZero", {"x": _NZX},
    [np.asarray(np.nonzero(_NZX), np.int64)], oracle_only=False)
for nd, shp in (("3d", (3, 4, 5)), ("4d", (2, 3, 4, 5))):
    xb = _rng.random(shp) > 0.5
    add(f"not_{nd}", "Not", {"x": xb}, [~xb])
_IFX = np.array([-1.2, np.nan, np.inf, 2.8, -np.inf, np.inf],
                np.float32)
add("isinf", "IsInf", {"x": _IFX}, [np.isinf(_IFX)])
add("isinf_positive", "IsInf", {"x": _IFX}, [np.isposinf(_IFX)],
    detect_negative=0)
add("isinf_negative", "IsInf", {"x": _IFX}, [np.isneginf(_IFX)],
    detect_positive=0)
add("isinf_float16", "IsInf", {"x": _IFX.astype(np.float16)},
    [np.isinf(_IFX)])
add("isnan_float16", "IsNaN", {"x": _IFX.astype(np.float16)},
    [np.isnan(_IFX)])
_GBA = _rng.standard_normal((3, 4, 5)).astype(np.float32)
_GBB = _rng.standard_normal((5,)).astype(np.float32)
add("greater_bcast", "Greater", {"a": _GBA, "b": _GBB}, [_GBA > _GBB])
add("less_bcast", "Less", {"a": _GBA, "b": _GBB}, [_GBA < _GBB])
_RLX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
add("relu_expanded_ver18", "Relu", {"x": _RLX},
    [np.maximum(_RLX, 0)])
add("softsign_expanded_ver18", "Softsign", {"x": _RLX},
    [_RLX / (1 + np.abs(_RLX))])
add("softsign_example_expanded_ver18", "Softsign",
    {"x": np.array([-1.0, 0.0, 1.0], np.float32)},
    [np.array([-0.5, 0.0, 0.5], np.float32)])
_PRX = _rng.standard_normal((3, 4, 5)).astype(np.float32)
_PRS = _rng.standard_normal((5,)).astype(np.float32)
add("prelu_example_expanded", "PRelu",
    {"x": _PRX, "slope": _PRX.copy()},
    [np.where(_PRX > 0, _PRX, _PRX * _PRX)])
add("prelu_broadcast_expanded", "PRelu", {"x": _PRX, "slope": _PRS},
    [np.where(_PRX > 0, _PRX, _PRX * _PRS)])
add("hardswish_expanded", "HardSwish", {"x": _RLX},
    [_RLX * np.clip(_RLX / 6 + 0.5, 0, 1)])


def _mvn_ref(x, axes=(0, 2, 3)):
    m = x.mean(axis=axes, keepdims=True)
    v = x.std(axis=axes, keepdims=True)
    return ((x - m) / (v + 1e-9)).astype(np.float32)


_MVX = _rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
add("mvn_expanded", "MeanVarianceNormalization", {"x": _MVX},
    [_mvn_ref(_MVX)], atol=1e-4)
add("mvn_expanded_ver18", "MeanVarianceNormalization", {"x": _MVX},
    [_mvn_ref(_MVX)], atol=1e-4)
_INX = _rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
_INS = _rng.standard_normal(3).astype(np.float32) + 1
_INB = _rng.standard_normal(3).astype(np.float32)


def _in_ref(x, s, b, eps):
    m = x.mean(axis=(2, 3), keepdims=True)
    v = x.var(axis=(2, 3), keepdims=True)
    return ((x - m) / np.sqrt(v + eps) * s[None, :, None, None]
            + b[None, :, None, None]).astype(np.float32)


add("instancenorm_example", "InstanceNormalization",
    {"x": _INX, "s": _INS, "b": _INB}, [_in_ref(_INX, _INS, _INB, 1e-5)],
    atol=1e-4)
add("instancenorm_epsilon", "InstanceNormalization",
    {"x": _INX, "s": _INS, "b": _INB}, [_in_ref(_INX, _INS, _INB, 1e-2)],
    atol=1e-4, epsilon=1e-2)
_EXX = _rng.standard_normal((3, 1)).astype(np.float32)
add("expand_dim_changed", "Expand",
    {"x": _EXX, "shape": np.array([2, 3, 6], np.int64)},
    [_EXX * np.ones((2, 3, 6), np.float32)], init=("shape",))
add("expand_dim_unchanged", "Expand",
    {"x": _EXX, "shape": np.array([3, 4], np.int64)},
    [np.tile(_EXX, (1, 4))], init=("shape",))
_GPX = np.arange(9, dtype=np.float32).reshape(1, 1, 3, 3) + 1
add("globalaveragepool_precomputed", "GlobalAveragePool", {"x": _GPX},
    [np.array([[[[5.0]]]], np.float32)])
add("globalmaxpool_precomputed", "GlobalMaxPool", {"x": _GPX},
    [np.array([[[[9.0]]]], np.float32)])
# ceil window whose last window would start in the end padding
_MPC = np.arange(32, dtype=np.float32).reshape(1, 1, 4, 8)
from .cases_ref_final import _avgpool_ref  # noqa: E402


def _maxpool_loop(x, k, s, ceil):
    import itertools as it

    nsp = 2
    osp = []
    for i in range(nsp):
        num = x.shape[2 + i] - k[i]
        o = (-(-num // s[i]) if ceil else num // s[i]) + 1
        if ceil and (o - 1) * s[i] >= x.shape[2 + i]:
            o -= 1
        osp.append(o)
    out = np.full((x.shape[0], x.shape[1]) + tuple(osp), -np.inf,
                  np.float32)
    for n, c, i, j in it.product(range(x.shape[0]), range(x.shape[1]),
                                 range(osp[0]), range(osp[1])):
        for di, dj in it.product(range(k[0]), range(k[1])):
            y_, x_ = i * s[0] + di, j * s[1] + dj
            if y_ < x.shape[2] and x_ < x.shape[3]:
                out[n, c, i, j] = max(out[n, c, i, j], x[n, c, y_, x_])
    return out


add("maxpool_2d_ceil_output_size_reduce_by_one", "MaxPool",
    {"x": _MPC}, [_maxpool_loop(_MPC, (2, 2), (3, 3), True)],
    kernel_shape=[2, 2], strides=[3, 3], ceil_mode=1)
add("range_float_type_positive_delta", "Range",
    {"start": np.float32(1.0), "limit": np.float32(5.0),
     "delta": np.float32(2.0)},
    [np.arange(1, 5, 2, dtype=np.float32)],
    init=("start", "limit", "delta"))
add("range_int32_type_negative_delta", "Range",
    {"start": np.int32(21), "limit": np.int32(1), "delta": np.int32(-7)},
    [np.arange(21, 1, -7, dtype=np.int32)],
    init=("start", "limit", "delta"))
_SND = np.array([1., 2., 3., 4., 5., 6., 7., 8.], np.float32)
_SNI = np.array([[1], [3]], np.int64)
_SNU = np.array([7., 11.], np.float32)
_snd_exp = _SND.copy()
_snd_exp[1] *= 7
_snd_exp[3] *= 11
add("scatternd_multiply", "ScatterND",
    {"data": _SND, "idx": _SNI, "upd": _SNU}, [_snd_exp],
    reduction="mul")
# deprecated opset-9 Scatter (alias of ScatterElements)
_SC9 = np.zeros((3, 3), np.float32)
_SC9I = np.array([[1, 0, 2], [0, 2, 1]], np.int64)
_SC9U = np.array([[1.0, 1.1, 1.2], [2.0, 2.1, 2.2]], np.float32)
_sc9 = _SC9.copy()
for _p in np.ndindex(_SC9I.shape):
    _t = list(_p)
    _t[0] = _SC9I[_p]
    _sc9[tuple(_t)] = _SC9U[_p]
add("scatter_without_axis", "Scatter",
    {"data": _SC9, "idx": _SC9I, "upd": _SC9U}, [_sc9], opset=10)


def _d2s_ref(x, bs, mode):
    N, C, H, W = x.shape
    if mode == "DCR":
        t = x.reshape(N, bs, bs, C // (bs * bs), H, W)
        t = t.transpose(0, 3, 4, 1, 5, 2)
    else:
        t = x.reshape(N, C // (bs * bs), bs, bs, H, W)
        t = t.transpose(0, 1, 4, 2, 5, 3)
    return t.reshape(N, C // (bs * bs), H * bs, W * bs)


_D2X = _rng.standard_normal((1, 8, 2, 3)).astype(np.float32)
add("depthtospace_example", "DepthToSpace", {"x": _D2X},
    [_d2s_ref(_D2X, 2, "DCR")], blocksize=2)
add("depthtospace_crd_mode_example", "DepthToSpace", {"x": _D2X},
    [_d2s_ref(_D2X, 2, "CRD")], blocksize=2, mode="CRD")
_PNX = _rng.standard_normal((2, 3, 4)).astype(np.float32)
add("constant_pad_negative_axes", "Pad",
    {"x": _PNX, "pads": np.array([0, 1, 0, 1], np.int64),
     "value": np.float32(1.5)},
    [np.pad(_PNX, ((0, 0), (0, 0), (1, 1)), constant_values=1.5)],
    init=("pads", "value"), axes_attr_skip=None) if False else None
# Pad with axes input (negative axes)
_PAD_AX = Case(
    "constant_pad_negative_axes", "Pad",
    {"x": _PNX, "pads": np.array([1, 1], np.int64),
     "value": np.float32(1.5), "axes": np.array([-1], np.int64)},
    [np.pad(_PNX, ((0, 0), (0, 0), (1, 1)), constant_values=1.5)],
    attrs={}, initializer_names=("pads", "value", "axes"), atol=1e-5)
CASES.append(_PAD_AX)

# STFT with an explicit window input
_STX = _rng.standard_normal((1, 64, 1)).astype(np.float32)
_STW = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(16) / 16)).astype(
    np.float32)


def _stft_ref(x, frame_step, window, onesided=True):
    sig = x[0, :, 0]
    n = len(window)
    frames = []
    for st in range(0, len(sig) - n + 1, frame_step):
        seg = sig[st:st + n] * window
        sp = np.fft.rfft(seg) if onesided else np.fft.fft(seg)
        frames.append(np.stack([sp.real, sp.imag], -1))
    return np.stack(frames)[None].astype(np.float32)


add("stft_with_window", "STFT",
    {"signal": _STX, "frame_step": np.asarray(8, np.int64),
     "window": _STW},
    [_stft_ref(_STX, 8, _STW)], init=("frame_step",), atol=1e-4)

# --- simple RNN ------------------------------------------------------------------


def _rnn_ref(X, W, R, B=None, layout=0):
    H = R.shape[2]
    S, Bn, I = X.shape
    h = np.zeros((Bn, H), np.float64)
    bias = (B[0][:H] + B[0][H:]) if B is not None else 0.0
    ys = []
    for t in range(S):
        h = np.tanh(X[t] @ W[0].T + h @ R[0].T + bias)
        ys.append(h.copy())
    Y = np.stack(ys)[:, None].astype(np.float32)
    Yh = h[None].astype(np.float32)
    if layout:
        return Y.transpose(2, 0, 1, 3), np.swapaxes(Yh, 0, 1)
    return Y, Yh


_RNS, _RNB, _RNI, _RNH = 4, 3, 2, 4
_RX = _rng.standard_normal((_RNS, _RNB, _RNI)).astype(np.float32)
_RW = _rng.standard_normal((1, _RNH, _RNI)).astype(np.float32) * 0.5
_RR = _rng.standard_normal((1, _RNH, _RNH)).astype(np.float32) * 0.5
_RB = _rng.standard_normal((1, 2 * _RNH)).astype(np.float32) * 0.5
y, hT = _rnn_ref(_RX.astype(np.float64), _RW, _RR)
add("simple_rnn_defaults", "RNN", {"x": _RX, "w": _RW, "r": _RR},
    [y, hT], hidden_size=_RNH, atol=1e-4)
y, hT = _rnn_ref(_RX.astype(np.float64), _RW, _RR, _RB)
add("simple_rnn_with_initial_bias", "RNN",
    {"x": _RX, "w": _RW, "r": _RR, "b": _RB}, [y, hT],
    hidden_size=_RNH, atol=1e-4)
y, hT = _rnn_ref(_RX.astype(np.float64), _RW, _RR, layout=1)
add("simple_rnn_batchwise", "RNN",
    {"x": np.swapaxes(_RX, 0, 1).copy(), "w": _RW, "r": _RR}, [y, hT],
    hidden_size=_RNH, atol=1e-4, layout=1, oracle_only=False)

# --- TreeEnsemble (ai.onnx.ml v5) ---------------------------------------------------

_TEX = np.array([[1.2], [3.4], [-0.12], [1.66], [4.14], [1.77]],
                np.float32)
add("ai_onnx_ml_tree_ensemble_single_tree", "TreeEnsemble",
    {"x": np.array([[1.2, 3.4], [-0.12, 1.66], [4.14, 1.77]],
                   np.float64).astype(np.float32)},
    [np.array([[5.23, 0], [5.23, 0], [0, 12.12]], np.float32)],
    oracle_only=False, domain="ai.onnx.ml",
    n_targets=2, aggregate_function=1, post_transform=0,
    tree_roots=np.array([0], np.int64),
    nodes_modes=np.array([0, 0, 0], np.uint8),
    nodes_featureids=np.array([0, 0, 0], np.int64),
    nodes_splits=np.array([3.14, 1.2, 4.2], np.float64).astype(
        np.float32),
    nodes_truenodeids=np.array([1, 0, 1], np.int64),
    nodes_trueleafs=np.array([0, 1, 1], np.int64),
    nodes_falsenodeids=np.array([2, 2, 3], np.int64),
    nodes_falseleafs=np.array([0, 1, 1], np.int64),
    leaf_targetids=np.array([0, 1, 0, 1], np.int64),
    leaf_weights=np.array([5.23, 12.12, -12.23, 2.12],
                          np.float64).astype(np.float32))
add("ai_onnx_ml_tree_ensemble_set_membership", "TreeEnsemble",
    {"x": np.array([[1.2, 3.4], [-0.12, np.nan], [12.0, 1.0],
                    [np.nan, 0.5]], np.float32)},
    [np.array([[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]],
              np.float32)],
    oracle_only=False, domain="ai.onnx.ml",
    n_targets=4, aggregate_function=1, post_transform=0,
    tree_roots=np.array([0], np.int64),
    nodes_modes=np.array([0, 6, 6], np.uint8),
    nodes_featureids=np.array([0, 0, 0], np.int64),
    nodes_splits=np.array([11.0, 232344.0, np.nan],
                          np.float64).astype(np.float32),
    nodes_truenodeids=np.array([1, 0, 1], np.int64),
    nodes_trueleafs=np.array([0, 1, 1], np.int64),
    nodes_falsenodeids=np.array([2, 2, 3], np.int64),
    nodes_falseleafs=np.array([1, 0, 1], np.int64),
    leaf_targetids=np.array([0, 1, 2, 3], np.int64),
    leaf_weights=np.array([1, 1, 1, 1], np.float64).astype(np.float32),
    membership_values=np.array([1.2, 3.7, 8, 9, np.nan, 12, 7,
                                np.nan], np.float32),
    nodes_missing_value_tracks_true=np.array([1, 0, 1], np.int64))

# --- control flow (if / loop / scan corpus entries) ----------------------------------


def _graph_then_else():
    tb = OnnxBuilder("then")
    tb.initializer("tv", np.array([1., 2., 3., 4., 5.], np.float32))
    tb.node("Identity", ["tv"], outputs=["ov"])
    tb.output("ov", DType.F32, [5])
    eb = OnnxBuilder("else")
    eb.initializer("ev", np.array([-1., -2., -3., -4., -5.], np.float32))
    eb.node("Identity", ["ev"], outputs=["ov"])
    eb.output("ov", DType.F32, [5])
    st = WeightStorage.embed()
    return tb.build_graph_proto(st), eb.build_graph_proto(st)


_thg, _elg = _graph_then_else()
add("if", "If", {"cond": np.asarray(True)},
    [np.array([1., 2., 3., 4., 5.], np.float32)],
    init=("cond",), then_branch=_thg, else_branch=_elg)


def _loop11_case():
    # official loop11: y accumulates x[: i+1] sums per iteration
    body = OnnxBuilder("body")
    body.input("iter_count", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("y_in", DType.F32, [1])
    body.initializer("one_f", np.array([1.0], np.float32))
    body.node("Identity", ["cond_in"], outputs=["cond_out"])
    body.node("Add", ["y_in", "one_f"], outputs=["y_out"])
    body.node("Identity", ["y_out"], outputs=["scan_out"])
    body.output("cond_out", DType.BOOL, [])
    body.output("y_out", DType.F32, [1])
    body.output("scan_out", DType.F32, [1])
    g = body.build_graph_proto(WeightStorage.embed())
    y0 = np.array([0.0], np.float32)
    trip = np.asarray(5, np.int64)
    cond = np.asarray(True)
    final = np.array([5.0], np.float32)
    trace = np.arange(1, 6, dtype=np.float32).reshape(5, 1)
    add("loop11", "Loop", {"m": trip, "cond": cond, "y0": y0},
        [final, trace], init=("m", "cond"), body=g)


_loop11_case()


def _scan9_case():
    body = OnnxBuilder("body")
    body.input("sum_in", DType.F32, [2])
    body.input("next", DType.F32, [2])
    body.node("Add", ["sum_in", "next"], outputs=["sum_out"])
    body.node("Identity", ["sum_out"], outputs=["scan_out"])
    body.output("sum_out", DType.F32, [2])
    body.output("scan_out", DType.F32, [2])
    g = body.build_graph_proto(WeightStorage.embed())
    init = np.zeros(2, np.float32)
    seq = np.arange(1, 7, dtype=np.float32).reshape(3, 2)
    final = seq.sum(0)
    partial = np.cumsum(seq, 0)
    add("scan9_sum", "Scan", {"init": init, "seq": seq},
        [final, partial], num_scan_inputs=1, body=g, opset=9)


_scan9_case()

CASES = [c for c in CASES if c is not None]
