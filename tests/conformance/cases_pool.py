"""Conformance cases: pooling matrix (torch-pinned referees) and
scatter / RNN-family variants.

MaxPool/AveragePool x {1d,2d,3d} x {strides,pads,ceil_mode,
count_include_pad,dilations}, Global pools, LpPool; ScatterElements x
{axis,reduction}; ScatterND reductions; LSTM/GRU/RNN direction/bias/
state/seq_lens variants. GRU linear_before_reset=0 (which torch cannot
express) is pinned by a hand-written numpy cell.
"""

import numpy as np
import torch

from .harness import Case

rng = np.random.default_rng(777)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# ---------------------------------------------------------------------------
# MaxPool / AveragePool matrix vs torch
# ---------------------------------------------------------------------------
_P2 = rng.standard_normal((2, 3, 9, 10)).astype(np.float32)
_P1 = rng.standard_normal((2, 3, 13)).astype(np.float32)
_P3 = rng.standard_normal((1, 2, 6, 7, 8)).astype(np.float32)

_MAX2D = [
    # NB: ONNX default strides = 1 (torch defaults to kernel_size)
    ("k2", dict(kernel_shape=[2, 2]), dict(kernel_size=2, stride=1)),
    ("k3s2", dict(kernel_shape=[3, 3], strides=[2, 2]),
     dict(kernel_size=3, stride=2)),
    ("k3s2p1", dict(kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1]),
     dict(kernel_size=3, stride=2, padding=1)),
    ("k3s2_ceil", dict(kernel_shape=[3, 3], strides=[2, 2], ceil_mode=1),
     dict(kernel_size=3, stride=2, ceil_mode=True)),
    ("k3s2p1_ceil", dict(kernel_shape=[3, 3], strides=[2, 2],
                         pads=[1, 1, 1, 1], ceil_mode=1),
     dict(kernel_size=3, stride=2, padding=1, ceil_mode=True)),
    ("k3d2", dict(kernel_shape=[3, 3], dilations=[2, 2]),
     dict(kernel_size=3, stride=1, dilation=2)),
    ("k2x3_asym", dict(kernel_shape=[2, 3], strides=[1, 2]),
     dict(kernel_size=(2, 3), stride=(1, 2))),
    ("k3_p_asym", dict(kernel_shape=[3, 3], strides=[2, 2],
                       pads=[0, 1, 1, 0]), None),  # asymmetric pads: numpy ref
]
for name, attrs, targs in _MAX2D:
    if targs is not None:
        ref = torch.nn.functional.max_pool2d(t(_P2), **targs).numpy()
    else:
        # asymmetric pads: pad -inf then valid torch maxpool
        pb = attrs["pads"][:2]
        pe = attrs["pads"][2:]
        xp = np.pad(_P2, [(0, 0), (0, 0), (pb[0], pe[0]), (pb[1], pe[1])],
                    constant_values=-np.inf)
        ref = torch.nn.functional.max_pool2d(
            t(xp), kernel_size=3, stride=2).numpy()
    add(f"mp2_{name}", "MaxPool", {"x": _P2}, ref, attrs=dict(attrs))

add("mp1_k3s2", "MaxPool", {"x": _P1},
    torch.nn.functional.max_pool1d(t(_P1), 3, 2).numpy(),
    attrs={"kernel_shape": [3], "strides": [2]})
add("mp1_ceil", "MaxPool", {"x": _P1},
    torch.nn.functional.max_pool1d(t(_P1), 3, 2, ceil_mode=True).numpy(),
    attrs={"kernel_shape": [3], "strides": [2], "ceil_mode": 1})
add("mp3_k2", "MaxPool", {"x": _P3},
    torch.nn.functional.max_pool3d(t(_P3), 2, 2).numpy(),
    attrs={"kernel_shape": [2, 2, 2], "strides": [2, 2, 2]})
_PI = rng.integers(-99, 99, (1, 2, 6, 6)).astype(np.int32)
add("mp2_i32", "MaxPool", {"x": _PI},
    torch.nn.functional.max_pool2d(t(_PI.astype(np.float32)), 2, 2)
    .numpy().astype(np.int32),
    attrs={"kernel_shape": [2, 2], "strides": [2, 2]})

_AVG2D = [
    ("k2", dict(kernel_shape=[2, 2]), dict(kernel_size=2, stride=1)),
    ("k3s2", dict(kernel_shape=[3, 3], strides=[2, 2]),
     dict(kernel_size=3, stride=2)),
    ("k3s2p1_inc", dict(kernel_shape=[3, 3], strides=[2, 2],
                        pads=[1, 1, 1, 1], count_include_pad=1),
     dict(kernel_size=3, stride=2, padding=1, count_include_pad=True)),
    ("k3s2p1_exc", dict(kernel_shape=[3, 3], strides=[2, 2],
                        pads=[1, 1, 1, 1]),
     dict(kernel_size=3, stride=2, padding=1, count_include_pad=False)),
    ("k3s2p1_ceil_exc", dict(kernel_shape=[3, 3], strides=[2, 2],
                             pads=[1, 1, 1, 1], ceil_mode=1),
     dict(kernel_size=3, stride=2, padding=1, ceil_mode=True,
          count_include_pad=False)),
    ("k3s2p1_ceil_inc", dict(kernel_shape=[3, 3], strides=[2, 2],
                             pads=[1, 1, 1, 1], ceil_mode=1,
                             count_include_pad=1),
     dict(kernel_size=3, stride=2, padding=1, ceil_mode=True,
          count_include_pad=True)),
]
for name, attrs, targs in _AVG2D:
    ref = torch.nn.functional.avg_pool2d(t(_P2), **targs).numpy()
    add(f"ap2_{name}", "AveragePool", {"x": _P2}, ref, attrs=dict(attrs),
        rtol=1e-5, atol=1e-6)

add("ap1_k4s3", "AveragePool", {"x": _P1},
    torch.nn.functional.avg_pool1d(t(_P1), 4, 3).numpy(),
    attrs={"kernel_shape": [4], "strides": [3]}, rtol=1e-5, atol=1e-6)
add("ap3_k2", "AveragePool", {"x": _P3},
    torch.nn.functional.avg_pool3d(t(_P3), 2, 2).numpy(),
    attrs={"kernel_shape": [2, 2, 2], "strides": [2, 2, 2]},
    rtol=1e-5, atol=1e-6)

add("gmp2", "GlobalMaxPool", {"x": _P2},
    t(_P2).amax(dim=(2, 3), keepdim=True).numpy())
add("gap2", "GlobalAveragePool", {"x": _P2},
    t(_P2).mean(dim=(2, 3), keepdim=True).numpy(), rtol=1e-5, atol=1e-6)
add("gmp1", "GlobalMaxPool", {"x": _P1},
    t(_P1).amax(dim=2, keepdim=True).numpy())
add("gap3", "GlobalAveragePool", {"x": _P3},
    t(_P3).mean(dim=(2, 3, 4), keepdim=True).numpy(), rtol=1e-5, atol=1e-6)

add("lp2_p2", "LpPool", {"x": _P2},
    torch.nn.functional.lp_pool2d(t(_P2), 2, 3, 2).numpy(),
    attrs={"kernel_shape": [3, 3], "strides": [2, 2], "p": 2},
    rtol=1e-4, atol=1e-5)


def _lp_ref(x, k, s, p):
    oh = (x.shape[2] - k) // s + 1
    ow = (x.shape[3] - k) // s + 1
    out = np.zeros(x.shape[:2] + (oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            w = np.abs(x[:, :, i * s:i * s + k, j * s:j * s + k]) ** p
            out[:, :, i, j] = w.sum(axis=(2, 3)) ** (1.0 / p)
    return out


add("lp2_p3", "LpPool", {"x": _P2}, _lp_ref(_P2, 3, 3, 3),
    attrs={"kernel_shape": [3, 3], "strides": [3, 3], "p": 3},
    rtol=1e-4, atol=1e-5)
add("lp2_p1", "LpPool", {"x": _P2}, _lp_ref(_P2, 2, 2, 1),
    attrs={"kernel_shape": [2, 2], "strides": [2, 2], "p": 1},
    rtol=1e-4, atol=1e-5)

# ---------------------------------------------------------------------------
# ScatterElements matrix (torch scatter referees)
# ---------------------------------------------------------------------------
_SD = rng.standard_normal((5, 6)).astype(np.float32)
_SI0 = rng.integers(0, 5, (3, 6)).astype(np.int64)
_SU0 = rng.standard_normal((3, 6)).astype(np.float32)
_SI1 = rng.integers(0, 6, (5, 4)).astype(np.int64)
_SU1 = rng.standard_normal((5, 4)).astype(np.float32)

add("se_ax0_none", "ScatterElements", {"d": _SD, "i": _SI0, "u": _SU0},
    t(_SD).scatter(0, t(_SI0), t(_SU0)).numpy())
add("se_ax1_none", "ScatterElements", {"d": _SD, "i": _SI1, "u": _SU1},
    t(_SD).scatter(1, t(_SI1), t(_SU1)).numpy(), attrs={"axis": 1})
add("se_ax0_add", "ScatterElements", {"d": _SD, "i": _SI0, "u": _SU0},
    t(_SD).scatter_add(0, t(_SI0), t(_SU0)).numpy(),
    attrs={"reduction": "add"})
add("se_ax1_mul", "ScatterElements", {"d": _SD, "i": _SI1, "u": _SU1},
    t(_SD).scatter_reduce(1, t(_SI1), t(_SU1), "prod").numpy(),
    attrs={"axis": 1, "reduction": "mul"})
add("se_ax0_max", "ScatterElements", {"d": _SD, "i": _SI0, "u": _SU0},
    t(_SD).scatter_reduce(0, t(_SI0), t(_SU0), "amax").numpy(),
    attrs={"reduction": "max"})
add("se_ax0_min", "ScatterElements", {"d": _SD, "i": _SI0, "u": _SU0},
    t(_SD).scatter_reduce(0, t(_SI0), t(_SU0), "amin").numpy(),
    attrs={"reduction": "min"})
# negative indices + int dtype + deprecated Scatter alias
_SIN = _SI0 - 5
add("se_negative_idx", "ScatterElements", {"d": _SD, "i": _SIN, "u": _SU0},
    t(_SD).scatter(0, t(_SI0), t(_SU0)).numpy())
_SDI = rng.integers(-50, 50, (4, 4)).astype(np.int64)
_SII = rng.integers(0, 4, (2, 4)).astype(np.int64)
_SUI = rng.integers(-50, 50, (2, 4)).astype(np.int64)
add("se_i64", "ScatterElements", {"d": _SDI, "i": _SII, "u": _SUI},
    t(_SDI).scatter(0, t(_SII), t(_SUI)).numpy())
add("scatter_alias_opset9", "Scatter", {"d": _SD, "i": _SI0, "u": _SU0},
    t(_SD).scatter(0, t(_SI0), t(_SU0)).numpy(), opset=9)

# ScatterND with reductions (numpy referees)
_ND = rng.standard_normal((4, 3)).astype(np.float32)
_NDI = np.asarray([[0], [2], [0]], dtype=np.int64)
_NDU = rng.standard_normal((3, 3)).astype(np.float32)
_rmul = _ND.copy()
np.multiply.at(_rmul, (_NDI.reshape(-1),), _NDU)
add("snd_mul", "ScatterND", {"d": _ND, "i": _NDI, "u": _NDU}, _rmul,
    attrs={"reduction": "mul"})
_rmax = _ND.copy()
np.maximum.at(_rmax, (_NDI.reshape(-1),), _NDU)
add("snd_max", "ScatterND", {"d": _ND, "i": _NDI, "u": _NDU}, _rmax,
    attrs={"reduction": "max"})
_rmin = _ND.copy()
np.minimum.at(_rmin, (_NDI.reshape(-1),), _NDU)
add("snd_min", "ScatterND", {"d": _ND, "i": _NDI, "u": _NDU}, _rmin,
    attrs={"reduction": "min"})

# GatherND batch_dims
_GD = rng.standard_normal((2, 5, 4)).astype(np.float32)
_GI = rng.integers(0, 5, (2, 3, 1)).astype(np.int64)
ref = np.stack([_GD[b][_GI[b, :, 0]] for b in range(2)])
add("gnd_batch1", "GatherND", {"d": _GD, "i": _GI}, ref,
    attrs={"batch_dims": 1})
_GD2 = rng.standard_normal((2, 3, 6, 4)).astype(np.float32)
_GI2 = rng.integers(0, 6, (2, 3, 1)).astype(np.int64)
ref2 = np.stack([np.stack([_GD2[a, b, _GI2[a, b, 0]] for b in range(3)])
                 for a in range(2)])
add("gnd_batch2", "GatherND", {"d": _GD2, "i": _GI2}, ref2,
    attrs={"batch_dims": 2})
# GatherElements negative indices
_GED = rng.standard_normal((4, 5)).astype(np.float32)
_GEI = rng.integers(-4, 4, (2, 5)).astype(np.int64)
add("ge_negative", "GatherElements", {"d": _GED, "i": _GEI},
    np.take_along_axis(_GED, np.where(_GEI < 0, _GEI + 4, _GEI), axis=0))

# ---------------------------------------------------------------------------
# LSTM / GRU / RNN variants
# ---------------------------------------------------------------------------
S, B, I, H = 4, 3, 3, 4


def _lstm_np(x, W, R, Bi=None, seq=None, h0=None, c0=None,
             direction="forward"):
    nd = W.shape[0]
    Sx, Bn, _ = x.shape
    sig = lambda v: 1 / (1 + np.exp(-v))
    Y = np.zeros((Sx, nd, Bn, H), np.float32)
    Yh = np.zeros((nd, Bn, H), np.float32)
    Yc = np.zeros((nd, Bn, H), np.float32)
    for d in range(nd):
        rev = direction == "reverse" or d == 1
        bias = (Bi[d][:4 * H] + Bi[d][4 * H:]) if Bi is not None else 0
        h = (h0[d] if h0 is not None else np.zeros((Bn, H), np.float32)).copy()
        c = (c0[d] if c0 is not None else np.zeros((Bn, H), np.float32)).copy()
        for tt in (range(Sx - 1, -1, -1) if rev else range(Sx)):
            g = x[tt] @ W[d].T + h @ R[d].T + bias
            i_, o_, f_, cc = g[:, :H], g[:, H:2*H], g[:, 2*H:3*H], g[:, 3*H:]
            c2 = sig(f_) * c + sig(i_) * np.tanh(cc)
            h2 = sig(o_) * np.tanh(c2)
            if seq is not None:
                act = (tt < seq)[:, None]
                h2 = np.where(act, h2, h)
                c2 = np.where(act, c2, c)
                Y[tt, d] = np.where(act, h2, 0)
            else:
                Y[tt, d] = h2
            h, c = h2, c2
        Yh[d], Yc[d] = h, c
    return Y, Yh, Yc


_LX = rng.standard_normal((S, B, I)).astype(np.float32)
_LW2 = (rng.standard_normal((2, 4 * H, I)) / 2).astype(np.float32)
_LR2 = (rng.standard_normal((2, 4 * H, H)) / 2).astype(np.float32)
_LB2 = (rng.standard_normal((2, 8 * H)) / 4).astype(np.float32)
_SEQ = np.asarray([4, 2, 1], dtype=np.int32)
_H0 = rng.standard_normal((2, B, H)).astype(np.float32) / 2
_C0 = rng.standard_normal((2, B, H)).astype(np.float32) / 2

y, yh, yc = _lstm_np(_LX, _LW2, _LR2, _LB2, direction="bidirectional")
add("lstm_bidir", "LSTM", {"x": _LX, "w": _LW2, "r": _LR2, "b": _LB2},
    [y, yh, yc], attrs={"hidden_size": H, "direction": "bidirectional"},
    rtol=1e-4, atol=1e-5)
y, yh, yc = _lstm_np(_LX, _LW2[:1], _LR2[:1], _LB2[:1], seq=_SEQ)
add("lstm_seq_lens", "LSTM",
    {"x": _LX, "w": _LW2[:1], "r": _LR2[:1], "b": _LB2[:1], "sl": _SEQ},
    [y, yh, yc], attrs={"hidden_size": H}, rtol=1e-4, atol=1e-5)
y, yh, yc = _lstm_np(_LX, _LW2[:1], _LR2[:1], _LB2[:1], h0=_H0[:1], c0=_C0[:1])
add("lstm_initial_state", "LSTM",
    {"x": _LX, "w": _LW2[:1], "r": _LR2[:1], "b": _LB2[:1],
     "sl": np.full(B, S, np.int32), "h0": _H0[:1], "c0": _C0[:1]},
    [y, yh, yc], attrs={"hidden_size": H}, rtol=1e-4, atol=1e-5)
y, yh, yc = _lstm_np(_LX, _LW2[:1], _LR2[:1], None)
add("lstm_no_bias", "LSTM", {"x": _LX, "w": _LW2[:1], "r": _LR2[:1]},
    [y, yh, yc], attrs={"hidden_size": H}, rtol=1e-4, atol=1e-5)


def _gru_np(x, W, R, Bi=None, lbr=False, seq=None, direction="forward"):
    nd = W.shape[0]
    Sx, Bn, _ = x.shape
    sig = lambda v: 1 / (1 + np.exp(-v))
    Y = np.zeros((Sx, nd, Bn, H), np.float32)
    Yh = np.zeros((nd, Bn, H), np.float32)
    for d in range(nd):
        rev = direction == "reverse" or d == 1
        wb = Bi[d][:3 * H] if Bi is not None else np.zeros(3 * H, np.float32)
        rb = Bi[d][3 * H:] if Bi is not None else np.zeros(3 * H, np.float32)
        h = np.zeros((Bn, H), np.float32)
        for tt in (range(Sx - 1, -1, -1) if rev else range(Sx)):
            gx = x[tt] @ W[d].T + wb
            gh = h @ R[d].T + rb
            z = sig(gx[:, :H] + gh[:, :H])
            r = sig(gx[:, H:2*H] + gh[:, H:2*H])
            if lbr:
                hh = np.tanh(gx[:, 2*H:] + r * gh[:, 2*H:])
            else:
                hh = np.tanh(gx[:, 2*H:] + (r * h) @ R[d][2*H:].T + rb[2*H:])
            h2 = (1 - z) * hh + z * h
            if seq is not None:
                act = (tt < seq)[:, None]
                h2 = np.where(act, h2, h)
                Y[tt, d] = np.where(act, h2, 0)
            else:
                Y[tt, d] = h2
            h = h2
        Yh[d] = h
    return Y, Yh


_GW2 = (rng.standard_normal((2, 3 * H, I)) / 2).astype(np.float32)
_GR2 = (rng.standard_normal((2, 3 * H, H)) / 2).astype(np.float32)
_GB2 = (rng.standard_normal((2, 6 * H)) / 4).astype(np.float32)
for lbr in (0, 1):
    y, yh = _gru_np(_LX, _GW2[:1], _GR2[:1], _GB2[:1], lbr=bool(lbr))
    add(f"gru_lbr{lbr}", "GRU",
        {"x": _LX, "w": _GW2[:1], "r": _GR2[:1], "b": _GB2[:1]},
        [y, yh], attrs={"hidden_size": H, "linear_before_reset": lbr},
        rtol=1e-4, atol=1e-5)
y, yh = _gru_np(_LX, _GW2, _GR2, _GB2, lbr=True, direction="bidirectional")
add("gru_bidir", "GRU", {"x": _LX, "w": _GW2, "r": _GR2, "b": _GB2},
    [y, yh], attrs={"hidden_size": H, "direction": "bidirectional",
                    "linear_before_reset": 1}, rtol=1e-4, atol=1e-5)
y, yh = _gru_np(_LX, _GW2[:1], _GR2[:1], _GB2[:1], lbr=True, seq=_SEQ)
add("gru_seq_lens", "GRU",
    {"x": _LX, "w": _GW2[:1], "r": _GR2[:1], "b": _GB2[:1], "sl": _SEQ},
    [y, yh], attrs={"hidden_size": H, "linear_before_reset": 1},
    rtol=1e-4, atol=1e-5)
y, yh = _gru_np(_LX, _GW2[:1], _GR2[:1], None, lbr=True,
                direction="reverse")
add("gru_reverse_nobias", "GRU", {"x": _LX, "w": _GW2[:1], "r": _GR2[:1]},
    [y, yh], attrs={"hidden_size": H, "direction": "reverse",
                    "linear_before_reset": 1}, rtol=1e-4, atol=1e-5)


def _rnn_np(x, W, R, Bi=None, act=np.tanh, direction="forward"):
    nd = W.shape[0]
    Sx, Bn, _ = x.shape
    Y = np.zeros((Sx, nd, Bn, H), np.float32)
    Yh = np.zeros((nd, Bn, H), np.float32)
    for d in range(nd):
        rev = direction == "reverse" or d == 1
        bias = (Bi[d][:H] + Bi[d][H:]) if Bi is not None else 0
        h = np.zeros((Bn, H), np.float32)
        for tt in (range(Sx - 1, -1, -1) if rev else range(Sx)):
            h = act(x[tt] @ W[d].T + h @ R[d].T + bias)
            Y[tt, d] = h
        Yh[d] = h
    return Y, Yh


_RW2 = (rng.standard_normal((2, H, I)) / 2).astype(np.float32)
_RR2 = (rng.standard_normal((2, H, H)) / 2).astype(np.float32)
_RB2 = (rng.standard_normal((2, 2 * H)) / 4).astype(np.float32)
y, yh = _rnn_np(_LX, _RW2[:1], _RR2[:1], _RB2[:1])
add("rnn_tanh", "RNN", {"x": _LX, "w": _RW2[:1], "r": _RR2[:1], "b": _RB2[:1]},
    [y, yh], attrs={"hidden_size": H}, rtol=1e-4, atol=1e-5)
y, yh = _rnn_np(_LX, _RW2[:1], _RR2[:1], _RB2[:1],
                act=lambda v: np.maximum(v, 0))
add("rnn_relu", "RNN", {"x": _LX, "w": _RW2[:1], "r": _RR2[:1], "b": _RB2[:1]},
    [y, yh], attrs={"hidden_size": H, "activations": ["Relu"]},
    rtol=1e-4, atol=1e-5)
y, yh = _rnn_np(_LX, _RW2, _RR2, _RB2, direction="bidirectional")
add("rnn_bidir", "RNN", {"x": _LX, "w": _RW2, "r": _RR2, "b": _RB2},
    [y, yh], attrs={"hidden_size": H, "direction": "bidirectional"},
    rtol=1e-4, atol=1e-5)
