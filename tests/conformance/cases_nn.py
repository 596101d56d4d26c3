"""Conformance cases: matmul/gemm, conv family, norms, softmax, resize,
LSTM, STFT, attention/rotary, control flow."""

import numpy as np
import torch

import ml_dtypes

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)

from .harness import Case

rng = np.random.default_rng(99)
CASES = []


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def add(name, op, inputs, expected, **kw):
    CASES.append(Case(name, op, inputs, [np.asarray(e) for e in (
        expected if isinstance(expected, (list, tuple)) else [expected])], **kw))


# -- matmul / gemm -----------------------------------------------------------
_MA = rng.standard_normal((3, 4)).astype(np.float32)
_MB = rng.standard_normal((4, 5)).astype(np.float32)
_MC = rng.standard_normal((3, 5)).astype(np.float32)
add("matmul_2d", "MatMul", {"a": _MA, "b": _MB}, _MA @ _MB, atol=1e-5)
_BA = rng.standard_normal((2, 3, 4)).astype(np.float32)
add("matmul_batched", "MatMul", {"a": _BA, "b": _MB}, _BA @ _MB, atol=1e-5)
_B2 = rng.standard_normal((2, 4, 5)).astype(np.float32)
add("matmul_bcast_batch", "MatMul", {"a": _BA, "b": _B2}, _BA @ _B2, atol=1e-5)
_V1 = rng.standard_normal(4).astype(np.float32)
add("matmul_vec_left", "MatMul", {"a": _V1, "b": _MB}, _V1 @ _MB, atol=1e-5)
add("matmul_vec_right", "MatMul", {"a": _MA, "b": _V1}, _MA @ _V1, atol=1e-5)
add("matmul_f64", "MatMul", {"a": _MA.astype(np.float64), "b": _MB.astype(np.float64)},
    _MA.astype(np.float64) @ _MB.astype(np.float64))
_IA = rng.integers(-5, 5, (3, 4)).astype(np.int32)
_IB = rng.integers(-5, 5, (4, 2)).astype(np.int32)
add("matmul_i32", "MatMul", {"a": _IA, "b": _IB}, _IA @ _IB)
_BFA = rng.standard_normal((8, 16)).astype(ml_dtypes.bfloat16)
_BFB = rng.standard_normal((16, 8)).astype(ml_dtypes.bfloat16)
add("matmul_bf16_f32acc", "MatMul", {"a": _BFA, "b": _BFB},
    (_BFA.astype(np.float32) @ _BFB.astype(np.float32)).astype(ml_dtypes.bfloat16),
    rtol=1e-2, atol=1e-2)

add("gemm_basic", "Gemm", {"a": _MA, "b": _MB, "c": _MC}, _MA @ _MB + _MC,
    atol=1e-5)
add("gemm_alpha_beta", "Gemm", {"a": _MA, "b": _MB, "c": _MC},
    0.5 * (_MA @ _MB) + 2.0 * _MC, attrs={"alpha": 0.5, "beta": 2.0}, atol=1e-5)
add("gemm_transA", "Gemm", {"a": _MA.T.copy(), "b": _MB, "c": _MC},
    _MA @ _MB + _MC, attrs={"transA": 1}, atol=1e-5)
add("gemm_transB", "Gemm", {"a": _MA, "b": _MB.T.copy(), "c": _MC},
    _MA @ _MB + _MC, attrs={"transB": 1}, atol=1e-5)
add("gemm_no_c", "Gemm", {"a": _MA, "b": _MB}, _MA @ _MB, atol=1e-5)
add("gemm_c_bcast", "Gemm", {"a": _MA, "b": _MB,
                             "c": rng.standard_normal(5).astype(np.float32)},
    None, atol=1e-5)
CASES[-1].expected = [_MA @ _MB + CASES[-1].inputs["c"]]

# -- conv family ---------------------------------------------------------------
_CX = rng.standard_normal((1, 3, 8, 9)).astype(np.float32)
_CW = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
_CB = rng.standard_normal(5).astype(np.float32)
add("conv2d_basic", "Conv", {"x": _CX, "w": _CW},
    torch.conv2d(t(_CX), t(_CW)).numpy(), atol=1e-4)
add("conv2d_pad_stride", "Conv", {"x": _CX, "w": _CW, "b": _CB},
    torch.conv2d(t(_CX), t(_CW), t(_CB), stride=(2, 1), padding=(1, 2)).numpy(),
    attrs={"strides": [2, 1], "pads": [1, 2, 1, 2]}, atol=1e-4)
add("conv2d_dilated", "Conv", {"x": _CX, "w": _CW},
    torch.conv2d(t(_CX), t(_CW), dilation=2).numpy(),
    attrs={"dilations": [2, 2]}, atol=1e-4)
_GX = rng.standard_normal((2, 4, 10)).astype(np.float32)
_GW = rng.standard_normal((6, 2, 3)).astype(np.float32)
add("conv1d_grouped", "Conv", {"x": _GX, "w": _GW},
    torch.conv1d(t(_GX), t(_GW), groups=2).numpy(),
    attrs={"group": 2}, atol=1e-4)
_DX = rng.standard_normal((2, 4, 10)).astype(np.float32)
_DW = rng.standard_normal((4, 1, 3)).astype(np.float32)
add("conv1d_depthwise", "Conv", {"x": _DX, "w": _DW},
    torch.conv1d(t(_DX), t(_DW), groups=4, padding=1).numpy(),
    attrs={"group": 4, "pads": [1, 1]}, atol=1e-4)
_C3X = rng.standard_normal((1, 2, 4, 5, 6)).astype(np.float32)
_C3W = rng.standard_normal((3, 2, 2, 2, 2)).astype(np.float32)
add("conv3d", "Conv", {"x": _C3X, "w": _C3W},
    torch.conv3d(t(_C3X), t(_C3W)).numpy(), atol=1e-4)

_TX = rng.standard_normal((1, 4, 5, 6)).astype(np.float32)
_TW = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
add("convtranspose_basic", "ConvTranspose", {"x": _TX, "w": _TW},
    torch.conv_transpose2d(t(_TX), t(_TW)).numpy(), atol=1e-4)
add("convtranspose_stride_pad", "ConvTranspose", {"x": _TX, "w": _TW},
    torch.conv_transpose2d(t(_TX), t(_TW), stride=2, padding=1,
                           output_padding=1).numpy(),
    attrs={"strides": [2, 2], "pads": [1, 1, 1, 1], "output_padding": [1, 1]},
    atol=1e-4)

# -- norms / softmax --------------------------------------------------------------
_NX = rng.standard_normal((2, 5, 8)).astype(np.float32)
_NG = rng.standard_normal(8).astype(np.float32)
_NB = rng.standard_normal(8).astype(np.float32)
add("layernorm", "LayerNormalization", {"x": _NX, "g": _NG, "b": _NB},
    torch.nn.functional.layer_norm(t(_NX), (8,), t(_NG), t(_NB)).numpy(),
    atol=1e-5)
add("layernorm_no_bias", "LayerNormalization", {"x": _NX, "g": _NG},
    torch.nn.functional.layer_norm(t(_NX), (8,), t(_NG)).numpy(), atol=1e-5)
add("layernorm_axis1", "LayerNormalization",
    {"x": _NX, "g": np.ones((5, 8), np.float32)},
    torch.nn.functional.layer_norm(t(_NX), (5, 8)).numpy(),
    attrs={"axis": 1}, atol=1e-5)
add("rmsnorm", "RMSNormalization", {"x": _NX, "g": _NG},
    (t(_NX) * torch.rsqrt(t(_NX).pow(2).mean(-1, keepdim=True) + 1e-5) * t(_NG)).numpy(),
    atol=1e-5)
_INX = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
_ING = rng.standard_normal(3).astype(np.float32)
_INB = rng.standard_normal(3).astype(np.float32)
add("instancenorm", "InstanceNormalization", {"x": _INX, "g": _ING, "b": _INB},
    torch.nn.functional.instance_norm(
        t(_INX), weight=t(_ING), bias=t(_INB), eps=1e-5).numpy(), atol=1e-5)
_GNG = rng.standard_normal(4).astype(np.float32)
_GNB = rng.standard_normal(4).astype(np.float32)
_GNX = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
add("groupnorm", "GroupNormalization", {"x": _GNX, "g": _GNG, "b": _GNB},
    torch.nn.functional.group_norm(t(_GNX), 2, t(_GNG), t(_GNB)).numpy(),
    attrs={"num_groups": 2}, atol=1e-5)
_BNM = rng.standard_normal(3).astype(np.float32)
_BNV = np.abs(rng.standard_normal(3)).astype(np.float32) + 0.5
add("batchnorm_inference", "BatchNormalization",
    {"x": _INX, "g": _ING, "b": _INB, "m": _BNM, "v": _BNV},
    torch.nn.functional.batch_norm(
        t(_INX), t(_BNM), t(_BNV), t(_ING), t(_INB), eps=1e-5).numpy(),
    atol=1e-5)
add("lpnorm_l2", "LpNormalization", {"x": _NX},
    torch.nn.functional.normalize(t(_NX), p=2, dim=-1).numpy(), atol=1e-5)
add("softmax_lastax", "Softmax", {"x": _NX},
    torch.softmax(t(_NX), -1).numpy(), atol=1e-6)
add("softmax_ax0", "Softmax", {"x": _NX}, torch.softmax(t(_NX), 0).numpy(),
    attrs={"axis": 0}, atol=1e-6)
add("logsoftmax", "LogSoftmax", {"x": _NX},
    torch.log_softmax(t(_NX), -1).numpy(), atol=1e-5)
add("meanvarnorm", "MeanVarianceNormalization", {"x": _INX},
    ((t(_INX) - t(_INX).mean(dim=(0, 2, 3), keepdim=True))
     / (t(_INX).std(dim=(0, 2, 3), unbiased=False, keepdim=True) + 0)).numpy(),
    attrs={"axes": [0, 2, 3]}, rtol=1e-3, atol=1e-4)

# -- resize ------------------------------------------------------------------------
_RX = rng.standard_normal((1, 2, 4, 5)).astype(np.float32)
_EMPTY = np.zeros(0, dtype=np.float32)
add("resize_nearest_floor_asym", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": np.asarray([1, 1, 2, 2], dtype=np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="nearest").numpy(),
    attrs={"mode": "nearest", "coordinate_transformation_mode": "asymmetric",
           "nearest_mode": "floor"})
add("resize_linear_halfpixel", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": np.asarray([1, 1, 2, 2], dtype=np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="bilinear",
                                    align_corners=False).numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
add("resize_linear_aligncorners", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": np.asarray([1, 1, 2, 2], dtype=np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="bilinear",
                                    align_corners=True).numpy(),
    attrs={"mode": "linear", "coordinate_transformation_mode": "align_corners"},
    atol=1e-5)
add("resize_cubic_halfpixel", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": np.asarray([1, 1, 2, 2], dtype=np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=2, mode="bicubic",
                                    align_corners=False).numpy(),
    attrs={"mode": "cubic"}, rtol=1e-3, atol=1e-4)
add("resize_downscale_linear", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": np.asarray([1, 1, 0.5, 0.6], dtype=np.float32)},
    torch.nn.functional.interpolate(t(_RX), scale_factor=(0.5, 0.6),
                                    mode="bilinear", align_corners=False).numpy(),
    attrs={"mode": "linear"}, atol=1e-5)
_sizes = np.asarray([1, 2, 8, 10], dtype=np.int64)
add("resize_sizes_nearest", "Resize",
    {"x": _RX, "roi": _EMPTY, "s": _EMPTY, "sz": _sizes},
    torch.nn.functional.interpolate(t(_RX), size=(8, 10), mode="nearest").numpy(),
    attrs={"mode": "nearest", "coordinate_transformation_mode": "asymmetric",
           "nearest_mode": "floor"})

# -- lstm ---------------------------------------------------------------------------
def _lstm_ref(x, W, R, B, h0=None, c0=None):
    S, Bn, I = x.shape
    H = R.shape[2]
    h = np.zeros((Bn, H), np.float32) if h0 is None else h0[0]
    c = np.zeros((Bn, H), np.float32) if c0 is None else c0[0]
    bias = (B[0][:4 * H] + B[0][4 * H:]) if B is not None else np.zeros(4 * H, np.float32)
    ys = []
    sig = lambda v: 1 / (1 + np.exp(-v))
    for tt in range(S):
        g = x[tt] @ W[0].T + h @ R[0].T + bias
        i, o, f, cc = g[:, :H], g[:, H:2*H], g[:, 2*H:3*H], g[:, 3*H:]
        c = sig(f) * c + sig(i) * np.tanh(cc)
        h = sig(o) * np.tanh(c)
        ys.append(h.copy())
    Y = np.stack(ys)[:, None]
    return Y.astype(np.float32), h[None].astype(np.float32), c[None].astype(np.float32)


_LX = rng.standard_normal((5, 2, 3)).astype(np.float32)
_LW = (rng.standard_normal((1, 16, 3)) * 0.5).astype(np.float32)
_LR = (rng.standard_normal((1, 16, 4)) * 0.5).astype(np.float32)
_LB = (rng.standard_normal((1, 32)) * 0.1).astype(np.float32)
_ly, _lh, _lc = _lstm_ref(_LX, _LW, _LR, _LB)
add("lstm_forward", "LSTM", {"x": _LX, "w": _LW, "r": _LR, "b": _LB},
    [_ly, _lh, _lc], attrs={"hidden_size": 4}, atol=1e-5)
_ly2, _lh2, _lc2 = _lstm_ref(_LX[::-1].copy(), _LW, _LR, _LB)
add("lstm_reverse", "LSTM", {"x": _LX, "w": _LW, "r": _LR, "b": _LB},
    [_ly2[::-1].copy(), _lh2, _lc2],
    attrs={"hidden_size": 4, "direction": "reverse"}, atol=1e-5)

# -- stft -----------------------------------------------------------------------------
_SIG = rng.standard_normal((2, 32)).astype(np.float32)
_WIN = np.hanning(8).astype(np.float32)


def _stft_ref(sig, step, win):
    fl = win.shape[0]
    nf = 1 + (sig.shape[1] - fl) // step
    frames = np.stack([sig[:, i * step:i * step + fl] * win for i in range(nf)], 1)
    spec = np.fft.rfft(frames, axis=-1)
    return np.stack([spec.real, spec.imag], -1).astype(np.float32)


add("stft_onesided", "STFT",
    {"sig": _SIG, "fs": np.asarray(4, dtype=np.int64), "win": _WIN},
    _stft_ref(_SIG, 4, _WIN), atol=1e-4)

# -- attention / rotary ------------------------------------------------------------
_Q = rng.standard_normal((2, 2, 6, 8)).astype(np.float32)
_K = rng.standard_normal((2, 2, 6, 8)).astype(np.float32)
_V = rng.standard_normal((2, 2, 6, 8)).astype(np.float32)
add("attention_basic", "Attention", {"q": _Q, "k": _K, "v": _V},
    torch.nn.functional.scaled_dot_product_attention(t(_Q), t(_K), t(_V)).numpy(),
    atol=1e-5)
add("attention_causal", "Attention", {"q": _Q, "k": _K, "v": _V},
    torch.nn.functional.scaled_dot_product_attention(
        t(_Q), t(_K), t(_V), is_causal=True).numpy(),
    attrs={"is_causal": 1}, atol=1e-5)
_MASK = (rng.uniform(size=(2, 1, 6, 6)) > 0.3).astype(np.float32) * 0 + \
        np.where(rng.uniform(size=(2, 1, 6, 6)) > 0.3, 0.0, -1e30).astype(np.float32)
add("attention_mask", "Attention", {"q": _Q, "k": _K, "v": _V, "m": _MASK},
    torch.nn.functional.scaled_dot_product_attention(
        t(_Q), t(_K), t(_V), attn_mask=t(_MASK)).numpy(), atol=1e-5)
_KG = rng.standard_normal((2, 1, 6, 8)).astype(np.float32)
_VG = rng.standard_normal((2, 1, 6, 8)).astype(np.float32)
add("attention_gqa", "Attention", {"q": _Q, "k": _KG, "v": _VG},
    torch.nn.functional.scaled_dot_product_attention(
        t(_Q), t(_KG), t(_VG), enable_gqa=True).numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# RotaryEmbedding (interleaved + halves + explicit positions)
# ---------------------------------------------------------------------------
def _rope_ref(x, cos, sin, pos=None, interleaved=False):
    B, H, S, D = x.shape
    c = cos[pos] if pos is not None else cos[:S]
    s = sin[pos] if pos is not None else sin[:S]
    while c.ndim < 3:
        c, s = c[None], s[None]
    c = c[:, None]
    s = s[:, None]
    out = x.astype(np.float64).copy()
    if interleaved:
        x1, x2 = x[..., 0::2].astype(np.float64), x[..., 1::2].astype(np.float64)
        out[..., 0::2] = x1 * c - x2 * s
        out[..., 1::2] = x2 * c + x1 * s
    else:
        half = D // 2
        x1, x2 = x[..., :half].astype(np.float64), x[..., half:].astype(np.float64)
        out[..., :half] = x1 * c - x2 * s
        out[..., half:] = x2 * c + x1 * s
    return out.astype(np.float32)


_RX = rng.standard_normal((2, 2, 4, 8)).astype(np.float32)
_ang = np.arange(6)[:, None] * (0.5 ** np.arange(4))[None]
_RC = np.cos(_ang).astype(np.float32)
_RS = np.sin(_ang).astype(np.float32)
add("rotary_halves", "RotaryEmbedding",
    {"x": _RX, "cos": _RC, "sin": _RS},
    _rope_ref(_RX, _RC, _RS, interleaved=False))
add("rotary_interleaved", "RotaryEmbedding",
    {"x": _RX, "cos": _RC, "sin": _RS},
    _rope_ref(_RX, _RC, _RS, interleaved=True),
    attrs={"interleaved": 1})
_POS = np.asarray([3, 1, 4, 0], dtype=np.int64)
add("rotary_positions", "RotaryEmbedding",
    {"x": _RX, "cos": _RC, "sin": _RS, "pos": _POS},
    _rope_ref(_RX, _RC, _RS, pos=_POS, interleaved=True),
    attrs={"interleaved": 1})

# Attention variants: GQA + additive mask + softcap
_Q4 = rng.standard_normal((1, 4, 3, 8)).astype(np.float32)
_K1 = rng.standard_normal((1, 1, 5, 8)).astype(np.float32)
_V1 = rng.standard_normal((1, 1, 5, 8)).astype(np.float32)


def _attn_ref(q, k, v, mask=None, scale=None, softcap=0.0):
    Hq, Hkv = q.shape[1], k.shape[1]
    k = np.repeat(k, Hq // Hkv, axis=1)
    v = np.repeat(v, Hq // Hkv, axis=1)
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64))
    s *= (scale if scale is not None else q.shape[-1] ** -0.5)
    if softcap:
        s = softcap * np.tanh(s / softcap)
    if mask is not None:
        s = s + mask
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64)).astype(np.float32)


add("attention_gqa_h4kv1", "Attention", {"q": _Q4, "k": _K1, "v": _V1},
    _attn_ref(_Q4, _K1, _V1), rtol=2e-3, atol=1e-5)
_MASK = np.where(rng.uniform(size=(1, 1, 3, 5)) > 0.4, 0.0,
                 -1e9).astype(np.float32)
add("attention_gqa_h4kv1_mask", "Attention",
    {"q": _Q4, "k": _K1, "v": _V1, "mask": _MASK},
    _attn_ref(_Q4, _K1, _V1, mask=_MASK), rtol=2e-3, atol=1e-5)
add("attention_softcap", "Attention", {"q": _Q4, "k": _K1, "v": _V1},
    _attn_ref(_Q4, _K1, _V1, softcap=5.0), attrs={"softcap": 5.0},
    rtol=2e-3, atol=1e-5)

# Dropout: inference mode is identity (single output)
_DX = rng.standard_normal((3, 4)).astype(np.float32)
add("dropout_inference", "Dropout", {"x": _DX}, _DX)
