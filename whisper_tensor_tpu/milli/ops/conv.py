"""Conv / ConvTranspose / conv gradients / Resize milli ops.

Reference equivalents: src/milli_graph/ops/conv.rs (Conv + ConvInputGrad/
ConvWeightGrad/ConvBiasGrad) and ops/resize.rs. The oracle implements
N-d convolution directly (kernel-position accumulation over strided
slices — no torch); the XLA path maps to lax.conv_general_dilated,
which XLA tiles onto the MXU. Resize shares one host-side index/weight
computation between the numpy and JAX paths so all ONNX
coordinate-transformation modes behave identically on both backends.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ...dtype import DType
from ...scalar_info import ScalarInfo
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp, Phase
from .common import downcast_result, upcast_for_compute


def _conv_out_size(in_size, k, stride, dil, pad_begin, pad_end):
    eff_k = (k - 1) * dil + 1
    return (in_size + pad_begin + pad_end - eff_k) // stride + 1


def _conv_precision(dtype):
    """f32/f64/f16 convs need true-precision MXU passes: the TPU default
    (bf16 single-pass) shows ~0.5% error vs the oracle on-chip, which
    fails ONNX conformance tolerances; f16's 10-bit mantissa would
    truncate to bf16's 7. bf16/int are natively exact.
    Same rule as MatMul (basic.py) and Einsum."""
    import jax
    import jax.numpy as jnp

    return (jax.lax.Precision.HIGHEST
            if dtype in (jnp.float32, jnp.float64, jnp.float16) else None)


def _np_conv(x, w, bias, strides, pads, dilations, groups):
    """x: (N, Cin, *sp); w: (Cout, Cin/g, *k). pads: [b0..bn, e0..en]."""
    nsp = x.ndim - 2
    strides = list(strides or [1] * nsp)
    dilations = list(dilations or [1] * nsp)
    pads = list(pads or [0] * (2 * nsp))
    pb, pe = pads[:nsp], pads[nsp:]
    xp = np.pad(x, [(0, 0), (0, 0)] + [(pb[i], pe[i]) for i in range(nsp)])
    N, Cin = x.shape[:2]
    Cout = w.shape[0]
    ksp = w.shape[2:]
    osp = [_conv_out_size(x.shape[2 + i], ksp[i], strides[i], dilations[i], pb[i], pe[i])
           for i in range(nsp)]
    icg = Cin // groups
    ocg = Cout // groups
    out = np.zeros((N, Cout, *osp), dtype=x.dtype)
    for kpos in itertools.product(*[range(k) for k in ksp]):
        sl = tuple(
            slice(kpos[i] * dilations[i],
                  kpos[i] * dilations[i] + strides[i] * (osp[i] - 1) + 1,
                  strides[i])
            for i in range(nsp))
        xs = xp[(slice(None), slice(None)) + sl]  # (N, Cin, *osp)
        wk = w[(slice(None), slice(None)) + kpos]  # (Cout, icg)
        if groups == 1:
            out += np.einsum("nc...,oc->no...", xs, wk)
        else:
            xs_g = xs.reshape(N, groups, icg, *osp)
            wk_g = wk.reshape(groups, ocg, icg)
            og = np.einsum("ngc...,goc->ngo...", xs_g, wk_g)
            out += og.reshape(N, Cout, *osp)
    if bias is not None:
        out += bias.reshape((1, -1) + (1,) * nsp)
    return out


@dataclass
class Conv(MilliOp):
    """inputs: x, w[, bias]. Explicit pads, or auto_pad SAME_UPPER /
    SAME_LOWER resolved here from the runtime shapes."""

    strides: Optional[List[int]] = None
    pads: Optional[List[int]] = None
    dilations: Optional[List[int]] = None
    groups: int = 1
    auto_pad: str = "NOTSET"
    KIND = "Conv"

    def _pads(self, x_shape, w_shape):
        if self.auto_pad not in ("SAME_UPPER", "SAME_LOWER"):
            return self.pads
        nsp = len(x_shape) - 2
        s = list(self.strides or [1] * nsp)
        d = list(self.dilations or [1] * nsp)
        k = list(w_shape[2:])
        pb, pe = [], []
        for i in range(nsp):
            eff = (k[i] - 1) * d[i] + 1
            o = -(-x_shape[2 + i] // s[i])
            total = max((o - 1) * s[i] + eff - x_shape[2 + i], 0)
            small, big = total // 2, total - total // 2
            if self.auto_pad == "SAME_UPPER":
                pb.append(small)
                pe.append(big)
            else:
                pb.append(big)
                pe.append(small)
        return pb + pe

    def eval(self, inputs):
        x, w = inputs[0], inputs[1]
        bias = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        xc, orig = upcast_for_compute(x)
        wc, _ = upcast_for_compute(w)
        bc = upcast_for_compute(bias)[0] if bias is not None else None
        out = _np_conv(xc, wc, bc, self.strides,
                       self._pads(x.shape, w.shape), self.dilations,
                       self.groups)
        return [downcast_result(out, orig)]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        x, w = inputs[0], inputs[1]
        nsp = x.ndim - 2
        strides = tuple(self.strides or [1] * nsp)
        dil = tuple(self.dilations or [1] * nsp)
        pads = list(self._pads(x.shape, w.shape) or [0] * (2 * nsp))
        pad_pairs = tuple((pads[i], pads[i + nsp]) for i in range(nsp))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NCHW"[:2 + nsp] if nsp <= 2 else None,
                                             "OIHW"[:2 + nsp] if nsp <= 2 else None,
                                             "NCHW"[:2 + nsp] if nsp <= 2 else None)
                                            if nsp <= 2 else None)
        acc = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else None
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=pad_pairs,
            rhs_dilation=dil, dimension_numbers=dn,
            feature_group_count=self.groups,
            preferred_element_type=acc,
            precision=_conv_precision(x.dtype))
        out = out.astype(x.dtype)
        if len(inputs) > 2 and inputs[2] is not None:
            out = out + inputs[2].reshape((1, -1) + (1,) * nsp)
        return [out]

    def infer(self, infos):
        x, w = infos[0], infos[1]
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        dx, dw = x.dims(), w.dims()
        if dx is not None and dw is not None:
            nsp = len(dx) - 2
            strides = self.strides or [1] * nsp
            dil = self.dilations or [1] * nsp
            if self.auto_pad in ("SAME_UPPER", "SAME_LOWER") and \
                    all(d.is_known for d in list(dx) + list(dw)):
                pads = list(self._pads([int(d.value()) for d in dx],
                                       [int(d.value()) for d in dw]))
            else:
                pads = list(self.pads or [0] * (2 * nsp))
            out = [dx[0], dw[0]]
            for i in range(nsp):
                if dx[2 + i].is_known and dw[2 + i].is_known:
                    out.append(ScalarInfo.of(_conv_out_size(
                        int(dx[2 + i].value()), int(dw[2 + i].value()),
                        strides[i], dil[i], pads[i], pads[i + nsp])))
                else:
                    return [TensorInfo.ranked(x.dtype, len(dx))]
            return [TensorInfo.shaped(x.dtype, out)]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None] * len(node.inputs)
        P = Phase.BACKWARD
        from .shape import Shape

        x, w = node.inputs[0], node.inputs[1]
        xs = b.op1(Shape(), x, phase=P)
        ws = b.op1(Shape(), w, phase=P)
        gx = b.op1(ConvInputGrad(self.strides, self.pads, self.dilations, self.groups),
                   xs, w, g, phase=P)
        gw = b.op1(ConvWeightGrad(self.strides, self.pads, self.dilations, self.groups),
                   ws, x, g, phase=P)
        grads = [gx, gw]
        if len(node.inputs) > 2:
            gb = b.op1(ConvBiasGrad(), g, phase=P)
            grads.append(gb)
        return grads


@dataclass
class ConvInputGrad(MilliOp):
    """(x_shape, w, grad) -> dX. Transposed convolution of grad by w."""

    strides: Optional[List[int]] = None
    pads: Optional[List[int]] = None
    dilations: Optional[List[int]] = None
    groups: int = 1
    KIND = "ConvInputGrad"

    def _compute_np(self, x_shape, w, g):
        nsp = len(x_shape) - 2
        strides = list(self.strides or [1] * nsp)
        dil = list(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        pb, pe = pads[:nsp], pads[nsp:]
        N, Cin = x_shape[0], x_shape[1]
        Cout = w.shape[0]
        ksp = w.shape[2:]
        osp = g.shape[2:]
        icg = Cin // self.groups
        ocg = Cout // self.groups
        padded_shape = [x_shape[2 + i] + pb[i] + pe[i] for i in range(nsp)]
        dxp = np.zeros((N, Cin, *padded_shape), dtype=g.dtype)
        for kpos in itertools.product(*[range(k) for k in ksp]):
            wk = w[(slice(None), slice(None)) + kpos]  # (Cout, icg)
            if self.groups == 1:
                contrib = np.einsum("no...,oc->nc...", g, wk)  # (N, Cin, *osp)
            else:
                g_g = g.reshape(N, self.groups, ocg, *osp)
                wk_g = wk.reshape(self.groups, ocg, icg)
                contrib = np.einsum("ngo...,goc->ngc...", g_g, wk_g).reshape(N, Cin, *osp)
            sl = tuple(
                slice(kpos[i] * dil[i],
                      kpos[i] * dil[i] + strides[i] * (osp[i] - 1) + 1,
                      strides[i])
                for i in range(nsp))
            dxp[(slice(None), slice(None)) + sl] += contrib
        unpad = tuple(slice(pb[i], pb[i] + x_shape[2 + i]) for i in range(nsp))
        return dxp[(slice(None), slice(None)) + unpad]

    def eval(self, inputs):
        x_shape = tuple(int(v) for v in np.asarray(inputs[0]).reshape(-1))
        w, g = inputs[1], inputs[2]
        wc, _ = upcast_for_compute(w)
        gc, orig = upcast_for_compute(g)
        return [downcast_result(self._compute_np(x_shape, wc, gc), orig)]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        from .shape import _need_static

        x_shape = tuple(int(v) for v in _need_static(static, 0, "ConvInputGrad").reshape(-1))
        w, g = inputs[1], inputs[2]
        nsp = len(x_shape) - 2
        strides = list(self.strides or [1] * nsp)
        dil = list(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        ksp = w.shape[2:]
        # dX = conv(g upsampled by stride, w flipped & swapped) — express as
        # conv_general_dilated with lhs_dilation=strides.
        eff_k = [(ksp[i] - 1) * dil[i] + 1 for i in range(nsp)]
        # full-correlation padding for the transposed conv: left pad
        # eff_k-1-pb; right pad chosen so the output is exactly x_size
        # given the stride-dilated gradient (size (o-1)*stride + 1).
        pad_pairs = tuple((eff_k[i] - 1 - pads[i],
                           x_shape[2 + i] + pads[i] - (g.shape[2 + i] - 1) * strides[i] - 1)
                          for i in range(nsp))
        # transpose weights: (Cout, icg, *k) -> (Cin, ocg, *k), flip spatial
        Cout, icg = w.shape[0], w.shape[1]
        gdim = self.groups
        wt = w.reshape(gdim, Cout // gdim, icg, *ksp)
        wt = jnp.swapaxes(wt, 1, 2).reshape(gdim * icg, Cout // gdim, *ksp)
        wt = jnp.flip(wt, axis=tuple(range(2, 2 + nsp)))
        dn = jax.lax.conv_dimension_numbers(
            g.shape, wt.shape, ("NCHW"[:2 + nsp], "OIHW"[:2 + nsp], "NCHW"[:2 + nsp]))
        acc = jnp.float32 if g.dtype in (jnp.bfloat16, jnp.float16) else None
        out = jax.lax.conv_general_dilated(
            g, wt, window_strides=(1,) * nsp, padding=pad_pairs,
            lhs_dilation=tuple(strides), rhs_dilation=tuple(dil),
            dimension_numbers=dn, feature_group_count=gdim,
            preferred_element_type=acc,
            precision=_conv_precision(g.dtype))
        return [out.astype(g.dtype)]

    def infer(self, infos):
        shp = infos[0]
        dt = infos[2].dtype
        if shp.level is Level.NUMERIC:
            return [TensorInfo.shaped(dt, [int(v) for v in shp.value.reshape(-1)])]
        return [TensorInfo.minimal(dt)]


@dataclass
class ConvWeightGrad(MilliOp):
    """(w_shape, x, grad) -> dW."""

    strides: Optional[List[int]] = None
    pads: Optional[List[int]] = None
    dilations: Optional[List[int]] = None
    groups: int = 1
    KIND = "ConvWeightGrad"

    def eval(self, inputs):
        w_shape = tuple(int(v) for v in np.asarray(inputs[0]).reshape(-1))
        x, g = inputs[1], inputs[2]
        xc, _ = upcast_for_compute(x)
        gc, orig = upcast_for_compute(g)
        nsp = x.ndim - 2
        strides = list(self.strides or [1] * nsp)
        dil = list(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        pb, pe = pads[:nsp], pads[nsp:]
        xp = np.pad(xc, [(0, 0), (0, 0)] + [(pb[i], pe[i]) for i in range(nsp)])
        N, Cin = x.shape[:2]
        Cout = w_shape[0]
        icg = Cin // self.groups
        ocg = Cout // self.groups
        ksp = w_shape[2:]
        osp = gc.shape[2:]
        dw = np.zeros(w_shape, dtype=gc.dtype)
        for kpos in itertools.product(*[range(k) for k in ksp]):
            sl = tuple(
                slice(kpos[i] * dil[i],
                      kpos[i] * dil[i] + strides[i] * (osp[i] - 1) + 1,
                      strides[i])
                for i in range(nsp))
            xs = xp[(slice(None), slice(None)) + sl]  # (N, Cin, *osp)
            sp = "defgh"[:nsp]  # spatial index letters (reduced)
            if self.groups == 1:
                dw[(slice(None), slice(None)) + kpos] += np.einsum(
                    f"no{sp},nc{sp}->oc", gc, xs)
            else:
                g_g = gc.reshape(N, self.groups, ocg, *osp)
                xs_g = xs.reshape(N, self.groups, icg, *osp)
                dd = np.einsum(f"ngo{sp},ngc{sp}->goc", g_g, xs_g).reshape(Cout, icg)
                dw[(slice(None), slice(None)) + kpos] += dd
        return [downcast_result(dw, orig)]

    def to_jax(self, inputs, static=None):
        """dW as a convolution: treat Cin as batch and N as the reduced
        feature dim; window strides <- dilations, rhs dilation <- strides.
        Grouped conv falls back to the host oracle (callback)."""
        import jax
        import jax.numpy as jnp

        from .shape import _need_static

        w_shape = tuple(int(v) for v in _need_static(static, 0, "ConvWeightGrad").reshape(-1))
        x, g = inputs[1], inputs[2]
        if self.groups != 1:
            # grouped dW via the VJP of the forward conv — XLA lowers
            # this to one transposed conv with batch_group_count=groups
            # (no host round-trip; replaces the former callback fallback)
            nsp_ = x.ndim - 2
            strides_ = tuple(self.strides or [1] * nsp_)
            dil_ = tuple(self.dilations or [1] * nsp_)
            pads_ = list(self.pads or [0] * (2 * nsp_))
            pad_pairs_ = tuple((pads_[i], pads_[i + nsp_]) for i in range(nsp_))
            sp_ = "HWD"[:nsp_]
            dn_ = jax.lax.conv_dimension_numbers(
                x.shape, w_shape, ("NC" + sp_, "OI" + sp_, "NC" + sp_))
            acc_ = (jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16)
                    else None)

            def fwd(w):
                return jax.lax.conv_general_dilated(
                    x, w, window_strides=strides_, padding=pad_pairs_,
                    rhs_dilation=dil_, dimension_numbers=dn_,
                    feature_group_count=self.groups,
                    preferred_element_type=acc_,
                    precision=_conv_precision(x.dtype))

            _, vjp = jax.vjp(fwd, jnp.zeros(w_shape, x.dtype))
            dw, = vjp(g.astype(acc_ or g.dtype))
            return [dw.astype(g.dtype)]
        nsp = x.ndim - 2
        strides = tuple(self.strides or [1] * nsp)
        dil = tuple(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        pad_pairs = tuple((pads[i], pads[i + nsp]) for i in range(nsp))
        sp = "HWD"[:nsp] if nsp <= 3 else None
        # lhs x (N,Cin,*s): batch<-Cin ('N' at dim1), feature<-N ('C' at dim0)
        # rhs g (N,Cout,*o): input-feature<-N ('I' at dim0), output<-Cout ('O' at dim1)
        # out spec "CN": feature(Cout) first, batch(Cin) second -> (Cout, Cin, *k)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, g.shape, ("CN" + sp, "IO" + sp, "CN" + sp))
        acc = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else None
        out = jax.lax.conv_general_dilated(
            x, g, window_strides=dil, padding=pad_pairs,
            rhs_dilation=strides, dimension_numbers=dn,
            preferred_element_type=acc,
            precision=_conv_precision(x.dtype)).astype(g.dtype)
        # conv arithmetic can overshoot kernel extent by stride-remainder;
        # trim to the requested weight shape
        sl = (slice(None), slice(None)) + tuple(
            slice(0, w_shape[2 + i]) for i in range(nsp))
        return [out[sl]]

    def infer(self, infos):
        shp = infos[0]
        dt = infos[2].dtype
        if shp.level is Level.NUMERIC:
            return [TensorInfo.shaped(dt, [int(v) for v in shp.value.reshape(-1)])]
        return [TensorInfo.minimal(dt)]


@dataclass
class ConvBiasGrad(MilliOp):
    """grad -> dBias (sum over all but channel axis 1)."""

    KIND = "ConvBiasGrad"

    def eval(self, inputs):
        g = inputs[0]
        gc, orig = upcast_for_compute(g)
        ax = (0,) + tuple(range(2, g.ndim))
        return [downcast_result(gc.sum(axis=ax), orig)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        g = inputs[0]
        ax = (0,) + tuple(range(2, g.ndim))
        return [jnp.sum(g, axis=ax)]

    def infer(self, infos):
        i = infos[0]
        dims = i.dims()
        if dims is not None:
            return [TensorInfo.shaped(i.dtype, [dims[1]])]
        return [TensorInfo.ranked(i.dtype, 1)]


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------


def _orig_coord(out_idx: np.ndarray, scale: float, in_size: int, out_size: int,
                mode: str) -> np.ndarray:
    x = out_idx.astype(np.float64)
    if mode == "half_pixel":
        return (x + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        return (x + 0.5) / scale - 0.5 if out_size > 1 else np.zeros_like(x)
    if mode == "align_corners":
        if out_size == 1:
            return np.zeros_like(x)
        return x * (in_size - 1) / (out_size - 1)
    if mode == "asymmetric":
        return x / scale
    if mode == "half_pixel_symmetric":
        adjustment = out_size / (scale * in_size)
        center = in_size / 2.0
        offset = center * (1 - adjustment)
        return offset + (x + 0.5) / scale - 0.5
    raise NotImplementedError(f"coordinate_transformation_mode {mode}")


def _nearest_pick(coord: np.ndarray, mode: str) -> np.ndarray:
    if mode == "round_prefer_floor":
        return np.ceil(coord - 0.5)
    if mode == "round_prefer_ceil":
        return np.floor(coord + 0.5)
    if mode == "floor":
        return np.floor(coord)
    if mode == "ceil":
        return np.ceil(coord)
    raise NotImplementedError(f"nearest_mode {mode}")


def _cubic_weights(t: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic kernel weights for offsets [-1,0,1,2] around floor(coord)."""
    # t in [0,1): fractional part
    w = np.empty(t.shape + (4,), dtype=np.float64)
    for i, off in enumerate((-1, 0, 1, 2)):
        x = np.abs(t - off)
        w[..., i] = np.where(
            x <= 1, ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, ((a * x - 5 * a) * x + 8 * a) * x - 4 * a, 0.0))
    return w


def _cubic_kernel(x, a):
    x = np.abs(x)
    return np.where(
        x <= 1.0, (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
        np.where(x < 2.0,
                 a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a,
                 0.0))


def _antialias_plan(coord, in_size, scale, mode, cubic_a, exclude_outside):
    """Downscale antialias filter (ONNX-18 antialias=1): the kernel is
    stretched by 1/scale and every output taps a fixed footprint of
    inputs, weights normalized to sum 1 (edge-replicated borders)."""
    s = min(float(scale), 1.0)
    reach = 1.0 if mode == "linear" else 2.0
    i_start = int(np.floor(-reach / s)) + 1
    i_end = int(2 * reach) - i_start if mode == "cubic" else 2 - 2 * i_start
    # footprint: relative taps [i_start, i_end)
    if mode == "cubic":
        i_end = 2 - i_start
        rel = np.arange(i_start, i_end)
    else:
        rel = np.arange(i_start, i_start + (2 - 2 * i_start))
    lo = np.floor(coord).astype(np.int64)
    ratio = coord - lo
    args = (rel[None, :] - ratio[:, None]) * s
    if mode == "linear":
        w = np.clip(1.0 - np.abs(args), 0.0, 1.0)
    else:
        w = _cubic_kernel(args, cubic_a)
    idx = lo[:, None] + rel[None, :]
    if exclude_outside:
        inside = (idx >= 0) & (idx < in_size)
        w = np.where(inside, w, 0.0)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return np.clip(idx, 0, in_size - 1), w


def resize_plan(in_size: int, out_size: int, scale: float, mode: str,
                coord_mode: str, nearest_mode: str, cubic_a: float,
                exclude_outside: bool, antialias: bool = False,
                roi_ax=None):
    """Host-side gather plan for one axis: (indices (out,k), weights
    (out,k), extrapolation mask (out,) or None)."""
    out_idx = np.arange(out_size)
    if coord_mode == "tf_crop_and_resize":
        start, end = float(roi_ax[0]), float(roi_ax[1])
        x = out_idx.astype(np.float64)
        if out_size > 1:
            coord = (start * (in_size - 1)
                     + x * (end - start) * (in_size - 1) / (out_size - 1))
        else:
            coord = np.full_like(x, 0.5 * (start + end) * (in_size - 1))
        extrap = ~((coord >= 0) & (coord <= in_size - 1))
    else:
        coord = _orig_coord(out_idx, scale, in_size, out_size, coord_mode)
        extrap = None
    if antialias and mode in ("linear", "cubic") and scale < 1.0:
        idx, w = _antialias_plan(coord, in_size, scale, mode, cubic_a,
                                 exclude_outside)
        return idx, w, extrap
    if mode == "nearest":
        idx = _nearest_pick(coord, nearest_mode).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        return idx[:, None], np.ones((out_size, 1)), extrap
    if mode == "linear":
        lo = np.floor(coord).astype(np.int64)
        t = coord - lo
        idx = np.stack([lo, lo + 1], axis=1)
        w = np.stack([1 - t, t], axis=1)
        idx_c = np.clip(idx, 0, in_size - 1)
        return idx_c, w, extrap
    if mode == "cubic":
        lo = np.floor(coord).astype(np.int64)
        t = coord - lo
        w = _cubic_weights(t, cubic_a)
        idx = np.stack([lo - 1, lo, lo + 1, lo + 2], axis=1)
        if exclude_outside:
            inside = (idx >= 0) & (idx < in_size)
            w = np.where(inside, w, 0.0)
            w = w / w.sum(axis=1, keepdims=True)
        idx_c = np.clip(idx, 0, in_size - 1)
        return idx_c, w, extrap
    raise NotImplementedError(f"resize mode {mode}")


@dataclass
class Resize(MilliOp):
    """inputs: x, roi?, scales?, sizes? (exactly one of scales/sizes set;
    empty tensors mean absent, per ONNX)."""

    mode: str = "nearest"
    coord_mode: str = "half_pixel"
    nearest_mode: str = "round_prefer_floor"
    cubic_a: float = -0.75
    exclude_outside: bool = False
    axes: Optional[List[int]] = None
    antialias: bool = False
    keep_policy: str = "stretch"   # keep_aspect_ratio_policy
    extrapolation_value: float = 0.0
    KIND = "Resize"

    def _plan(self, in_shape, scales, sizes, roi=None):
        rank = len(in_shape)
        axes = self.axes if self.axes else list(range(rank))
        axes = [a % rank for a in axes]
        out_shape = list(in_shape)
        per_axis = {}
        if sizes is not None and np.asarray(sizes).size:
            sizes = [int(s) for s in np.asarray(sizes).reshape(-1)]
            if self.keep_policy in ("not_larger", "not_smaller"):
                cands = [s / in_shape[a] for a, s in zip(axes, sizes)]
                sc = (min(cands) if self.keep_policy == "not_larger"
                      else max(cands))
                for a in axes:
                    o = int(round(sc * in_shape[a]))
                    out_shape[a] = o
                    per_axis[a] = (o, sc)
            else:
                for a, s in zip(axes, sizes):
                    out_shape[a] = s
                    per_axis[a] = (s, s / in_shape[a])
        else:
            scales = np.asarray(scales).reshape(-1).astype(np.float64)
            for a, sc in zip(axes, scales):
                o = int(np.floor(in_shape[a] * sc))
                out_shape[a] = o
                per_axis[a] = (o, sc)
        roi_per_axis = {}
        if self.coord_mode == "tf_crop_and_resize":
            r = (np.asarray(roi, dtype=np.float64).reshape(-1)
                 if roi is not None and np.asarray(roi).size
                 else np.concatenate([np.zeros(len(axes)),
                                      np.ones(len(axes))]))
            for i, a in enumerate(axes):
                roi_per_axis[a] = (r[i], r[len(axes) + i])
        plans = {}
        for a, (o, sc) in per_axis.items():
            if (o == in_shape[a] and abs(sc - 1.0) < 1e-9
                    and self.coord_mode != "tf_crop_and_resize"):
                continue
            plans[a] = resize_plan(in_shape[a], o, sc, self.mode,
                                   self.coord_mode, self.nearest_mode,
                                   self.cubic_a, self.exclude_outside,
                                   self.antialias,
                                   roi_per_axis.get(a, (0.0, 1.0)))
        return tuple(out_shape), plans

    def _apply(self, xp, x, plans, f32=False):
        out = x
        for a, (idx, w, extrap) in plans.items():
            gathered = xp.take(out, xp.asarray(idx.reshape(-1)), axis=a)
            new_shape = out.shape[:a] + idx.shape + out.shape[a + 1:]
            gathered = gathered.reshape(new_shape)
            wv = w.reshape((1,) * a + w.shape + (1,) * (out.ndim - a - 1))
            if f32:
                wb = xp.asarray(wv, dtype=np.float32)
                out = (gathered.astype(np.float32) * wb).sum(axis=a + 1)
            else:
                wb = xp.asarray(wv)
                out = (gathered * wb).sum(axis=a + 1)
            if extrap is not None and extrap.any():
                ev = xp.asarray(np.float32(self.extrapolation_value)
                                if f32 else self.extrapolation_value)
                eb = xp.asarray(extrap.reshape(
                    (1,) * a + extrap.shape + (1,) * (out.ndim - a - 1)))
                out = xp.where(eb, ev.astype(out.dtype), out)
        return out

    def eval(self, inputs):
        x = inputs[0]
        roi = inputs[1] if len(inputs) > 1 else None
        scales = inputs[2] if len(inputs) > 2 else None
        sizes = inputs[3] if len(inputs) > 3 else None
        xc, orig = upcast_for_compute(x)
        out_shape, plans = self._plan(x.shape, scales, sizes, roi)
        out = self._apply(np, xc, plans)
        if self.mode == "nearest":
            out = out.astype(xc.dtype)
        out = out.astype(xc.dtype, copy=False)
        return [downcast_result(out, orig)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x = inputs[0]
        roi = None
        scales = None
        sizes = None
        if len(inputs) > 1 and static is not None:
            roi = static[1]
        if len(inputs) > 2 and static is not None and static[2] is not None:
            scales = static[2]
        elif len(inputs) > 2 and inputs[2] is not None:
            raise NotImplementedError("Resize: dynamic scales")
        if len(inputs) > 3 and inputs[3] is not None:
            if static is None or static[3] is None:
                raise NotImplementedError("Resize: dynamic sizes")
            sizes = static[3]
        if self.coord_mode == "tf_crop_and_resize" and len(inputs) > 1 \
                and inputs[1] is not None and roi is None:
            raise NotImplementedError("Resize: dynamic roi")
        out_shape, plans = self._plan(x.shape, scales, sizes, roi)
        return [self._apply(jnp, x, plans, f32=True).astype(x.dtype)]

    def infer(self, infos):
        vals = [i.value if i is not None and i.level is Level.NUMERIC else None for i in infos]
        x = infos[0]
        if all(v is not None or infos[k] is None
               for k, v in enumerate(vals)) and vals[0] is not None:
            return [TensorInfo.numeric(self.eval(vals)[0])]
        cs = x.concrete_shape()
        scales = vals[2] if len(vals) > 2 else None
        sizes = vals[3] if len(vals) > 3 else None
        if cs is not None and (scales is not None or sizes is not None):
            out_shape, _ = self._plan(cs, scales, sizes,
                                      vals[1] if len(vals) > 1 else None)
            return [TensorInfo.shaped(x.dtype, list(out_shape))]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


@dataclass
class ConvTransposeMilli(MilliOp):
    """ConvTranspose: x(N,Cin,*sp), w(Cin, Cout/g, *k)[, bias(Cout)].

    Implemented as the input-gradient of a forward conv (identical math):
    reference src/symbolic_graph/ops/mod.rs ConvTranspose.
    """

    strides: Optional[List[int]] = None
    pads: Optional[List[int]] = None
    dilations: Optional[List[int]] = None
    groups: int = 1
    output_padding: Optional[List[int]] = None
    KIND = "ConvTranspose"

    def _out_shape(self, x_shape, w_shape):
        nsp = len(x_shape) - 2
        strides = list(self.strides or [1] * nsp)
        dil = list(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        opad = list(self.output_padding or [0] * nsp)
        cout = w_shape[1] * self.groups
        sp = [
            (x_shape[2 + i] - 1) * strides[i] + (w_shape[2 + i] - 1) * dil[i] + 1
            - pads[i] - pads[i + nsp] + opad[i]
            for i in range(nsp)
        ]
        return (x_shape[0], cout, *sp)

    def _as_input_grad(self):
        return ConvInputGrad(self.strides, self.pads, self.dilations, self.groups)

    def eval(self, inputs):
        x, w = inputs[0], inputs[1]
        out_shape = self._out_shape(x.shape, w.shape)
        xc, orig = upcast_for_compute(x)
        wc, _ = upcast_for_compute(w)
        out = self._as_input_grad()._compute_np(out_shape, wc, xc)
        if len(inputs) > 2 and inputs[2] is not None:
            bc, _ = upcast_for_compute(inputs[2])
            out = out + bc.reshape((1, -1) + (1,) * (out.ndim - 2))
        return [downcast_result(out, orig)]

    def to_jax(self, inputs, static=None):
        x, w = inputs[0], inputs[1]
        out_shape = np.asarray(self._out_shape(x.shape, w.shape), dtype=np.int64)
        ig = self._as_input_grad()
        out = ig.to_jax([None, w, x], static=[out_shape, None, None])[0]
        if len(inputs) > 2 and inputs[2] is not None:
            out = out + inputs[2].reshape((1, -1) + (1,) * (out.ndim - 2))
        return [out]

    def infer(self, infos):
        x, w = infos[0], infos[1]
        vals = [i.value if i is not None and i.level is Level.NUMERIC else None
                for i in infos]
        if all(v is not None for v in vals):
            return [TensorInfo.numeric(self.eval(vals)[0])]
        cx, cw = x.concrete_shape(), w.concrete_shape()
        if cx is not None and cw is not None:
            return [TensorInfo.shaped(x.dtype, list(self._out_shape(cx, cw)))]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


@dataclass
class Pool(MilliOp):
    """MaxPool / AveragePool (+ Global* when kernel is None).

    Reference seam: the ONNX pooling family from the official node-test
    corpus (tests/onnx_testing.rs registers them); TPU lowering uses
    jax.lax.reduce_window, which XLA maps onto the vector units.
    Semantics follow ONNX/torch: ceil_mode windows must start inside
    the (left-padded) input; avg denominators honor count_include_pad
    (padding from ceil extension never counts).
    """

    mode: str = "max"                        # max | avg
    kernel: Optional[List[int]] = None       # None = global (all spatial)
    strides: Optional[List[int]] = None
    pads: Optional[List[int]] = None         # [b..., e...]
    dilations: Optional[List[int]] = None    # max only (ONNX)
    ceil_mode: bool = False
    count_include_pad: bool = False
    auto_pad: str = "NOTSET"                 # SAME_UPPER | SAME_LOWER
    n_out: int = 1                           # 2 = MaxPool Indices output
    storage_order: int = 0                   # Indices flattening order
    KIND = "Pool"

    def _geometry(self, ishape):
        nsp = len(ishape) - 2
        k = list(self.kernel) if self.kernel else list(ishape[2:])
        s = list(self.strides or [1] * nsp)
        d = list(self.dilations or [1] * nsp)
        pads = list(self.pads or [0] * (2 * nsp))
        pb, pe = pads[:nsp], pads[nsp:]
        if self.auto_pad in ("SAME_UPPER", "SAME_LOWER"):
            pb, pe = [], []
            for i in range(nsp):
                eff = (k[i] - 1) * d[i] + 1
                o = -(-ishape[2 + i] // s[i])
                total = max((o - 1) * s[i] + eff - ishape[2 + i], 0)
                small, big = total // 2, total - total // 2
                if self.auto_pad == "SAME_UPPER":
                    pb.append(small)
                    pe.append(big)
                else:
                    pb.append(big)
                    pe.append(small)
        osp, pe_ext = [], []
        for i in range(nsp):
            eff = (k[i] - 1) * d[i] + 1
            num = ishape[2 + i] + pb[i] + pe[i] - eff
            o = (-(-num // s[i]) if self.ceil_mode else num // s[i]) + 1
            if self.ceil_mode and (o - 1) * s[i] >= ishape[2 + i] + pb[i]:
                o -= 1
            osp.append(o)
            # extend end padding so every window slice exists
            pe_ext.append(max(pe[i], (o - 1) * s[i] + eff
                              - ishape[2 + i] - pb[i]))
        return k, s, d, pb, pe, pe_ext, osp

    def eval(self, inputs):
        x = inputs[0]
        nsp = x.ndim - 2
        k, s, d, pb, pe, pe_ext, osp = self._geometry(x.shape)
        xc, orig = upcast_for_compute(x)
        if self.mode == "max":
            fill = (np.array(-np.inf, dtype=xc.dtype) if xc.dtype.kind == "f"
                    else np.iinfo(xc.dtype).min)
        else:
            fill = 0
        xp = np.pad(xc, [(0, 0), (0, 0)] + [(pb[i], pe_ext[i])
                                            for i in range(nsp)],
                    constant_values=fill)
        out = None
        for kpos in itertools.product(*[range(ki) for ki in k]):
            sl = tuple(slice(kpos[i] * d[i],
                             kpos[i] * d[i] + s[i] * (osp[i] - 1) + 1, s[i])
                       for i in range(nsp))
            w = xp[(slice(None), slice(None)) + sl]
            if out is None:
                out = w.copy()
            elif self.mode == "max":
                out = np.maximum(out, w)
            else:
                out = out + w
        if self.mode == "avg":
            out = out / self._denom(x.shape, np)
        y = downcast_result(out.astype(xc.dtype, copy=False), orig)
        if self.n_out < 2:
            return [y]
        # MaxPool Indices: flattened position of each window max in the
        # ORIGINAL input (row-major; storage_order=1 flattens spatial
        # dims column-major). Loop form — the Indices surface is an
        # oracle artifact (corpus argmax tests), not a serving path.
        N, C = x.shape[0], x.shape[1]
        sp = x.shape[2:]
        idx_out = np.zeros((N, C) + tuple(osp), np.int64)
        for n in range(N):
            for c in range(C):
                for opos in itertools.product(*[range(o) for o in osp]):
                    best, best_i = None, 0
                    for kpos in itertools.product(*[range(ki) for ki in k]):
                        ipos = [opos[i] * s[i] - pb[i] + kpos[i] * d[i]
                                for i in range(nsp)]
                        if any(p_ < 0 or p_ >= sp[i]
                               for i, p_ in enumerate(ipos)):
                            continue
                        v = x[(n, c) + tuple(ipos)]
                        if best is None or v > best:
                            best = v
                            if self.storage_order == 1 and nsp == 2:
                                flat_sp = ipos[1] * sp[0] + ipos[0]
                            else:
                                flat_sp = 0
                                for i in range(nsp):
                                    flat_sp = flat_sp * sp[i] + ipos[i]
                            spn = 1
                            for dim in sp:
                                spn *= dim
                            best_i = (n * C + c) * spn + flat_sp
                    idx_out[(n, c) + opos] = best_i
        return [y, idx_out]

    def _denom(self, ishape, xp_mod):
        """per-window element count (f32): ones over the input, 1-padded
        in the declared pads iff count_include_pad, always 0-padded in
        the ceil extension."""
        nsp = len(ishape) - 2
        k, s, d, pb, pe, pe_ext, osp = self._geometry(ishape)
        ones = np.ones(ishape[2:], dtype=np.float32)
        inc = 1.0 if self.count_include_pad else 0.0
        cnt = np.pad(ones, [(pb[i], pe[i]) for i in range(nsp)],
                     constant_values=inc)
        cnt = np.pad(cnt, [(0, pe_ext[i] - pe[i]) for i in range(nsp)],
                     constant_values=0.0)
        den = None
        for kpos in itertools.product(*[range(ki) for ki in k]):
            sl = tuple(slice(kpos[i] * d[i],
                             kpos[i] * d[i] + s[i] * (osp[i] - 1) + 1, s[i])
                       for i in range(nsp))
            w = cnt[sl]
            den = w.copy() if den is None else den + w
        den = den[(None, None)]
        return xp_mod.asarray(den) if xp_mod is not np else den

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        if self.n_out > 1:
            raise NotImplementedError("MaxPool Indices: oracle path")
        x = inputs[0]
        nsp = x.ndim - 2
        k, s, d, pb, pe, pe_ext, osp = self._geometry(x.shape)
        pad_pairs = [(0, 0), (0, 0)] + [(pb[i], pe_ext[i])
                                        for i in range(nsp)]
        dims = (1, 1, *k)
        strides = (1, 1, *s)
        dil = (1, 1, *d)
        if self.mode == "max":
            if x.dtype.kind == "f" if hasattr(x.dtype, "kind") else \
                    jnp.issubdtype(x.dtype, jnp.floating):
                init = -jnp.inf
            else:
                init = jnp.iinfo(x.dtype).min
            out = jax.lax.reduce_window(
                x, jnp.asarray(init, x.dtype), jax.lax.max, dims, strides,
                pad_pairs, window_dilation=dil)
            return [out]
        acc = x.astype(jnp.float32) if x.dtype != jnp.float64 else x
        ssum = jax.lax.reduce_window(
            acc, jnp.asarray(0, acc.dtype), jax.lax.add, dims, strides,
            pad_pairs, window_dilation=dil)
        out = ssum / jnp.asarray(self._denom(x.shape, np), acc.dtype)
        return [out.astype(x.dtype)]

    def infer(self, infos):
        i = infos[0]
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(o) for o in self.eval([i.value])]
        cs = i.concrete_shape()
        if cs is not None:
            _, _, _, _, _, _, osp = self._geometry(cs)
            out = TensorInfo.shaped(i.dtype, list(cs[:2]) + osp)
            return [out, TensorInfo.shaped(DType.I64, list(cs[:2]) + osp)
                    ][:self.n_out]
        if i.rank is not None:
            return [TensorInfo.ranked(i.dtype, i.rank),
                    TensorInfo.ranked(DType.I64, i.rank)][:self.n_out]
        return [TensorInfo.minimal(i.dtype),
                TensorInfo.minimal(DType.I64)][:self.n_out]
