"""Vision milli ops: GridSample, RoiAlign, AffineGrid, Col2Im,
CenterCropPad, NonMaxSuppression, DeformConv, ImageDecoder.

These back the official ONNX vision op families the reference runs from
the node-test corpus (tests/onnx_testing.rs test_gridsample_* /
test_roialign_* / test_affine_grid_* / test_col2im* /
test_center_crop_pad_* / test_nonmaxsuppression_* /
test_basic_deform_conv* / test_image_decoder_*).

GridSample/RoiAlign/AffineGrid/Col2Im/CenterCropPad are jittable (the
coordinate math is shared between the numpy oracle and the jnp path via
an `xp` module parameter). NMS, DeformConv and ImageDecoder have
data-dependent output shapes or host-library decode steps and stay
oracle-only (graph-partition fallback, like NonZero).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp
from .shape import _need_static


# ---------------------------------------------------------------------------
# GridSample
# ---------------------------------------------------------------------------

def _gs_unnormalize(c, size, align):
    if align:
        return (c + 1.0) * 0.5 * (size - 1)
    return ((c + 1.0) * size - 1.0) * 0.5


def _gs_reflect(xp, f, lo, hi):
    """Reflect float coords into [lo, hi] (torch reflection semantics)."""
    rng = hi - lo
    if rng <= 0:
        return xp.zeros_like(f) + lo
    f = xp.abs(f - lo) % (2.0 * rng)
    return xp.where(f > rng, 2.0 * rng - f, f) + lo


def _cubic_weights(xp, t, a=-0.75):
    """4 cubic-convolution tap weights for fractional offset t (0..1)."""
    def w1(x):  # |x| <= 1
        return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0

    def w2(x):  # 1 < |x| < 2
        return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a

    return [w2(t + 1.0), w1(t), w1(1.0 - t), w2(2.0 - t)]


def _grid_sample(xp, x, grid, mode, pad, align):
    """x (N,C,*S), grid (N,*So,k) with grid[...,0]=innermost (W) coord.
    Returns (N,C,*So). Shared by the numpy oracle and the jnp path."""
    k = grid.shape[-1]
    spatial = x.shape[2:]
    assert len(spatial) == k
    N, C = x.shape[0], x.shape[1]
    so = grid.shape[1:-1]
    P = 1
    for s in spatial:
        P *= int(s)
    xf = x.reshape(N, C, P)
    gf = grid.reshape(N, -1, k).astype(
        xp.float32 if hasattr(xp, "float32") else np.float32)
    Q = gf.shape[1]

    # per-axis float coords, axis order = spatial order (outermost first)
    coords = []
    for ax in range(k):
        size = spatial[ax]
        c = gf[..., k - 1 - ax]  # grid last-dim is (x, y, z) = reversed
        f = _gs_unnormalize(c, float(size), align)
        if pad == "reflection":
            if align:
                f = _gs_reflect(xp, f, 0.0, float(size - 1))
            else:
                f = _gs_reflect(xp, f, -0.5, float(size) - 0.5)
            f = xp.clip(f, 0.0, float(size - 1))
        elif pad == "border":
            f = xp.clip(f, 0.0, float(size - 1))
        coords.append(f)

    def gather(idxs, weight):
        """idxs: per-axis int coords (N,Q); weight (N,Q) or scalar."""
        flat = idxs[0]
        for ax in range(1, k):
            flat = flat * spatial[ax] + idxs[ax]
        out = xp.take_along_axis(xf, flat[:, None, :].astype(np.int64),
                                 axis=2)
        return out * weight[:, None, :]

    def inb(i, ax):
        return (i >= 0) & (i <= spatial[ax] - 1)

    if mode == "nearest":
        idxs, ok = [], None
        for ax in range(k):
            i = xp.rint(coords[ax])
            m = inb(i, ax)
            ok = m if ok is None else (ok & m)
            idxs.append(xp.clip(i, 0, spatial[ax] - 1).astype(np.int64))
        w = ok.astype(xf.dtype) if pad == "zeros" else \
            xp.ones_like(coords[0]).astype(xf.dtype)
        out = gather(idxs, w)
    elif mode in ("linear", "bilinear"):
        lo, fr = [], []
        for ax in range(k):
            f0 = xp.floor(coords[ax])
            lo.append(f0)
            fr.append(coords[ax] - f0)
        out = None
        for corner in range(1 << k):
            idxs, w, ok = [], None, None
            for ax in range(k):
                hi_side = (corner >> ax) & 1
                i = lo[ax] + hi_side
                wa = fr[ax] if hi_side else (1.0 - fr[ax])
                w = wa if w is None else w * wa
                m = inb(i, ax)
                ok = m if ok is None else (ok & m)
                idxs.append(xp.clip(i, 0, spatial[ax] - 1).astype(np.int64))
            if pad == "zeros":
                w = w * ok.astype(w.dtype)
            term = gather(idxs, w.astype(xf.dtype))
            out = term if out is None else out + term
    elif mode in ("cubic", "bicubic"):
        if k != 2:
            raise NotImplementedError("GridSample cubic: 2-D only")
        lo, ws = [], []
        for ax in range(k):
            f0 = xp.floor(coords[ax])
            lo.append(f0)
            ws.append(_cubic_weights(xp, coords[ax] - f0))
        out = None
        for ty in range(4):
            for tx in range(4):
                iy = lo[0] + (ty - 1)
                ix = lo[1] + (tx - 1)
                w = ws[0][ty] * ws[1][tx]
                if pad == "zeros":
                    w = w * (inb(iy, 0) & inb(ix, 1)).astype(w.dtype)
                idxs = [xp.clip(iy, 0, spatial[0] - 1).astype(np.int64),
                        xp.clip(ix, 0, spatial[1] - 1).astype(np.int64)]
                term = gather(idxs, w.astype(xf.dtype))
                out = term if out is None else out + term
    else:
        raise NotImplementedError(f"GridSample mode {mode}")
    return out.reshape((N, C) + tuple(so))


@dataclass
class GridSampleMilli(MilliOp):
    """ONNX GridSample (4-D and 5-D, linear/nearest/cubic,
    zeros/border/reflection padding, align_corners)."""

    mode: str = "linear"
    padding_mode: str = "zeros"
    align_corners: bool = False
    KIND = "GridSample"

    def eval(self, inputs):
        x, grid = inputs[0], inputs[1]
        out = _grid_sample(np, x.astype(np.float32),
                           grid.astype(np.float32), self.mode,
                           self.padding_mode, self.align_corners)
        return [out.astype(x.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, grid = inputs[0], inputs[1]
        out = _grid_sample(jnp, x.astype(jnp.float32),
                           grid.astype(jnp.float32), self.mode,
                           self.padding_mode, self.align_corners)
        return [out.astype(x.dtype)]

    def infer(self, infos):
        x, g = infos[0], infos[1]
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        dx, dg = x.dims(), g.dims()
        if dx is not None and dg is not None:
            return [TensorInfo.shaped(x.dtype,
                                      [dx[0], dx[1]] + list(dg[1:-1]))]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


# ---------------------------------------------------------------------------
# RoiAlign
# ---------------------------------------------------------------------------

def _roi_align(xp, x, rois, batch_idx, out_h, out_w, mode, ratio, scale,
               half_pixel):
    N, C, H, W = x.shape
    R = rois.shape[0]
    off = 0.5 if half_pixel else 0.0
    x1 = rois[:, 0] * scale - off
    y1 = rois[:, 1] * scale - off
    x2 = rois[:, 2] * scale - off
    y2 = rois[:, 3] * scale - off
    rw = x2 - x1
    rh = y2 - y1
    if not half_pixel:  # output_half_pixel mode keeps the legacy min-1
        rw = xp.maximum(rw, 1.0)
        rh = xp.maximum(rh, 1.0)
    bin_h = rh / out_h
    bin_w = rw / out_w
    if ratio > 0:
        sh = sw = ratio
    else:
        # adaptive: ceil of the per-roi bin size; static shapes need a
        # fixed count, so take the max over rois (extra samples land on
        # the same clamped points — harmless for avg within tolerance
        # only if counts match per-roi; eval uses per-roi counts)
        sh = int(np.max(np.ceil(np.asarray(rh / out_h)))) or 1
        sw = int(np.max(np.ceil(np.asarray(rw / out_w)))) or 1
    oy = xp.arange(out_h, dtype=x1.dtype)
    ox = xp.arange(out_w, dtype=x1.dtype)
    iy = xp.arange(sh, dtype=x1.dtype)
    ix = xp.arange(sw, dtype=x1.dtype)
    # sample coords: (R, out, s)
    ys = (y1[:, None, None] + oy[None, :, None] * bin_h[:, None, None]
          + (iy[None, None, :] + 0.5) * bin_h[:, None, None] / sh)
    xs = (x1[:, None, None] + ox[None, :, None] * bin_w[:, None, None]
          + (ix[None, None, :] + 0.5) * bin_w[:, None, None] / sw)
    y_ok = (ys >= -1.0) & (ys <= H)
    x_ok = (xs >= -1.0) & (xs <= W)
    yc = xp.clip(ys, 0.0, H - 1)
    xc = xp.clip(xs, 0.0, W - 1)
    y0 = xp.floor(yc)
    x0 = xp.floor(xc)
    wy1 = yc - y0
    wx1 = xc - x0
    y0i = y0.astype(np.int64)
    x0i = x0.astype(np.int64)
    y1i = xp.minimum(y0i + 1, H - 1)
    x1i = xp.minimum(x0i + 1, W - 1)
    xb = x[batch_idx.astype(np.int64)]           # (R, C, H, W)
    xb = xb.reshape(R, C, H * W)

    def pick(yi, xi):
        # yi (R,oh,sh), xi (R,ow,sw) -> (R, C, oh, ow, sh, sw)
        flat = (yi[:, :, :, None, None] * W
                + xi[:, None, None, :, :])       # (R, oh, sh, ow, sw)
        flat = flat.reshape(R, -1)
        v = xp.take_along_axis(xb, flat[:, None, :], axis=2)
        v = v.reshape(R, C, out_h, sh, out_w, sw)
        return xp.swapaxes(v, 3, 4)              # (R,C,oh,ow,sh,sw)

    w00 = ((1 - wy1)[:, :, :, None, None]
           * (1 - wx1)[:, None, None, :, :]).reshape(R, -1)
    w01 = ((1 - wy1)[:, :, :, None, None]
           * wx1[:, None, None, :, :]).reshape(R, -1)
    w10 = (wy1[:, :, :, None, None]
           * (1 - wx1)[:, None, None, :, :]).reshape(R, -1)
    w11 = (wy1[:, :, :, None, None]
           * wx1[:, None, None, :, :]).reshape(R, -1)

    def shape_w(w):
        return xp.swapaxes(w.reshape(R, 1, out_h, sh, out_w, sw), 3, 4)

    val = (pick(y0i, x0i) * shape_w(w00) + pick(y0i, x1i) * shape_w(w01)
           + pick(y1i, x0i) * shape_w(w10) + pick(y1i, x1i) * shape_w(w11))
    ok = (y_ok[:, :, :, None, None] & x_ok[:, None, None, :, :])
    ok = xp.swapaxes(ok.reshape(R, 1, out_h, sh, out_w, sw), 3, 4)
    val = val * ok.astype(val.dtype)
    if mode == "max":
        big_neg = xp.where(ok, val, xp.zeros_like(val) - 1e30)
        out = big_neg.reshape(R, C, out_h, out_w, -1).max(axis=-1)
        # all-masked bins produce 0 (matches the reference impl)
        any_ok = ok.reshape(R, 1, out_h, out_w, -1).any(axis=-1)
        out = xp.where(any_ok, out, xp.zeros_like(out))
    else:
        out = val.reshape(R, C, out_h, out_w, -1).mean(axis=-1)
    return out


@dataclass
class RoiAlignMilli(MilliOp):
    mode: str = "avg"
    output_height: int = 1
    output_width: int = 1
    sampling_ratio: int = 0
    spatial_scale: float = 1.0
    half_pixel: bool = True  # coordinate_transformation_mode == half_pixel
    KIND = "RoiAlign"

    def eval(self, inputs):
        x, rois, bi = inputs[0], inputs[1], inputs[2]
        out = _roi_align(np, x.astype(np.float32), rois.astype(np.float32),
                         bi, self.output_height, self.output_width,
                         self.mode, self.sampling_ratio, self.spatial_scale,
                         self.half_pixel)
        return [out.astype(x.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, rois, bi = inputs[0], inputs[1], inputs[2]
        if self.sampling_ratio <= 0:
            raise NotImplementedError(
                "RoiAlign adaptive sampling_ratio is data-dependent")
        out = _roi_align(jnp, x.astype(jnp.float32),
                         rois.astype(jnp.float32), bi, self.output_height,
                         self.output_width, self.mode, self.sampling_ratio,
                         self.spatial_scale, self.half_pixel)
        return [out.astype(x.dtype)]

    def infer(self, infos):
        x, rois = infos[0], infos[1]
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        dx, dr = x.dims(), rois.dims()
        if dx is not None and dr is not None:
            return [TensorInfo.shaped(x.dtype, [dr[0], dx[1],
                                                self.output_height,
                                                self.output_width])]
        return [TensorInfo.ranked(x.dtype, 4)]


# ---------------------------------------------------------------------------
# AffineGrid
# ---------------------------------------------------------------------------

def _affine_axis(xp, size, align):
    if align:
        if size == 1:
            return xp.zeros(1, np.float32)
        return xp.linspace(-1.0, 1.0, size).astype(np.float32)
    step = 2.0 / size
    return (xp.arange(size, dtype=np.float32) * step + step / 2.0 - 1.0)


@dataclass
class AffineGridMilli(MilliOp):
    """theta (N,2,3)/(N,3,4) + static size -> sampling grid for
    GridSample (N,H,W,2) / (N,D,H,W,3)."""

    align_corners: bool = False
    KIND = "AffineGrid"

    def _grid(self, xp, theta, size):
        size = [int(s) for s in np.asarray(size).reshape(-1)]
        spatial = size[2:]
        k = len(spatial)
        axes = [_affine_axis(xp, s, self.align_corners) for s in spatial]
        # homogeneous coords (P, k+1) in (x, y[, z]) order = reversed
        mesh = xp.meshgrid(*axes, indexing="ij")
        cols = [m.reshape(-1) for m in reversed(mesh)]
        cols.append(xp.ones_like(cols[0]))
        base = xp.stack(cols, axis=-1)                    # (P, k+1)
        out = xp.einsum("nij,pj->npi", theta.astype(base.dtype), base)
        return out.reshape((theta.shape[0],) + tuple(spatial) + (k,))

    def eval(self, inputs):
        return [np.asarray(self._grid(np, inputs[0].astype(np.float32),
                                      inputs[1]), dtype=inputs[0].dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        size = _need_static(static, 1, "AffineGrid")
        return [self._grid(jnp, inputs[0].astype(jnp.float32),
                           size).astype(inputs[0].dtype)]

    def infer(self, infos):
        t = infos[0]
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [TensorInfo.minimal(t.dtype)]


# ---------------------------------------------------------------------------
# Col2Im
# ---------------------------------------------------------------------------

@dataclass
class Col2ImMilli(MilliOp):
    """Rearrange column blocks back into an image (inverse Im2Col).
    image_shape/block_shape are static inputs; N-D spatial."""

    dilations: Optional[List[int]] = None
    pads: Optional[List[int]] = None
    strides: Optional[List[int]] = None
    KIND = "Col2Im"

    def _params(self, k):
        dil = self.dilations or [1] * k
        pads = self.pads or [0] * (2 * k)
        strides = self.strides or [1] * k
        return dil, pads, strides

    def _col2im(self, x, image_shape, block_shape, use_jax=False):
        image_shape = [int(s) for s in np.asarray(image_shape).reshape(-1)]
        block = [int(s) for s in np.asarray(block_shape).reshape(-1)]
        k = len(image_shape)
        dil, pads, strides = self._params(k)
        N = x.shape[0]
        K = 1
        for b in block:
            K *= b
        C = x.shape[1] // K
        # block positions per axis
        npos = [(image_shape[i] + pads[i] + pads[k + i]
                 - dil[i] * (block[i] - 1) - 1) // strides[i] + 1
                for i in range(k)]
        L = 1
        for p in npos:
            L *= p
        xs = x.reshape((N, C) + tuple(block) + tuple(npos))
        padded = [image_shape[i] + pads[i] + pads[k + i] for i in range(k)]
        if use_jax:
            import jax.numpy as jnp

            out = jnp.zeros((N, C) + tuple(padded), xs.dtype)
        else:
            out = np.zeros((N, C) + tuple(padded), xs.dtype)
        for kidx in np.ndindex(*block):
            sl = (slice(None), slice(None)) + tuple(
                slice(kidx[i] * dil[i],
                      kidx[i] * dil[i] + npos[i] * strides[i], strides[i])
                for i in range(k))
            patch = xs[(slice(None), slice(None)) + kidx]
            if use_jax:
                out = out.at[sl].add(patch)
            else:
                out[sl] += patch
        crop = (slice(None), slice(None)) + tuple(
            slice(pads[i], pads[i] + image_shape[i]) for i in range(k))
        return out[crop]

    def eval(self, inputs):
        return [self._col2im(inputs[0], inputs[1], inputs[2])]

    def to_jax(self, inputs, static=None):
        img = _need_static(static, 1, "Col2Im")
        blk = _need_static(static, 2, "Col2Im")
        return [self._col2im(inputs[0], img, blk, use_jax=True)]

    def infer(self, infos):
        x = infos[0]
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [TensorInfo.minimal(x.dtype)]


# ---------------------------------------------------------------------------
# CenterCropPad
# ---------------------------------------------------------------------------

@dataclass
class CenterCropPadMilli(MilliOp):
    """Center-crop or center-pad each selected axis to a target extent
    (ONNX-18 CenterCropPad; shape input must be static)."""

    axes: Optional[List[int]] = None
    KIND = "CenterCropPad"

    def _crop_pad(self, xp, x, shape):
        tgt = [int(s) for s in np.asarray(shape).reshape(-1)]
        axes = self.axes
        if axes is None:
            axes = list(range(len(tgt)))
        axes = [a % x.ndim for a in axes]
        for a, t in zip(axes, tgt):
            cur = x.shape[a]
            if cur > t:
                start = (cur - t) // 2
                sl = [slice(None)] * x.ndim
                sl[a] = slice(start, start + t)
                x = x[tuple(sl)]
            elif cur < t:
                before = (t - cur) // 2
                pads = [(0, 0)] * x.ndim
                pads[a] = (before, t - cur - before)
                x = xp.pad(x, pads)
        return x

    def eval(self, inputs):
        return [self._crop_pad(np, inputs[0], inputs[1])]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        shape = _need_static(static, 1, "CenterCropPad")
        return [self._crop_pad(jnp, inputs[0], shape)]

    def infer(self, infos):
        x = infos[0]
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


# ---------------------------------------------------------------------------
# NonMaxSuppression (oracle-only: data-dependent output count)
# ---------------------------------------------------------------------------

@dataclass
class NonMaxSuppressionMilli(MilliOp):
    center_point_box: bool = False
    KIND = "NonMaxSuppression"

    def eval(self, inputs):
        boxes, scores = inputs[0], inputs[1]
        max_out = (int(np.asarray(inputs[2]).reshape(-1)[0])
                   if len(inputs) > 2 and inputs[2] is not None
                   and np.asarray(inputs[2]).size else 0)
        iou_th = (float(np.asarray(inputs[3]).reshape(-1)[0])
                  if len(inputs) > 3 and inputs[3] is not None
                  and np.asarray(inputs[3]).size else 0.0)
        score_th = (float(np.asarray(inputs[4]).reshape(-1)[0])
                    if len(inputs) > 4 and inputs[4] is not None
                    and np.asarray(inputs[4]).size else None)

        def corners(b):
            if not self.center_point_box:
                y1, x1, y2, x2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
                return (np.minimum(y1, y2), np.minimum(x1, x2),
                        np.maximum(y1, y2), np.maximum(x1, x2))
            xc, yc, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            return (yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2)

        sel = []
        for n in range(boxes.shape[0]):
            y1, x1, y2, x2 = corners(boxes[n].astype(np.float64))
            area = (y2 - y1) * (x2 - x1)
            for c in range(scores.shape[1]):
                s = scores[n, c].astype(np.float64)
                order = np.argsort(-s, kind="stable")
                if score_th is not None:
                    order = order[s[order] > score_th]
                kept = []
                for i in order:
                    ok = True
                    for j in kept:
                        yy1 = max(y1[i], y1[j])
                        xx1 = max(x1[i], x1[j])
                        yy2 = min(y2[i], y2[j])
                        xx2 = min(x2[i], x2[j])
                        inter = max(0.0, yy2 - yy1) * max(0.0, xx2 - xx1)
                        union = area[i] + area[j] - inter
                        if union > 0 and inter / union > iou_th:
                            ok = False
                            break
                    if ok:
                        kept.append(i)
                        if max_out and len(kept) >= max_out:
                            break
                sel.extend([n, c, int(i)] for i in kept)
        return [np.asarray(sel, dtype=np.int64).reshape(-1, 3)]

    def infer(self, infos):
        if all(i is None or i.level is Level.NUMERIC for i in infos):
            vals = [None if i is None else i.value for i in infos]
            if vals[0] is not None and vals[1] is not None:
                return [TensorInfo.numeric(self.eval(vals)[0])]
        return [TensorInfo(DType.I64, Level.RANKED, rank_=2)]


# ---------------------------------------------------------------------------
# DeformConv (oracle-only; official corpus has tiny 2-D cases)
# ---------------------------------------------------------------------------

@dataclass
class DeformConvMilli(MilliOp):
    dilations: Optional[List[int]] = None
    group: int = 1
    kernel_shape: Optional[List[int]] = None
    offset_group: int = 1
    pads: Optional[List[int]] = None
    strides: Optional[List[int]] = None
    KIND = "DeformConv"

    def eval(self, inputs):
        x, w, off = (inputs[0].astype(np.float64),
                     inputs[1].astype(np.float64),
                     inputs[2].astype(np.float64))
        bias = (inputs[3].astype(np.float64) if len(inputs) > 3
                and inputs[3] is not None else None)
        mask = (inputs[4].astype(np.float64) if len(inputs) > 4
                and inputs[4] is not None else None)
        N, C, H, W = x.shape
        M = w.shape[0]
        kh, kw = (self.kernel_shape or list(w.shape[2:]))
        dil = self.dilations or [1, 1]
        pads = self.pads or [0, 0, 0, 0]
        strides = self.strides or [1, 1]
        oh = (H + pads[0] + pads[2] - dil[0] * (kh - 1) - 1) // strides[0] + 1
        ow = (W + pads[1] + pads[3] - dil[1] * (kw - 1) - 1) // strides[1] + 1
        og = self.offset_group
        out = np.zeros((N, M, oh, ow))
        cg = C // self.group
        mg = M // self.group

        def sample(n, c, y, xq):
            if y <= -1 or y >= H or xq <= -1 or xq >= W:
                return 0.0
            y0, x0 = int(np.floor(y)), int(np.floor(xq))
            v = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        wy = (y - y0) if dy else (1 - (y - y0))
                        wx = (xq - x0) if dx else (1 - (xq - x0))
                        v += wy * wx * x[n, c, yy, xx]
            return v

        offr = off.reshape(N, og, kh, kw, 2, oh, ow)
        if mask is not None:
            maskr = mask.reshape(N, og, kh, kw, oh, ow)
        for n in range(N):
            for m in range(M):
                g = m // mg
                for o_y in range(oh):
                    for o_x in range(ow):
                        acc = 0.0
                        for ci in range(cg):
                            c = g * cg + ci
                            geo = (c * og // C) if og > 1 else 0
                            for ky in range(kh):
                                for kx in range(kw):
                                    y = (o_y * strides[0] - pads[0]
                                         + ky * dil[0]
                                         + offr[n, geo, ky, kx, 0, o_y, o_x])
                                    xq = (o_x * strides[1] - pads[1]
                                          + kx * dil[1]
                                          + offr[n, geo, ky, kx, 1, o_y, o_x])
                                    v = sample(n, c, y, xq)
                                    if mask is not None:
                                        v *= maskr[n, geo, ky, kx, o_y, o_x]
                                    acc += v * w[m, ci, ky, kx]
                        out[n, m, o_y, o_x] = acc
                if bias is not None:
                    out[n, m] += bias[m]
        return [out.astype(inputs[0].dtype)]

    def infer(self, infos):
        x = infos[0]
        if all(i is None or (i is not None and i.level is Level.NUMERIC)
               for i in infos) and infos[0] is not None:
            vals = [None if i is None else i.value for i in infos]
            if all(v is not None for v in vals[:3]):
                return [TensorInfo.numeric(self.eval(vals)[0])]
        return [TensorInfo.ranked(x.dtype, 4)]


# ---------------------------------------------------------------------------
# ImageDecoder (oracle-only; PIL)
# ---------------------------------------------------------------------------

@dataclass
class ImageDecoderMilli(MilliOp):
    pixel_format: str = "RGB"
    KIND = "ImageDecoder"

    def eval(self, inputs):
        import io

        from PIL import Image

        data = np.asarray(inputs[0], dtype=np.uint8).tobytes()
        img = Image.open(io.BytesIO(data))
        if self.pixel_format == "Grayscale":
            img = img.convert("L")
            arr = np.asarray(img, dtype=np.uint8)[..., None]
        else:
            img = img.convert("RGB")
            arr = np.asarray(img, dtype=np.uint8)
            if self.pixel_format == "BGR":
                arr = arr[..., ::-1]
        return [np.ascontiguousarray(arr)]

    def infer(self, infos):
        i = infos[0]
        if i is not None and i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0])]
        return [TensorInfo(DType.U8, Level.RANKED, rank_=3)]
