"""Resize conformance cases named 1:1 after the official corpus list
the reference enumerates (tests/onnx_testing.rs test_resize_*, 37).

Oracle: a per-output-pixel loop implementation of the ONNX-19 Resize
spec written independently of the framework's vectorized gather-plan
kernel (same published formulas, different code path).
"""

from __future__ import annotations

import numpy as np

from .harness import Case


def _coord(x, scale, insz, outsz, ctm, roi_ax):
    if ctm == "half_pixel":
        return (x + 0.5) / scale - 0.5
    if ctm == "pytorch_half_pixel":
        return (x + 0.5) / scale - 0.5 if outsz > 1 else 0.0
    if ctm == "align_corners":
        return 0.0 if outsz == 1 else x * (insz - 1) / (outsz - 1)
    if ctm == "asymmetric":
        return x / scale
    if ctm == "half_pixel_symmetric":
        adj = outsz / (scale * insz)
        return (insz / 2.0) * (1 - adj) + (x + 0.5) / scale - 0.5
    if ctm == "tf_crop_and_resize":
        s, e = roi_ax
        if outsz > 1:
            return s * (insz - 1) + x * (e - s) * (insz - 1) / (outsz - 1)
        return 0.5 * (s + e) * (insz - 1)
    raise NotImplementedError(ctm)


def _cubic_w(t, a):
    t = abs(t)
    if t <= 1:
        return (a + 2) * t**3 - (a + 3) * t**2 + 1
    if t < 2:
        return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
    return 0.0


def _interp_axis_1d(row, outsz, scale, mode, ctm, nm, a, excl, aa, roi_ax,
                    extrap_val):
    insz = len(row)
    out = np.zeros(outsz)
    for xo in range(outsz):
        c = _coord(float(xo), scale, insz, outsz, ctm, roi_ax)
        if ctm == "tf_crop_and_resize" and not (0 <= c <= insz - 1):
            out[xo] = extrap_val
            continue
        if mode == "nearest":
            if nm == "round_prefer_floor":
                i = int(np.ceil(c - 0.5))
            elif nm == "round_prefer_ceil":
                i = int(np.floor(c + 0.5))
            elif nm == "floor":
                i = int(np.floor(c))
            else:
                i = int(np.ceil(c))
            out[xo] = row[min(max(i, 0), insz - 1)]
            continue
        lo = int(np.floor(c))
        t = c - lo
        if aa and scale < 1:
            s = min(scale, 1.0)
            reach = 1.0 if mode == "linear" else 2.0
            i0 = int(np.floor(-reach / s)) + 1
            i1 = 2 - i0 if mode == "cubic" else 2 - 2 * i0 + i0
            rel = range(i0, (2 - i0) if mode == "cubic"
                        else (i0 + 2 - 2 * i0))
            ws, idxs = [], []
            for r in rel:
                arg = (r - t) * s
                w = (max(0.0, 1 - abs(arg)) if mode == "linear"
                     else _cubic_w(arg, a))
                ws.append(w)
                idxs.append(lo + r)
            if excl:
                ws = [w if 0 <= i < insz else 0.0
                      for w, i in zip(ws, idxs)]
            tot = sum(ws)
            out[xo] = sum(w / tot * row[min(max(i, 0), insz - 1)]
                          for w, i in zip(ws, idxs))
            continue
        if mode == "linear":
            taps = [(lo, 1 - t), (lo + 1, t)]
        else:
            taps = [(lo - 1, _cubic_w(t + 1, a)), (lo, _cubic_w(t, a)),
                    (lo + 1, _cubic_w(1 - t, a)),
                    (lo + 2, _cubic_w(2 - t, a))]
        if excl:
            taps = [(i, w if 0 <= i < insz else 0.0) for i, w in taps]
            tot = sum(w for _, w in taps)
            taps = [(i, w / tot) for i, w in taps]
        out[xo] = sum(w * row[min(max(i, 0), insz - 1)] for i, w in taps)
    return out


def _resize_ref(x, scales=None, sizes=None, roi=None, mode="nearest",
                ctm="half_pixel", nm="round_prefer_floor", a=-0.75,
                excl=False, aa=False, axes=None, policy="stretch",
                extrap=0.0):
    x = np.asarray(x, dtype=np.float64)
    rank = x.ndim
    ax_list = [ax % rank for ax in (axes if axes else range(rank))]
    out_shape = list(x.shape)
    per = {}
    if sizes is not None:
        if policy in ("not_larger", "not_smaller"):
            cands = [s / x.shape[ax] for ax, s in zip(ax_list, sizes)]
            sc = min(cands) if policy == "not_larger" else max(cands)
            for ax in ax_list:
                o = int(round(sc * x.shape[ax]))
                out_shape[ax] = o
                per[ax] = (o, sc)
        else:
            for ax, s in zip(ax_list, sizes):
                out_shape[ax] = int(s)
                per[ax] = (int(s), s / x.shape[ax])
    else:
        for ax, sc in zip(ax_list, scales):
            o = int(np.floor(x.shape[ax] * sc))
            out_shape[ax] = o
            per[ax] = (o, sc)
    roi_per = {}
    if ctm == "tf_crop_and_resize":
        r = np.asarray(roi, dtype=np.float64).reshape(-1)
        n = len(ax_list)
        for i, ax in enumerate(ax_list):
            roi_per[ax] = (r[i], r[n + i])
    out = x
    for ax, (o, sc) in per.items():
        if o == out.shape[ax] and abs(sc - 1) < 1e-9 \
                and ctm != "tf_crop_and_resize":
            continue
        moved = np.moveaxis(out, ax, -1)
        flat = moved.reshape(-1, moved.shape[-1])
        res = np.stack([
            _interp_axis_1d(row, o, sc, mode, ctm, nm, a, excl, aa,
                            roi_per.get(ax, (0.0, 1.0)), extrap)
            for row in flat])
        out = np.moveaxis(res.reshape(moved.shape[:-1] + (o,)), -1, ax)
    return out.astype(np.float32)


_X22 = np.array([[[[1, 2], [3, 4]]]], dtype=np.float32)
_X44 = np.arange(1, 17, dtype=np.float32).reshape(1, 1, 4, 4)


def _mk(name, x, *, scales=None, sizes=None, roi=None, axes=None, **kw):
    attrs = {}
    if kw.get("mode", "nearest") != "nearest":
        attrs["mode"] = kw.get("mode")
    if kw.get("ctm", "half_pixel") != "half_pixel":
        attrs["coordinate_transformation_mode"] = kw["ctm"]
    if kw.get("nm", "round_prefer_floor") != "round_prefer_floor":
        attrs["nearest_mode"] = kw["nm"]
    if kw.get("excl"):
        attrs["exclude_outside"] = 1
    if kw.get("aa"):
        attrs["antialias"] = 1
    if axes:
        attrs["axes"] = list(axes)
    if kw.get("policy", "stretch") != "stretch":
        attrs["keep_aspect_ratio_policy"] = kw["policy"]
    if kw.get("extrap", 0.0):
        attrs["extrapolation_value"] = kw["extrap"]
    if kw.get("a") is not None and kw.get("a") != -0.75:
        attrs["cubic_coeff_a"] = kw["a"]
    y = _resize_ref(x, scales=scales, sizes=sizes, roi=roi, axes=axes,
                    mode=kw.get("mode", "nearest"),
                    ctm=kw.get("ctm", "half_pixel"),
                    nm=kw.get("nm", "round_prefer_floor"),
                    a=kw.get("a", -0.75), excl=kw.get("excl", False),
                    aa=kw.get("aa", False),
                    policy=kw.get("policy", "stretch"),
                    extrap=kw.get("extrap", 0.0))
    inputs = {"x": x}
    inputs["roi"] = (np.asarray(roi, np.float32) if roi is not None
                     else None)
    inputs["scales"] = (np.asarray(scales, np.float32)
                        if scales is not None else None)
    if sizes is not None:
        inputs["sizes"] = np.asarray(sizes, np.int64)
    return Case(name, "Resize", inputs, [y], attrs=attrs, atol=1e-4,
                initializer_names=[k for k in ("roi", "scales", "sizes")
                                   if inputs.get(k) is not None])


CASES = [
    _mk("resize_downsample_scales_cubic", _X44,
        scales=[1, 1, 0.8, 0.8], mode="cubic"),
    _mk("resize_downsample_scales_cubic_align_corners", _X44,
        scales=[1, 1, 0.8, 0.8], mode="cubic", ctm="align_corners"),
    _mk("resize_downsample_scales_cubic_antialias", _X44,
        scales=[1, 1, 0.6, 0.6], mode="cubic", aa=True),
    _mk("resize_downsample_scales_linear", _X22,
        scales=[1, 1, 0.6, 0.6], mode="linear"),
    _mk("resize_downsample_scales_linear_align_corners", _X22,
        scales=[1, 1, 0.6, 0.6], mode="linear", ctm="align_corners"),
    _mk("resize_downsample_scales_linear_antialias", _X44,
        scales=[1, 1, 0.6, 0.6], mode="linear", aa=True),
    _mk("resize_downsample_scales_linear_half_pixel_symmetric",
        np.arange(1, 5, dtype=np.float32).reshape(1, 1, 1, 4),
        scales=[1, 1, 1, 0.6], mode="linear", ctm="half_pixel_symmetric"),
    _mk("resize_downsample_scales_nearest", _X22,
        scales=[1, 1, 0.6, 0.6]),
    _mk("resize_downsample_sizes_cubic", _X44,
        sizes=[1, 1, 3, 3], mode="cubic"),
    _mk("resize_downsample_sizes_cubic_antialias", _X44,
        sizes=[1, 1, 3, 3], mode="cubic", aa=True),
    _mk("resize_downsample_sizes_linear_antialias", _X44,
        sizes=[1, 1, 3, 3], mode="linear", aa=True),
    _mk("resize_downsample_sizes_linear_pytorch_half_pixel", _X44,
        sizes=[1, 1, 3, 1], mode="linear", ctm="pytorch_half_pixel"),
    _mk("resize_downsample_sizes_nearest", _X22,
        sizes=[1, 1, 1, 3]),
    _mk("resize_downsample_sizes_nearest_not_larger", _X44,
        sizes=[1, 3], axes=[2, 3], policy="not_larger"),
    _mk("resize_downsample_sizes_nearest_not_smaller", _X44,
        sizes=[1, 3], axes=[2, 3], policy="not_smaller"),
    _mk("resize_tf_crop_and_resize", _X44,
        roi=[0, 0, 0.4, 0.6, 1, 1, 0.6, 0.8], sizes=[1, 1, 3, 3],
        mode="linear", ctm="tf_crop_and_resize"),
    _mk("resize_tf_crop_and_resize_axes_2_3", _X44,
        roi=[0.4, 0.6, 0.6, 0.8], sizes=[3, 3], axes=[2, 3],
        mode="linear", ctm="tf_crop_and_resize"),
    _mk("resize_tf_crop_and_resize_axes_3_2", _X44,
        roi=[0.6, 0.4, 0.8, 0.6], sizes=[3, 3], axes=[3, 2],
        mode="linear", ctm="tf_crop_and_resize"),
    _mk("resize_tf_crop_and_resize_extrapolation_value", _X44,
        roi=[0, 0, 0.4, 0.6, 1, 1, 1.2, 1.7], sizes=[1, 1, 3, 3],
        mode="linear", ctm="tf_crop_and_resize", extrap=10.0),
    _mk("resize_upsample_scales_cubic", _X44,
        scales=[1, 1, 2, 2], mode="cubic"),
    _mk("resize_upsample_scales_cubic_align_corners", _X44,
        scales=[1, 1, 2, 2], mode="cubic", ctm="align_corners"),
    _mk("resize_upsample_scales_cubic_asymmetric", _X44,
        scales=[1, 1, 2, 2], mode="cubic", ctm="asymmetric"),
    _mk("resize_upsample_scales_linear", _X22,
        scales=[1, 1, 2, 2], mode="linear"),
    _mk("resize_upsample_scales_linear_align_corners", _X22,
        scales=[1, 1, 2, 2], mode="linear", ctm="align_corners"),
    _mk("resize_upsample_scales_linear_half_pixel_symmetric", _X22,
        scales=[1, 1, 2.3, 2.94], mode="linear",
        ctm="half_pixel_symmetric"),
    _mk("resize_upsample_scales_nearest", _X22,
        scales=[1, 1, 2, 3]),
    _mk("resize_upsample_scales_nearest_axes_2_3", _X22,
        scales=[2, 3], axes=[2, 3]),
    _mk("resize_upsample_scales_nearest_axes_3_2", _X22,
        scales=[3, 2], axes=[3, 2]),
    _mk("resize_upsample_sizes_cubic", _X44,
        sizes=[1, 1, 9, 10], mode="cubic"),
    _mk("resize_upsample_sizes_nearest", _X22,
        sizes=[1, 1, 7, 8]),
    _mk("resize_upsample_sizes_nearest_axes_2_3", _X22,
        sizes=[7, 8], axes=[2, 3]),
    _mk("resize_upsample_sizes_nearest_axes_3_2", _X22,
        sizes=[8, 7], axes=[3, 2]),
    _mk("resize_upsample_sizes_nearest_ceil_half_pixel", _X44,
        sizes=[1, 1, 8, 8], nm="ceil"),
    _mk("resize_upsample_sizes_nearest_floor_align_corners", _X44,
        sizes=[1, 1, 8, 8], nm="floor", ctm="align_corners"),
    _mk("resize_upsample_sizes_nearest_not_larger", _X22,
        sizes=[7, 8], axes=[2, 3], policy="not_larger"),
    _mk("resize_upsample_sizes_nearest_not_smaller", _X22,
        sizes=[7, 8], axes=[2, 3], policy="not_smaller"),
    _mk("resize_upsample_sizes_nearest_round_prefer_ceil_asymmetric",
        _X44, sizes=[1, 1, 8, 8], nm="round_prefer_ceil",
        ctm="asymmetric"),
]
