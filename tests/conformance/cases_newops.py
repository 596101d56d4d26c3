"""Conformance cases for the long-tail official families: GridSample,
RoiAlign, AffineGrid, Col2Im, CenterCropPad, NMS, DeformConv,
ImageDecoder, DFT, windows, Bernoulli, DynamicQuantizeLinear, LRN, Det,
Unique, Compress, BitwiseNot, BitShift, bool And/Or/Xor, strings,
ai.onnx.ml, Momentum. Named 1:1 after the reference's enumerated list
(tests/onnx_testing.rs).

Oracles: torch for GridSample (the op ONNX modeled), numpy/stdlib
formulas elsewhere; PIL both encodes and decodes the ImageDecoder
payloads (the codec is the semantic there).
"""

from __future__ import annotations

import io

import numpy as np
import torch

from .harness import Case

CASES = []


def add(name, op, inputs, expected, oracle_only=False, domain="", **attrs):
    CASES.append(Case(name, op, inputs, expected, attrs=attrs,
                      oracle_only=oracle_only, domain=domain, atol=1e-5))


def clone(name, twins=("_expanded",)):
    src = next(c for c in CASES if c.name == name)
    for t in twins:
        CASES.append(Case(name + t, src.op_type, src.inputs, src.expected,
                          attrs=src.attrs, oracle_only=src.oracle_only,
                          domain=src.domain, atol=src.atol))


_rng = np.random.default_rng(7)

# --- GridSample (torch referee) --------------------------------------------


def _gs(name, x, grid, mode="bilinear", pad="zeros", align=False,
        onnx_mode=None):
    t_mode = {"linear": "bilinear", "cubic": "bicubic"}.get(mode, mode)
    if x.ndim == 5 and t_mode == "bilinear":
        t_mode = "bilinear"
    y = torch.nn.functional.grid_sample(
        torch.tensor(x), torch.tensor(grid), mode=t_mode,
        padding_mode=pad, align_corners=align).numpy()
    attrs = {"mode": onnx_mode or mode, "padding_mode": pad,
             "align_corners": int(align)}
    CASES.append(Case(name, "GridSample", {"x": x, "grid": grid}, [y],
                      attrs=attrs, atol=1e-4))


_GX = _rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
_GG = (_rng.random((1, 3, 5, 2)).astype(np.float32) * 2.4 - 1.2)
_GX5 = _rng.standard_normal((1, 2, 3, 4, 4)).astype(np.float32)
_GG5 = (_rng.random((1, 2, 3, 3, 3)).astype(np.float32) * 2.2 - 1.1)

_gs("gridsample", _GX, _GG, mode="bilinear", onnx_mode="linear")
_gs("gridsample_aligncorners_true", _GX, _GG, align=True,
    onnx_mode="linear")
_gs("gridsample_bicubic", _GX, _GG, mode="cubic")
_gs("gridsample_bicubic_align_corners_0_additional_1", _GX, _GG,
    mode="cubic", align=False)
_gs("gridsample_bicubic_align_corners_1_additional_1", _GX, _GG,
    mode="cubic", align=True)
_gs("gridsample_bilinear", _GX, _GG, onnx_mode="linear")
_gs("gridsample_bilinear_align_corners_0_additional_1", _GX, _GG,
    onnx_mode="linear")
_gs("gridsample_bilinear_align_corners_1_additional_1", _GX, _GG,
    align=True, onnx_mode="linear")
_gs("gridsample_border_padding", _GX, _GG, pad="border",
    onnx_mode="linear")
_gs("gridsample_nearest", _GX, _GG, mode="nearest")
_gs("gridsample_nearest_align_corners_0_additional_1", _GX, _GG,
    mode="nearest")
_gs("gridsample_nearest_align_corners_1_additional_1", _GX, _GG,
    mode="nearest", align=True)
_gs("gridsample_reflection_padding", _GX, _GG, pad="reflection",
    onnx_mode="linear")
_gs("gridsample_volumetric_bilinear_align_corners_0", _GX5, _GG5,
    onnx_mode="linear")
_gs("gridsample_volumetric_bilinear_align_corners_1", _GX5, _GG5,
    align=True, onnx_mode="linear")
_gs("gridsample_volumetric_nearest_align_corners_0", _GX5, _GG5,
    mode="nearest")
_gs("gridsample_volumetric_nearest_align_corners_1", _GX5, _GG5,
    mode="nearest", align=True)
_gs("gridsample_zeros_padding", _GX, _GG, pad="zeros", onnx_mode="linear")

# --- RoiAlign ---------------------------------------------------------------


def _roialign_ref(x, rois, bi, oh, ow, mode, ratio, scale, half_pixel):
    """Loop-style RoiAlign (Detectron bilinear sampling), independent of
    the op's vectorized gather."""
    R = rois.shape[0]
    C, H, W = x.shape[1:]
    out = np.zeros((R, C, oh, ow), np.float64)
    off = 0.5 if half_pixel else 0.0
    for r in range(R):
        x1, y1, x2, y2 = rois[r] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not half_pixel:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / oh, rw / ow
        sh = ratio if ratio > 0 else int(np.ceil(rh / oh))
        sw = ratio if ratio > 0 else int(np.ceil(rw / ow))
        sh, sw = max(sh, 1), max(sw, 1)
        for c in range(C):
            for i in range(oh):
                for j in range(ow):
                    vals = []
                    for si in range(sh):
                        for sj in range(sw):
                            y = y1 + i * bh + (si + 0.5) * bh / sh
                            xx = x1 + j * bw + (sj + 0.5) * bw / sw
                            if y < -1 or y > H or xx < -1 or xx > W:
                                vals.append(0.0)
                                continue
                            y = min(max(y, 0), H - 1)
                            xx = min(max(xx, 0), W - 1)
                            y0, x0 = int(y), int(xx)
                            y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                            ly, lx = y - y0, xx - x0
                            d = x[bi[r], c]
                            vals.append(
                                d[y0, x0] * (1 - ly) * (1 - lx)
                                + d[y0, x1i] * (1 - ly) * lx
                                + d[y1i, x0] * ly * (1 - lx)
                                + d[y1i, x1i] * ly * lx)
                    out[r, c, i, j] = (max(vals) if mode == "max"
                                       else np.mean(vals))
    return out.astype(np.float32)


_RAX = _rng.random((1, 1, 10, 10)).astype(np.float32)
_RARO = np.array([[0, 0, 9, 9], [0, 5, 4, 9], [5, 5, 9, 9]],
                 dtype=np.float32)
_RABI = np.zeros(3, np.int64)
for nm, half, mode in (("roialign_aligned_false", False, "avg"),
                       ("roialign_aligned_true", True, "avg"),
                       ("roialign_mode_max", False, "max")):
    y = _roialign_ref(_RAX, _RARO, _RABI, 5, 5, mode, 2, 1.0, half)
    add(nm, "RoiAlign",
        {"x": _RAX, "rois": _RARO, "batch_indices": _RABI}, [y],
        mode=mode, output_height=5, output_width=5, sampling_ratio=2,
        spatial_scale=1.0,
        coordinate_transformation_mode=("half_pixel" if half
                                        else "output_half_pixel"))

# --- AffineGrid --------------------------------------------------------------


def _affine_ref(theta, size, align):
    y = torch.nn.functional.affine_grid(torch.tensor(theta),
                                        list(size), align_corners=align)
    return y.numpy()


_TH2 = _rng.standard_normal((2, 2, 3)).astype(np.float32)
_SZ2 = np.array([2, 3, 4, 5], np.int64)
_TH3 = _rng.standard_normal((2, 3, 4)).astype(np.float32)
_SZ3 = np.array([2, 3, 3, 4, 5], np.int64)
for nm, th, sz, al in (("affine_grid_2d", _TH2, _SZ2, False),
                       ("affine_grid_2d_align_corners", _TH2, _SZ2, True),
                       ("affine_grid_3d", _TH3, _SZ3, False),
                       ("affine_grid_3d_align_corners", _TH3, _SZ3, True)):
    add(nm, "AffineGrid", {"theta": th, "size": sz},
        [_affine_ref(th, sz, al)], align_corners=int(al))
    clone(nm)

# --- Col2Im ------------------------------------------------------------------


def _col2im_ref(x, img, blk, dil=None, pads=None, strides=None):
    k = len(img)
    dil = dil or [1] * k
    pads = pads or [0] * (2 * k)
    strides = strides or [1] * k
    N = x.shape[0]
    K = int(np.prod(blk))
    C = x.shape[1] // K
    padded = [img[i] + pads[i] + pads[k + i] for i in range(k)]
    npos = [(padded[i] - dil[i] * (blk[i] - 1) - 1) // strides[i] + 1
            for i in range(k)]
    out = np.zeros((N, C) + tuple(padded), x.dtype)
    xs = x.reshape((N, C) + tuple(blk) + tuple(npos))
    for n in range(N):
        for c in range(C):
            for kidx in np.ndindex(*blk):
                for pidx in np.ndindex(*npos):
                    tgt = tuple(kidx[i] * dil[i] + pidx[i] * strides[i]
                                for i in range(k))
                    out[(n, c) + tgt] += xs[(n, c) + kidx + pidx]
    crop = (slice(None), slice(None)) + tuple(
        slice(pads[i], pads[i] + img[i]) for i in range(k))
    return out[crop]


def _c2i(name, img, blk, L_shape, **kw):
    k = len(img)
    dil = kw.get("dilations") or [1] * k
    pads = kw.get("pads") or [0] * (2 * k)
    strides = kw.get("strides") or [1] * k
    L = int(np.prod([(img[i] + pads[i] + pads[k + i]
                      - dil[i] * (blk[i] - 1) - 1) // strides[i] + 1
                     for i in range(k)]))
    L_shape = (L_shape[0], L_shape[1], L)
    x = _rng.standard_normal(L_shape).astype(np.float32)
    y = _col2im_ref(x, img, blk, kw.get("dilations"), kw.get("pads"),
                    kw.get("strides"))
    add(name, "Col2Im",
        {"x": x, "image_shape": np.asarray(img, np.int64),
         "block_shape": np.asarray(blk, np.int64)}, [y], **kw)
    CASES[-1] = Case(CASES[-1].name, CASES[-1].op_type, CASES[-1].inputs,
                     CASES[-1].expected, attrs=CASES[-1].attrs,
                     initializer_names=("image_shape", "block_shape"),
                     atol=1e-5)


_c2i("col2im", [5, 5], [1, 5], (1, 5, 5))
_c2i("col2im_5d", [3, 4, 5], [1, 1, 5], (1, 10, 12))
_c2i("col2im_dilations", [6, 6], [2, 2], (1, 4, 25), dilations=[1, 5])
_c2i("col2im_pads", [5, 5], [1, 5], (1, 5, 15), pads=[0, 1, 0, 1])
_c2i("col2im_strides", [5, 5], [3, 3], (1, 9, 4), strides=[2, 2])

# --- CenterCropPad -----------------------------------------------------------


def _ccp_ref(x, shape, axes=None):
    tgt = list(shape)
    axes = [a % x.ndim for a in (axes or range(len(tgt)))]
    for a, t in zip(axes, tgt):
        cur = x.shape[a]
        if cur > t:
            s = (cur - t) // 2
            sl = [slice(None)] * x.ndim
            sl[a] = slice(s, s + t)
            x = x[tuple(sl)]
        elif cur < t:
            b = (t - cur) // 2
            p = [(0, 0)] * x.ndim
            p[a] = (b, t - cur - b)
            x = np.pad(x, p)
    return x


_CCX = _rng.standard_normal((20, 8, 3)).astype(np.float32)


def _ccp(name, x, shape, axes=None):
    attrs = {"axes": list(axes)} if axes else {}
    add(name, "CenterCropPad",
        {"x": x, "shape": np.asarray(shape, np.int64)},
        [_ccp_ref(x, shape, axes)], **attrs)
    CASES[-1] = Case(CASES[-1].name, CASES[-1].op_type, CASES[-1].inputs,
                     CASES[-1].expected, attrs=CASES[-1].attrs,
                     initializer_names=("shape",), atol=1e-5)
    clone(name)


_ccp("center_crop_pad_crop", _CCX, [10, 7, 3])
_ccp("center_crop_pad_crop_and_pad", _CCX, [10, 10, 3])
_ccp("center_crop_pad_crop_axes_chw", _CCX, [10, 9], axes=[0, 1])
_ccp("center_crop_pad_crop_axes_hwc", _CCX, [10, 9], axes=[1, 2])
_ccp("center_crop_pad_crop_negative_axes_hwc", _CCX, [10, 9],
     axes=[-3, -2])
_ccp("center_crop_pad_pad", _CCX[:10, :5], [20, 10, 3])

# --- NonMaxSuppression (oracle-only: data-dependent output) ------------------


def _nms_ref(boxes, scores, max_out, iou_th, score_th=None, center=False):
    sel = []
    for n in range(boxes.shape[0]):
        b = boxes[n].astype(np.float64)
        if center:
            xc, yc, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            y1, x1, y2, x2 = yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2
        else:
            y1 = np.minimum(b[:, 0], b[:, 2])
            x1 = np.minimum(b[:, 1], b[:, 3])
            y2 = np.maximum(b[:, 0], b[:, 2])
            x2 = np.maximum(b[:, 1], b[:, 3])
        area = (y2 - y1) * (x2 - x1)
        for c in range(scores.shape[1]):
            s = scores[n, c]
            order = list(np.argsort(-s, kind="stable"))
            if score_th is not None:
                order = [i for i in order if s[i] > score_th]
            kept = []
            for i in order:
                ok = True
                for j in kept:
                    yy1, xx1 = max(y1[i], y1[j]), max(x1[i], x1[j])
                    yy2, xx2 = min(y2[i], y2[j]), min(x2[i], x2[j])
                    inter = max(0, yy2 - yy1) * max(0, xx2 - xx1)
                    u = area[i] + area[j] - inter
                    if u > 0 and inter / u > iou_th:
                        ok = False
                        break
                if ok:
                    kept.append(i)
                    if max_out and len(kept) >= max_out:
                        break
            sel += [[n, c, int(i)] for i in kept]
    return np.asarray(sel, np.int64).reshape(-1, 3)


_NB = np.array([[[0, 0, 1, 1], [0, 0.1, 1, 1.1], [0, -0.1, 1, 0.9],
                 [0, 10, 1, 11], [0, 10.1, 1, 11.1], [0, 100, 1, 101]]],
               np.float32)
_NS = np.array([[[0.9, 0.75, 0.6, 0.95, 0.5, 0.3]]], np.float32)


def _nms(name, boxes, scores, mo, iou, st=None, center=False):
    inputs = {"boxes": boxes, "scores": scores,
              "max_output_boxes_per_class": np.array([mo], np.int64),
              "iou_threshold": np.array([iou], np.float32)}
    if st is not None:
        inputs["score_threshold"] = np.array([st], np.float32)
    attrs = {"center_point_box": 1} if center else {}
    CASES.append(Case(name, "NonMaxSuppression", inputs,
                      [_nms_ref(boxes, scores, mo, iou, st, center)],
                      attrs=attrs, oracle_only=False))


_nms("nonmaxsuppression_single_box",
     np.array([[[0, 0, 1, 1]]], np.float32),
     np.array([[[0.9]]], np.float32), 3, 0.5)
_nms("nonmaxsuppression_identical_boxes",
     np.repeat(np.array([[[0, 0, 1, 1]]], np.float32), 10, axis=1),
     np.full((1, 1, 10), 0.9, np.float32), 3, 0.5)
_nms("nonmaxsuppression_flipped_coordinates",
     np.array([[[1, 1, 0, 0], [0, 0.1, 1, 1.1], [0, 0.9, 1, -0.1],
                [0, 10, 1, 11], [1, 10.1, 0, 11.1], [1, 101, 0, 100]]],
              np.float32), _NS, 3, 0.5)
_nms("nonmaxsuppression_limit_output_size", _NB, _NS, 2, 0.5)
_nms("nonmaxsuppression_two_batches", np.repeat(_NB, 2, axis=0),
     np.repeat(_NS, 2, axis=0), 2, 0.5)
_nms("nonmaxsuppression_two_classes", _NB,
     np.repeat(_NS, 2, axis=1), 2, 0.5)
_nms("nonmaxsuppression_center_point_box_format",
     np.array([[[0.5, 0.5, 1, 1], [0.5, 0.6, 1, 1], [0.5, 0.4, 1, 1],
                [0.5, 10.5, 1, 1], [0.5, 10.6, 1, 1], [0.5, 100.5, 1, 1]]],
              np.float32), _NS, 3, 0.5, center=True)

# --- DeformConv (torchvision absent; loop referee in the milli op is the
# implementation — referee here is an independent dense matmul over the
# bilinear sampling matrix) --------------------------------------------------


def _deform_ref(x, w, off, bias=None, mask=None, pads=(0, 0, 0, 0),
                strides=(1, 1), dil=(1, 1), group=1, offset_group=1):
    N, C, H, W = x.shape
    M, _, kh, kw = w.shape
    oh = (H + pads[0] + pads[2] - dil[0] * (kh - 1) - 1) // strides[0] + 1
    ow = (W + pads[1] + pads[3] - dil[1] * (kw - 1) - 1) // strides[1] + 1
    offr = off.reshape(N, offset_group, kh, kw, 2, oh, ow)
    maskr = (mask.reshape(N, offset_group, kh, kw, oh, ow)
             if mask is not None else None)
    out = np.zeros((N, M, oh, ow))
    cg = C // group
    mg = M // group
    for n in range(N):
        for m in range(M):
            g = m // mg
            for oy in range(oh):
                for ox in range(ow):
                    acc = 0.0
                    for ci in range(cg):
                        c = g * cg + ci
                        og = (c * offset_group) // C
                        for ky in range(kh):
                            for kx in range(kw):
                                y = (oy * strides[0] - pads[0] + ky * dil[0]
                                     + offr[n, og, ky, kx, 0, oy, ox])
                                xx = (ox * strides[1] - pads[1] + kx * dil[1]
                                      + offr[n, og, ky, kx, 1, oy, ox])
                                v = 0.0
                                if -1 < y < H and -1 < xx < W:
                                    y0 = int(np.floor(y))
                                    x0 = int(np.floor(xx))
                                    for dy in (0, 1):
                                        for dx in (0, 1):
                                            yy, xc = y0 + dy, x0 + dx
                                            if 0 <= yy < H and 0 <= xc < W:
                                                wy = (y - y0) if dy else (1 - (y - y0))
                                                wx = (xx - x0) if dx else (1 - (xx - x0))
                                                v += wy * wx * x[n, c, yy, xc]
                                if maskr is not None:
                                    v *= maskr[n, og, ky, kx, oy, ox]
                                acc += v * w[m, ci, ky, kx]
                    out[n, m, oy, ox] = acc
            if bias is not None:
                out[n, m] += bias[m]
    return out.astype(np.float32)


_DX = np.arange(9, dtype=np.float32).reshape(1, 1, 3, 3)
_DW = np.ones((1, 1, 2, 2), np.float32)
_DOF = _rng.standard_normal((1, 8, 2, 2)).astype(np.float32) * 0.5
add("basic_deform_conv_without_padding", "DeformConv",
    {"x": _DX, "w": _DW, "offset": _DOF},
    [_deform_ref(_DX, _DW, _DOF)], oracle_only=False,
    kernel_shape=[2, 2], pads=[0, 0, 0, 0])
_DOF2 = _rng.standard_normal((1, 8, 4, 4)).astype(np.float32) * 0.5
add("basic_deform_conv_with_padding", "DeformConv",
    {"x": _DX, "w": _DW, "offset": _DOF2},
    [_deform_ref(_DX, _DW, _DOF2, pads=(1, 1, 1, 1))], oracle_only=False,
    kernel_shape=[2, 2], pads=[1, 1, 1, 1])
_DB = np.array([0.5], np.float32)
_DM = _rng.random((1, 4, 2, 2)).astype(np.float32)
add("deform_conv_with_mask_bias", "DeformConv",
    {"x": _DX, "w": _DW, "offset": _DOF, "bias": _DB, "mask": _DM},
    [_deform_ref(_DX, _DW, _DOF, _DB, _DM)], oracle_only=False,
    kernel_shape=[2, 2])
_DX2 = np.arange(18, dtype=np.float32).reshape(1, 2, 3, 3)
_DW2 = np.ones((1, 2, 2, 2), np.float32)
_DOF3 = _rng.standard_normal((1, 16, 2, 2)).astype(np.float32) * 0.5
add("deform_conv_with_multiple_offset_groups", "DeformConv",
    {"x": _DX2, "w": _DW2, "offset": _DOF3},
    [_deform_ref(_DX2, _DW2, _DOF3, offset_group=2)], oracle_only=False,
    kernel_shape=[2, 2], offset_group=2)

# --- ImageDecoder ------------------------------------------------------------


def _imgdec(name, fmt, pixel_format="RGB", **save_kw):
    from PIL import Image

    arr = (_rng.random((11, 9, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    if fmt == "PPM":
        buf = io.BytesIO()
        img.save(buf, format="PPM")
    else:
        buf = io.BytesIO()
        try:
            img.save(buf, format=fmt, **save_kw)
        except Exception:
            return  # codec not in this PIL build: justified skip
    data = np.frombuffer(buf.getvalue(), np.uint8)
    dec = Image.open(io.BytesIO(buf.getvalue()))
    if pixel_format == "Grayscale":
        exp = np.asarray(dec.convert("L"), np.uint8)[..., None]
    else:
        exp = np.asarray(dec.convert("RGB"), np.uint8)
        if pixel_format == "BGR":
            exp = exp[..., ::-1]
    add(name, "ImageDecoder", {"data": data},
        [np.ascontiguousarray(exp)], oracle_only=False,
        pixel_format=pixel_format)


_imgdec("image_decoder_decode_bmp_rgb", "BMP")
_imgdec("image_decoder_decode_jpeg2k_rgb", "JPEG2000")
_imgdec("image_decoder_decode_jpeg_bgr", "JPEG", pixel_format="BGR",
        quality=95)
_imgdec("image_decoder_decode_jpeg_grayscale", "JPEG",
        pixel_format="Grayscale", quality=95)
_imgdec("image_decoder_decode_jpeg_rgb", "JPEG", quality=95)
_imgdec("image_decoder_decode_png_rgb", "PNG")
_imgdec("image_decoder_decode_pnm_rgb", "PPM")
_imgdec("image_decoder_decode_tiff_rgb", "TIFF")
_imgdec("image_decoder_decode_webp_rgb", "WEBP", lossless=True)

# --- DFT ---------------------------------------------------------------------

_FX = _rng.standard_normal((2, 8, 1)).astype(np.float32)
_FC = _rng.standard_normal((2, 8, 2)).astype(np.float32)


def _dft_ref(x, axis=-2, inverse=False, onesided=False, n=None):
    axis = axis % x.ndim  # relative to the FULL input incl component dim
    z = x[..., 0].astype(np.float64) + (
        1j * x[..., 1] if x.shape[-1] == 2 else 0.0)
    if inverse:
        out = np.fft.ifft(z, n=n, axis=axis)
    elif onesided:
        out = np.fft.rfft(z.real, n=n, axis=axis)
    else:
        out = np.fft.fft(z, n=n, axis=axis)
    return np.stack([out.real, out.imag], -1).astype(np.float32)


add("dft", "DFT", {"x": _FX, "": None,
                   "axis": np.asarray(-2, np.int64)},
    [_dft_ref(_FX)])
CASES[-1] = Case("dft", "DFT", CASES[-1].inputs, CASES[-1].expected,
                 attrs={}, initializer_names=("axis",), atol=1e-4)
add("dft_axis", "DFT", {"x": _FC, "": None,
                        "axis": np.asarray(1, np.int64)},
    [_dft_ref(_FC, axis=1)])
CASES[-1] = Case("dft_axis", "DFT", CASES[-1].inputs, CASES[-1].expected,
                 attrs={}, initializer_names=("axis",), atol=1e-4)
add("dft_inverse", "DFT", {"x": _FC, "": None,
                           "axis": np.asarray(-2, np.int64)},
    [_dft_ref(_FC, inverse=True)], inverse=1)
CASES[-1] = Case("dft_inverse", "DFT", CASES[-1].inputs,
                 CASES[-1].expected, attrs={"inverse": 1},
                 initializer_names=("axis",), atol=1e-4)
# opset-19 twins: axis is an attribute, no axis input
CASES.append(Case("dft_opset19", "DFT", {"x": _FX}, [_dft_ref(_FX)],
                  attrs={}, opset=19, atol=1e-4))
CASES.append(Case("dft_axis_opset19", "DFT", {"x": _FC},
                  [_dft_ref(_FC, axis=1)], attrs={"axis": 1}, opset=19,
                  atol=1e-4))
CASES.append(Case("dft_inverse_opset19", "DFT", {"x": _FC},
                  [_dft_ref(_FC, inverse=True)], attrs={"inverse": 1},
                  opset=19, atol=1e-4))

# --- windows ------------------------------------------------------------------


def _win_ref(kind, n, periodic=True):
    N = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    if kind == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * i / N)
    elif kind == "hamming":
        w = 25 / 46 - (21 / 46) * np.cos(2 * np.pi * i / N)
    else:
        w = 0.42 - 0.5 * np.cos(2 * np.pi * i / N) \
            + 0.08 * np.cos(4 * np.pi * i / N)
    return w.astype(np.float32)


for kind, op in (("hann", "HannWindow"), ("hamming", "HammingWindow"),
                 ("blackman", "BlackmanWindow")):
    for suffix, per in (("", True), ("_symmetric", False)):
        nm = f"{kind}window{suffix}"
        attrs = {} if per else {"periodic": 0}
        CASES.append(Case(nm, op, {"size": np.asarray(10, np.int64)},
                          [_win_ref(kind, 10, per)], attrs=attrs,
                          initializer_names=("size",), atol=1e-5))
        clone(nm)

# --- Bernoulli (p in {0,1} -> deterministic under any seed) -------------------

_BP = (_rng.random((10,)) > 0.5).astype(np.float32)
add("bernoulli", "Bernoulli", {"x": _BP}, [_BP])
clone("bernoulli")
add("bernoulli_double", "Bernoulli", {"x": _BP.astype(np.float64)},
    [_BP.astype(np.float64)], dtype=11)
clone("bernoulli_double")
add("bernoulli_seed", "Bernoulli", {"x": _BP}, [_BP], seed=float(0))
clone("bernoulli_seed")

# --- DynamicQuantizeLinear ----------------------------------------------------


def _dql_ref(x):
    mn, mx = min(x.min(), 0.0), max(x.max(), 0.0)
    scale = np.float32((mx - mn) / 255.0)
    zp = np.uint8(np.clip(np.rint(-mn / scale), 0, 255)) if scale > 0 \
        else np.uint8(0)
    y = np.clip(np.rint(x / scale) + zp, 0, 255).astype(np.uint8) \
        if scale > 0 else x.astype(np.uint8)
    return [y, scale, zp]


for nm, data in (
        ("dynamicquantizelinear",
         np.array([0, 2, -3, -2.5, 1.34, 0.5], np.float32)),
        ("dynamicquantizelinear_max_adjusted",
         np.array([-1.0, -2.1, -1.3, -2.5, -3.34, -4.0], np.float32)),
        ("dynamicquantizelinear_min_adjusted",
         np.array([1, 2.1, 1.3, 2.5, 3.34, 4.0, 1.5, 2.6, 5.9, 2.4, 1,
                   3.24, 3.8, 4.4, 6.2], np.float32).reshape(3, 5))):
    add(nm, "DynamicQuantizeLinear", {"x": data}, _dql_ref(data))
    clone(nm)

# --- LRN / Det / Unique / Compress / BitwiseNot / BitShift / bool ------------

_LX = _rng.standard_normal((2, 8, 3, 3)).astype(np.float32)


def _lrn_ref(x, alpha, beta, bias, size):
    C = x.shape[1]
    sq = x.astype(np.float64) ** 2
    out = np.zeros_like(sq)
    for c in range(C):
        lo = max(0, c - (size - 1) // 2)
        hi = min(C, c + size // 2 + 1)
        out[:, c] = sq[:, lo:hi].sum(axis=1)
    return (x / ((bias + alpha / size * out) ** beta)).astype(np.float32)


add("lrn", "LRN", {"x": _LX}, [_lrn_ref(_LX, 2e-4, 0.5, 2.0, 3)],
    alpha=2e-4, beta=0.5, bias=2.0, size=3)
add("lrn_default", "LRN", {"x": _LX},
    [_lrn_ref(_LX, 1e-4, 0.75, 1.0, 3)], size=3)

_DTX = _rng.standard_normal((3, 3)).astype(np.float32)
_DTN = _rng.standard_normal((2, 3, 3)).astype(np.float32)
add("det_2d", "Det", {"x": _DTX}, [np.linalg.det(_DTX.astype(np.float64)).astype(np.float32)])
add("det_nd", "Det", {"x": _DTN}, [np.linalg.det(_DTN.astype(np.float64)).astype(np.float32)])

_UQ = np.array([2, 1, 1, 3, 4, 3], np.float32)
y, i, inv, c = np.unique(_UQ, return_index=True, return_inverse=True,
                         return_counts=True)
add("unique_sorted_without_axis", "Unique", {"x": _UQ},
    [y, i.astype(np.int64), inv.astype(np.int64), c.astype(np.int64)],
    oracle_only=False)
add("unique_length_1", "Unique", {"x": np.array([5.0], np.float32)},
    [np.array([5.0], np.float32), np.zeros(1, np.int64),
     np.zeros(1, np.int64), np.ones(1, np.int64)], oracle_only=False)
# not_sorted: first-occurrence order
_UQ2 = np.array([2, 1, 1, 3, 4, 3], np.float32)
add("unique_not_sorted_without_axis", "Unique", {"x": _UQ2},
    [np.array([2, 1, 3, 4], np.float32),
     np.array([0, 1, 3, 4], np.int64),
     np.array([0, 1, 1, 2, 3, 2], np.int64),
     np.array([1, 2, 2, 1], np.int64)], oracle_only=False, sorted=0)
_UQA = np.array([[1, 0, 0], [1, 0, 0], [2, 3, 4]], np.float32)
ya, ia, inva, ca = np.unique(_UQA, axis=0, return_index=True,
                             return_inverse=True, return_counts=True)
add("unique_sorted_with_axis", "Unique", {"x": _UQA},
    [ya, ia.astype(np.int64), inva.reshape(-1).astype(np.int64),
     ca.astype(np.int64)], oracle_only=False, axis=0)
add("unique_sorted_with_negative_axis", "Unique", {"x": _UQA.T},
    [ya.T, ia.astype(np.int64), inva.reshape(-1).astype(np.int64),
     ca.astype(np.int64)], oracle_only=False, axis=-1)
_UQ3 = _rng.integers(0, 2, (2, 3, 2)).astype(np.float32)
y3, i3, inv3, c3 = np.unique(_UQ3, axis=1, return_index=True,
                             return_inverse=True, return_counts=True)
add("unique_sorted_with_axis_3d", "Unique", {"x": _UQ3},
    [y3, i3.astype(np.int64), inv3.reshape(-1).astype(np.int64),
     c3.astype(np.int64)], oracle_only=False, axis=1)

_CPX = np.array([[1, 2], [3, 4], [5, 6]], np.float32)
add("compress_0", "Compress",
    {"x": _CPX, "cond": np.array([0, 1, 1], bool)},
    [np.compress([0, 1, 1], _CPX, axis=0)], oracle_only=False, axis=0)
add("compress_1", "Compress",
    {"x": _CPX, "cond": np.array([0, 1], bool)},
    [np.compress([0, 1], _CPX, axis=1)], oracle_only=False, axis=1)
add("compress_negative_axis", "Compress",
    {"x": _CPX, "cond": np.array([0, 1], bool)},
    [np.compress([0, 1], _CPX, axis=-1)], oracle_only=False, axis=-1)
add("compress_default_axis", "Compress",
    {"x": _CPX, "cond": np.array([0, 1, 0, 0, 1], bool)},
    [np.compress([0, 1, 0, 0, 1], _CPX.reshape(-1))], oracle_only=False)

for nm, shp in (("bitwise_not_2d", (3, 4)), ("bitwise_not_3d", (3, 4, 5)),
                ("bitwise_not_4d", (3, 4, 5, 6))):
    xv = _rng.integers(-100, 100, shp).astype(np.int32)
    add(nm, "BitwiseNot", {"x": xv}, [np.invert(xv)])

for d, ty in (("left", np.uint8), ("left", np.uint16), ("left", np.uint32),
              ("left", np.uint64), ("right", np.uint8),
              ("right", np.uint16), ("right", np.uint32),
              ("right", np.uint64)):
    nm = f"bitshift_{d}_{np.dtype(ty).name}"
    xv = np.array([16, 4, 1], ty)
    sv = np.array([1, 2, 3], ty)
    exp = (xv << sv) if d == "left" else (xv >> sv)
    add(nm, "BitShift", {"x": xv, "y": sv}, [exp],
        direction=("LEFT" if d == "left" else "RIGHT"))

for nm_op, fn in (("and", np.logical_and), ("or", np.logical_or),
                  ("xor", np.logical_xor)):
    for nd, shp in (("2d", (3, 4)), ("3d", (3, 4, 5)),
                    ("4d", (3, 4, 5, 6))):
        a = _rng.random(shp) > 0.5
        b = _rng.random(shp) > 0.5
        add(f"{nm_op}{nd}", nm_op.capitalize() if nm_op != "xor"
            else "Xor", {"a": a, "b": b}, [fn(a, b)])

# --- strings ------------------------------------------------------------------


def _s(x):
    return np.asarray(x, dtype=object)


add("string_concat", "StringConcat",
    {"a": _s(["abc", "def"]), "b": _s([".com", ".net"])},
    [_s(["abc.com", "def.net"])], oracle_only=False)
add("string_concat_broadcasting", "StringConcat",
    {"a": _s([["ab", "cd"], ["ef", "gh"]]), "b": _s(["x", "y"])},
    [_s([["abx", "cdy"], ["efx", "ghy"]])], oracle_only=False)
add("string_concat_empty_string", "StringConcat",
    {"a": _s(["", "a"]), "b": _s(["b", ""])}, [_s(["b", "a"])],
    oracle_only=False)
add("string_concat_utf8", "StringConcat",
    {"a": _s(["桜"]), "b": _s(["はな"])}, [_s(["桜はな"])],
    oracle_only=False)
add("string_concat_zero_dimensional", "StringConcat",
    {"a": _s("ab"), "b": _s("cd")}, [_s("abcd")], oracle_only=False)

add("string_split_basic", "StringSplit",
    {"x": _s(["a,b,c", "d,e"])},
    [_s([["a", "b", "c"], ["d", "e", ""]]),
     np.array([3, 2], np.int64)], oracle_only=False, delimiter=",")
add("string_split_consecutive_delimiters", "StringSplit",
    {"x": _s(["a,,b"])}, [_s([["a", "", "b"]]),
                          np.array([3], np.int64)],
    oracle_only=False, delimiter=",")
add("string_split_maxsplit", "StringSplit",
    {"x": _s(["a,b,c,d"])}, [_s([["a", "b", "c,d"]]),
                             np.array([3], np.int64)],
    oracle_only=False, delimiter=",", maxsplit=2)
add("string_split_no_delimiter", "StringSplit",
    {"x": _s(["hello world  foo"])},
    [_s([["hello", "world", "foo"]]), np.array([3], np.int64)],
    oracle_only=False)
add("string_split_empty_string_delimiter", "StringSplit",
    {"x": _s([""])}, [_s([[]]).reshape(1, 0),
                      np.array([0], np.int64)],
    oracle_only=False, delimiter=",")
add("string_split_empty_tensor", "StringSplit",
    {"x": _s([]).reshape(0)}, [_s([]).reshape(0, 0),
                               np.zeros(0, np.int64)],
    oracle_only=False, delimiter=",")

_MON = _s(["monday", "tuesday", "wednesday", "thursday"])
add("strnormalizer_export_monday_casesensintive_lower",
    "StringNormalizer", {"x": _MON},
    [_s(["tuesday", "wednesday", "thursday"])], oracle_only=False,
    case_change_action="LOWER", is_case_sensitive=1,
    stopwords=["monday"])
add("strnormalizer_export_monday_casesensintive_nochangecase",
    "StringNormalizer", {"x": _MON},
    [_s(["tuesday", "wednesday", "thursday"])], oracle_only=False,
    is_case_sensitive=1, stopwords=["monday"])
add("strnormalizer_export_monday_casesensintive_upper",
    "StringNormalizer", {"x": _MON},
    [_s(["TUESDAY", "WEDNESDAY", "THURSDAY"])], oracle_only=False,
    case_change_action="UPPER", is_case_sensitive=1,
    stopwords=["monday"])
add("strnormalizer_export_monday_empty_output", "StringNormalizer",
    {"x": _s(["monday", "monday"])}, [_s([""])], oracle_only=False,
    is_case_sensitive=1, stopwords=["monday"])
add("strnormalizer_export_monday_insensintive_upper_twodim",
    "StringNormalizer",
    {"x": _s(["Monday", "tuesday", "wednesday", "Monday", "tuesday",
              "wednesday"]).reshape(1, 6)},
    [_s(["TUESDAY", "WEDNESDAY", "TUESDAY", "WEDNESDAY"]).reshape(1, 4)],
    oracle_only=False, case_change_action="UPPER", stopwords=["monday"])
add("strnormalizer_nostopwords_nochangecase", "StringNormalizer",
    {"x": _s(["monday", "tuesday"])}, [_s(["monday", "tuesday"])],
    oracle_only=False, is_case_sensitive=1)

add("regex_full_match_basic", "RegexFullMatch",
    {"x": _s(["www.google.com", "www.facebook.com", "www.bbc.co.uk"])},
    [np.array([False, False, True])], oracle_only=False,
    pattern=r"www\.[\w.-]+\.\bco\.uk\b")
add("regex_full_match_email_domain", "RegexFullMatch",
    {"x": _s([["account@gmail.com", "account@hotmail.com"],
              ["not email", "account2@yahoo.com"]])},
    [np.array([[True, False], [False, True]])], oracle_only=False,
    pattern=r"(\W|^)[\w.\-]{0,25}@(yahoo|gmail)\.com(\W|$)")
add("regex_full_match_empty", "RegexFullMatch",
    {"x": _s([]).reshape(0)}, [np.zeros(0, bool)], oracle_only=False,
    pattern=r"(\W|^)[\w.\-]{0,25}@(yahoo|gmail)\.com(\W|$)")

# --- ai.onnx.ml ---------------------------------------------------------------

add("ai_onnx_ml_label_encoder_string_int", "LabelEncoder",
    {"x": _s(["a", "b", "x", "c"])},
    [np.array([0, 1, -1, 2], np.int64)], oracle_only=False,
    domain="ai.onnx.ml", keys_strings=["a", "b", "c"],
    values_int64s=[0, 1, 2], default_int64=-1)
add("ai_onnx_ml_label_encoder_string_int_no_default", "LabelEncoder",
    {"x": _s(["a", "b", "x", "c"])},
    [np.array([0, 1, -1, 2], np.int64)], oracle_only=False,
    domain="ai.onnx.ml", keys_strings=["a", "b", "c"],
    values_int64s=[0, 1, 2])
add("ai_onnx_ml_label_encoder_tensor_mapping", "LabelEncoder",
    {"x": np.array([1, 5, 2, 9], np.int64)},
    [_s(["one", "other", "two", "other"])], oracle_only=False,
    domain="ai.onnx.ml", keys_int64s=[1, 2],
    values_strings=["one", "two"], default_string="other")
add("ai_onnx_ml_label_encoder_tensor_value_only_mapping", "LabelEncoder",
    {"x": np.array([1, 2, 3], np.int64)},
    [_s(["a", "b", "other"])], oracle_only=False, domain="ai.onnx.ml",
    keys_int64s=[1, 2], values_strings=["a", "b"],
    default_string="other")

_BZX = np.array([[-0.5, 0.1, 1.2], [0.4, -1.1, 2.2]], np.float32)
add("ai_onnx_ml_binarizer", "Binarizer", {"x": _BZX},
    [(_BZX > 0.3).astype(np.float32)], domain="ai.onnx.ml",
    threshold=0.3)

_AFX = np.arange(12, dtype=np.float32).reshape(3, 4)
add("ai_onnx_ml_array_feature_extractor", "ArrayFeatureExtractor",
    {"x": _AFX, "idx": np.array([0, 2], np.int64)},
    [np.take(_AFX, [0, 2], axis=-1)], domain="ai.onnx.ml")

# --- Momentum (preview.training) ---------------------------------------------


def _momentum_ref(r, t, xs, gs, vs, alpha, beta, nc, nesterov=False):
    outs_x, outs_v = [], []
    for x, g, v in zip(xs, gs, vs):
        x, g, v = (np.asarray(x, np.float64), np.asarray(g, np.float64),
                   np.asarray(v, np.float64))
        beta_adj = beta if t > 0 else 1.0
        gr = g + nc * x
        v_new = alpha * v + beta_adj * gr
        if nesterov:
            x_new = x - r * (gr + alpha * v_new)
        else:
            x_new = x - r * v_new
        outs_x.append(x_new.astype(np.float32))
        outs_v.append(v_new.astype(np.float32))
    return outs_x + outs_v


_MR = np.float32(0.1)
_MT = np.int64(0)
_MX = np.array([1.2, 2.8], np.float32)
_MG = np.array([-0.94, -2.5], np.float32)
_MV = np.array([1.7, 3.6], np.float32)
add("momentum", "Momentum",
    {"r": _MR, "t": _MT, "x": _MX, "g": _MG, "v": _MV},
    _momentum_ref(0.1, 0, [_MX], [_MG], [_MV], 0.95, 0.1, 0.002),
    oracle_only=False, domain="ai.onnx.preview.training",
    alpha=0.95, beta=0.1, norm_coefficient=0.002, mode="standard")
_MX2 = np.array([1.0], np.float32)
_MG2 = np.array([-1.0], np.float32)
_MV2 = np.array([2.0], np.float32)
add("momentum_multiple", "Momentum",
    {"r": _MR, "t": _MT, "x1": _MX2, "x2": _MX, "g1": _MG2, "g2": _MG,
     "v1": _MV2, "v2": _MV},
    _momentum_ref(0.1, 0, [_MX2, _MX], [_MG2, _MG], [_MV2, _MV],
                  0.95, 0.85, 0.002),
    oracle_only=False, domain="ai.onnx.preview.training",
    alpha=0.95, beta=0.85, norm_coefficient=0.002, mode="standard")
add("nesterov_momentum", "Momentum",
    {"r": _MR, "t": _MT, "x": _MX, "g": _MG, "v": _MV},
    _momentum_ref(0.1, 0, [_MX], [_MG], [_MV], 0.95, 1.0, 0.01,
                  nesterov=True),
    oracle_only=False, domain="ai.onnx.preview.training",
    alpha=0.95, beta=1.0, norm_coefficient=0.01, mode="nesterov")

# --- QLinearConv / ConvInteger -------------------------------------------------

_QX = _rng.integers(0, 255, (1, 1, 7, 7)).astype(np.uint8)
_QW = _rng.integers(0, 255, (1, 1, 1, 1)).astype(np.uint8)


def _qlc_ref(x, xs, xz, w, ws, wz, ys, yz):
    xf = (x.astype(np.float64) - xz) * xs
    wf = (w.astype(np.float64) - wz) * ws
    import torch.nn.functional as F

    y = F.conv2d(torch.tensor(xf[None] if xf.ndim == 3 else xf),
                 torch.tensor(wf)).numpy()
    q = np.rint(y / ys) + yz
    return np.clip(q, 0, 255).astype(np.uint8)


add("qlinearconv", "QLinearConv",
    {"x": _QX, "x_scale": np.float32(0.00369), "x_zp": np.uint8(132),
     "w": _QW, "w_scale": np.float32(0.00172), "w_zp": np.uint8(255),
     "y_scale": np.float32(0.00162), "y_zp": np.uint8(123)},
    [_qlc_ref(_QX, 0.00369, 132, _QW, 0.00172, 255, 0.00162, 123)])

_CIX = np.arange(1, 10, dtype=np.uint8).reshape(1, 1, 3, 3)
_CIW = np.ones((1, 1, 2, 2), np.uint8)


def _ci_ref(x, w, xz, pads=None):
    xf = x.astype(np.int64) - xz
    wf = w.astype(np.int64)
    if pads:
        xf = np.pad(xf, ((0, 0), (0, 0), (pads[0], pads[2]),
                         (pads[1], pads[3])))
    import torch.nn.functional as F

    y = F.conv2d(torch.tensor(xf.astype(np.float64)),
                 torch.tensor(wf.astype(np.float64))).numpy()
    return y.astype(np.int32)


add("convinteger_without_padding", "ConvInteger",
    {"x": _CIX, "w": _CIW, "x_zp": np.uint8(1)},
    [_ci_ref(_CIX, _CIW, 1)])
add("convinteger_with_padding", "ConvInteger",
    {"x": _CIX, "w": _CIW, "x_zp": np.uint8(1)},
    [_ci_ref(_CIX, _CIW, 1, pads=[1, 1, 1, 1])], pads=[1, 1, 1, 1])
