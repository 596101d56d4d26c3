"""Generate frozen .npz referee fixtures for the highest-risk op
families (Resize / LSTM / GRU / STFT / SoftmaxCrossEntropyLoss).

VERDICT r4 missing-item 1: the reference settles conformance disputes
with an EXTERNAL referee (Python onnx.reference via pyo3,
src/backends/onnx_reference_backend.rs:1-90). This image has no onnx
package, and the conformance suite's numpy oracles share authorship
with the implementation. These fixtures substitute: expected outputs
computed by TORCH (independent numerics), generated ONCE by this
script and frozen under tests/conformance/fixtures/ — regeneration is
deliberate (rerun this script), never automatic, so the referee can't
drift with the implementation.

Each fixture npz holds: op_type, attrs (json), rtol/atol, in_<name>
arrays (ordered), out_<k> arrays. tests/conformance/test_frozen_referee.py
replays them through the full Model path on both backends.
"""

import json
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "tests", "conformance", "fixtures")
rng = np.random.default_rng(20260820)
FIXTURES = {}


def add(name, op_type, inputs, outputs, rtol=1e-3, atol=1e-6,
        crop_margin=0, **attrs):
    """crop_margin > 0: compare only the spatial interior (trailing
    dims cropped by the margin). Needed where torch is a valid referee
    only away from borders — ONNX antialias CLAMPS out-of-range taps
    (edge replication; verified against the official
    resize_downsample_scales_linear_antialias expected [[2.875, 4.5],
    [9.375, 11.0]]) while torch/PIL drop them and renormalize, so the
    two agree exactly on interior pixels and deliberately differ on
    edge rows/columns."""
    assert name not in FIXTURES
    rec = {"op_type": np.str_(op_type),
           "attrs": np.str_(json.dumps(attrs)),
           "rtol": np.float64(rtol), "atol": np.float64(atol),
           "crop_margin": np.int64(crop_margin),
           "in_order": np.str_(json.dumps(list(inputs))),
           # np.savez round-trips 0-d arrays as (1,): record true ranks
           "out_shapes": np.str_(json.dumps(
               [list(np.asarray(v).shape) for v in outputs]))}
    for k, v in inputs.items():
        rec[f"in_{k}"] = v
    for i, v in enumerate(outputs):
        rec[f"out_{i}"] = np.ascontiguousarray(v)
    FIXTURES[name] = rec


# --- Resize (torch.nn.functional.interpolate) -------------------------------
X = rng.standard_normal((1, 2, 4, 5)).astype(np.float32)
tX = torch.from_numpy(X)

# linear, half_pixel == torch bilinear align_corners=False
for sc in ((2.0, 3.0), (1.7, 0.6)):
    y = F.interpolate(tX, scale_factor=sc, mode="bilinear",
                      align_corners=False, recompute_scale_factor=False)
    add(f"resize_linear_half_pixel_{sc[0]}x{sc[1]}".replace(".", "p"),
        "Resize",
        {"x": X, "roi": None, "scales":
         np.array([1, 1, *sc], np.float32)},
        [y.numpy()], mode="linear",
        coordinate_transformation_mode="half_pixel")

# linear, align_corners
y = F.interpolate(tX, size=(8, 9), mode="bilinear", align_corners=True)
add("resize_linear_align_corners_sizes", "Resize",
    {"x": X, "roi": None, "scales": None,
     "sizes": np.array([1, 2, 8, 9], np.int64)},
    [y.numpy()], mode="linear",
    coordinate_transformation_mode="align_corners")

# cubic, half_pixel (torch bicubic a=-0.75 matches ONNX default)
y = F.interpolate(tX, scale_factor=(2.0, 2.0), mode="bicubic",
                  align_corners=False, recompute_scale_factor=False)
add("resize_cubic_half_pixel", "Resize",
    {"x": X, "roi": None, "scales": np.array([1, 1, 2, 2], np.float32)},
    [y.numpy()], mode="cubic",
    coordinate_transformation_mode="half_pixel")

# nearest floor + asymmetric == torch 'nearest'
y = F.interpolate(tX, scale_factor=(2.0, 3.0), mode="nearest")
add("resize_nearest_asymmetric_floor", "Resize",
    {"x": X, "roi": None, "scales": np.array([1, 1, 2, 3], np.float32)},
    [y.numpy()], mode="nearest",
    coordinate_transformation_mode="asymmetric", nearest_mode="floor")

# antialiased downsample (bilinear + bicubic). The cubic kernel's
# stretched footprint spans ±2/s taps, so the input must be large
# enough that interior output pixels exist (all taps in range) — the
# torch referee is only valid there (clamp-vs-renormalize edges).
for md, omd, ishape, osz, margin in (
        ("bilinear", "linear", (8, 10), (3, 4), 1),
        ("bicubic", "cubic", (16, 20), (6, 8), 2)):
    XB = rng.standard_normal((1, 1) + ishape).astype(np.float32)
    y = F.interpolate(torch.from_numpy(XB), size=osz, mode=md,
                      align_corners=False, antialias=True)
    extra = {}
    if omd == "cubic":
        # torch's antialias path follows PIL, whose bicubic kernel uses
        # a=-0.5 (verified: interior weight-matrix match 1e-7 at -0.5,
        # 1.4e-2 at the ONNX default -0.75)
        extra["cubic_coeff_a"] = -0.5
    add(f"resize_downsample_antialias_{omd}", "Resize",
        {"x": XB, "roi": None, "scales": None,
         "sizes": np.array((1, 1) + osz, np.int64)},
        [y.numpy()], rtol=2e-3, atol=1e-5, crop_margin=margin, mode=omd,
        antialias=1, coordinate_transformation_mode="half_pixel",
        **extra)

# 1D + 3D linear
X1 = rng.standard_normal((2, 3, 6)).astype(np.float32)
y = F.interpolate(torch.from_numpy(X1), scale_factor=2.5, mode="linear",
                  align_corners=False, recompute_scale_factor=False)
add("resize_linear_1d", "Resize",
    {"x": X1, "roi": None,
     "scales": np.array([1, 1, 2.5], np.float32)},
    [y.numpy()], mode="linear",
    coordinate_transformation_mode="half_pixel")
X3 = rng.standard_normal((1, 1, 3, 4, 5)).astype(np.float32)
y = F.interpolate(torch.from_numpy(X3), scale_factor=(2, 2, 2),
                  mode="trilinear", align_corners=False,
                  recompute_scale_factor=False)
add("resize_linear_3d", "Resize",
    {"x": X3, "roi": None,
     "scales": np.array([1, 1, 2, 2, 2], np.float32)},
    [y.numpy()], mode="linear",
    coordinate_transformation_mode="half_pixel")


# --- LSTM / GRU --------------------------------------------------------------
def _lstm_fixture(name, T, B, I, H, bidirectional, with_init):
    num_dir = 2 if bidirectional else 1
    m = torch.nn.LSTM(I, H, bidirectional=bidirectional)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32)))
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    h0 = rng.standard_normal((num_dir, B, H)).astype(np.float32) \
        if with_init else np.zeros((num_dir, B, H), np.float32)
    c0 = rng.standard_normal((num_dir, B, H)).astype(np.float32) \
        if with_init else np.zeros((num_dir, B, H), np.float32)
    with torch.no_grad():
        y, (hn, cn) = m(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))

    # torch gate order i,f,g,o -> ONNX i,o,f,c (g==c)
    def remap(w):  # (4H, X) -> (4H, X)
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    Ws, Rs, Bs = [], [], []
    for d in range(num_dir):
        sfx = "_reverse" if d else ""
        Ws.append(remap(getattr(m, f"weight_ih_l0{sfx}").detach().numpy()))
        Rs.append(remap(getattr(m, f"weight_hh_l0{sfx}").detach().numpy()))
        Bs.append(np.concatenate(
            [remap(getattr(m, f"bias_ih_l0{sfx}").detach().numpy()),
             remap(getattr(m, f"bias_hh_l0{sfx}").detach().numpy())]))
    W = np.stack(Ws)          # (D, 4H, I)
    R = np.stack(Rs)          # (D, 4H, H)
    Bias = np.stack(Bs)       # (D, 8H)
    # ONNX Y: (T, D, B, H); torch y: (T, B, D*H)
    Y = y.numpy().reshape(T, B, num_dir, H).transpose(0, 2, 1, 3)
    ins = {"x": x, "w": W, "r": R, "b": Bias}
    if with_init:
        ins["sequence_lens"] = None
        ins["initial_h"] = h0
        ins["initial_c"] = c0
    add(name, "LSTM", ins, [Y, hn.detach().numpy(), cn.detach().numpy()],
        hidden_size=H,
        direction="bidirectional" if bidirectional else "forward")


_lstm_fixture("lstm_forward_torch", 5, 3, 4, 6, False, False)
_lstm_fixture("lstm_forward_init_torch", 4, 2, 3, 5, False, True)
_lstm_fixture("lstm_bidir_torch", 6, 2, 4, 3, True, False)
_lstm_fixture("lstm_bidir_init_torch", 3, 2, 5, 4, True, True)


def _gru_fixture(name, T, B, I, H, bidirectional):
    num_dir = 2 if bidirectional else 1
    m = torch.nn.GRU(I, H, bidirectional=bidirectional)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32)))
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    with torch.no_grad():
        y, hn = m(torch.from_numpy(x))
    # torch gate order r,z,n == ONNX z,r,h reordered: ONNX wants z,r,h
    def remap(w):
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    Ws, Rs, Bs = [], [], []
    for d in range(num_dir):
        sfx = "_reverse" if d else ""
        Ws.append(remap(getattr(m, f"weight_ih_l0{sfx}").detach().numpy()))
        Rs.append(remap(getattr(m, f"weight_hh_l0{sfx}").detach().numpy()))
        Bs.append(np.concatenate(
            [remap(getattr(m, f"bias_ih_l0{sfx}").detach().numpy()),
             remap(getattr(m, f"bias_hh_l0{sfx}").detach().numpy())]))
    Y = y.numpy().reshape(T, B, num_dir, H).transpose(0, 2, 1, 3)
    add(name, "GRU",
        {"x": x, "w": np.stack(Ws), "r": np.stack(Rs),
         "b": np.stack(Bs)},
        [Y, hn.detach().numpy()], hidden_size=H,
        direction="bidirectional" if bidirectional else "forward",
        linear_before_reset=1)  # torch GRU semantics


_gru_fixture("gru_forward_torch", 5, 3, 4, 6, False)
_gru_fixture("gru_bidir_torch", 4, 2, 3, 5, True)


# --- STFT --------------------------------------------------------------------
def _stft_fixture(name, B, L, frame_length, frame_step, onesided,
                  window=None):
    sig = rng.standard_normal((B, L)).astype(np.float32)
    win = (np.hanning(frame_length).astype(np.float32)
           if window == "hann" else None)
    twin = (torch.from_numpy(win) if win is not None
            else torch.ones(frame_length))
    spec = torch.stft(torch.from_numpy(sig), n_fft=frame_length,
                      hop_length=frame_step, win_length=frame_length,
                      window=twin, center=False, onesided=onesided,
                      return_complex=True)
    # torch: (B, F, T) complex -> ONNX: (B, T, F, 2)
    spec = spec.numpy().transpose(0, 2, 1)
    out = np.stack([spec.real, spec.imag], axis=-1).astype(np.float32)
    ins = {"signal": sig[..., None],
           "frame_step": np.int64(frame_step)}
    if win is not None:
        ins["window"] = win
    else:
        ins["window"] = None
    ins["frame_length"] = np.int64(frame_length)
    add(name, "STFT", ins, [out], rtol=2e-3, atol=2e-5,
        onesided=int(onesided))


_stft_fixture("stft_onesided_hann_torch", 2, 64, 16, 8, True, "hann")
_stft_fixture("stft_onesided_rect_torch", 1, 48, 16, 4, True)
_stft_fixture("stft_twosided_hann_torch", 1, 40, 8, 4, False, "hann")


# --- SoftmaxCrossEntropyLoss -------------------------------------------------
def _sce_fixture(name, N, C, reduction, weights=False, ignore=None,
                 spatial=None):
    shape = (N, C) + (tuple(spatial) if spatial else ())
    x = rng.standard_normal(shape).astype(np.float32) * 2
    tshape = (N,) + (tuple(spatial) if spatial else ())
    t = rng.integers(0, C, tshape).astype(np.int64)
    if ignore is not None:
        t.reshape(-1)[::3] = ignore
    w = (rng.random(C).astype(np.float32) + 0.25) if weights else None
    tx, tt = torch.from_numpy(x), torch.from_numpy(t)
    tw = torch.from_numpy(w) if w is not None else None
    loss = F.cross_entropy(
        tx, tt, weight=tw, reduction=reduction,
        ignore_index=(ignore if ignore is not None else -100))
    log_prob = F.log_softmax(tx, dim=1)
    ins = {"scores": x, "labels": t}
    if w is not None:
        ins["weights"] = w
    attrs = {"reduction": reduction}
    if ignore is not None:
        attrs["ignore_index"] = ignore
    add(name, "SoftmaxCrossEntropyLoss", ins,
        [loss.numpy().astype(np.float32),
         log_prob.numpy().astype(np.float32)],
        rtol=2e-3, atol=2e-6, **attrs)


_sce_fixture("sce_mean_torch", 6, 5, "mean")
_sce_fixture("sce_sum_weights_torch", 4, 7, "sum", weights=True)
_sce_fixture("sce_none_torch", 5, 4, "none")
_sce_fixture("sce_mean_ignore_torch", 6, 5, "mean", weights=True,
             ignore=2)
_sce_fixture("sce_spatial_mean_torch", 2, 4, "mean", spatial=(3, 5))
_sce_fixture("sce_spatial_none_ignore_torch", 2, 3, "none",
             ignore=1, spatial=(4,))


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    total = 0
    for name, rec in FIXTURES.items():
        # None inputs (absent optionals) are encoded as 0-size markers
        ins = json.loads(str(rec["in_order"]))
        packed = {}
        for k, v in rec.items():
            if k.startswith("in_") and k != "in_order" and v is None:
                packed[k + "__absent__"] = np.zeros(0, np.int8)
            elif v is not None:
                packed[k] = v
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, **packed)
        total += os.path.getsize(path)
        del ins
    print(f"{len(FIXTURES)} fixtures, {total / 1024:.0f} KiB total "
          f"-> {OUT_DIR}", file=sys.stderr)


if __name__ == "__main__":
    main()
