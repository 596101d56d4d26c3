"""Tests for formerly-NotImplemented branches (round-2 burn-down):
negative pads in jit, Slice/LayerNorm/GatherElements backwards,
Reduce max/min backward with positive axes, grouped ConvWeightGrad in
jit, LSTM sequence_lens in jit, GatherND batch_dims>0 in jit.

Each case compares against an independent referee (torch autograd,
jax.grad, or the numpy oracle) per the conformance strategy
(reference tests/onnx_testing.rs tolerances).
"""

import numpy as np
import pytest
import torch

from whisper_tensor_tpu.backends.xla.compiler import compile_milli
from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.autodiff import generate_backward
from whisper_tensor_tpu.milli.ops import (MatMul, Reduce, SimpleBinary,
                                          SimpleUnary, Slice)
from whisper_tensor_tpu.tensor_info import TensorInfo

rng = np.random.default_rng(7)


def _xla_vs_oracle(g, feeds, static=None, rtol=1e-5, atol=1e-6):
    ref = g.eval(feeds)
    comp = compile_milli(g, feeds, static_inputs=static, use_cache=False)
    out = comp(feeds)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(out[k], np.float64),
                                   v.astype(np.float64),
                                   rtol=rtol, atol=atol, err_msg=k)


def test_negative_pads_jit():
    from whisper_tensor_tpu.milli.ops.shape import Pad
    from whisper_tensor_tpu.milli.ops import Constant

    g = MilliGraph("negpad")
    x = g.add_input("x")
    pads = g.op1(Constant(np.asarray([-1, 1, 2, -2], dtype=np.int64)))
    g.mark_output("y", g.op1(Pad(mode="constant"), x, pads))
    feeds = {"x": rng.standard_normal((5, 6)).astype(np.float32)}
    _xla_vs_oracle(g, feeds)


def test_negative_pads_jit_reflect():
    from whisper_tensor_tpu.milli.ops.shape import Pad
    from whisper_tensor_tpu.milli.ops import Constant

    g = MilliGraph("negpadr")
    x = g.add_input("x")
    pads = g.op1(Constant(np.asarray([2, -1, 1, -2], dtype=np.int64)))
    g.mark_output("y", g.op1(Pad(mode="reflect"), x, pads))
    feeds = {"x": rng.standard_normal((6, 7)).astype(np.float32)}
    _xla_vs_oracle(g, feeds)


def test_slice_backward_pad_rule():
    """d(sum(x[1:4, 2:5]))/dx == indicator of the slice window."""
    from whisper_tensor_tpu.milli.ops import Constant

    g = MilliGraph("slicebwd")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [5, 6]))
    st = g.op1(Constant(np.asarray([1, 2], dtype=np.int64)))
    en = g.op1(Constant(np.asarray([4, 5], dtype=np.int64)))
    sl = g.op1(Slice(), x, st, en)
    loss = g.op1(Reduce("sum", axes=None, keepdims=False),
                 g.op1(SimpleBinary("mul"), sl, sl))
    g.mark_output("loss", loss)
    grads = generate_backward(g, loss, {"x": g.inputs["x"]})
    g.mark_output("gx", grads["x"])
    xv = rng.standard_normal((5, 6)).astype(np.float32)
    out = g.eval({"x": xv})
    exp = np.zeros((5, 6), np.float32)
    exp[1:4, 2:5] = 2 * xv[1:4, 2:5]
    np.testing.assert_allclose(out["gx"], exp, rtol=1e-6)
    # and through XLA
    _xla_vs_oracle(g, {"x": xv})


def test_slice_backward_negative_indices_and_axes():
    from whisper_tensor_tpu.milli.ops import Constant

    g = MilliGraph("slicebwd2")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [4, 8]))
    st = g.op1(Constant(np.asarray([-6], dtype=np.int64)))
    en = g.op1(Constant(np.asarray([2 ** 31], dtype=np.int64)))
    ax = g.op1(Constant(np.asarray([1], dtype=np.int64)))
    sl = g.op1(Slice(), x, st, en, ax)
    loss = g.op1(Reduce("sum", axes=None, keepdims=False), sl)
    g.mark_output("loss", loss)
    grads = generate_backward(g, loss, {"x": g.inputs["x"]})
    g.mark_output("gx", grads["x"])
    xv = rng.standard_normal((4, 8)).astype(np.float32)
    out = g.eval({"x": xv})
    exp = np.zeros((4, 8), np.float32)
    exp[:, -6:] = 1.0
    np.testing.assert_allclose(out["gx"], exp)


def test_layernorm_backward_vs_torch():
    from whisper_tensor_tpu.milli.ops.norm import LayerNormMilli

    B, T, D = 3, 4, 8
    xv = rng.standard_normal((B, T, D)).astype(np.float32)
    sv = rng.standard_normal((D,)).astype(np.float32)
    bv = rng.standard_normal((D,)).astype(np.float32)
    gv = rng.standard_normal((B, T, D)).astype(np.float32)

    g = MilliGraph("lnbwd")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [B, T, D]))
    s = g.add_input("s", TensorInfo.shaped(DType.F32, [D]))
    bb = g.add_input("b", TensorInfo.shaped(DType.F32, [D]))
    from whisper_tensor_tpu.milli.ops import Constant

    y = g.op1(LayerNormMilli(axis=-1, epsilon=1e-5), x, s, bb)
    # weighted-sum loss so the seed grad is gv
    wconst = g.op1(Constant(gv))
    loss = g.op1(Reduce("sum", axes=None, keepdims=False),
                 g.op1(SimpleBinary("mul"), y, wconst))
    g.mark_output("loss", loss)
    g.infer_all({"x": TensorInfo.shaped(DType.F32, [B, T, D]),
                 "s": TensorInfo.shaped(DType.F32, [D]),
                 "b": TensorInfo.shaped(DType.F32, [D])})
    grads = generate_backward(g, loss, {"x": g.inputs["x"],
                                        "s": g.inputs["s"],
                                        "b": g.inputs["b"]})
    for k, tid in grads.items():
        g.mark_output(f"g{k}", tid)
    out = g.eval({"x": xv, "s": sv, "b": bv})

    xt = torch.tensor(xv, requires_grad=True)
    st = torch.tensor(sv, requires_grad=True)
    bt = torch.tensor(bv, requires_grad=True)
    yt = torch.nn.functional.layer_norm(xt, (D,), st, bt, eps=1e-5)
    (yt * torch.tensor(gv)).sum().backward()
    np.testing.assert_allclose(out["gx"], xt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["gs"], st.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["gb"], bt.grad.numpy(), rtol=1e-4, atol=1e-5)
    # and compiled
    _xla_vs_oracle(g, {"x": xv, "s": sv, "b": bv}, rtol=1e-4, atol=1e-5)


def test_layernorm_backward_axis1():
    from whisper_tensor_tpu.milli.ops.norm import LayerNormMilli
    from whisper_tensor_tpu.milli.ops import Constant

    B, T, D = 2, 3, 4
    xv = rng.standard_normal((B, T, D)).astype(np.float32)
    sv = rng.standard_normal((T, D)).astype(np.float32)
    gv = rng.standard_normal((B, T, D)).astype(np.float32)

    g = MilliGraph("lnbwd1")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [B, T, D]))
    s = g.add_input("s", TensorInfo.shaped(DType.F32, [T, D]))
    y = g.op1(LayerNormMilli(axis=1, epsilon=1e-5), x, s)
    loss = g.op1(Reduce("sum", axes=None, keepdims=False),
                 g.op1(SimpleBinary("mul"), y, g.op1(Constant(gv))))
    g.mark_output("loss", loss)
    grads = generate_backward(g, loss, {"x": g.inputs["x"], "s": g.inputs["s"]})
    for k, tid in grads.items():
        g.mark_output(f"g{k}", tid)
    out = g.eval({"x": xv, "s": sv})

    xt = torch.tensor(xv, requires_grad=True)
    st = torch.tensor(sv, requires_grad=True)
    yt = torch.nn.functional.layer_norm(xt, (T, D), st, None, eps=1e-5)
    (yt * torch.tensor(gv)).sum().backward()
    np.testing.assert_allclose(out["gx"], xt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["gs"], st.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_reduce_max_backward_positive_axes_no_keepdims():
    from whisper_tensor_tpu.milli.ops import Constant

    g = MilliGraph("maxbwd")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [3, 4, 5]))
    m = g.op1(Reduce("max", axes=[1], keepdims=False), x)
    gv = rng.standard_normal((3, 5)).astype(np.float32)
    loss = g.op1(Reduce("sum", axes=None, keepdims=False),
                 g.op1(SimpleBinary("mul"), m, g.op1(Constant(gv))))
    g.mark_output("loss", loss)
    grads = generate_backward(g, loss, {"x": g.inputs["x"]})
    g.mark_output("gx", grads["x"])
    xv = rng.standard_normal((3, 4, 5)).astype(np.float32)
    # inject ties to exercise the even-split subgradient
    xv[0, 0, 0] = xv[0, 2, 0] = xv[:, :, 0].max() + 1.0
    out = g.eval({"x": xv})
    # referee: distribute grad equally over ties
    mx = xv.max(axis=1, keepdims=True)
    ties = (xv == mx).astype(np.float32)
    exp = ties / ties.sum(axis=1, keepdims=True) * gv[:, None, :]
    np.testing.assert_allclose(out["gx"], exp, rtol=1e-5, atol=1e-6)


def test_grouped_conv_weight_grad_jit():
    from whisper_tensor_tpu.milli.ops.conv import ConvWeightGrad
    from whisper_tensor_tpu.milli.ops import Constant

    for groups, cin, cout in [(2, 4, 6), (4, 4, 4)]:
        g = MilliGraph(f"gcwg{groups}")
        x, gr = g.add_input("x"), g.add_input("g")
        ws = g.op1(Constant(np.asarray([cout, cin // groups, 3, 3],
                                       dtype=np.int64)))
        g.mark_output("dw", g.op1(ConvWeightGrad(strides=[1, 1],
                                                 groups=groups), ws, x, gr))
        feeds = {"x": rng.standard_normal((2, cin, 8, 8)).astype(np.float32),
                 "g": rng.standard_normal((2, cout, 6, 6)).astype(np.float32)}
        # referee: torch autograd through the grouped conv
        xt = torch.tensor(feeds["x"])
        wt = torch.zeros(cout, cin // groups, 3, 3, requires_grad=True)
        out = torch.nn.functional.conv2d(xt, wt, groups=groups)
        out.backward(torch.tensor(feeds["g"]))
        ref = wt.grad.numpy()
        np.testing.assert_allclose(g.eval(feeds)["dw"], ref, rtol=1e-4,
                                   atol=1e-4)
        comp = compile_milli(g, feeds, use_cache=False)
        np.testing.assert_allclose(np.asarray(comp(feeds)["dw"]), ref,
                                   rtol=1e-4, atol=1e-4)


def test_lstm_sequence_lens_jit():
    from whisper_tensor_tpu.milli.ops.rnn import LstmMilli

    S, B, I, H = 6, 3, 4, 5
    for direction in ("forward", "reverse", "bidirectional"):
        nd = 2 if direction == "bidirectional" else 1
        g = MilliGraph(f"lstm_{direction}")
        xin = g.add_input("x")
        w, r, bb = g.add_input("w"), g.add_input("r"), g.add_input("b")
        sl = g.add_input("sl")
        y, yh, yc = g.add_op(LstmMilli(hidden_size=H, direction=direction),
                             [xin, w, r, bb, sl])
        g.mark_output("y", y)
        g.mark_output("yh", yh)
        g.mark_output("yc", yc)
        feeds = {
            "x": rng.standard_normal((S, B, I)).astype(np.float32),
            "w": (rng.standard_normal((nd, 4 * H, I)) / 3).astype(np.float32),
            "r": (rng.standard_normal((nd, 4 * H, H)) / 3).astype(np.float32),
            "b": rng.standard_normal((nd, 8 * H)).astype(np.float32) / 4,
            "sl": np.asarray([6, 3, 1], dtype=np.int32),
        }
        _xla_vs_oracle(g, feeds, rtol=1e-4, atol=1e-5)


def test_gathernd_batch_dims_jit():
    from whisper_tensor_tpu.milli.ops.index import GatherND

    # batch_dims=1, k=1: per-batch row gather
    g = MilliGraph("gnd1")
    d, i = g.add_input("d"), g.add_input("i")
    g.mark_output("y", g.op1(GatherND(batch_dims=1), d, i))
    feeds = {"d": rng.standard_normal((3, 5, 7)).astype(np.float32),
             "i": rng.integers(0, 5, (3, 4, 1)).astype(np.int64)}
    _xla_vs_oracle(g, feeds)

    # batch_dims=2, k=1
    g2 = MilliGraph("gnd2")
    d2, i2 = g2.add_input("d"), g2.add_input("i")
    g2.mark_output("y", g2.op1(GatherND(batch_dims=2), d2, i2))
    feeds2 = {"d": rng.standard_normal((2, 3, 6, 4)).astype(np.float32),
              "i": rng.integers(0, 6, (2, 3, 1)).astype(np.int64)}
    _xla_vs_oracle(g2, feeds2)


def test_gather_elements_backward_axis0():
    from whisper_tensor_tpu.milli.ops.index import GatherElements
    from whisper_tensor_tpu.milli.ops import Constant

    V, K = 6, 4
    xv = rng.standard_normal((V, 5)).astype(np.float32)
    idx = rng.integers(0, V, (K, 5)).astype(np.int64)
    gv = rng.standard_normal((K, 5)).astype(np.float32)

    g = MilliGraph("gebwd")
    x = g.add_input("x", TensorInfo.shaped(DType.F32, [V, 5]))
    i = g.add_input("i", TensorInfo.shaped(DType.I64, [K, 5]))
    y = g.op1(GatherElements(axis=0), x, i)
    loss = g.op1(Reduce("sum", axes=None, keepdims=False),
                 g.op1(SimpleBinary("mul"), y, g.op1(Constant(gv))))
    g.mark_output("loss", loss)
    grads = generate_backward(g, loss, {"x": g.inputs["x"]})
    g.mark_output("gx", grads["x"])
    out = g.eval({"x": xv, "i": idx})

    xt = torch.tensor(xv, requires_grad=True)
    yt = torch.gather(xt, 0, torch.tensor(idx))
    (yt * torch.tensor(gv)).sum().backward()
    np.testing.assert_allclose(out["gx"], xt.grad.numpy(), rtol=1e-5,
                               atol=1e-6)
