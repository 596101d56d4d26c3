"""End-to-end SymbolicGraph tests: ONNX bytes -> ingest -> eval (oracle
and XLA) vs independent references (torch / numpy).

Mirrors the reference's model-loading + onnx conformance strategy
(tests/onnx_testing.rs) on builder-generated models.
"""

import os

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.onnx_pb import GraphProto


def both_modes(model, feeds, rtol=1e-4, atol=1e-5):
    ref = model.eval(feeds, mode="oracle")
    out = model.eval(feeds, mode="xla")
    for k in ref:
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        if b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(np.float64), b.astype(np.float64),
                                       rtol=rtol, atol=atol, err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)
    return ref


def test_mlp_with_layernorm_softmax():
    import torch

    rng = np.random.default_rng(0)
    D, H, O = 16, 32, 8
    w1 = rng.standard_normal((D, H), dtype=np.float32)
    b1 = rng.standard_normal(H, dtype=np.float32)
    ln_g = rng.standard_normal(H, dtype=np.float32)
    ln_b = rng.standard_normal(H, dtype=np.float32)
    w2 = rng.standard_normal((H, O), dtype=np.float32)

    b = OnnxBuilder("mlp")
    x = b.input("x", DType.F32, ["batch", D])
    h = b.add(b.matmul(x, b.initializer("w1", w1)), b.initializer("b1", b1))
    h = b.node("Tanh", [h])
    h = b.layer_norm(h, b.initializer("ln_g", ln_g), b.initializer("ln_b", ln_b))
    y = b.softmax(b.matmul(h, b.initializer("w2", w2)))
    b.node("Identity", [y], outputs=["probs"])
    b.output("probs", DType.F32, ["batch", O])

    model = Model.new_from_onnx(b.build())
    xv = rng.standard_normal((4, D), dtype=np.float32)
    ref = both_modes(model, {"x": xv})["probs"]

    t = torch.from_numpy
    th = torch.tanh(t(xv) @ t(w1) + t(b1))
    th = torch.nn.functional.layer_norm(th, (H,), t(ln_g), t(ln_b))
    tref = torch.softmax(th @ t(w2), dim=-1).numpy()
    np.testing.assert_allclose(ref, tref, rtol=1e-4, atol=1e-6)


def test_attention_op_vs_torch_sdpa():
    import torch

    rng = np.random.default_rng(1)
    B, Hd, S, D = 2, 4, 16, 8
    q = rng.standard_normal((B, Hd, S, D), dtype=np.float32)
    k = rng.standard_normal((B, Hd, S, D), dtype=np.float32)
    v = rng.standard_normal((B, Hd, S, D), dtype=np.float32)

    b = OnnxBuilder("attn")
    for nm in ("q", "k", "v"):
        b.input(nm, DType.F32, [B, Hd, S, D])
    y = b.attention("q", "k", "v", is_causal=True)
    b.node("Identity", [y], outputs=["out"])
    b.output("out", DType.F32, [B, Hd, S, D])

    model = Model.new_from_onnx(b.build())
    ref = both_modes(model, {"q": q, "k": k, "v": v})["out"]
    tref = torch.nn.functional.scaled_dot_product_attention(
        *(torch.from_numpy(a) for a in (q, k, v)), is_causal=True).numpy()
    np.testing.assert_allclose(ref, tref, rtol=1e-4, atol=1e-5)


def test_rotary_embedding_vs_manual():
    rng = np.random.default_rng(2)
    B, Hd, S, D = 1, 2, 8, 16
    x = rng.standard_normal((B, Hd, S, D), dtype=np.float32)
    inv = 1.0 / (10000 ** (np.arange(0, D, 2) / D))
    pos = np.arange(S)
    ang = np.outer(pos, inv)
    cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    b = OnnxBuilder("rope")
    b.input("x", DType.F32, [B, Hd, S, D])
    y = b.rotary("x", b.initializer("cos", cos), b.initializer("sin", sin))
    b.node("Identity", [y], outputs=["out"])
    b.output("out", DType.F32, [B, Hd, S, D])
    model = Model.new_from_onnx(b.build())
    out = both_modes(model, {"x": x})["out"]

    # manual NeoX-style halves rotation
    x1, x2 = x[..., :D // 2], x[..., D // 2:]
    c, s = cos[None, None], sin[None, None]
    manual = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-6)


def test_if_control_flow():
    b = OnnxBuilder("ifgraph")
    b.input("cond", DType.BOOL, [])
    b.input("x", DType.F32, [4])

    then_b = OnnxBuilder("then")
    t = then_b.node("Mul", ["x", then_b.const(np.asarray(2.0, dtype=np.float32))],
                    outputs=["if_out"])
    then_b.output("if_out", DType.F32, [4])
    else_b = OnnxBuilder("else")
    e = else_b.node("Neg", ["x"], outputs=["if_out"])
    else_b.output("if_out", DType.F32, [4])

    b.node("If", ["cond"], outputs=["y"],
           then_branch=then_b.build_graph_proto(WeightStorage.embed()),
           else_branch=else_b.build_graph_proto(WeightStorage.embed()))
    b.output("y", DType.F32, [4])
    model = Model.new_from_onnx(b.build())
    x = np.arange(4, dtype=np.float32)
    out_t = model.eval({"cond": np.asarray(True), "x": x})["y"]
    out_f = model.eval({"cond": np.asarray(False), "x": x})["y"]
    np.testing.assert_array_equal(out_t, x * 2)
    np.testing.assert_array_equal(out_f, -x)
    # xla mode: control flow falls back to interpreter transparently
    out_x = model.eval({"cond": np.asarray(True), "x": x}, mode="xla")["y"]
    np.testing.assert_array_equal(out_x, x * 2)


def test_scan_running_sum():
    body = OnnxBuilder("body")
    body.input("acc_in", DType.F32, [2])
    body.input("elem", DType.F32, [2])
    s = body.node("Add", ["acc_in", "elem"], outputs=["acc_out"])
    body.node("Identity", ["acc_out"], outputs=["scan_out"])
    body.output("acc_out", DType.F32, [2])
    body.output("scan_out", DType.F32, [2])

    b = OnnxBuilder("scan")
    b.input("init", DType.F32, [2])
    b.input("seq", DType.F32, [5, 2])
    b.node("Scan", ["init", "seq"], outputs=["final", "partials"],
           num_scan_inputs=1, body=body.build_graph_proto(WeightStorage.embed()))
    b.output("final", DType.F32, [2])
    b.output("partials", DType.F32, [5, 2])
    model = Model.new_from_onnx(b.build())
    init = np.zeros(2, dtype=np.float32)
    seq = np.arange(10, dtype=np.float32).reshape(5, 2)
    out = model.eval({"init": init, "seq": seq})
    np.testing.assert_array_equal(out["final"], seq.sum(axis=0))
    np.testing.assert_array_equal(out["partials"], np.cumsum(seq, axis=0))


def test_external_bin_weights(tmp_path):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((600, 600), dtype=np.float32)  # > 1MB
    b = OnnxBuilder("ext")
    x = b.input("x", DType.F32, [2, 600])
    y = b.matmul(x, b.initializer("w", w))
    b.node("Identity", [y], outputs=["out"])
    b.output("out", DType.F32, [2, 600])
    data = b.build(WeightStorage.bin_file(str(tmp_path / "weights.bin")))
    assert len(data) < w.nbytes // 2  # payload is external
    model = Model.new_from_onnx(data, base_dir=str(tmp_path))
    xv = rng.standard_normal((2, 600), dtype=np.float32)
    out = model.eval({"x": xv})["out"]
    np.testing.assert_allclose(out, xv @ w, rtol=1e-5, atol=1e-4)


def test_lstm_vs_torch():
    import torch

    rng = np.random.default_rng(4)
    S, B, I, H = 6, 3, 4, 5
    x = rng.standard_normal((S, B, I), dtype=np.float32)
    W = rng.standard_normal((1, 4 * H, I), dtype=np.float32) * 0.5
    R = rng.standard_normal((1, 4 * H, H), dtype=np.float32) * 0.5
    Bv = rng.standard_normal((1, 8 * H), dtype=np.float32) * 0.1

    b = OnnxBuilder("lstm")
    b.input("x", DType.F32, [S, B, I])
    y, yh, yc = b.node("LSTM", ["x", b.initializer("W", W), b.initializer("R", R),
                                b.initializer("B", Bv)],
                       n_outputs=3, hidden_size=H)
    b.node("Identity", [y], outputs=["Y"])
    b.node("Identity", [yh], outputs=["Yh"])
    b.output("Y", DType.F32, [S, 1, B, H])
    b.output("Yh", DType.F32, [1, B, H])
    model = Model.new_from_onnx(b.build())
    out = both_modes(model, {"x": x})

    # torch LSTM with mapped weights (onnx iofc -> torch ifgo)
    lstm = torch.nn.LSTM(I, H)
    i, o, f, c = np.split(W[0], 4)
    lstm.weight_ih_l0.data = torch.from_numpy(np.concatenate([i, f, c, o]))
    i, o, f, c = np.split(R[0], 4)
    lstm.weight_hh_l0.data = torch.from_numpy(np.concatenate([i, f, c, o]))
    wb, rb = Bv[0][:4 * H], Bv[0][4 * H:]
    i, o, f, c = np.split(wb, 4)
    lstm.bias_ih_l0.data = torch.from_numpy(np.concatenate([i, f, c, o]))
    i, o, f, c = np.split(rb, 4)
    lstm.bias_hh_l0.data = torch.from_numpy(np.concatenate([i, f, c, o]))
    ty, (th, tc) = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(out["Y"][:, 0], ty.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["Yh"], th.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_unsupported_op_reports_cleanly():
    from whisper_tensor_tpu.symbolic_graph import UnsupportedOnnxOp

    b = OnnxBuilder("bad")
    b.input("x", DType.F32, [2])
    b.node("TotallyMadeUpOp", ["x"], outputs=["y"])
    b.output("y", DType.F32, [2])
    with pytest.raises(UnsupportedOnnxOp, match="TotallyMadeUpOp"):
        Model.new_from_onnx(b.build())
