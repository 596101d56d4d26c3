"""Conformance: control flow (If/Scan/Loop), legacy opset attribute
forms, string tensors — cases that need multi-node graphs, so they use
the builder directly rather than the single-node harness."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)
from whisper_tensor_tpu.model import Model


def test_if_nested_in_branches():
    inner_t = OnnxBuilder("it")
    inner_t.node("Mul", ["x", inner_t.const(np.float32(10))], outputs=["iv"])
    inner_t.output("iv", DType.F32, [2])
    inner_e = OnnxBuilder("ie")
    inner_e.node("Mul", ["x", inner_e.const(np.float32(100))], outputs=["iv"])
    inner_e.output("iv", DType.F32, [2])

    then_b = OnnxBuilder("t")
    then_b.node("If", ["c2"], outputs=["ov"],
                then_branch=inner_t.build_graph_proto(WeightStorage.embed()),
                else_branch=inner_e.build_graph_proto(WeightStorage.embed()))
    then_b.output("ov", DType.F32, [2])
    else_b = OnnxBuilder("e")
    else_b.node("Neg", ["x"], outputs=["ov"])
    else_b.output("ov", DType.F32, [2])

    b = OnnxBuilder("nested_if")
    b.input("c1", DType.BOOL, [])
    b.input("c2", DType.BOOL, [])
    b.input("x", DType.F32, [2])
    b.node("If", ["c1"], outputs=["y"],
           then_branch=then_b.build_graph_proto(WeightStorage.embed()),
           else_branch=else_b.build_graph_proto(WeightStorage.embed()))
    b.output("y", DType.F32, [2])
    m = Model.new_from_onnx(b.build())
    x = np.asarray([1.0, 2.0], dtype=np.float32)
    t, f = np.asarray(True), np.asarray(False)
    np.testing.assert_array_equal(m.eval({"c1": t, "c2": t, "x": x})["y"], x * 10)
    np.testing.assert_array_equal(m.eval({"c1": t, "c2": f, "x": x})["y"], x * 100)
    np.testing.assert_array_equal(m.eval({"c1": f, "c2": t, "x": x})["y"], -x)


def test_scan_reverse_direction():
    body = OnnxBuilder("body")
    body.input("acc", DType.F32, [1])
    body.input("el", DType.F32, [1])
    body.node("Add", ["acc", "el"], outputs=["acc_o"])
    body.node("Identity", ["acc_o"], outputs=["sc_o"])
    body.output("acc_o", DType.F32, [1])
    body.output("sc_o", DType.F32, [1])
    b = OnnxBuilder("scan_rev")
    b.input("init", DType.F32, [1])
    b.input("seq", DType.F32, [4, 1])
    b.node("Scan", ["init", "seq"], outputs=["fin", "outs"],
           num_scan_inputs=1, scan_input_directions=[1],
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("fin", DType.F32, [1])
    b.output("outs", DType.F32, [4, 1])
    m = Model.new_from_onnx(b.build())
    seq = np.asarray([[1], [2], [3], [4]], dtype=np.float32)
    out = m.eval({"init": np.zeros(1, np.float32), "seq": seq})
    np.testing.assert_array_equal(out["fin"], [10])
    # reverse: visits 4,3,2,1 -> partials [4,7,9,10]
    np.testing.assert_array_equal(out["outs"][:, 0], [4, 7, 9, 10])


def test_loop_with_condition():
    body = OnnxBuilder("lbody")
    body.input("iter", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("acc", DType.F32, [])
    acc2 = body.node("Add", ["acc", body.const(np.float32(2))], outputs=["acc_o"])
    lim = body.const(np.float32(7))
    body.node("Less", ["acc_o", lim], outputs=["cond_o"])
    body.node("Identity", ["acc_o"], outputs=["scan_o"])
    body.output("cond_o", DType.BOOL, [])
    body.output("acc_o", DType.F32, [])
    body.output("scan_o", DType.F32, [])
    b = OnnxBuilder("loop")
    b.input("m", DType.I64, [])
    b.input("c", DType.BOOL, [])
    b.input("acc0", DType.F32, [])
    b.node("Loop", ["m", "c", "acc0"], outputs=["final", "trace"],
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("final", DType.F32, [])
    b.output("trace", DType.F32, ["n"])
    m = Model.new_from_onnx(b.build())
    out = m.eval({"m": np.asarray(100, dtype=np.int64), "c": np.asarray(True),
                  "acc0": np.asarray(0.0, dtype=np.float32)})
    # 0 -> 2,4,6,8 (cond 8<7 false stops AFTER producing 8)
    assert float(out["final"]) == 8.0
    np.testing.assert_array_equal(out["trace"], [2, 4, 6, 8])


def test_legacy_attr_forms_opset11():
    """Squeeze/Unsqueeze/Slice/Pad/ReduceSum with attributes (pre-13)."""
    b = OnnxBuilder("legacy", opset=11)
    b.input("x", DType.F32, [1, 3, 1, 4])
    s = b.node("Squeeze", ["x"], axes=[0, 2])
    u = b.node("Unsqueeze", [s], axes=[0])
    sl = b.node("Slice", [u], starts=[1], ends=[3], axes=[2])
    r = b.node("ReduceSum", [sl], axes=[2], keepdims=0)
    b.node("Identity", [r], outputs=["y"])
    b.output("y", DType.F32, [1, 3])
    m = Model.new_from_onnx(b.build())
    x = np.arange(12, dtype=np.float32).reshape(1, 3, 1, 4)
    out = m.eval({"x": x})["y"]
    ref = x.squeeze((0, 2))[None][:, :, 1:3].sum(axis=2)
    np.testing.assert_array_equal(out, ref)
    # xla path too
    out2 = m.eval({"x": x}, mode="xla")["y"]
    np.testing.assert_array_equal(np.asarray(out2), ref)


def test_string_tensor_identity_and_cast():
    b = OnnxBuilder("strings")
    b.input("s", DType.STRING, [3])
    y = b.node("Identity", ["s"], outputs=["y"])
    b.output("y", DType.STRING, [3])
    m = Model.new_from_onnx(b.build())
    arr = np.array(["1.5", "2", "-3"], dtype=object)
    out = m.eval({"s": arr})["y"]
    assert list(out) == ["1.5", "2", "-3"]

    b2 = OnnxBuilder("str_cast")
    b2.input("s", DType.STRING, [3])
    from whisper_tensor_tpu.dtype import DTYPE_TO_ONNX

    y = b2.node("Cast", ["s"], to=DTYPE_TO_ONNX[DType.F32])
    b2.node("Identity", [y], outputs=["f"])
    b2.output("f", DType.F32, [3])
    m2 = Model.new_from_onnx(b2.build())
    np.testing.assert_allclose(m2.eval({"s": arr})["f"], [1.5, 2.0, -3.0])


def test_scan_two_states_two_inputs_two_outputs():
    """Scan with 2 state vars, 2 scan inputs, 2 scan outputs (the full
    generality of the reference's ScanOperation: state triples + scan
    slicing, src/symbolic_graph/ops/scan.rs:16)."""
    body = OnnxBuilder("body2")
    body.input("s1", DType.F32, [1])
    body.input("s2", DType.F32, [1])
    body.input("a", DType.F32, [1])
    body.input("b", DType.F32, [1])
    body.node("Add", ["s1", "a"], outputs=["s1_o"])        # running sum of a
    body.node("Mul", ["s2", "b"], outputs=["s2_o"])        # running prod of b
    body.node("Sub", ["a", "b"], outputs=["d_o"])          # scan out 1
    body.node("Add", ["s1_o", "s2_o"], outputs=["t_o"])    # scan out 2
    for n, s in (("s1_o", [1]), ("s2_o", [1]), ("d_o", [1]), ("t_o", [1])):
        body.output(n, DType.F32, s)
    b = OnnxBuilder("scan2")
    b.input("i1", DType.F32, [1])
    b.input("i2", DType.F32, [1])
    b.input("sa", DType.F32, [3, 1])
    b.input("sb", DType.F32, [3, 1])
    b.node("Scan", ["i1", "i2", "sa", "sb"],
           outputs=["f1", "f2", "d", "t"], num_scan_inputs=2,
           body=body.build_graph_proto(WeightStorage.embed()))
    for n, s in (("f1", [1]), ("f2", [1]), ("d", [3, 1]), ("t", [3, 1])):
        b.output(n, DType.F32, s)
    m = Model.new_from_onnx(b.build())
    sa = np.asarray([[1], [2], [3]], np.float32)
    sb = np.asarray([[2], [3], [4]], np.float32)
    out = m.eval({"i1": np.zeros(1, np.float32),
                  "i2": np.ones(1, np.float32), "sa": sa, "sb": sb})
    np.testing.assert_array_equal(out["f1"], [6])    # 1+2+3
    np.testing.assert_array_equal(out["f2"], [24])   # 2*3*4
    np.testing.assert_array_equal(out["d"][:, 0], [-1, -1, -1])
    np.testing.assert_array_equal(out["t"][:, 0], [1 + 2, 3 + 6, 6 + 24])


def test_scan_outer_scope_capture():
    """The Scan body references a tensor from the OUTER graph (the
    reference supports outer-scope capture in nested subgraphs)."""
    b = OnnxBuilder("scan_cap")
    b.input("init", DType.F32, [1])
    b.input("seq", DType.F32, [4, 1])
    b.input("gain", DType.F32, [1])
    body = OnnxBuilder("bodyc")
    body.input("acc", DType.F32, [1])
    body.input("el", DType.F32, [1])
    body.node("Mul", ["el", "gain"], outputs=["g"])  # outer-scope "gain"
    body.node("Add", ["acc", "g"], outputs=["acc_o"])
    body.output("acc_o", DType.F32, [1])
    b.node("Scan", ["init", "seq"], outputs=["fin"], num_scan_inputs=1,
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("fin", DType.F32, [1])
    m = Model.new_from_onnx(b.build())
    out = m.eval({"init": np.zeros(1, np.float32),
                  "seq": np.asarray([[1], [2], [3], [4]], np.float32),
                  "gain": np.asarray([10.0], np.float32)})
    np.testing.assert_array_equal(out["fin"], [100.0])


def test_if_multiple_outputs():
    tb = OnnxBuilder("t")
    tb.node("Identity", ["x"], outputs=["o1"])
    tb.node("Neg", ["x"], outputs=["o2"])
    tb.output("o1", DType.F32, [2])
    tb.output("o2", DType.F32, [2])
    eb = OnnxBuilder("e")
    eb.node("Neg", ["x"], outputs=["o1"])
    eb.node("Identity", ["x"], outputs=["o2"])
    eb.output("o1", DType.F32, [2])
    eb.output("o2", DType.F32, [2])
    b = OnnxBuilder("if2")
    b.input("c", DType.BOOL, [])
    b.input("x", DType.F32, [2])
    b.node("If", ["c"], outputs=["y1", "y2"],
           then_branch=tb.build_graph_proto(WeightStorage.embed()),
           else_branch=eb.build_graph_proto(WeightStorage.embed()))
    b.output("y1", DType.F32, [2])
    b.output("y2", DType.F32, [2])
    m = Model.new_from_onnx(b.build())
    x = np.asarray([1.0, -2.0], np.float32)
    out = m.eval({"c": np.asarray(True), "x": x})
    np.testing.assert_array_equal(out["y1"], x)
    np.testing.assert_array_equal(out["y2"], -x)
    out = m.eval({"c": np.asarray(False), "x": x})
    np.testing.assert_array_equal(out["y1"], -x)
    np.testing.assert_array_equal(out["y2"], x)


def test_loop_trip_count_only_outer_capture():
    """Pure for-loop (cond stays true) whose body captures an
    outer-scope tensor."""
    body = OnnxBuilder("lb")
    body.input("iter", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("acc", DType.F32, [])
    body.node("Add", ["acc", "delta"], outputs=["acc_o"])  # outer capture
    body.node("Identity", ["cond_in"], outputs=["cond_o"])
    body.output("cond_o", DType.BOOL, [])
    body.output("acc_o", DType.F32, [])
    b = OnnxBuilder("loop_tc")
    b.input("m", DType.I64, [])
    b.input("c", DType.BOOL, [])
    b.input("acc0", DType.F32, [])
    b.input("delta", DType.F32, [])
    b.node("Loop", ["m", "c", "acc0"], outputs=["final"],
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("final", DType.F32, [])
    m = Model.new_from_onnx(b.build())
    out = m.eval({"m": np.asarray(5, np.int64), "c": np.asarray(True),
                  "acc0": np.asarray(1.0, np.float32),
                  "delta": np.asarray(0.5, np.float32)})
    assert float(out["final"]) == 3.5


def test_loop_zero_iterations():
    body = OnnxBuilder("lb0")
    body.input("iter", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("acc", DType.F32, [])
    body.node("Add", ["acc", body.const(np.float32(1))], outputs=["acc_o"])
    body.node("Identity", ["cond_in"], outputs=["cond_o"])
    body.output("cond_o", DType.BOOL, [])
    body.output("acc_o", DType.F32, [])
    b = OnnxBuilder("loop0")
    b.input("m", DType.I64, [])
    b.input("c", DType.BOOL, [])
    b.input("acc0", DType.F32, [])
    b.node("Loop", ["m", "c", "acc0"], outputs=["final"],
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("final", DType.F32, [])
    m = Model.new_from_onnx(b.build())
    out = m.eval({"m": np.asarray(0, np.int64), "c": np.asarray(True),
                  "acc0": np.asarray(7.0, np.float32)})
    assert float(out["final"]) == 7.0


def test_string_cast_roundtrip_and_int():
    from whisper_tensor_tpu.dtype import DTYPE_TO_ONNX

    b = OnnxBuilder("str_rt")
    b.input("f", DType.F32, [3])
    s = b.node("Cast", ["f"], to=DTYPE_TO_ONNX[DType.STRING])
    y = b.node("Cast", [s], to=DTYPE_TO_ONNX[DType.F32])
    b.node("Identity", [y], outputs=["out"])
    b.output("out", DType.F32, [3])
    m = Model.new_from_onnx(b.build())
    f = np.asarray([1.5, -2.0, 0.25], np.float32)
    np.testing.assert_allclose(m.eval({"f": f})["out"], f)

    b2 = OnnxBuilder("str_i64")
    b2.input("s", DType.STRING, [3])
    y = b2.node("Cast", ["s"], to=DTYPE_TO_ONNX[DType.I64])
    b2.node("Identity", [y], outputs=["out"])
    b2.output("out", DType.I64, [3])
    m2 = Model.new_from_onnx(b2.build())
    arr = np.array(["12", "-7", "0"], dtype=object)
    np.testing.assert_array_equal(m2.eval({"s": arr})["out"], [12, -7, 0])
