"""XLA backend parity tests: jit-compiled milli graphs vs the CPU oracle.

This is the TPU analog of the reference's Vulkan-vs-NDArray comparisons
(src/backends/vulkan_backend/ops/unary.rs:1126-1235): every graph runs
through both the oracle interpreter and compile_milli, outputs must match.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.ops import (Cast, Concat, Constant, Gather,
                                          GatherShape, MatMul, Reduce,
                                          Reshape, Shape, SimpleBinary,
                                          SimpleUnary, Slice, Transpose,
                                          Where)
from whisper_tensor_tpu.backends.xla.compiler import (GraphNotJittable,
                                                      compile_milli)


def xla_vs_oracle(g, feeds, static=None, rtol=1e-5, atol=1e-6):
    ref = g.eval(feeds)
    comp = compile_milli(g, feeds, static_inputs=static, use_cache=False)
    out = comp(feeds)
    assert set(out) >= set(ref)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(out[k], dtype=np.float64) if v.dtype.kind == "f" else np.asarray(out[k]),
                                   v.astype(np.float64) if v.dtype.kind == "f" else v,
                                   rtol=rtol, atol=atol, err_msg=k)
    return out


def test_mlp_graph():
    g = MilliGraph()
    x = g.add_input("x")
    w1, w2 = g.add_input("w1"), g.add_input("w2")
    h = g.op1(SimpleUnary("tanh"), g.op1(MatMul(), x, w1))
    y = g.op1(MatMul(), h, w2)
    g.mark_output("y", y)
    feeds = {"x": np.random.randn(4, 8).astype(np.float32),
             "w1": np.random.randn(8, 16).astype(np.float32),
             "w2": np.random.randn(16, 2).astype(np.float32)}
    xla_vs_oracle(g, feeds)


def test_shape_math_folds_to_static():
    """Shape->Gather->Concat->Reshape chains must fold at trace time."""
    g = MilliGraph()
    x = g.add_input("x")
    shp = g.op1(Shape(), x)
    d0 = g.op1(GatherShape(0), shp)
    neg1 = g.op1(Constant(np.asarray([-1], dtype=np.int64)))
    tgt = g.op1(Concat(axis=0), d0, neg1)
    g.mark_output("y", g.op1(Reshape(), x, tgt))
    feeds = {"x": np.random.randn(3, 4, 5).astype(np.float32)}
    out = xla_vs_oracle(g, feeds)
    assert np.asarray(out["y"]).shape == (3, 20)


def test_mixed_dtypes_and_compare():
    g = MilliGraph()
    a, b = g.add_input("a"), g.add_input("b")
    m = g.op1(SimpleBinary("lt"), a, b)
    y = g.op1(Where(), m, a, b)
    g.mark_output("y", y)
    g.mark_output("mask", g.op1(Cast(DType.I32), m))
    feeds = {"a": np.random.randn(5).astype(np.float32),
             "b": np.random.randn(5).astype(np.float32)}
    xla_vs_oracle(g, feeds)


def test_bf16_matmul_parity():
    import ml_dtypes

    g = MilliGraph()
    x, w = g.add_input("x"), g.add_input("w")
    g.mark_output("y", g.op1(MatMul(), x, w))
    feeds = {"x": np.random.randn(8, 16).astype(ml_dtypes.bfloat16),
             "w": np.random.randn(16, 8).astype(ml_dtypes.bfloat16)}
    ref = g.eval(feeds)["y"]
    comp = compile_milli(g, feeds, use_cache=False)
    out = np.asarray(comp(feeds)["y"])
    # bf16 x bf16 -> f32 accumulate is exact on both paths
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_callback_fallback_for_op_without_jax_rule():
    from whisper_tensor_tpu.milli.ops.conv import ConvWeightGrad

    g = MilliGraph()
    ws, x, gr = g.add_input("ws"), g.add_input("x"), g.add_input("g")
    g.mark_output("dw", g.op1(ConvWeightGrad(strides=[1, 1]), ws, x, gr))
    feeds = {"ws": np.asarray([2, 3, 3, 3], dtype=np.int64),
             "x": np.random.randn(1, 3, 8, 8).astype(np.float32),
             "g": np.random.randn(1, 2, 6, 6).astype(np.float32)}
    xla_vs_oracle(g, feeds, static={"ws": feeds["ws"]}, rtol=1e-4, atol=1e-5)


def test_data_dependent_shape_raises_not_jittable():
    from whisper_tensor_tpu.milli.ops import NonZero

    g = MilliGraph()
    x = g.add_input("x")
    nz = g.op1(NonZero(), x)
    g.mark_output("idx", nz)
    feeds = {"x": np.asarray([0.0, 1.0, 0.0, 2.0], dtype=np.float32)}
    with pytest.raises(GraphNotJittable):
        compile_milli(g, feeds, use_cache=False)
    # oracle still handles it
    out = g.eval(feeds)["idx"]
    np.testing.assert_array_equal(out, [[1, 3]])


def test_intermediate_capture_taps():
    g = MilliGraph()
    x = g.add_input("x")
    h = g.add_op(SimpleUnary("exp"), [x], labels=["hidden_exp"])[0]
    g.mark_output("y", g.op1(Reduce("sum", axes=[0], keepdims=False), h))
    feeds = {"x": np.random.randn(6).astype(np.float32)}
    comp = compile_milli(g, feeds, capture_labels=["hidden_exp"], use_cache=False)
    out = comp(feeds)
    np.testing.assert_allclose(np.asarray(out["hidden_exp"]), np.exp(feeds["x"]), rtol=1e-6)


def test_segmented_fallback_mixes_xla_and_oracle():
    """A graph with a data-dependent-shape op in the middle runs via the
    segmented plan (reference v9 hybrid ExecutionPlan): heavy ops jitted,
    the dynamic island on the oracle, results exact."""
    from whisper_tensor_tpu.backends.xla.segmented import SegmentedPlan
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.milli.ops import (Cast, GatherShape, NonZero,
                                              Shape)

    g = MilliGraph("mixed")
    x, w = g.add_input("x"), g.add_input("w")
    h = g.op1(SimpleUnary("relu"), g.op1(MatMul(), x, w))
    nz = g.op1(NonZero(), h)
    cnt = g.op1(GatherShape(1), g.op1(Shape(), nz))
    cntf = g.op1(Cast(DType.F32), cnt)
    g.mark_output("scaled", g.op1(SimpleBinary("mul"), h, cntf))
    feeds = {"x": np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32),
             "w": np.random.default_rng(1).standard_normal((4, 5)).astype(np.float32)}
    ref = g.eval(feeds)
    plan = SegmentedPlan.build(g, feeds)
    kinds = [k for k, _ in plan.segments]
    assert "xla" in kinds and "oracle" in kinds
    out = plan.run(feeds)
    np.testing.assert_allclose(out["scaled"], ref["scaled"], rtol=1e-6)


def test_eval_backend_segmented_route():
    """EvalBackend xla mode must transparently produce results for graphs
    the whole-graph compiler rejects."""
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model

    b = OnnxBuilder("seg")
    b.input("x", DT.F32, [6])
    nz = b.node("NonZero", ["x"])
    shp = b.node("Shape", [nz])
    cnt = b.node("Gather", [shp, b.const(np.asarray(1, dtype=np.int64))], axis=0)
    cntf = b.node("Cast", [cnt], to=1)
    y = b.node("Mul", ["x", cntf], outputs=["y"])
    b.output("y", DT.F32, [6])
    m = Model.new_from_onnx(b.build())
    x = np.asarray([0, 1, 0, 2, 3, 0], dtype=np.float32)
    ref = m.eval({"x": x}, mode="oracle")["y"]
    out = m.eval({"x": x}, mode="xla")["y"]
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_callback_guard_on_non_cpu_platform(monkeypatch):
    """On platforms without pure_callback (the axon TPU plugin), a
    callback-needing op must fail at COMPILE time with GraphNotJittable
    so EvalBackend's segmented plan takes over — never at runtime on
    hardware (reference contract: per-op fallback never fails at
    runtime, src/numeric_tensor.rs:844-880)."""
    import os

    from whisper_tensor_tpu.backends.xla import compiler as xc
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model

    monkeypatch.delenv("WT_TPU_CALLBACK", raising=False)
    monkeypatch.setattr(xc, "_callbacks_supported", lambda: False)

    # 1) whole-graph compile refuses eagerly (simulate an op with no jax
    #    rule so the guard stays exercised as op coverage grows)
    def _no_jax(self, inputs, static=None):
        raise NotImplementedError("simulated coverage gap")

    monkeypatch.setattr(SimpleUnary, "to_jax", _no_jax)
    g = MilliGraph()
    x = g.add_input("x")
    g.mark_output("y", g.op1(SimpleUnary("exp"), x))
    feeds = {"x": np.random.randn(3, 4).astype(np.float32)}
    with pytest.raises(GraphNotJittable):
        compile_milli(g, feeds, use_cache=False)
    monkeypatch.undo()
    monkeypatch.setattr(xc, "_callbacks_supported", lambda: False)

    # 2) EvalBackend xla mode transparently succeeds via the segmented plan
    b = OnnxBuilder("cbguard")
    b.input("x", DT.F32, [4, 6])
    h = b.node("Relu", ["x"])
    nz = b.node("NonZero", [h])
    shp = b.node("Shape", [nz])
    cnt = b.node("Gather", [shp, b.const(np.asarray(1, dtype=np.int64))], axis=0)
    cntf = b.node("Cast", [cnt], to=1)
    b.node("Mul", [h, cntf], outputs=["y"])
    b.output("y", DT.F32, [4, 6])
    m = Model.new_from_onnx(b.build())
    xin = np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32)
    ref = m.eval({"x": xin}, mode="oracle")["y"]
    out = m.eval({"x": xin}, mode="xla")["y"]
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.skipif(not __import__("os").environ.get("WT_TPU_TESTS"),
                    reason="real-chip test (WT_TPU_TESTS=1)")
def test_tpu_callback_graph_runs_segmented():
    """On the real chip a callback-needing graph must route through the
    segmented plan (pure_callback is unsupported on axon)."""
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model

    b = OnnxBuilder("tpuseg")
    b.input("x", DT.F32, [8])
    nz = b.node("NonZero", ["x"])
    shp = b.node("Shape", [nz])
    cnt = b.node("Gather", [shp, b.const(np.asarray(1, dtype=np.int64))], axis=0)
    cntf = b.node("Cast", [cnt], to=1)
    b.node("Mul", ["x", cntf], outputs=["y"])
    b.output("y", DT.F32, [8])
    m = Model.new_from_onnx(b.build())
    xin = np.asarray([0, 1, 0, 2, 3, 0, 4, 0], dtype=np.float32)
    ref = m.eval({"x": xin}, mode="oracle")["y"]
    out = m.eval({"x": xin}, mode="xla")["y"]
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_xla_capture_taps_reach_observer():
    """Intermediate tensors subscribed by name stream through the
    observer even in compiled (XLA) mode — VERDICT r1 #8; reference
    streams per-tensor reports regardless of backend
    (crates/whisper-tensor-server/src/scheduler.rs:215-392)."""
    from whisper_tensor_tpu.backends.eval_backend import (EvalBackend,
                                                          SymbolicObserver)
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model

    b = OnnxBuilder("taps")
    b.input("x", DT.F32, [3, 4])
    h = b.node("Relu", ["x"], outputs=["hidden_relu"])
    b.node("Mul", [h, b.const(np.asarray(2.0, np.float32))], outputs=["y"])
    b.output("y", DT.F32, [3, 4])
    m = Model.new_from_onnx(b.build())

    seen = {}

    class Obs(SymbolicObserver):
        def on_tensor_assigned(self, graph, name, value):
            seen[name] = np.asarray(value)

    x = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
    be = EvalBackend("xla", observer=Obs(), capture={"hidden_relu"})
    out = be.run(m.graph, {"x": x})
    np.testing.assert_allclose(out["y"], np.maximum(x, 0) * 2, rtol=1e-6)
    assert "hidden_relu" in seen
    np.testing.assert_allclose(seen["hidden_relu"], np.maximum(x, 0),
                               rtol=1e-6)
    # captures must NOT leak into the output dict
    assert set(out) == {"y"}


def test_supergraph_capture_through_context():
    """ExecutionContext(capture_labels=...) streams model-internal
    tensors to the Super observer in xla mode."""
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.super_graph import LinkKind, SuperGraph
    from whisper_tensor_tpu.super_graph.graph import (ExecutionContext,
                                                      SuperObserver)
    from whisper_tensor_tpu.super_graph.nodes import ModelExecutionNode

    b = OnnxBuilder("m")
    b.input("x", DT.F32, [4])
    h = b.node("Exp", ["x"], outputs=["exp_out"])
    b.node("Neg", [h], outputs=["y"])
    b.output("y", DT.F32, [4])
    model = Model.new_from_onnx(b.build(), name="m")

    g = SuperGraph("job")
    in_l = g.mark_input("tensors", g.link(LinkKind.TENSOR_MAP))
    out_l = g.link(LinkKind.TENSOR_MAP, "model_out")
    g.add(ModelExecutionNode(inputs={"tensors": in_l},
                             outputs={"tensors": out_l}, model_ref="m"))
    g.mark_output("tensors", out_l)

    seen = {}

    class Obs(SuperObserver):
        def on_tensor_assigned(self, name, value):
            seen[name] = value

    x = np.asarray([0.5, -1.0, 2.0, 0.0], np.float32)
    ctx = ExecutionContext(models={"m": model}, backend_mode="xla",
                           observer=Obs(), capture_labels={"exp_out"})
    out = g.run(ctx, {"tensors": {"x": x}})
    np.testing.assert_allclose(np.asarray(out["tensors"]["y"]), -np.exp(x),
                               rtol=1e-6)
    assert "exp_out" in seen
    np.testing.assert_allclose(np.asarray(seen["exp_out"]), np.exp(x),
                               rtol=1e-6)


def test_profiler_trace_writes_files(tmp_path):
    import jax

    d = str(tmp_path / "trace")
    jax.profiler.start_trace(d)
    jax.jit(lambda v: v * 2)(np.ones(8, np.float32)).block_until_ready()
    jax.profiler.stop_trace()
    import os as _os

    found = []
    for root, _dirs, files in _os.walk(d):
        found += files
    assert found, "profiler trace produced no files"
