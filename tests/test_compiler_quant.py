"""Compiler facade + int8 quantization pass tests."""

import numpy as np
import pytest

from whisper_tensor_tpu.compiler import (CompilationSubject, CompiledProgram,
                                         build_program, interpret_milli_graph,
                                         op_census)
from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.ops import MatMul, SimpleUnary


def test_build_program_xla_and_fallback():
    g = MilliGraph("p")
    x, w = g.add_input("x"), g.add_input("w")
    g.mark_output("y", g.op1(SimpleUnary("tanh"), g.op1(MatMul(), x, w)))
    prog = build_program(CompilationSubject(milli=g))
    feeds = {"x": np.random.default_rng(0).standard_normal((2, 4)).astype(np.float32),
             "w": np.random.default_rng(1).standard_normal((4, 3)).astype(np.float32)}
    out = prog.run(feeds)
    assert prog.backend == "xla"
    np.testing.assert_allclose(out["y"], np.tanh(feeds["x"] @ feeds["w"]),
                               rtol=1e-5, atol=1e-6)
    assert op_census(g) == {"MatMul": 1, "SimpleUnary": 1}
    ref = interpret_milli_graph(g, feeds)
    np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-5, atol=1e-6)


def test_build_program_interpreter_fallback():
    from whisper_tensor_tpu.milli.ops import NonZero

    g = MilliGraph("nz")
    x = g.add_input("x")
    g.mark_output("idx", g.op1(NonZero(), x))
    prog = build_program(CompilationSubject(milli=g))
    out = prog.run({"x": np.asarray([0.0, 3.0, 0.0, 1.0], dtype=np.float32)})
    assert prog.backend == "failed-xla"
    np.testing.assert_array_equal(out["idx"], [[1, 3]])


def test_program_with_model_weight_feeder():
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.model import Model

    rng = np.random.default_rng(0)
    w = rng.standard_normal((2048, 4)).astype(np.float32)  # big enough to stay a weight
    b = OnnxBuilder("m")
    b.input("x", DType.F32, [3, 2048])
    y = b.matmul("x", b.initializer("w", w))
    b.node("Identity", [y], outputs=["y"])
    b.output("y", DType.F32, [3, 4])
    model = Model.new_from_onnx(b.build())
    prog = build_program(CompilationSubject(model=model))
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    out = prog.run({"x": x})
    np.testing.assert_allclose(out["y"], x @ w, rtol=1e-4, atol=1e-4)


class TestInt8Quant:
    def test_quantize_int8_reconstruction(self):
        from whisper_tensor_tpu.backends.pallas.quant_matmul import quantize_int8

        rng = np.random.default_rng(0)
        w = rng.standard_normal((128, 256)).astype(np.float32)
        q, s = quantize_int8(w)
        assert q.dtype == np.int8 and s.shape == (256,)
        recon = q.astype(np.float32) * s[None, :]
        assert np.abs(recon - w).max() / np.abs(w).max() < 0.005

    def test_quant_matmul_op_accuracy(self):
        from whisper_tensor_tpu.backends.pallas.quant_matmul import quantize_int8
        from whisper_tensor_tpu.milli.transforms import QuantMatMulMilli

        rng = np.random.default_rng(1)
        w = rng.standard_normal((128, 256)).astype(np.float32)
        x = rng.standard_normal((4, 128)).astype(np.float32)
        q, s = quantize_int8(w)
        out = QuantMatMulMilli().eval([x, q, s])[0]
        exact = x @ w
        assert np.abs(out - exact).max() / np.abs(exact).max() < 0.02

    def test_interface_int8_logits_close(self):
        from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
            GPT2Config, build_gpt2_step, random_gpt2_weights)
        from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
        from whisper_tensor_tpu.model import Model

        cfg = GPT2Config(n_layer=2, n_head=2, n_embd=128, vocab_size=512,
                         n_positions=64)
        data = build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=64)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, 512, (1, 8)).astype(np.int64)
        base = TextInferenceInterface(Model.new_from_onnx(data), max_len=64,
                                      prompt_buckets=(16,)).logits(prompt)
        qi = TextInferenceInterface(Model.new_from_onnx(data), max_len=64,
                                    prompt_buckets=(16,), quantize="int8")
        assert len(qi._quantized) >= 5  # qkv/proj/fc/mproj/lm_head matmuls
        ql = qi.logits(prompt)
        rel = np.abs(base - ql).max() / np.abs(base).max()
        assert rel < 0.03, rel


def test_select_tiles():
    import os

    from whisper_tensor_tpu.backends.pallas.quant_matmul import (
        TILE_N, select_tiles)

    # decode: tiny M kept whole; prefill: M capped for VMEM
    assert select_tiles(32, 14336) == (32, TILE_N)
    assert select_tiles(512, 4096) == (256, TILE_N)
    assert select_tiles(96, 512) == (96, TILE_N)
    # env override honored only when it divides N
    os.environ["WT_QMM_TN"] = "512"
    try:
        assert select_tiles(32, 14336) == (32, 512)
        assert select_tiles(32, 14336 + 256) == (32, TILE_N)
    finally:
        del os.environ["WT_QMM_TN"]


def test_int8_with_windowed_decode_token_exact():
    """quantize="int8" composes with window_models (VERDICT r4 item 1:
    window-sized admission at 8B serving needs int8 window graphs): the
    window step graphs get the SAME QuantMatMul surgery reusing the
    main graph's precomputed (w_i8, scale) arrays, and windowed
    generation equals plain int8 generation token-exactly."""
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.onnx_builder import WeightStorage
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=128, vocab_size=512,
                     n_positions=64)
    wg = random_gpt2_weights(cfg, seed=3)
    m64 = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64,
                                              dtype=DType.F32))
    m32 = Model.new_from_onnx(build_gpt2_step(
        wg, cfg, max_len=32, dtype=DType.F32,
        storage=WeightStorage.none()))
    m32.graph.store = m64.graph.store

    plain = TextInferenceInterface(m64, max_len=64, prompt_buckets=(8,),
                                   quantize="int8")
    windowed = TextInferenceInterface(m64, max_len=64, prompt_buckets=(8,),
                                      quantize="int8",
                                      window_models={32: m32})
    assert plain._quantized and windowed._quantized
    assert windowed.weight_names == plain.weight_names
    rng = np.random.default_rng(7)
    p = rng.integers(0, 512, (2, 5)).astype(np.int64)
    np.testing.assert_array_equal(plain.generate_tokens(p, 30),
                                  windowed.generate_tokens(p, 30))


def test_int8_precomputed_shared_across_interfaces():
    """quantize_precomputed: a SIBLING interface (same recipe, another
    max_len — the long-context S-sweep case) reuses the first
    interface's int8 arrays instead of re-quantizing/re-uploading;
    after the first interface's _weights() ran, the shared dict holds
    the DEVICE buffers (upload paid once). Logits must match the
    fresh-quantized build exactly (same int8 values, same scales)."""
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=128, vocab_size=512,
                     n_positions=64)
    wg = random_gpt2_weights(cfg, seed=3)
    m64 = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64,
                                              dtype=DType.F32))
    m48 = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=48,
                                              dtype=DType.F32))
    first = TextInferenceInterface(m64, max_len=64, prompt_buckets=(8,),
                                   quantize="int8")
    rng = np.random.default_rng(7)
    p = rng.integers(0, 512, (2, 5)).astype(np.int64)
    l_first = first.logits(p)
    # _weights() ran inside logits(): the writeback leaves device
    # arrays in the shared dict
    assert any(hasattr(w, "devices") for w, _ in first._quantized.values())
    shared = TextInferenceInterface(m48, max_len=48, prompt_buckets=(8,),
                                    quantize="int8",
                                    quantize_precomputed=first._quantized)
    fresh = TextInferenceInterface(m48, max_len=48, prompt_buckets=(8,),
                                   quantize="int8")
    np.testing.assert_allclose(shared.logits(p), fresh.logits(p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(shared.logits(p), l_first,
                               rtol=1e-4, atol=1e-4)
