"""Sub-byte GGUF execution: repack bit-parity, fused packed-matmul op,
and the end-to-end packed loader path.

Reference: the QuantMatMul execution path that runs GGUF weights
without dense float materialization (src/packed_tensor.rs:96,
src/symbolic_graph/ops/mod.rs QuantMatMul).
"""

import numpy as np
import pytest

from whisper_tensor_tpu.backends.cpu.dequant import (dequantize_blocks,
                                                     quantize_blocks)
from whisper_tensor_tpu.backends.pallas.packed_matmul import (
    SUPPORTED, dequant_repacked, packed_matmul, repack_packed_tensor)
from whisper_tensor_tpu.packed_format import PackedFormat
from whisper_tensor_tpu.tensor import PackedTensor

rng = np.random.default_rng(0)


@pytest.mark.parametrize("fmt", list(SUPPORTED), ids=lambda f: f.value)
def test_repack_bitwise_matches_cpu_dequant(fmt):
    """The TPU device layout must dequantize to EXACTLY the same floats
    as the CPU oracle (bit parity, arbitrary block bytes)."""
    N, K = 8, 512
    data = rng.integers(0, 256, fmt.storage_bytes(N * K),
                        dtype=np.uint8).tobytes()
    pt = PackedTensor(data, fmt, (N, K))
    ref = dequantize_blocks(pt.data, fmt, N * K).reshape(N, K).T
    rp = repack_packed_tensor(pt)
    assert rp is not None
    got = dequant_repacked(rp)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fmt", [PackedFormat.Q4_0, PackedFormat.Q8_0],
                         ids=lambda f: f.value)
def test_packed_matmul_matches_dense(fmt):
    """packed_matmul (jnp fallback on CPU; Pallas kernel on TPU — same
    math) equals x @ dequant(W).T."""
    N, K = 256, 128
    w = (rng.standard_normal((N, K)) * 0.1).astype(np.float32)
    pt = PackedTensor(quantize_blocks(w, fmt), fmt, (N, K))
    wd = dequantize_blocks(pt.data, fmt, N * K).reshape(N, K).T
    rp = repack_packed_tensor(pt)
    x = rng.standard_normal((5, K)).astype(np.float32)
    out = np.asarray(packed_matmul(x, rp["q"], rp["scales"],
                                   rp["offsets"], int(rp["bits"])))
    np.testing.assert_allclose(out, x @ wd, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("fmt", [PackedFormat.Q5_0, PackedFormat.Q5_1,
                                 PackedFormat.Q2_K, PackedFormat.Q3_K,
                                 PackedFormat.Q5_K, PackedFormat.Q6_K],
                         ids=lambda f: f.value)
def test_packed_matmul_extended_formats(fmt):
    """The 8-bit-with-offset (Q5/Q6) and 16-group nibble (Q2_K/Q3_K)
    repacks must execute through packed_matmul exactly like the dense
    matmul over the CPU-oracle dequantization (random block bytes —
    quantize_blocks has no writer for these formats)."""
    N, K = 256, 512
    raw = rng.integers(0, 256, (N * K // fmt.block_size, fmt.block_bytes),
                       dtype=np.uint8)
    # splice FINITE f16 super-block scales over the random bytes (a
    # random f16 field is inf/nan ~6% of the time); quant ints and
    # 6-bit sub-scales stay fully random
    scale_at = {PackedFormat.Q5_0: (0,), PackedFormat.Q5_1: (0, 2),
                PackedFormat.Q2_K: (80, 82), PackedFormat.Q3_K: (108,),
                PackedFormat.Q5_K: (0, 2), PackedFormat.Q6_K: (208,)}[fmt]
    for off in scale_at:
        d = (rng.uniform(0.01, 0.1, (raw.shape[0], 1))
             .astype(np.float16).view(np.uint8))
        raw[:, off:off + 2] = d
    pt = PackedTensor(raw.tobytes(), fmt, (N, K))
    wd = dequantize_blocks(pt.data, fmt, N * K).reshape(N, K).T
    assert np.isfinite(wd).all()
    rp = repack_packed_tensor(pt)
    assert rp is not None
    x = rng.standard_normal((5, K)).astype(np.float32)
    out = np.asarray(packed_matmul(x, rp["q"], rp["scales"],
                                   rp["offsets"], int(rp["bits"]),
                                   bool(rp["has_off"])))
    scale = max(1.0, np.abs(x @ wd).max())
    np.testing.assert_allclose(out / scale, (x @ wd) / scale,
                               rtol=2e-5, atol=2e-5)


def test_quantize_blocks_roundtrip_error_bounded():
    x = rng.standard_normal(2048).astype(np.float32)
    for fmt, bound in ((PackedFormat.Q4_0, 0.12), (PackedFormat.Q8_0, 0.01)):
        deq = dequantize_blocks(quantize_blocks(x, fmt), fmt, x.size)
        assert np.abs(deq - x).max() / np.abs(x).max() < bound


def _write_tiny_gguf(tmp_path, fmt):
    from whisper_tensor_tpu.importers.gguf import write_gguf

    if fmt.block_size == 256:      # K-quants need K % 256 == 0 weights
        E, Hq, Hkv, D, I, V, L = 256, 2, 1, 128, 256, 96, 2
    else:
        E, Hq, Hkv, D, I, V, L = 64, 2, 1, 32, 128, 96, 2
    r = np.random.default_rng(1)

    def q(shape):
        w = (r.standard_normal(shape) * 0.05).astype(np.float32)
        return PackedTensor(quantize_blocks(w, fmt), fmt, shape)

    tensors = {
        "token_embd.weight": (r.standard_normal((V, E)) * 0.05
                              ).astype(np.float32),
        "output_norm.weight": np.ones(E, np.float32),
        "output.weight": q((V, E)),
    }
    for i in range(L):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = np.ones(E, np.float32)
        tensors[p + "attn_q.weight"] = q((Hq * D, E))
        tensors[p + "attn_k.weight"] = q((Hkv * D, E))
        tensors[p + "attn_v.weight"] = q((Hkv * D, E))
        tensors[p + "attn_output.weight"] = q((E, Hq * D))
        tensors[p + "ffn_norm.weight"] = np.ones(E, np.float32)
        tensors[p + "ffn_gate.weight"] = q((I, E))
        tensors[p + "ffn_up.weight"] = q((I, E))
        tensors[p + "ffn_down.weight"] = q((E, I))
    meta = {"general.architecture": "llama", "general.name": "tinyq",
            "llama.block_count": L, "llama.embedding_length": E,
            "llama.attention.head_count": Hq,
            "llama.attention.head_count_kv": Hkv,
            "llama.feed_forward_length": I, "llama.context_length": 64,
            "llama.vocab_size": V,
            "llama.attention.layer_norm_rms_epsilon": 1e-5,
            "llama.rope.freq_base": 10000.0}
    path = str(tmp_path / f"tiny_{fmt.value}.gguf")
    write_gguf(path, meta, tensors)
    return path


@pytest.mark.parametrize("fmt", [PackedFormat.Q4_0, PackedFormat.Q8_0,
                                 PackedFormat.Q4_K, PackedFormat.Q6_K],
                         ids=lambda f: f.value)
def test_gguf_packed_path_end_to_end(tmp_path, fmt):
    """GgufLoader(packed_weights=True): weights stay packed in the
    store, MatMuls become PackedMatMul, and generation matches the
    dense (host-dequantized) load of the SAME file."""
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface

    path = _write_tiny_gguf(tmp_path, fmt)
    gl = loader_registry()["gguf"]

    bundle_p = gl.load({"path": path, "max_len": 64,
                        "dtype": "f32"})
    (_, model_p), = bundle_p.models.items()
    assert model_p.graph.store.packed_sources, "no packed sources recorded"
    iface_p = TextInferenceInterface(model_p, max_len=64,
                                     prompt_buckets=(16,),
                                     cache_dtype=DType.F32,
                                     weight_dtype=DType.F32)
    assert iface_p._packed, "fused packed path not engaged"
    assert any(n.op.KIND == "PackedMatMul" for n in iface_p.milli.nodes)

    bundle_d = gl.load({"path": path, "max_len": 64, "dtype": "f32",
                        "packed_weights": False})
    (_, model_d), = bundle_d.models.items()
    iface_d = TextInferenceInterface(model_d, max_len=64,
                                     prompt_buckets=(16,),
                                     cache_dtype=DType.F32,
                                     weight_dtype=DType.F32)

    prompt = np.asarray([[1, 2, 3, 4]], dtype=np.int64)
    lp = iface_p.logits(prompt)
    ld = iface_d.logits(prompt)
    np.testing.assert_allclose(lp, ld, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(iface_p.generate_tokens(prompt, 8),
                                  iface_d.generate_tokens(prompt, 8))


def test_gguf_packed_store_stays_packed(tmp_path):
    """The store never materializes dense copies of packed weights
    unless a fallback asks for them (HBM/RAM budget property)."""
    from whisper_tensor_tpu.importers.loaders import loader_registry

    path = _write_tiny_gguf(tmp_path, PackedFormat.Q4_0)
    bundle = loader_registry()["gguf"].load({"path": path, "max_len": 64})
    (_, model), = bundle.models.items()
    # lazy entries: nothing dense cached yet for the matmul weights
    for name in model.graph.store.packed_sources:
        assert name not in model.graph.store._cache


def test_host_quantize_q4_0_any_checkpoint():
    """quantize="q4_0" host-quantizes a DENSE (non-GGUF) model's 2-D
    MatMul weights into Q4_0 blocks and runs the fused packed kernel;
    logits must match a referee running the plain graph with the same
    quantize->dequantize-degraded weights, and ineligible weights
    (K % 64 != 0, 1-D) must stay dense."""
    from whisper_tensor_tpu.backends.cpu.dequant import quantize_blocks
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.tensor import as_tensor

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=64, vocab_size=160,
                     n_positions=64)
    data = build_gpt2_step(random_gpt2_weights(cfg, seed=2), cfg,
                           max_len=64, dtype=DType.F32)
    m = Model.new_from_onnx(data)
    iface = TextInferenceInterface(m, max_len=64, prompt_buckets=(16,),
                                   quantize="q4_0")
    assert iface._packed, "no weight took the packed path"

    m2 = Model.new_from_onnx(data)
    for n in iface._packed:
        w = m2.graph.store.get_numeric(n, DType.F32).numpy()
        pt = PackedTensor(
            quantize_blocks(np.ascontiguousarray(w.T), PackedFormat.Q4_0),
            PackedFormat.Q4_0, (w.shape[1], w.shape[0]))
        deg = pt.dequantize(DType.F32).numpy().T     # back to (K, N)
        m2.graph.store.put(n, as_tensor(np.ascontiguousarray(deg)))
    ref = TextInferenceInterface(m2, max_len=64, prompt_buckets=(16,))

    rng = np.random.default_rng(4)
    p = rng.integers(0, cfg.vocab_size, (1, 7)).astype(np.int64)
    np.testing.assert_allclose(iface.logits(p), ref.logits(p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(iface.generate_tokens(p, 8),
                                  ref.generate_tokens(p, 8))
    # degradation is real but bounded: still correlated with f32
    f32 = TextInferenceInterface(Model.new_from_onnx(data), max_len=64,
                                 prompt_buckets=(16,))
    a = np.asarray(iface.logits(p), np.float64).ravel()
    b = np.asarray(f32.logits(p), np.float64).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos


def test_host_quantize_with_windowed_decode():
    """quantize="q4_0" composes with window_models: the window graphs
    pack from the same memoized quantized sources, and windowed output
    equals the plain q4_0 generation exactly."""
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.onnx_builder import WeightStorage
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=64, vocab_size=128,
                     n_positions=64)
    wg = random_gpt2_weights(cfg, seed=5)
    m64 = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64,
                                              dtype=DType.F32))
    m32 = Model.new_from_onnx(build_gpt2_step(
        wg, cfg, max_len=32, dtype=DType.F32,
        storage=WeightStorage.none()))
    m32.graph.store = m64.graph.store

    plain = TextInferenceInterface(m64, max_len=64, prompt_buckets=(8,),
                                   quantize="q4_0")
    windowed = TextInferenceInterface(m64, max_len=64, prompt_buckets=(8,),
                                      quantize="q4_0",
                                      window_models={32: m32})
    assert plain._packed and windowed._packed
    rng = np.random.default_rng(6)
    p = rng.integers(0, 128, (2, 5)).astype(np.int64)
    np.testing.assert_array_equal(plain.generate_tokens(p, 30),
                                  windowed.generate_tokens(p, 30))
