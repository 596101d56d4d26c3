"""GPTQ / AWQ quantized-checkpoint loading (importers/quantized.py).

No GPTQ/AWQ library exists in this image, so the tests pin the
documented checkpoint conventions via our own packers (pack->unpack
bit-identity), then prove the full loader path: a GPTQ/AWQ-format tiny
llama checkpoint loads, runs, and matches a dense model built from the
SAME dequantized weights exactly (f32), on both the dense and the
fused-packed execution paths."""

import json

import numpy as np
import pytest

from whisper_tensor_tpu.importers.quantized import (
    QuantSpec, QuantizedStore, dequant_dense, pack_awq, pack_gptq,
    repack_for_kernel, unpack_awq, unpack_gptq)

K, N, G = 256, 128, 64


def _random_quant(rng, k=K, n=N, g=G):
    q = rng.integers(0, 16, (k, n)).astype(np.uint8)
    zeros = rng.integers(0, 16, (k // g, n)).astype(np.float32)
    scales = (rng.random((k // g, n), dtype=np.float32) * 0.1 + 0.01)
    return q, zeros, scales


class TestPackUnpack:
    @pytest.mark.parametrize("v2", [False, True])
    def test_gptq_roundtrip(self, v2):
        rng = np.random.default_rng(0)
        q, zeros, scales = _random_quant(rng)
        # classic gptq stores zero-1: zero=0 would wrap; keep zeros >= 1
        if not v2:
            zeros = np.clip(zeros, 1, 15)
        spec = QuantSpec("gptq", 4, G, v2=v2)
        qw, qz, sc = pack_gptq(q, zeros, scales, spec)
        assert qw.dtype == np.int32 and qw.shape == (K // 8, N)
        assert qz.shape == (K // G, N // 8)
        q2, z2, s2 = unpack_gptq(qw, qz, np.asarray(sc, np.float32), spec)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, zeros)
        np.testing.assert_allclose(s2, scales.astype(np.float16), rtol=0)

    def test_awq_roundtrip(self):
        rng = np.random.default_rng(1)
        q, zeros, scales = _random_quant(rng)
        spec = QuantSpec("awq", 4, G)
        qw, qz, sc = pack_awq(q, zeros, scales, spec)
        assert qw.shape == (K, N // 8) and qz.shape == (K // G, N // 8)
        q2, z2, s2 = unpack_awq(qw, qz, np.asarray(sc, np.float32), spec)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, zeros)

    def test_dequant_matches_formula(self):
        rng = np.random.default_rng(2)
        q, zeros, scales = _random_quant(rng)
        w = dequant_dense(q, zeros, scales)
        ref = (q.astype(np.float32)
               - np.repeat(zeros, G, axis=0)) * np.repeat(scales, G, axis=0)
        np.testing.assert_array_equal(w, ref)

    def test_dequant_act_order(self):
        rng = np.random.default_rng(3)
        q, zeros, scales = _random_quant(rng)
        g_idx = rng.integers(0, K // G, K)   # arbitrary per-row groups
        w = dequant_dense(q, zeros, scales, g_idx)
        ref = (q.astype(np.float32) - zeros[g_idx]) * scales[g_idx]
        np.testing.assert_array_equal(w, ref)

    def test_repack_matches_kernel_oracle(self):
        from whisper_tensor_tpu.backends.pallas.packed_matmul import (
            dequant_repacked)

        rng = np.random.default_rng(4)
        q, zeros, scales = _random_quant(rng)
        rp = repack_for_kernel(q, zeros, scales)
        assert rp is not None and int(rp["bits"]) == 4
        # kernel form q*s - (z*s) vs (q-z)*s: equal to 1 ulp
        np.testing.assert_allclose(dequant_repacked(rp),
                                   dequant_dense(q, zeros, scales),
                                   rtol=1e-6, atol=1e-6)

    def test_packed_matmul_group_size_generalizes(self):
        """PackedMatMul milli op (oracle + jnp fallback) with g=64
        groups — the GPTQ/AWQ shape, vs dense matmul."""
        import jax

        from whisper_tensor_tpu.milli.transforms import PackedMatMulMilli

        rng = np.random.default_rng(5)
        q, zeros, scales = _random_quant(rng)
        rp = repack_for_kernel(q, zeros, scales)
        w = dequant_dense(q, zeros, scales)
        x = rng.standard_normal((4, K)).astype(np.float32)
        ref = x @ w
        op = PackedMatMulMilli(bits=4)
        out = op.eval([x, rp["q"], rp["scales"], rp["offsets"]])[0]
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)
        jout = jax.jit(lambda *a: op.to_jax(list(a))[0])(
            x, rp["q"], rp["scales"], rp["offsets"])
        np.testing.assert_allclose(np.asarray(jout), ref,
                                   rtol=1e-5, atol=1e-4)


def _write_quantized_llama(tmp_path, method: str, g: int = 64):
    """Tiny llama checkpoint with every Linear in GPTQ/AWQ format.
    Returns (dir, dense state dict of the DEQUANTIZED weights)."""
    from safetensors.numpy import save_file

    E, I, V, HEADS, KV = 128, 256, 130, 4, 2
    rng = np.random.default_rng(7)
    spec = QuantSpec(method, 4, g)
    cfg = {
        "model_type": "llama", "num_hidden_layers": 2,
        "num_attention_heads": HEADS, "num_key_value_heads": KV,
        "hidden_size": E, "intermediate_size": I, "vocab_size": V,
        "max_position_embeddings": 64, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "torch_dtype": "float32",
        "tie_word_embeddings": True,
        "quantization_config": (
            {"quant_method": "gptq", "bits": 4, "group_size": g,
             "desc_act": False, "sym": True}
            if method == "gptq" else
            {"quant_method": "awq", "bits": 4, "group_size": g,
             "version": "gemm", "zero_point": True}),
    }
    sd = {}
    dense = {}

    def dense_w(name, shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05
        dense[name] = sd[name]

    def quant_linear(mod, n_out, k_in):
        q = rng.integers(0, 16, (k_in, n_out)).astype(np.uint8)
        zeros = np.clip(rng.integers(1, 15, (k_in // g, n_out)), 1, 15) \
            .astype(np.float32)
        scales = (rng.random((k_in // g, n_out), dtype=np.float32)
                  * 0.01 + 0.001)
        if method == "gptq":
            qw, qz, sc = pack_gptq(q, zeros, scales, spec)
        else:
            qw, qz, sc = pack_awq(q, zeros, scales, spec)
        sd[mod + ".qweight"] = qw
        sd[mod + ".qzeros"] = qz
        sd[mod + ".scales"] = sc
        # the scales round-trip through f16 in the checkpoint
        dense[mod + ".weight"] = np.ascontiguousarray(
            dequant_dense(q, zeros, sc.astype(np.float32)).T)

    dense_w("model.embed_tokens.weight", (V, E))
    dense_w("model.norm.weight", (E,))
    for i in range(2):
        p = f"model.layers.{i}."
        dense_w(p + "input_layernorm.weight", (E,))
        dense_w(p + "post_attention_layernorm.weight", (E,))
        hd = E // HEADS
        quant_linear(p + "self_attn.q_proj", E, E)
        quant_linear(p + "self_attn.k_proj", KV * hd, E)   # N=64: stays
        quant_linear(p + "self_attn.v_proj", KV * hd, E)   # dense (<128)
        quant_linear(p + "self_attn.o_proj", E, E)
        quant_linear(p + "mlp.gate_proj", I, E)
        quant_linear(p + "mlp.up_proj", I, E)
        quant_linear(p + "mlp.down_proj", E, I)
    d = tmp_path / f"tiny-llama-{method}"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    save_file(sd, str(d / "model.safetensors"))
    return d, dense


@pytest.mark.parametrize("method", ["gptq", "awq"])
def test_loader_end_to_end(tmp_path, method):
    """GPTQ/AWQ dir -> TransformersLoader -> logits EXACTLY equal a
    dense llama built from the dequantized weights (f32); the fused
    packed path is registered and produces the same logits."""
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.importers.recipes.llm.llama import (
        LlamaConfig, build_llama_step)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    d, dense = _write_quantized_llama(tmp_path, method)
    bundle = loader_registry()["transformers"].load(
        {"path": str(d), "dtype": "f32", "max_len": 64})
    model = next(iter(bundle.models.values()))
    # quantized linears registered for the fused packed path
    assert len(model.graph.store.packed_sources) == 14

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 130, (2, 9)).astype(np.int64)

    # dense referee from the dequantized weights
    cfg = LlamaConfig.from_hf(json.loads((d / "config.json").read_text()))

    def getter(name):
        if name == "lm_head.weight":
            return dense["model.embed_tokens.weight"]
        return dense[name]

    ref_model = Model.new_from_onnx(
        build_llama_step(getter, cfg, max_len=64, dtype=DType.F32))
    ref = TextInferenceInterface(ref_model, max_len=64,
                                 prompt_buckets=(16,)).logits(ids)

    # packed path auto-enables from packed_sources (jnp fallback on
    # CPU, Pallas on TPU); k/v projections (N=64 < 128) stay dense, so
    # this exercises the mixed packed+dense program
    iface = TextInferenceInterface(model, max_len=64, prompt_buckets=(16,))
    # q,o,down stay individual; gate+up fuse into one packed entry
    # (fuse_parallel_matmuls concat of the GPTQ device-layout dicts);
    # k/v (N=64, not lane-aligned) stay dense -> 8 packed entries
    assert len(iface._packed) == 8
    assert any(n.endswith("::fused2") for n in iface._packed)
    got = iface.logits(ids)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_desc_act_dense_fallback(tmp_path):
    """desc_act (non-trivial g_idx) dequantizes correctly on the dense
    path and is EXCLUDED from packed registration."""
    from safetensors.numpy import save_file

    g = 64
    rng = np.random.default_rng(9)
    spec = QuantSpec("gptq", 4, g)
    q = rng.integers(0, 16, (K, N)).astype(np.uint8)
    zeros = np.clip(rng.integers(1, 15, (K // g, N)), 1, 15) \
        .astype(np.float32)
    scales = (rng.random((K // g, N), dtype=np.float32) * 0.01 + 0.001)
    qw, qz, sc = pack_gptq(q, zeros, scales, spec)
    g_idx = rng.permutation(np.repeat(np.arange(K // g), g)).astype(np.int32)
    d = tmp_path / "descact"
    d.mkdir()
    save_file({"m.qweight": qw, "m.qzeros": qz, "m.scales": sc,
               "m.g_idx": g_idx}, str(d / "model.safetensors"))

    from whisper_tensor_tpu.importers.safetensors_io import SafetensorsStore

    store = QuantizedStore(SafetensorsStore([str(d / "model.safetensors")]),
                           spec)
    w = store.load("m.weight")                      # (N, K) HF Linear
    ref = dequant_dense(q, zeros, sc.astype(np.float32),
                        g_idx.astype(np.int64))
    np.testing.assert_array_equal(w, ref.T)
    assert store.packed_source("m.weight")() is None


def test_names_keeps_sibling_tensors(tmp_path):
    """names() must collapse only the q-component tensors of a module
    into '<mod>.weight' — siblings like '<mod>.bias' share the module
    prefix and must keep passing through (a Qwen-style checkpoint with
    attention biases would otherwise silently lose them)."""
    from safetensors.numpy import save_file

    g = 64
    rng = np.random.default_rng(13)
    spec = QuantSpec("gptq", 4, g)
    q = rng.integers(0, 16, (K, N)).astype(np.uint8)
    zeros = np.clip(rng.integers(1, 15, (K // g, N)), 1, 15) \
        .astype(np.float32)
    scales = (rng.random((K // g, N), dtype=np.float32) * 0.01 + 0.001)
    qw, qz, sc = pack_gptq(q, zeros, scales, spec)
    bias = rng.standard_normal((N,)).astype(np.float32)
    d = tmp_path / "withbias"
    d.mkdir()
    save_file({"m.qweight": qw, "m.qzeros": qz, "m.scales": sc,
               "m.bias": bias, "other.weight": bias.copy()},
              str(d / "model.safetensors"))

    from whisper_tensor_tpu.importers.safetensors_io import SafetensorsStore

    store = QuantizedStore(SafetensorsStore([str(d / "model.safetensors")]),
                           spec)
    names = sorted(store.names())
    assert names == ["m.bias", "m.weight", "other.weight"]
    np.testing.assert_array_equal(store.load("m.bias"), bias)
