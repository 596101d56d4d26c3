"""fuse_parallel_matmuls: same-input projection fusion (q/k/v, gate/up).

The pass merges weight matmuls sharing one lhs into a single wide
matmul + static Split. It must be numerically EXACT (matmul columns
are independent) across the dense, int8, host-quantized Q4/Q8, and
GGUF-packed execution paths, and transparently de-fuse when multi-LoRA
adapters install.

Net-new TPU-shaped pass (decode is bound by matmul count, not weight
bytes — scripts/latency_probe.py); no reference counterpart.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.llama import (LlamaConfig,
                                                            build_llama_step)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.milli.ops import MatMul, Split
from whisper_tensor_tpu.model import Model

CFG = LlamaConfig(
    num_hidden_layers=2, hidden_size=256, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=512, vocab_size=512,
    max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-5,
    tie_word_embeddings=False)


def _shapes(cfg):
    E, D, I, V = (cfg.hidden_size, cfg.hd, cfg.intermediate_size,
                  cfg.vocab_size)
    s = {"model.embed_tokens.weight": (V, E), "model.norm.weight": (E,),
         "lm_head.weight": (V, E)}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        s.update({
            p + "input_layernorm.weight": (E,),
            p + "post_attention_layernorm.weight": (E,),
            p + "self_attn.q_proj.weight": (cfg.num_attention_heads * D, E),
            p + "self_attn.k_proj.weight": (cfg.num_key_value_heads * D, E),
            p + "self_attn.v_proj.weight": (cfg.num_key_value_heads * D, E),
            p + "self_attn.o_proj.weight": (E, cfg.num_attention_heads * D),
            p + "mlp.gate_proj.weight": (I, E),
            p + "mlp.up_proj.weight": (I, E),
            p + "mlp.down_proj.weight": (E, I)})
    return s


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(0)
    out = {}
    for n, s in _shapes(CFG).items():
        out[n] = (np.ones(s, np.float32) if n.endswith("norm.weight")
                  else rng.standard_normal(s).astype(np.float32) * 0.05)
    return out


def _iface(weights, fuse, quantize=None, **kw):
    model = Model.new_from_onnx(
        build_llama_step(lambda n: weights[n], CFG, max_len=32,
                         dtype=DType.F32))
    return TextInferenceInterface(model, max_len=32, cache_dtype=DType.F32,
                                  prompt_buckets=(8,), fuse_matmuls=fuse,
                                  quantize=quantize, **kw)


def _ids(b=2, s=8):
    return np.random.default_rng(1).integers(
        0, CFG.vocab_size, (b, s)).astype(np.int64)


def test_dense_exact_and_counts(weights):
    base = _iface(weights, fuse=False)
    fused = _iface(weights, fuse=True)
    n0 = sum(1 for nd in base.milli.nodes if type(nd.op) is MatMul)
    n1 = sum(1 for nd in fused.milli.nodes if type(nd.op) is MatMul)
    # per layer: q+k+v -> 1, gate+up -> 1 (o, down, lm_head unfused)
    assert n0 - n1 == 3 * CFG.num_hidden_layers
    assert sum(1 for nd in fused.milli.nodes
               if type(nd.op) is Split) >= 2 * CFG.num_hidden_layers
    ids = _ids()
    l0 = np.asarray(base.logits(ids), np.float32)
    l1 = np.asarray(fused.logits(ids), np.float32)
    # exact math, but XLA may pick a different K-reduction order for a
    # wider matmul — identical up to f32 summation order
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-5)
    assert np.array_equal(base.generate_tokens(ids, 6),
                          fused.generate_tokens(ids, 6))


@pytest.mark.parametrize("mode", ["q4_0", "q8_0"])
def test_host_quantized_exact(weights, mode):
    ids = _ids()
    l0 = np.asarray(_iface(weights, False, quantize=mode).logits(ids),
                    np.float32)
    l1 = np.asarray(_iface(weights, True, quantize=mode).logits(ids),
                    np.float32)
    # per-block quantization is column-local: fusion changes nothing
    # beyond f32 summation order
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-5)


def test_int8_close(weights):
    # int8's min_elements threshold quantizes MORE weights once fused
    # (small k/v projections ride the fused tensor), so compare against
    # the dense referee instead of the unfused-int8 run
    ids = _ids()
    ref = np.asarray(_iface(weights, True).logits(ids), np.float32)
    got = np.asarray(_iface(weights, True, quantize="int8").logits(ids),
                     np.float32)
    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.995


def test_adapters_defuse(weights):
    iface = _iface(weights, fuse=True)
    assert iface._fused
    K = CFG.hidden_size
    Nq = CFG.num_attention_heads * CFG.hd
    rng = np.random.default_rng(3)
    A = rng.standard_normal((K, 4)).astype(np.float32) * 0.1
    B = rng.standard_normal((4, Nq)).astype(np.float32) * 0.1
    iface.install_adapters({"a": {"wq_0": (A, B, 1.0)}})
    assert not iface._fused          # transparently rebuilt unfused
    ids = _ids()
    base_iface = _iface(weights, fuse=False)
    # slot 0 rows == base model
    l_base = np.asarray(base_iface.logits(ids), np.float32)
    l_slot0 = np.asarray(iface.logits(ids), np.float32)
    assert np.allclose(l_base, l_slot0, atol=1e-5)


def test_quantized_adapters_rejected(weights):
    iface = _iface(weights, fuse=True, quantize="q4_0")
    with pytest.raises(ValueError, match="fuse_matmuls=False"):
        iface.install_adapters({"a": {"wq_0": (np.zeros((2, 2)),
                                               np.zeros((2, 2)), 1.0)}})


def test_gguf_packed_fused_source(weights):
    """PackedTensor byte concat (the GGUF fused source) matches the
    dense concat exactly after dequantization."""
    from whisper_tensor_tpu.backends.cpu.dequant import (dequantize_blocks,
                                                         quantize_blocks)
    from whisper_tensor_tpu.packed_format import PackedFormat
    from whisper_tensor_tpu.tensor import PackedTensor

    rng = np.random.default_rng(7)
    w1 = rng.standard_normal((128, 256)).astype(np.float32)  # (N1, K)
    w2 = rng.standard_normal((64, 256)).astype(np.float32)   # (N2, K)
    pts = [PackedTensor(quantize_blocks(w, PackedFormat.Q4_0),
                        PackedFormat.Q4_0, w.shape) for w in (w1, w2)]
    data = np.concatenate(
        [np.frombuffer(p.data, dtype=np.uint8) for p in pts])
    fused = PackedTensor(data.tobytes(), PackedFormat.Q4_0, (192, 256))
    got = dequantize_blocks(fused.data, PackedFormat.Q4_0,
                            192 * 256).reshape(192, 256)
    ref = np.concatenate([
        dequantize_blocks(p.data, PackedFormat.Q4_0,
                          p.shape[0] * 256).reshape(p.shape[0], 256)
        for p in pts], axis=0)
    assert np.array_equal(got, ref)


def test_mesh_disables_fusion(weights):
    """Auto mode keeps fusion off under a device mesh (megatron shard
    rules match per-projection names)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("dp", "tp"))
    iface = _iface(weights, fuse=None, mesh=mesh, shard_rules=[])
    assert not iface._fused
