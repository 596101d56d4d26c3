"""Tensor-parallel SERVING: the step-graph decode program sharded over a
(dp, tp) mesh via per-weight PartitionSpecs; GSPMD inserts the
collectives. Results must match the single-device run (greedy tokens
exactly; logits to collective-reassociation tolerance).

Net-new vs the reference (single-device serving); SURVEY §2.6/§7
phase 8 seam.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, random_gpt2_weights)
from whisper_tensor_tpu.importers.recipes.llm.llama import (
    LlamaConfig, build_llama_step, hf_weight_getter)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.parallel.mesh import (GPT2_RULES, LLAMA_RULES,
                                              make_mesh)

rng = np.random.default_rng(17)


@pytest.mark.parametrize("dp,tp", [(1, 2), (1, 4), (2, 2)])
def test_gpt2_tp_serving_matches_single(dp, tp):
    cfg = GPT2Config(n_layer=2, n_head=4, n_embd=64, vocab_size=256,
                     n_positions=64)
    wg = random_gpt2_weights(cfg)
    m = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64))
    single = TextInferenceInterface(m, max_len=64, prompt_buckets=(8,))
    mesh = make_mesh(dp=dp, sp=1, tp=tp)
    sharded = TextInferenceInterface(m, max_len=64, prompt_buckets=(8,),
                                     mesh=mesh, shard_rules=GPT2_RULES)
    B = 4
    prompt = rng.integers(0, 256, (B, 6)).astype(np.int64)
    a = single.generate_tokens(prompt, 16)
    b = sharded.generate_tokens(prompt, 16)
    np.testing.assert_array_equal(a, b)
    # logits agree to collective-reassociation tolerance
    la = single.logits(prompt)
    lb = sharded.logits(prompt)
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-5)


def test_llama_tp_serving_matches_single():
    import torch
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

    torch.manual_seed(4)
    common = dict(num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, hidden_size=32,
                  intermediate_size=64, vocab_size=128,
                  max_position_embeddings=64, attention_dropout=0.0)
    hf = LlamaForCausalLM(HFCfg(rope_theta=10000.0, **common))
    cfg = LlamaConfig.from_hf({**common, "model_type": "llama",
                               "rope_theta": 10000.0, "rms_norm_eps": 1e-6})
    m = Model.new_from_onnx(build_llama_step(hf_weight_getter(hf), cfg,
                                             max_len=64))
    single = TextInferenceInterface(m, max_len=64, prompt_buckets=(8,))
    mesh = make_mesh(dp=1, sp=1, tp=2)   # Hkv=2 divides tp
    sharded = TextInferenceInterface(m, max_len=64, prompt_buckets=(8,),
                                     mesh=mesh, shard_rules=LLAMA_RULES)
    prompt = rng.integers(0, 128, (2, 5)).astype(np.int64)
    a = single.generate_tokens(prompt, 12)
    b = sharded.generate_tokens(prompt, 12)
    np.testing.assert_array_equal(a, b)


def test_multihost_mesh_factorization():
    """multihost_mesh places dp across the (virtual) host boundary and
    keeps sp/tp inside — here: 8 'local' devices on 1 process."""
    from whisper_tensor_tpu.parallel.mesh import multihost_mesh

    mesh = multihost_mesh(sp=1, tp=2)
    assert mesh.shape["tp"] == 2
    assert mesh.shape["dp"] == 4           # 1 process x 8 local / tp2
    mesh2 = multihost_mesh(sp=2, tp=2)
    assert mesh2.shape == {"dp": 2, "sp": 2, "tp": 2}
    # over-subscription (pretending more hosts than devices) must raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multihost_mesh(dp_hosts=4, sp=2, tp=2)


def test_tp_serving_with_adapters():
    """Multi-LoRA under tensor parallelism: adapter stacks replicate
    (a base weight's 2-D rule must not catch the 3-D stacks) and the
    masked-einsum bypass reshards cleanly against tp-sharded matmul
    outputs — per-row selection matches single-device base/merged."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.interfaces.text import _bucket

    cfg = GPT2Config(n_layer=2, n_head=4, n_embd=64, vocab_size=256,
                     n_positions=64)
    wg = random_gpt2_weights(cfg)
    hfname = "transformer.h.0.mlp.c_fc.weight"
    K, N = wg(hfname).shape
    r = np.random.default_rng(21)
    A = (r.standard_normal((K, 4)) * 0.1).astype(np.float32)
    B = (r.standard_normal((4, N)) * 0.1).astype(np.float32)

    m = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64))
    mesh = make_mesh(dp=1, sp=1, tp=2)
    sharded = TextInferenceInterface(m, max_len=64, prompt_buckets=(8,),
                                     mesh=mesh, shard_rules=GPT2_RULES)
    sharded.install_adapters({"a": {"wfc_0": (A, B, 0.5)}})

    ids = rng.integers(0, 256, (2, 6)).astype(np.int64)
    Sb = _bucket(6, sharded.prompt_buckets)
    padded = np.zeros((2, Sb), np.int64)
    padded[:, :6] = ids
    step = sharded._traced_step(2, Sb)
    logits, _ = jax.jit(lambda i, c, w: step(
        i, jnp.asarray(0, jnp.int64), c, w))(
        jnp.asarray(padded), sharded.fresh_cache(2),
        sharded.weights_with_rows([jnp.asarray([0, 1], jnp.int64)]))
    logits = np.asarray(logits)[:, :6, :]

    base = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64)),
        max_len=64, prompt_buckets=(8,)).logits(ids)

    def merged_g(name):
        W = np.array(wg(name))
        if name == hfname:
            W = W + A @ B * 0.5
        return W
    merged = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(merged_g, cfg, max_len=64)),
        max_len=64, prompt_buckets=(8,)).logits(ids)

    np.testing.assert_allclose(logits[0], base[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(logits[1], merged[1], rtol=1e-4,
                               atol=1e-5)
