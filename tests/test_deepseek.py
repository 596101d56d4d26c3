"""DeepSeek-V2 recipe (MLA + MoE) vs torch transformers."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.deepseek import (
    DeepseekConfig, build_deepseek_step)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

MAXLEN = 32


@pytest.fixture(scope="module")
def tiny_deepseek():
    import torch
    from transformers import DeepseekV2Config as HFCfg
    from transformers import DeepseekV2ForCausalLM

    torch.manual_seed(0)
    common = dict(
        num_hidden_layers=3, num_attention_heads=2, hidden_size=32,
        intermediate_size=48, moe_intermediate_size=16, vocab_size=99,
        q_lora_rank=None, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        moe_layer_freq=1, routed_scaling_factor=1.0, norm_topk_prob=False,
        rms_norm_eps=1e-6, rope_theta=10000.0)
    hf = DeepseekV2ForCausalLM(HFCfg(
        attention_dropout=0.0, max_position_embeddings=MAXLEN,
        attention_bias=False, **common))
    hf.eval()
    cfg = DeepseekConfig.from_hf(common)
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    data = build_deepseek_step(lambda n: sd[n], cfg, max_len=MAXLEN)
    return hf, Model.new_from_onnx(data, name="tiny-deepseek"), cfg


def test_logits_match_torch(tiny_deepseek):
    import torch

    hf, model, cfg = tiny_deepseek
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (1, 9)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16,))
    lg = iface.logits(ids)
    with torch.no_grad():
        tl = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(lg, tl, rtol=3e-3, atol=3e-4)


def test_greedy_matches_torch(tiny_deepseek):
    import torch

    hf, model, cfg = tiny_deepseek
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16,))
    ours = iface.generate_tokens(prompt, 6)[0]
    with torch.no_grad():
        full = hf.generate(torch.from_numpy(prompt), max_new_tokens=6,
                           do_sample=False, pad_token_id=0)
    np.testing.assert_array_equal(ours, full[0, 6:].numpy())


def test_mla_cache_is_compressed(tiny_deepseek):
    """The cache must store the latent (kv_lora_rank), not full K/V."""
    hf, model, cfg = tiny_deepseek
    info = model.graph.tensors[model.graph.by_name["cache_k_0"]].info
    dims = [int(d.value()) for d in info.dims()[1:]]
    assert dims == [1, MAXLEN, cfg.kv_lora_rank]
    # vs full MHA cache which would be H * (nope+rope) wide per position
    assert cfg.kv_lora_rank < cfg.num_attention_heads * (
        cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)


def test_absorbed_decode_matches_naive(tiny_deepseek):
    """absorb=True (MQA in latent space) must produce the same logits as
    the naive kv_b re-expansion — and therefore match torch too."""
    hf, naive_model, cfg = tiny_deepseek
    import torch

    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    data = build_deepseek_step(lambda n: sd[n], cfg, max_len=MAXLEN,
                               absorb=True)
    absorbed = Model.new_from_onnx(data, name="tiny-deepseek-absorbed")

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, (2, 9)).astype(np.int64)

    def run(model):
        iface = TextInferenceInterface(model, max_len=MAXLEN,
                                       prompt_buckets=(16,))
        step = iface._traced_step(2, 16)
        caches = iface.fresh_cache(2)
        pad = np.zeros((2, 16), dtype=np.int64)
        pad[:, :9] = ids
        logits, _ = step(pad, np.asarray(0, dtype=np.int64), caches,
                         iface._weights())
        return np.asarray(logits)[:, :9]

    la = run(absorbed)
    ln = run(naive_model)
    np.testing.assert_allclose(la, ln, rtol=2e-4, atol=2e-5)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(la, ref, rtol=2e-3, atol=2e-4)


def test_absorbed_cache_geometry(tiny_deepseek):
    """The absorbed graph must keep the compressed cache: no H-expanded
    K/V tensors as cache I/O."""
    hf, _, cfg = tiny_deepseek
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    data = build_deepseek_step(lambda n: sd[n], cfg, max_len=MAXLEN,
                               absorb=True)
    m = Model.new_from_onnx(data)
    for t in m.graph.inputs:
        ti = m.graph.tensors[t]
        if ti.name.startswith("cache_k_"):
            assert int(ti.info.shape[1].value()) == 1      # single kv head
            assert int(ti.info.shape[3].value()) == cfg.kv_lora_rank


class TestDeepseekV3:
    @pytest.fixture(scope="class")
    def tiny_v3(self):
        import torch
        from transformers import DeepseekV3Config as HFCfg
        from transformers import DeepseekV3ForCausalLM

        torch.manual_seed(1)
        common = dict(
            num_hidden_layers=3, num_attention_heads=2, hidden_size=32,
            intermediate_size=48, moe_intermediate_size=16, vocab_size=99,
            q_lora_rank=24, kv_lora_rank=16, qk_nope_head_dim=8,
            qk_rope_head_dim=4, v_head_dim=8, n_routed_experts=8,
            num_experts_per_tok=3, n_shared_experts=1,
            first_k_dense_replace=1, moe_layer_freq=1,
            routed_scaling_factor=2.5, norm_topk_prob=True,
            n_group=4, topk_group=2, rms_norm_eps=1e-6, rope_theta=10000.0)
        hf = DeepseekV3ForCausalLM(HFCfg(
            attention_dropout=0.0, max_position_embeddings=MAXLEN,
            attention_bias=False, rope_scaling=None, **common))
        hf.eval()
        cfg = DeepseekConfig.from_hf(common)
        cfg.scoring_func = "sigmoid"
        cfg.topk_method = "noaux_tc"
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        data = build_deepseek_step(lambda n: sd[n], cfg, max_len=MAXLEN,
                                   absorb=True)
        return hf, Model.new_from_onnx(data, name="tiny-deepseek-v3")

    def test_logits_match_torch(self, tiny_v3):
        import torch

        hf, model = tiny_v3
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 99, (2, 11)).astype(np.int64)
        iface = TextInferenceInterface(model, max_len=MAXLEN,
                                       prompt_buckets=(16,))
        step = iface._traced_step(2, 16)
        pad = np.zeros((2, 16), dtype=np.int64)
        pad[:, :11] = ids
        logits, _ = step(pad, np.asarray(0, dtype=np.int64),
                         iface.fresh_cache(2), iface._weights())
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).logits.numpy()
        np.testing.assert_allclose(np.asarray(logits)[:, :11], ref,
                                   rtol=2e-3, atol=2e-4)

    def test_greedy_matches_torch(self, tiny_v3):
        import torch

        hf, model = tiny_v3
        rng = np.random.default_rng(6)
        prompt = rng.integers(0, 99, (1, 7)).astype(np.int64)
        iface = TextInferenceInterface(model, max_len=MAXLEN,
                                       prompt_buckets=(8, 16))
        toks = np.asarray(iface.generate_tokens(prompt, 8))[0]
        with torch.no_grad():
            ref = hf.generate(torch.from_numpy(prompt), max_new_tokens=8,
                              do_sample=False)[0, 7:].numpy()
        np.testing.assert_array_equal(toks, ref)
