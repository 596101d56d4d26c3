"""Llama-family recipe end-to-end vs torch transformers (GQA + RoPE +
RMSNorm + SwiGLU), incl. qwen2 attention-bias variant."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.llama import (LlamaConfig,
                                                            build_llama_step,
                                                            hf_weight_getter)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

MAXLEN = 64


def make_tiny(model_type="llama"):
    import torch

    torch.manual_seed(0)
    common = dict(num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, hidden_size=32,
                  intermediate_size=64, vocab_size=101,
                  max_position_embeddings=MAXLEN,
                  attention_dropout=0.0)
    if model_type == "llama":
        from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

        hf = LlamaForCausalLM(HFCfg(rope_theta=10000.0, **common))
    else:
        from transformers import Qwen2Config as HFCfg, Qwen2ForCausalLM

        hf = Qwen2ForCausalLM(HFCfg(rope_theta=10000.0, **common))
    hf.eval()
    cfg = LlamaConfig.from_hf({**common, "model_type": model_type,
                               "rope_theta": 10000.0,
                               "rms_norm_eps": 1e-6})
    data = build_llama_step(hf_weight_getter(hf), cfg, max_len=MAXLEN)
    return hf, Model.new_from_onnx(data, name=f"tiny-{model_type}"), cfg


@pytest.fixture(scope="module", params=["llama", "qwen2"])
def tiny(request):
    return make_tiny(request.param)


def test_logits_match_torch(tiny):
    import torch

    hf, model, cfg = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 11)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN,
                                   prompt_buckets=(16, 32, 64))
    lg = iface.logits(ids)
    with torch.no_grad():
        tl = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(lg, tl, rtol=2e-3, atol=2e-4)


def test_hidden_states_tap(tiny):
    """The /v1/embeddings hidden-state tap (deepest-input walk from
    logits) lands on the post-final-norm activation for llama/qwen2."""
    import torch

    hf, model, cfg = tiny
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN,
                                   prompt_buckets=(16, 32, 64))
    h = iface.hidden_states(ids)
    with torch.no_grad():
        ref = hf.model(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(h, ref, rtol=2e-3, atol=2e-4)


def test_greedy_matches_torch(tiny):
    import torch

    hf, model, cfg = tiny
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, (1, 7)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN,
                                   prompt_buckets=(16, 32, 64))
    ours = iface.generate_tokens(prompt, 10)[0]
    with torch.no_grad():
        full = hf.generate(torch.from_numpy(prompt), max_new_tokens=10,
                           do_sample=False, pad_token_id=0)
    np.testing.assert_array_equal(ours, full[0, 7:].numpy())


def test_safetensors_round_trip(tmp_path):
    """Save tiny llama weights as sharded safetensors; import via
    SafetensorsStore; logits must match the in-memory path."""
    import torch
    from safetensors.torch import save_file

    from whisper_tensor_tpu.importers.safetensors_io import SafetensorsStore

    hf, model_ref, cfg = make_tiny("llama")
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()
          if not k.startswith("lm_head")}
    half = len(sd) // 2
    items = list(sd.items())
    save_file(dict(items[:half]), str(tmp_path / "a.safetensors"))
    save_file(dict(items[half:]), str(tmp_path / "b.safetensors"))

    store = SafetensorsStore([str(tmp_path / "a.safetensors"),
                              str(tmp_path / "b.safetensors")])

    def getter(name):
        if name == "lm_head.weight" and name not in store:
            return store.load("model.embed_tokens.weight")
        return store.load(name)

    cfg2 = LlamaConfig(**{**cfg.__dict__, "tie_word_embeddings": True})
    data = build_llama_step(getter, cfg2, max_len=MAXLEN)
    model = Model.new_from_onnx(data, name="st-llama")
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (1, 9)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16,))
    lg = iface.logits(ids)
    assert np.isfinite(lg).all()
    # cross-check vs torch with tied head
    with torch.no_grad():
        emb = hf.get_input_embeddings().weight
        hf.lm_head.weight = torch.nn.Parameter(emb.clone())
        tl = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(lg, tl, rtol=2e-3, atol=2e-4)


class TestMixtral:
    """Mixtral sparse MoE (softmax -> top-k -> renormalize) vs torch."""

    @pytest.fixture(scope="class")
    def tiny_mixtral(self):
        import torch
        from transformers import MixtralConfig as HFCfg
        from transformers import MixtralForCausalLM

        torch.manual_seed(0)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32,
                      intermediate_size=48, vocab_size=99,
                      max_position_embeddings=64, rms_norm_eps=1e-6,
                      rope_theta=10000.0, num_local_experts=4,
                      num_experts_per_tok=2, tie_word_embeddings=False)
        hf = MixtralForCausalLM(HFCfg(attention_dropout=0.0, **common))
        hf.eval()
        cfg = LlamaConfig.from_hf({**common, "model_type": "mixtral"})
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        data = build_llama_step(lambda n: sd[n], cfg, max_len=32)
        return hf, Model.new_from_onnx(data, name="tiny-mixtral")

    def test_logits_match_torch(self, tiny_mixtral):
        import torch

        hf, model = tiny_mixtral
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 99, (2, 10)).astype(np.int64)
        iface = TextInferenceInterface(model, max_len=32,
                                       prompt_buckets=(16,))
        step = iface._traced_step(2, 16)
        pad = np.zeros((2, 16), dtype=np.int64)
        pad[:, :10] = ids
        logits, _ = step(pad, np.asarray(0, dtype=np.int64),
                         iface.fresh_cache(2), iface._weights())
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).logits.numpy()
        np.testing.assert_allclose(np.asarray(logits)[:, :10], ref,
                                   rtol=2e-3, atol=2e-4)

    def test_greedy_matches_torch(self, tiny_mixtral):
        import torch

        hf, model = tiny_mixtral
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, 99, (1, 6)).astype(np.int64)
        iface = TextInferenceInterface(model, max_len=32,
                                       prompt_buckets=(8, 16))
        toks = np.asarray(iface.generate_tokens(prompt, 8))[0]
        with torch.no_grad():
            ref = hf.generate(torch.from_numpy(prompt), max_new_tokens=8,
                              do_sample=False)[0, 6:].numpy()
        np.testing.assert_array_equal(toks, ref)


class TestQwen3:
    """Qwen3 dense (per-head QK RMS norm) and Qwen3-MoE vs torch."""

    def _check(self, hf, model, seed):
        import torch

        rng = np.random.default_rng(seed)
        ids = rng.integers(0, 99, (2, 9)).astype(np.int64)
        iface = TextInferenceInterface(model, max_len=32, prompt_buckets=(16,))
        step = iface._traced_step(2, 16)
        pad = np.zeros((2, 16), dtype=np.int64)
        pad[:, :9] = ids
        logits, _ = step(pad, np.asarray(0, dtype=np.int64),
                         iface.fresh_cache(2), iface._weights())
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).logits.numpy()
        np.testing.assert_allclose(np.asarray(logits)[:, :9], ref,
                                   rtol=2e-3, atol=2e-4)
        prompt = ids[:1, :5]
        toks = np.asarray(iface.generate_tokens(prompt, 6))[0]
        with torch.no_grad():
            g = hf.generate(torch.from_numpy(prompt), max_new_tokens=6,
                            do_sample=False)[0, 5:].numpy()
        np.testing.assert_array_equal(toks, g)

    def test_qwen3_dense(self):
        import torch
        from transformers import Qwen3Config as HFCfg
        from transformers import Qwen3ForCausalLM

        torch.manual_seed(3)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32,
                      intermediate_size=48, vocab_size=99, head_dim=8,
                      max_position_embeddings=64, rms_norm_eps=1e-6,
                      rope_theta=10000.0, tie_word_embeddings=False)
        hf = Qwen3ForCausalLM(HFCfg(attention_dropout=0.0, **common))
        hf.eval()
        cfg = LlamaConfig.from_hf({**common, "model_type": "qwen3"})
        assert cfg.qk_norm
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        m = Model.new_from_onnx(build_llama_step(lambda n: sd[n], cfg,
                                                 max_len=32))
        self._check(hf, m, 4)

    def test_qwen3_moe(self):
        import torch
        from transformers import Qwen3MoeConfig as HFCfg
        from transformers import Qwen3MoeForCausalLM

        torch.manual_seed(5)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32,
                      intermediate_size=48, moe_intermediate_size=16,
                      vocab_size=99, head_dim=8,
                      max_position_embeddings=64, rms_norm_eps=1e-6,
                      rope_theta=10000.0, num_experts=4,
                      num_experts_per_tok=2, norm_topk_prob=True,
                      decoder_sparse_step=1, mlp_only_layers=[],
                      tie_word_embeddings=False)
        hf = Qwen3MoeForCausalLM(HFCfg(attention_dropout=0.0, **common))
        hf.eval()
        cfg = LlamaConfig.from_hf({**common, "model_type": "qwen3_moe"})
        assert cfg.qk_norm and cfg.moe_style == "qwen3"
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        m = Model.new_from_onnx(build_llama_step(lambda n: sd[n], cfg,
                                                 max_len=32))
        self._check(hf, m, 6)


def test_llama_loader_decode_windows(tmp_path):
    """decode_windows on a llama dir: rope tables and weights come from
    the shared store; windowed generation == plain."""
    import torch

    from whisper_tensor_tpu.importers.loaders import loader_registry

    hf, _, cfg = make_tiny("llama")
    d = tmp_path / "tiny-llama-w"
    hf.save_pretrained(str(d), safe_serialization=True)

    ldr = loader_registry()["transformers"]
    plain_b = ldr.load({"path": str(d), "dtype": "f32", "max_len": 64})
    win_b = ldr.load({"path": str(d), "dtype": "f32", "max_len": 64,
                      "decode_windows": "16,32"})
    spec = win_b.interfaces["text"]
    name = spec["model"]
    window_models = {int(w): win_b.models[mn]
                     for w, mn in spec["windows"].items()}
    plain = TextInferenceInterface(plain_b.models[name], max_len=64,
                                   prompt_buckets=(8,))
    windowed = TextInferenceInterface(win_b.models[name], max_len=64,
                                      prompt_buckets=(8,),
                                      window_models=window_models)
    prompt = np.random.default_rng(2).integers(0, 101, (2, 6)).astype(np.int64)
    a = plain.generate_tokens(prompt, 40)
    b = windowed.generate_tokens(prompt, 40)
    np.testing.assert_array_equal(a, b)


def test_logits_last_only_matches_full():
    """logits_last_only=True (long-context prefill: (B,1,V) instead of
    the (B,S,V) matrix that dominates HBM at 16k) must agree exactly
    with the last position of the full-logits graph."""
    hf, model_full, cfg = make_tiny("llama")
    data = build_llama_step(hf_weight_getter(hf), cfg, max_len=MAXLEN,
                            logits_last_only=True)
    model_last = Model.new_from_onnx(data, name="tiny-last")
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int64)
    def run(model):
        iface = TextInferenceInterface(model, max_len=MAXLEN,
                                       prompt_buckets=(16,))
        caches = iface.fresh_cache(2)
        step = iface._traced_step(2, 16)
        import jax.numpy as jnp
        padded = np.zeros((2, 16), np.int64)
        padded[:, :12] = ids
        lg, *_ = step(jnp.asarray(padded), jnp.asarray(0, jnp.int64),
                      caches, iface._weights())
        return np.asarray(lg)
    lg_full = run(model_full)
    lg_last = run(model_last)
    assert lg_last.shape[1] == 1
    np.testing.assert_allclose(lg_last[:, 0], lg_full[:, -1],
                               rtol=1e-5, atol=1e-5)
