"""Recipe + loader tests: gemma/gemma2/phi3 vs torch; AutoLoader probing;
GGUF end-to-end load."""

import json
import os

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

MAXLEN = 64


def _iface(model):
    return TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16, 32))


def _torch_logits(hf, ids):
    import torch

    with torch.no_grad():
        return hf(torch.from_numpy(ids)).logits.numpy()


class TestGemma:
    @pytest.mark.parametrize("v2", [False, True])
    def test_logits_vs_torch(self, v2):
        import torch

        from whisper_tensor_tpu.importers.recipes.llm.gemma import (
            GemmaConfig, build_gemma_step)

        torch.manual_seed(0)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32, head_dim=8,
                      intermediate_size=64, vocab_size=99,
                      max_position_embeddings=MAXLEN,
                      attention_dropout=0.0)
        if v2:
            from transformers import Gemma2Config as HFCfg
            from transformers import Gemma2ForCausalLM as HFModel

            hf = HFModel(HFCfg(attn_logit_softcapping=50.0,
                               final_logit_softcapping=30.0,
                               query_pre_attn_scalar=8, sliding_window=4096,
                               **common))
            cfg = GemmaConfig.from_hf({**common, "model_type": "gemma2",
                                       "attn_logit_softcapping": 50.0,
                                       "final_logit_softcapping": 30.0,
                                       "query_pre_attn_scalar": 8})
        else:
            from transformers import GemmaConfig as HFCfg
            from transformers import GemmaForCausalLM as HFModel

            hf = HFModel(HFCfg(**common))
            cfg = GemmaConfig.from_hf({**common, "model_type": "gemma"})
        hf.eval()

        def getter(name):
            sd = hf.state_dict()
            if name == "lm_head.weight":
                return sd["model.embed_tokens.weight"].float().numpy()
            return sd[name].float().numpy()

        data = build_gemma_step(getter, cfg, max_len=MAXLEN)
        model = Model.new_from_onnx(data, name="tiny-gemma")
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 99, (1, 9)).astype(np.int64)
        lg = _iface(model).logits(ids)
        tl = _torch_logits(hf, ids)
        np.testing.assert_allclose(lg, tl, rtol=3e-3, atol=3e-4)

        # hidden-state tap must step over the v2 softcap tail
        # (Mul/CastLike/Tanh/Div) and land on the post-final-norm
        # activation
        h = _iface(model).hidden_states(ids)
        with torch.no_grad():
            ref = hf.model(torch.from_numpy(ids)).last_hidden_state.numpy()
        np.testing.assert_allclose(h, ref, rtol=3e-3, atol=3e-4)


class TestPhi3:
    def test_logits_vs_torch(self):
        import torch
        from transformers import Phi3Config as HFCfg
        from transformers import Phi3ForCausalLM as HFModel

        from whisper_tensor_tpu.importers.recipes.llm.phi3 import (
            Phi3Config, build_phi3_step)

        torch.manual_seed(0)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32,
                      intermediate_size=64, vocab_size=99,
                      max_position_embeddings=MAXLEN,
                      attention_dropout=0.0)
        hf = HFModel(HFCfg(pad_token_id=0, **common))
        hf.eval()
        cfg = Phi3Config.from_hf({**common, "model_type": "phi3",
                                  "rms_norm_eps": 1e-5,
                                  "rope_theta": 10000.0})
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        data = build_phi3_step(lambda n: sd[n], cfg, max_len=MAXLEN)
        model = Model.new_from_onnx(data, name="tiny-phi3")
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 99, (1, 8)).astype(np.int64)
        lg = _iface(model).logits(ids)
        tl = _torch_logits(hf, ids)
        np.testing.assert_allclose(lg, tl, rtol=3e-3, atol=3e-4)


class TestLoaders:
    def test_auto_loader_transformers_dir(self, tmp_path):
        import torch
        from safetensors.torch import save_file
        from transformers import LlamaConfig as HFCfg
        from transformers import LlamaForCausalLM

        from whisper_tensor_tpu.importers.loaders import identify_and_load

        torch.manual_seed(0)
        hf = LlamaForCausalLM(HFCfg(
            num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
            hidden_size=16, intermediate_size=32, vocab_size=64,
            max_position_embeddings=64))
        d = tmp_path / "tiny-llama"
        d.mkdir()
        cfg_json = {
            "model_type": "llama", "num_hidden_layers": 1,
            "num_attention_heads": 2, "num_key_value_heads": 1,
            "hidden_size": 16, "intermediate_size": 32, "vocab_size": 64,
            "max_position_embeddings": 64, "rms_norm_eps": 1e-6,
            "rope_theta": 10000.0}
        (d / "config.json").write_text(json.dumps(cfg_json))
        # generation_config wins over config.json for eos resolution,
        # including the Llama-3-style multi-eos list form
        (d / "generation_config.json").write_text(json.dumps(
            {"eos_token_id": [2, 3]}))
        save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
                  str(d / "model.safetensors"))
        bundle = identify_and_load(str(d), max_len=64, dtype="f32")
        assert bundle.meta["model_type"] == "llama"
        (name, model), = bundle.models.items()
        iface_cfg = bundle.interfaces["text"]
        assert iface_cfg["n_layers"] == 1
        assert iface_cfg["eos_token_id"] == [2, 3]
        ids = np.asarray([[1, 2, 3]], dtype=np.int64)
        lg = TextInferenceInterface(model, max_len=64,
                                    prompt_buckets=(16,)).logits(ids)
        import torch as _t

        with _t.no_grad():
            tl = hf(_t.from_numpy(ids)).logits.numpy()
        np.testing.assert_allclose(lg, tl, rtol=3e-3, atol=3e-4)

    def test_auto_loader_gguf(self, tmp_path):
        from whisper_tensor_tpu.importers.gguf import write_gguf
        from whisper_tensor_tpu.importers.loaders import identify_and_load

        rng = np.random.default_rng(0)
        E, Hq, Hkv, D, I, V, L = 16, 2, 1, 8, 32, 64, 1
        tensors = {
            "token_embd.weight": rng.standard_normal((V, E)).astype(np.float32) * 0.05,
            "output_norm.weight": np.ones(E, np.float32),
        }
        for i in range(L):
            p = f"blk.{i}."
            tensors[p + "attn_norm.weight"] = np.ones(E, np.float32)
            tensors[p + "attn_q.weight"] = rng.standard_normal((Hq * D, E)).astype(np.float32) * 0.05
            tensors[p + "attn_k.weight"] = rng.standard_normal((Hkv * D, E)).astype(np.float32) * 0.05
            tensors[p + "attn_v.weight"] = rng.standard_normal((Hkv * D, E)).astype(np.float32) * 0.05
            tensors[p + "attn_output.weight"] = rng.standard_normal((E, Hq * D)).astype(np.float32) * 0.05
            tensors[p + "ffn_norm.weight"] = np.ones(E, np.float32)
            tensors[p + "ffn_gate.weight"] = rng.standard_normal((I, E)).astype(np.float32) * 0.05
            tensors[p + "ffn_up.weight"] = rng.standard_normal((I, E)).astype(np.float32) * 0.05
            tensors[p + "ffn_down.weight"] = rng.standard_normal((E, I)).astype(np.float32) * 0.05
        meta = {"general.architecture": "llama", "general.name": "tiny",
                "llama.block_count": L, "llama.embedding_length": E,
                "llama.attention.head_count": Hq,
                "llama.attention.head_count_kv": Hkv,
                "llama.feed_forward_length": I, "llama.context_length": 64,
                "llama.vocab_size": V,
                "llama.attention.layer_norm_rms_epsilon": 1e-5,
                "llama.rope.freq_base": 10000.0}
        p = str(tmp_path / "tiny.gguf")
        write_gguf(p, meta, tensors)
        bundle = identify_and_load(p, max_len=64)
        (name, model), = bundle.models.items()
        iface = TextInferenceInterface(model, max_len=64, prompt_buckets=(16,),
                                       cache_dtype=DType.BF16)
        toks = iface.generate_tokens(np.asarray([[1, 2, 3]], dtype=np.int64), 4)
        assert toks.shape == (1, 4)

    def test_config_schema_introspection(self):
        from whisper_tensor_tpu.importers.loaders import loader_registry

        reg = loader_registry()
        assert {"auto", "onnx", "transformers", "gguf", "rwkv7"} <= set(reg)
        schema = reg["transformers"].config_schema()
        names = [f.name for f in schema]
        assert "path" in names and "dtype" in names
        assert all(f.to_json() for f in schema)


def test_gguf_phi3_adapter(tmp_path):
    """Phi3 GGUF (fused attn_qkv / ffn_up=gate_up) loads and matches torch."""
    import torch
    from transformers import Phi3Config as HFCfg
    from transformers import Phi3ForCausalLM

    from whisper_tensor_tpu.importers.gguf import write_gguf
    from whisper_tensor_tpu.importers.loaders import identify_and_load

    torch.manual_seed(0)
    E, Hq, Hkv, D, I, V, L = 32, 4, 2, 8, 48, 64, 2
    hf = Phi3ForCausalLM(HFCfg(
        num_hidden_layers=L, num_attention_heads=Hq, num_key_value_heads=Hkv,
        hidden_size=E, intermediate_size=I, vocab_size=V,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2))
    hf.eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    tensors = {"token_embd.weight": sd["model.embed_tokens.weight"],
               "output_norm.weight": sd["model.norm.weight"],
               "output.weight": sd["lm_head.weight"]}
    for i in range(L):
        hp, gp = f"model.layers.{i}.", f"blk.{i}."
        tensors[gp + "attn_qkv.weight"] = sd[hp + "self_attn.qkv_proj.weight"]
        tensors[gp + "attn_output.weight"] = sd[hp + "self_attn.o_proj.weight"]
        tensors[gp + "ffn_up.weight"] = sd[hp + "mlp.gate_up_proj.weight"]
        tensors[gp + "ffn_down.weight"] = sd[hp + "mlp.down_proj.weight"]
        tensors[gp + "attn_norm.weight"] = sd[hp + "input_layernorm.weight"]
        tensors[gp + "ffn_norm.weight"] = sd[
            hp + "post_attention_layernorm.weight"]
    meta = {"general.architecture": "phi3", "general.name": "tiny-phi3",
            "phi3.block_count": L, "phi3.embedding_length": E,
            "phi3.attention.head_count": Hq,
            "phi3.attention.head_count_kv": Hkv,
            "phi3.feed_forward_length": I, "phi3.context_length": 64,
            "phi3.vocab_size": V,
            "phi3.attention.layer_norm_rms_epsilon": 1e-5,
            "phi3.rope.freq_base": 10000.0}
    path = str(tmp_path / "tiny-phi3.gguf")
    write_gguf(path, meta, tensors)
    bundle = identify_and_load(path, max_len=32, dtype="f32")
    (name, model), = bundle.models.items()
    assert bundle.meta["architecture"] == "phi3"
    iface = TextInferenceInterface(model, max_len=32, prompt_buckets=(16,))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, V, (2, 9)).astype(np.int64)
    step = iface._traced_step(2, 16)
    pad = np.zeros((2, 16), dtype=np.int64)
    pad[:, :9] = ids
    logits, _ = step(pad, np.asarray(0, dtype=np.int64),
                     iface.fresh_cache(2), iface._weights())
    import torch as _t

    with _t.no_grad():
        ref = hf(_t.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits)[:, :9], ref,
                               rtol=3e-3, atol=3e-4)


def test_gguf_loader_windows_and_ragged(tmp_path):
    """GGUF loader parity with the transformers loader: decode_windows
    (structure-only graphs sharing the packed store) and ragged_decode."""
    from whisper_tensor_tpu.importers.gguf import write_gguf
    from whisper_tensor_tpu.importers.loaders import loader_registry

    rng = np.random.default_rng(1)
    E, Hq, Hkv, D, I, V, L = 16, 2, 1, 8, 32, 64, 1
    tensors = {
        "token_embd.weight": rng.standard_normal((V, E)).astype(np.float32) * 0.05,
        "output_norm.weight": np.ones(E, np.float32),
    }
    p0 = "blk.0."
    tensors[p0 + "attn_norm.weight"] = np.ones(E, np.float32)
    tensors[p0 + "attn_q.weight"] = rng.standard_normal((Hq * D, E)).astype(np.float32) * 0.05
    tensors[p0 + "attn_k.weight"] = rng.standard_normal((Hkv * D, E)).astype(np.float32) * 0.05
    tensors[p0 + "attn_v.weight"] = rng.standard_normal((Hkv * D, E)).astype(np.float32) * 0.05
    tensors[p0 + "attn_output.weight"] = rng.standard_normal((E, Hq * D)).astype(np.float32) * 0.05
    tensors[p0 + "ffn_norm.weight"] = np.ones(E, np.float32)
    tensors[p0 + "ffn_gate.weight"] = rng.standard_normal((I, E)).astype(np.float32) * 0.05
    tensors[p0 + "ffn_up.weight"] = rng.standard_normal((I, E)).astype(np.float32) * 0.05
    tensors[p0 + "ffn_down.weight"] = rng.standard_normal((E, I)).astype(np.float32) * 0.05
    meta = {"general.architecture": "llama", "general.name": "tinyw",
            "llama.block_count": L, "llama.embedding_length": E,
            "llama.attention.head_count": Hq,
            "llama.attention.head_count_kv": Hkv,
            "llama.feed_forward_length": I, "llama.context_length": 64,
            "llama.vocab_size": V,
            "llama.attention.layer_norm_rms_epsilon": 1e-5,
            "llama.rope.freq_base": 10000.0}
    path = str(tmp_path / "tinyw.gguf")
    write_gguf(path, meta, tensors)
    ldr = loader_registry()["gguf"]

    plain_b = ldr.load({"path": path, "max_len": 64, "dtype": "f32"})
    win_b = ldr.load({"path": path, "max_len": 64, "dtype": "f32",
                      "decode_windows": "16,32"})
    spec = win_b.interfaces["text"]
    assert set(spec["windows"]) == {"16", "32"}
    name = spec["model"]
    wm = {int(w): win_b.models[mn] for w, mn in spec["windows"].items()}
    plain = TextInferenceInterface(plain_b.models[name], max_len=64,
                                   prompt_buckets=(8,))
    windowed = TextInferenceInterface(win_b.models[name], max_len=64,
                                      prompt_buckets=(8,), window_models=wm)
    prompt = np.asarray([[1, 5, 9]], dtype=np.int64)
    np.testing.assert_array_equal(plain.generate_tokens(prompt, 30),
                                  windowed.generate_tokens(prompt, 30))

    # ragged variant loads and serves through the batcher
    rag_b = ldr.load({"path": path, "max_len": 64, "dtype": "f32",
                      "ragged_decode": True})
    assert rag_b.interfaces["text"]["ragged"]
    from whisper_tensor_tpu.server.batching import ContinuousBatcher

    bat = ContinuousBatcher(rag_b.models[next(iter(rag_b.models))],
                            max_len=64, max_batch=2, chunk=4,
                            cache_dtype=DType.F32,
                            prompt_buckets=(8,)).start()
    try:
        out = bat.submit(prompt[0], 6).result(timeout=120)
        ref = plain.generate_tokens(prompt, 6)[0]
        np.testing.assert_array_equal(out, ref)
    finally:
        bat.stop()


@pytest.mark.parametrize("arch", ["gemma", "gemma2"])
def test_gguf_gemma_adapter(tmp_path, arch):
    """Gemma/Gemma-2 GGUF (net-new vs the reference's adapter set):
    norm weights are stored +1 by the HF->GGUF converter, heads are
    tied, gemma2 adds the 4-norm sandwich + logit softcaps — loaded
    logits must match torch."""
    import torch

    from whisper_tensor_tpu.importers.gguf import write_gguf
    from whisper_tensor_tpu.importers.loaders import identify_and_load

    torch.manual_seed(0)
    E, Hq, Hkv, D, I, V, L = 32, 4, 2, 8, 48, 64, 2
    if arch == "gemma":
        from transformers import GemmaConfig as HFCfg
        from transformers import GemmaForCausalLM as HFModel

        hf = HFModel(HFCfg(
            num_hidden_layers=L, num_attention_heads=Hq,
            num_key_value_heads=Hkv, hidden_size=E, intermediate_size=I,
            vocab_size=V, head_dim=D, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=10000.0, attention_dropout=0.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2))
    else:
        from transformers import Gemma2Config as HFCfg
        from transformers import Gemma2ForCausalLM as HFModel

        hf = HFModel(HFCfg(
            num_hidden_layers=L, num_attention_heads=Hq,
            num_key_value_heads=Hkv, hidden_size=E, intermediate_size=I,
            vocab_size=V, head_dim=D, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=10000.0, attention_dropout=0.0,
            query_pre_attn_scalar=D, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, sliding_window=64,
            pad_token_id=0, bos_token_id=1, eos_token_id=2))
    hf.eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}

    def plus1(a):   # what convert_hf_to_gguf.py does to gemma norms
        return a + 1.0

    tensors = {"token_embd.weight": sd["model.embed_tokens.weight"],
               "output_norm.weight": plus1(sd["model.norm.weight"])}
    for i in range(L):
        hp, gp = f"model.layers.{i}.", f"blk.{i}."
        tensors[gp + "attn_q.weight"] = sd[hp + "self_attn.q_proj.weight"]
        tensors[gp + "attn_k.weight"] = sd[hp + "self_attn.k_proj.weight"]
        tensors[gp + "attn_v.weight"] = sd[hp + "self_attn.v_proj.weight"]
        tensors[gp + "attn_output.weight"] = sd[hp + "self_attn.o_proj.weight"]
        tensors[gp + "ffn_gate.weight"] = sd[hp + "mlp.gate_proj.weight"]
        tensors[gp + "ffn_up.weight"] = sd[hp + "mlp.up_proj.weight"]
        tensors[gp + "ffn_down.weight"] = sd[hp + "mlp.down_proj.weight"]
        tensors[gp + "attn_norm.weight"] = plus1(
            sd[hp + "input_layernorm.weight"])
        if arch == "gemma":
            tensors[gp + "ffn_norm.weight"] = plus1(
                sd[hp + "post_attention_layernorm.weight"])
        else:
            tensors[gp + "post_attention_norm.weight"] = plus1(
                sd[hp + "post_attention_layernorm.weight"])
            tensors[gp + "ffn_norm.weight"] = plus1(
                sd[hp + "pre_feedforward_layernorm.weight"])
            tensors[gp + "post_ffw_norm.weight"] = plus1(
                sd[hp + "post_feedforward_layernorm.weight"])
    meta = {"general.architecture": arch, "general.name": f"tiny-{arch}",
            f"{arch}.block_count": L, f"{arch}.embedding_length": E,
            f"{arch}.attention.head_count": Hq,
            f"{arch}.attention.head_count_kv": Hkv,
            f"{arch}.attention.key_length": D,
            f"{arch}.feed_forward_length": I,
            f"{arch}.context_length": 64, f"{arch}.vocab_size": V,
            f"{arch}.attention.layer_norm_rms_epsilon": 1e-6,
            f"{arch}.rope.freq_base": 10000.0}
    if arch == "gemma2":
        meta[f"{arch}.attn_logit_softcapping"] = 50.0
        meta[f"{arch}.final_logit_softcapping"] = 30.0
    path = str(tmp_path / f"tiny-{arch}.gguf")
    write_gguf(path, meta, tensors)
    bundle = identify_and_load(path, max_len=32, dtype="f32")
    (name, model), = bundle.models.items()
    assert bundle.meta["architecture"] == arch
    iface = TextInferenceInterface(model, max_len=32, prompt_buckets=(16,))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, V, (2, 9)).astype(np.int64)
    step = iface._traced_step(2, 16)
    pad = np.zeros((2, 16), dtype=np.int64)
    pad[:, :9] = ids
    logits, _ = step(pad, np.asarray(0, dtype=np.int64),
                     iface.fresh_cache(2), iface._weights())
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits)[:, :9], ref,
                               rtol=3e-3, atol=3e-4)
