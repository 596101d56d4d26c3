"""PEFT LoRA adapter loading: `-c lora=<dir>` merges adapters into base
weights at import, pinned against peft's own merge_and_unload().

Reference seam: examples/rwkv_lora_train.rs (adapter training); this is
the consuming side for standard PEFT checkpoints.
"""

import json

import numpy as np
import pytest

MAXLEN = 64


def _save_base(hf, d, cfg_json):
    from safetensors.torch import save_file

    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg_json))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))


def _randomize_lora(peft_model):
    import torch

    # peft zero-inits lora_B (merge would be a no-op) — randomize both
    with torch.no_grad():
        for n, p in peft_model.named_parameters():
            if "lora_" in n:
                p.copy_(torch.randn_like(p) * 0.3)


def _our_logits(base_dir, adapter_dir, ids):
    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface

    bundle = loader_registry()["transformers"].load(
        {"path": str(base_dir), "dtype": "f32", "max_len": MAXLEN,
         "lora": str(adapter_dir)})
    name = bundle.interfaces["text"]["model"]
    iface = TextInferenceInterface(bundle.models[name], max_len=MAXLEN,
                                   prompt_buckets=(16,))
    return iface.logits(ids)


def test_gpt2_conv1d_adapter_matches_peft_merge(tmp_path):
    # GPT-2 Conv1D targets store weights (in, out): the fan_in_fan_out
    # transpose path
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = dict(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
               n_positions=MAXLEN)
    hf = GPT2LMHeadModel(HFConfig(**cfg))
    base = tmp_path / "base-gpt2"
    _save_base(hf, base, {"model_type": "gpt2", **cfg})

    pm = get_peft_model(hf, LoraConfig(
        r=4, lora_alpha=16, lora_dropout=0.0, fan_in_fan_out=True,
        target_modules=["c_attn", "c_proj"]))
    _randomize_lora(pm)
    adapter = tmp_path / "adapter-gpt2"
    pm.save_pretrained(str(adapter))
    merged = pm.merge_and_unload()
    merged.eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 211, (1, 9)).astype(np.int64)
    with torch.no_grad():
        want = merged(torch.from_numpy(ids)).logits.numpy()
    got = _our_logits(base, adapter, ids)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)

    # and the adapter actually changed the function
    with torch.no_grad():
        torch.manual_seed(0)
        plain = GPT2LMHeadModel(HFConfig(**cfg))
        plain.eval()
        base_lg = plain(torch.from_numpy(ids)).logits.numpy()
    assert np.abs(want - base_lg).max() > 1e-3


def test_llama_linear_adapter_matches_peft_merge(tmp_path):
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = dict(num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, hidden_size=32, intermediate_size=64,
               vocab_size=173, max_position_embeddings=MAXLEN,
               attention_dropout=0.0, tie_word_embeddings=True)
    hf = LlamaForCausalLM(HFConfig(**cfg))
    base = tmp_path / "base-llama"
    _save_base(hf, base, {"model_type": "llama", **cfg,
                          "rms_norm_eps": 1e-6, "rope_theta": 10000.0})

    pm = get_peft_model(hf, LoraConfig(
        r=2, lora_alpha=8, lora_dropout=0.0,
        target_modules=["q_proj", "v_proj", "down_proj"]))
    _randomize_lora(pm)
    adapter = tmp_path / "adapter-llama"
    pm.save_pretrained(str(adapter))
    merged = pm.merge_and_unload()
    merged.eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 173, (1, 8)).astype(np.int64)
    with torch.no_grad():
        want = merged(torch.from_numpy(ids)).logits.numpy()
    got = _our_logits(base, adapter, ids)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)


def test_rslora_scaling(tmp_path):
    # use_rslora scales by alpha/sqrt(r) instead of alpha/r
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(2)
    cfg = dict(num_hidden_layers=1, num_attention_heads=2,
               num_key_value_heads=2, hidden_size=16, intermediate_size=32,
               vocab_size=97, max_position_embeddings=MAXLEN,
               attention_dropout=0.0, tie_word_embeddings=True)
    hf = LlamaForCausalLM(HFConfig(**cfg))
    base = tmp_path / "base-rs"
    _save_base(hf, base, {"model_type": "llama", **cfg,
                          "rms_norm_eps": 1e-6, "rope_theta": 10000.0})
    pm = get_peft_model(hf, LoraConfig(
        r=4, lora_alpha=8, lora_dropout=0.0, use_rslora=True,
        target_modules=["q_proj"]))
    _randomize_lora(pm)
    adapter = tmp_path / "adapter-rs"
    pm.save_pretrained(str(adapter))
    merged = pm.merge_and_unload()
    merged.eval()
    ids = np.random.default_rng(2).integers(0, 97, (1, 6)).astype(np.int64)
    with torch.no_grad():
        want = merged(torch.from_numpy(ids)).logits.numpy()
    got = _our_logits(base, adapter, ids)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)


def test_missing_adapter_pair_raises(tmp_path):
    from safetensors.numpy import save_file as np_save

    from whisper_tensor_tpu.importers.lora import LoraMergedStore

    d = tmp_path / "bad-adapter"
    d.mkdir()
    (d / "adapter_config.json").write_text(json.dumps({"r": 2,
                                                       "lora_alpha": 4}))
    np_save({"base_model.model.x.lora_A.weight":
             np.zeros((2, 4), np.float32)}, str(d / "adapter_model.safetensors"))
    with pytest.raises(ValueError, match="missing A or B"):
        LoraMergedStore(_FakeStore(), str(d))


class _FakeStore:
    def names(self):
        return []


def test_multi_lora_peft_serving(tmp_path):
    """Multi-LoRA serving end-to-end: a ragged model loaded with
    serve_adapters=name=dir serves per-request adapters through the
    server's ContinuousBatcher; each request's tokens equal the
    merge-at-load (`lora=<dir>`) single-model path."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.server.main import Server

    torch.manual_seed(3)
    cfg = dict(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
               n_positions=MAXLEN)
    hf = GPT2LMHeadModel(HFConfig(**cfg))
    base = tmp_path / "base"
    _save_base(hf, base, {"model_type": "gpt2", **cfg})

    dirs = {}
    for aname, seed in (("a1", 10), ("a2", 20)):
        torch.manual_seed(0)
        fresh = GPT2LMHeadModel(HFConfig(**cfg))
        fresh.load_state_dict(hf.state_dict())
        pm = get_peft_model(fresh, LoraConfig(
            r=4, lora_alpha=16, lora_dropout=0.0, fan_in_fan_out=True,
            target_modules=["c_attn", "c_fc"]))
        torch.manual_seed(seed)
        _randomize_lora(pm)
        d = tmp_path / f"adapter-{aname}"
        pm.save_pretrained(str(d))
        dirs[aname] = d

    srv = Server()
    entries = srv.models.run_loader("transformers", {
        "path": str(base), "dtype": "f32", "max_len": MAXLEN,
        "ragged_decode": True,
        "serve_adapters": f"a1={dirs['a1']},a2={dirs['a2']}"})
    bat = srv._batcher(entries[0])
    try:
        rng = np.random.default_rng(1)
        prompts = [rng.integers(0, 211, (n,)).astype(np.int64)
                   for n in (5, 8, 4)]
        names = [None, "a1", "a2"]
        futs = [bat.submit(p, 6, adapter=a)
                for p, a in zip(prompts, names)]
        outs = [f.result(timeout=180) for f in futs]
    finally:
        bat.stop()

    reg = loader_registry()["transformers"]
    for p, a, out in zip(prompts, names, outs):
        cfg_load = {"path": str(base), "dtype": "f32", "max_len": MAXLEN}
        if a is not None:
            cfg_load["lora"] = str(dirs[a])
        bundle = reg.load(cfg_load)
        name = bundle.interfaces["text"]["model"]
        ref = TextInferenceInterface(
            bundle.models[name], max_len=MAXLEN,
            prompt_buckets=(16,)).generate_tokens(p[None], 6)[0]
        np.testing.assert_array_equal(out, ref, err_msg=str(a))
    # the two adapters genuinely produce different functions
    assert not np.array_equal(outs[1], outs[2])

    # vLLM-style adapter aliases over the OpenAI API: adapters list as
    # models ("<base>:<adapter>"), and selecting one equals the
    # explicit adapter field
    import http.client

    from whisper_tensor_tpu.server.openai_api import OpenAIApi

    srv._batchers.clear()    # the direct-use batcher above was stopped
    api = OpenAIApi(srv, "127.0.0.1", 0).start()
    try:
        def req(method, path, body=None):
            c = http.client.HTTPConnection("127.0.0.1", api.port,
                                           timeout=180)
            c.request(method, path,
                      body=None if body is None else json.dumps(body),
                      headers={"Content-Type": "application/json"})
            r = c.getresponse()
            data = json.loads(r.read())
            c.close()
            return r.status, data

        s, listing = req("GET", "/v1/models")
        ids = [m["id"] for m in listing["data"]]
        base_name = entries[0].name
        assert f"{base_name}:a1" in ids and f"{base_name}:a2" in ids
        s1, d1 = req("POST", "/v1/completions",
                     {"model": f"{base_name}:a1", "prompt": "hi",
                      "max_tokens": 5, "temperature": 0})
        assert s1 == 200, d1
        s2, d2 = req("POST", "/v1/completions",
                     {"model": base_name, "adapter": "a1",
                      "prompt": "hi", "max_tokens": 5, "temperature": 0})
        assert d1["choices"][0]["text"] == d2["choices"][0]["text"]
        # bare adapter name is unique here -> also resolves
        s3, d3 = req("POST", "/v1/completions",
                     {"model": "a1", "prompt": "hi", "max_tokens": 5,
                      "temperature": 0})
        assert d3["choices"][0]["text"] == d1["choices"][0]["text"]
    finally:
        api.stop()
        for b in srv._batchers.values():
            b.stop()


def test_dynamic_adapter_load(tmp_path):
    """load_adapter at runtime: the old batcher drains, a replacement
    serves the new adapter, and outputs equal the merge-at-load path."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.server.main import Server

    torch.manual_seed(9)
    cfg = dict(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
               n_positions=MAXLEN)
    hf = GPT2LMHeadModel(HFConfig(**cfg))
    base = tmp_path / "dyn-base"
    _save_base(hf, base, {"model_type": "gpt2", **cfg})
    pm = get_peft_model(hf, LoraConfig(
        r=4, lora_alpha=16, lora_dropout=0.0, fan_in_fan_out=True,
        target_modules=["c_attn", "c_fc"]))
    torch.manual_seed(44)
    _randomize_lora(pm)
    ad = tmp_path / "dyn-adapter"
    pm.save_pretrained(str(ad))

    srv = Server()
    entries = srv.models.run_loader("transformers", {
        "path": str(base), "dtype": "f32", "max_len": MAXLEN,
        "ragged_decode": True})
    entry = entries[0]
    rng = np.random.default_rng(2)
    p = rng.integers(0, 211, (6,)).astype(np.int64)
    bat0 = srv._batcher(entry)
    out_before = bat0.submit(p, 5).result(timeout=180)

    resp = srv._load_adapter({"model_id": entry.id, "name": "dyn",
                              "path": str(ad)})
    assert resp["adapters"] == ["dyn"]
    bat1 = srv._batcher(entry)
    assert bat1 is not bat0
    try:
        out_base = bat1.submit(p, 5).result(timeout=180)
        out_ad = bat1.submit(p, 5, adapter="dyn").result(timeout=180)
    finally:
        bat1.stop()
    np.testing.assert_array_equal(out_base, out_before)

    bundle = loader_registry()["transformers"].load(
        {"path": str(base), "dtype": "f32", "max_len": MAXLEN,
         "lora": str(ad)})
    name = bundle.interfaces["text"]["model"]
    ref = TextInferenceInterface(
        bundle.models[name], max_len=MAXLEN,
        prompt_buckets=(16,)).generate_tokens(p[None], 5)[0]
    np.testing.assert_array_equal(out_ad, ref)

    # duplicate name and bad path fail fast without touching the batcher
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already loaded"):
        srv._load_adapter({"model_id": entry.id, "name": "dyn",
                           "path": str(ad)})
    with _pytest.raises(Exception):
        srv._load_adapter({"model_id": entry.id, "name": "x",
                           "path": str(tmp_path / "nope")})
    assert srv._batcher(entry) is not bat0   # registry not corrupted
    for b in srv._batchers.values():
        b.stop()
