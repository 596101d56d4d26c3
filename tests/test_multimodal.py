"""Multimodal inputs_embeds path: CLIP vision tower vs torch, graph
surgery equivalence, and fused image+text generation cross-checked
against a torch inputs_embeds referee.

Reference parity target: MultimodalLanguageInterface
(src/interfaces.rs:166-327) — image information must flow through real
embeddings, not nearest-token requantization.
"""

import numpy as np
import pytest
import torch

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, hf_gpt2_weight_getter)
from whisper_tensor_tpu.importers.recipes.vision import (ClipVisionConfig,
                                                         build_clip_vision)
from whisper_tensor_tpu.interfaces.multimodal import MultimodalLanguageInterface
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

rng = np.random.default_rng(11)


def _tiny_vision_cfg():
    return ClipVisionConfig(num_hidden_layers=2, hidden_size=32,
                            num_attention_heads=2, intermediate_size=64,
                            image_size=16, patch_size=8, select_layer=-2)


def _torch_clip_vision(cfg):
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(HFCfg(
        num_hidden_layers=cfg.num_hidden_layers, hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, image_size=cfg.image_size,
        patch_size=cfg.patch_size, hidden_act="quick_gelu"))
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return hf, lambda name: sd[name]


def test_clip_vision_matches_torch():
    cfg = _tiny_vision_cfg()
    hf, weights = _torch_clip_vision(cfg)
    data = build_clip_vision(weights, cfg, dtype=DType.F32)
    m = Model.new_from_onnx(data, name="clip-vision")
    px = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(px),
                 output_hidden_states=True)
    out = m.eval({"pixels": px}, mode="xla")
    np.testing.assert_allclose(out["last_hidden_state"],
                               ref.last_hidden_state.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["pooled"], ref.pooler_output.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clip_vision_projector_selects_penultimate():
    """embeddings output == projector(hidden_states[-2][:, 1:]) in torch."""
    cfg = _tiny_vision_cfg()
    hf, weights = _torch_clip_vision(cfg)
    E_llm = 24
    torch.manual_seed(1)
    l1 = torch.nn.Linear(cfg.hidden_size, E_llm)
    l2 = torch.nn.Linear(E_llm, E_llm)
    proj_sd = {"linear_1.weight": l1.weight.detach().numpy(),
               "linear_1.bias": l1.bias.detach().numpy(),
               "linear_2.weight": l2.weight.detach().numpy(),
               "linear_2.bias": l2.bias.detach().numpy()}
    data = build_clip_vision(weights, cfg, dtype=DType.F32,
                             projector=lambda n: proj_sd[n])
    m = Model.new_from_onnx(data, name="clip-vision-proj")
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        hs = hf(pixel_values=torch.from_numpy(px),
                output_hidden_states=True).hidden_states
        feats = hs[-2][:, 1:]
        ref = l2(torch.nn.functional.gelu(l1(feats))).numpy()
    out = m.eval({"pixels": px}, mode="xla")["embeddings"]
    assert out.shape == (1, 4, E_llm)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def _tiny_gpt2():
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(2)
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=24, vocab_size=211,
                     n_positions=64)
    hf = GPT2LMHeadModel(HFConfig(
        n_layer=cfg.n_layer, n_head=cfg.n_head, n_embd=cfg.n_embd,
        vocab_size=cfg.vocab_size, n_positions=cfg.n_positions))
    hf.eval()
    return cfg, hf


def test_generate_from_embeds_matches_torch():
    """Fused (text-embeds + arbitrary continuous embeds) greedy decode
    must match torch GPT-2 driven via inputs_embeds."""
    cfg, hf = _tiny_gpt2()
    data = build_gpt2_step(hf_gpt2_weight_getter(hf), cfg, max_len=64,
                           dtype=DType.F32)
    iface = TextInferenceInterface(Model.new_from_onnx(data), max_len=64,
                                   prompt_buckets=(16, 32))
    mm = MultimodalLanguageInterface(iface)

    wte = hf.transformer.wte.weight.detach().numpy()
    text_ids = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
    # continuous "image" embeddings, NOT near any vocab row
    img_emb = rng.standard_normal((3, cfg.n_embd)).astype(np.float32) * 0.3
    fused = np.concatenate([wte[text_ids], img_emb], axis=0)[None]  # (1,8,E)
    L = fused.shape[1]

    n_new = 10
    toks = mm.generate_from_embeds(fused, n_new)[0]

    # torch referee: greedy loop over inputs_embeds
    with torch.no_grad():
        emb = torch.from_numpy(fused.copy())
        out_ids = []
        past = None
        inp = emb
        for _ in range(n_new):
            res = hf(inputs_embeds=inp, past_key_values=past, use_cache=True)
            past = res.past_key_values
            nxt = int(res.logits[0, -1].argmax())
            out_ids.append(nxt)
            inp = hf.transformer.wte(torch.tensor([[nxt]]))
    assert list(toks) == out_ids, (list(toks), out_ids)

    # the nearest-token fallback must NOT match (image info is lost
    # there) — guards against the old hack silently coming back
    w32 = wte.astype(np.float32)
    norms = (w32 ** 2).sum(-1)
    q_ids = np.argmax(fused[0] @ w32.T - 0.5 * norms[None, :], axis=-1)
    assert not np.array_equal(q_ids[:5], text_ids) or \
        not np.array_equal(q_ids[5:], text_ids[:3]), "degenerate test"


def test_multimodal_items_end_to_end():
    """items -> embed_items -> generate: true-embeds path runs and text-only
    items reproduce the plain token path exactly."""
    cfg, hf = _tiny_gpt2()
    data = build_gpt2_step(hf_gpt2_weight_getter(hf), cfg, max_len=64,
                           dtype=DType.F32)
    iface = TextInferenceInterface(Model.new_from_onnx(data), max_len=64,
                                   prompt_buckets=(16, 32))
    mm = MultimodalLanguageInterface(iface)
    from whisper_tensor_tpu.super_graph.links import MultimodalItem

    emb = rng.standard_normal((2, cfg.n_embd)).astype(np.float32) * 0.2
    wte = hf.transformer.wte.weight.detach().numpy()
    ids = np.asarray([3, 14, 15], dtype=np.int64)
    fused = mm.embed_items([
        MultimodalItem(embedding=wte[ids]),
        MultimodalItem(embedding=emb),
    ])
    assert fused.shape == (1, 5, cfg.n_embd)
    toks = mm.generate_from_embeds(fused, 6)
    assert toks.shape == (1, 6)

    # text-embeds-only fused sequence == plain token generation
    fused_text = mm.embed_items([MultimodalItem(embedding=wte[ids])])
    t1 = mm.generate_from_embeds(fused_text, 6)[0]
    t2 = iface.generate_tokens(ids[None], 6)[0]
    np.testing.assert_array_equal(t1, t2)


def test_llava_loader_end_to_end(tmp_path):
    """Load a real LlavaForConditionalGeneration checkpoint dir via the
    transformers loader; image+text generation through the true
    inputs_embeds path must match the torch referee token-for-token."""
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(3)
    hf_cfg = LlavaConfig(
        vision_config=dict(model_type="clip_vision_model",
                           num_hidden_layers=2, hidden_size=32,
                           num_attention_heads=2, intermediate_size=64,
                           image_size=16, patch_size=8,
                           hidden_act="quick_gelu"),
        text_config=dict(model_type="llama", num_hidden_layers=2,
                         hidden_size=24, num_attention_heads=2,
                         num_key_value_heads=2, intermediate_size=48,
                         vocab_size=211, max_position_embeddings=64,
                         rope_theta=10000.0))
    hf = LlavaForConditionalGeneration(hf_cfg)
    hf.eval()
    d = tmp_path / "tiny-llava"
    hf.save_pretrained(str(d), safe_serialization=True)

    from whisper_tensor_tpu.importers.loaders import loader_registry

    bundle = loader_registry()["transformers"].load(
        {"path": str(d), "dtype": "f32", "max_len": 64})
    assert "multimodal" in bundle.interfaces
    spec = bundle.interfaces["multimodal"]
    text_model = bundle.models[spec["model"]]
    vis_model = bundle.models[spec["vision"]]

    iface = TextInferenceInterface(text_model, max_len=64,
                                   prompt_buckets=(16, 32))
    mm = MultimodalLanguageInterface(iface,
                                     embed_weight_name=spec["embed_weight"],
                                     vision_encoder=vis_model)

    # pixels in [-1, 1] fed identically to both paths
    px8 = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    pixel_values = ((px8.astype(np.float32) / 127.5) - 1.0
                    ).transpose(2, 0, 1)[None]
    text_ids = rng.integers(0, 211, (4,)).astype(np.int64)

    # framework path: vision encoder -> fused embeds -> generate
    from whisper_tensor_tpu.backends.eval_backend import EvalBackend

    img_emb = np.asarray(EvalBackend("xla").run(
        vis_model.graph, {"pixels": pixel_values})["embeddings"])[0]
    wte = text_model.graph.store.get_numeric("embed_tokens").numpy()
    fused = np.concatenate([img_emb, wte[text_ids]], axis=0)[None]
    n_new = 8
    toks = mm.generate_from_embeds(fused, n_new)[0]

    # torch referee
    with torch.no_grad():
        hs = hf.vision_tower(torch.from_numpy(pixel_values),
                             output_hidden_states=True).hidden_states
        feats = hs[-2][:, 1:]
        proj = hf.multi_modal_projector(feats)
        temb = hf.get_input_embeddings()(torch.from_numpy(text_ids)[None])
        emb = torch.cat([proj, temb], dim=1)
        out_ids = []
        past = None
        inp = emb
        for _ in range(n_new):
            res = hf.language_model(inputs_embeds=inp, past_key_values=past,
                                    use_cache=True)
            logits = hf.lm_head(res.last_hidden_state)
            past = res.past_key_values
            nxt = int(logits[0, -1].argmax())
            out_ids.append(nxt)
            inp = hf.get_input_embeddings()(torch.tensor([[nxt]]))
    assert list(toks) == out_ids, (list(toks), out_ids)


def _write_tiny_llava(tmp_path):
    """Tiny LLaVA checkpoint dir (image_size 16) for serving tests."""
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(3)
    hf = LlavaForConditionalGeneration(LlavaConfig(
        vision_config=dict(model_type="clip_vision_model",
                           num_hidden_layers=2, hidden_size=32,
                           num_attention_heads=2, intermediate_size=64,
                           image_size=16, patch_size=8,
                           hidden_act="quick_gelu"),
        text_config=dict(model_type="llama", num_hidden_layers=2,
                         hidden_size=24, num_attention_heads=2,
                         num_key_value_heads=2, intermediate_size=48,
                         vocab_size=211, max_position_embeddings=128,
                         rope_theta=10000.0)))
    hf.eval()
    d = str(tmp_path / "tiny-llava-srv")
    hf.save_pretrained(d, safe_serialization=True)
    return d


def test_resize_bilinear():
    from whisper_tensor_tpu.utils.image import resize_bilinear

    a = rng.integers(0, 255, (7, 9, 3)).astype(np.uint8)
    # identity at the same size
    np.testing.assert_array_equal(resize_bilinear(a, 7, 9), a)
    # 2x2 block of a constant image stays constant
    c = np.full((4, 4, 3), 80, np.uint8)
    np.testing.assert_array_equal(resize_bilinear(c, 9, 5),
                                  np.full((9, 5, 3), 80, np.uint8))
    # downscale of a left/right split lands between the two values in
    # the middle column
    s = np.zeros((8, 8, 1), np.uint8)
    s[:, 4:] = 200
    out = resize_bilinear(s, 4, 3)
    assert out[0, 0, 0] < 40 and out[0, 2, 0] > 160
    assert 40 < out[0, 1, 0] < 160


def test_multimodal_serving_ws_and_openai(tmp_path):
    """generate_multimodal over the WS server and image_url data URIs
    through /v1/chat/completions both run the inputs_embeds path."""
    import base64
    import http.client
    import json as _json

    from whisper_tensor_tpu.server.main import Server
    from whisper_tensor_tpu.server.openai_api import OpenAIApi
    from whisper_tensor_tpu.utils.image import png_bytes

    d = _write_tiny_llava(tmp_path)
    srv = Server()
    entries = srv.models.run_loader("transformers", {
        "path": d, "dtype": "f32", "max_len": 128})
    entry = next(e for e in entries if "vision" not in e.name)
    px = rng.integers(0, 255, (20, 14, 3)).astype(np.uint8)  # resizes
    png64 = base64.b64encode(png_bytes(px)).decode()

    # WS-handler path (direct call: scheduler job runs synchronously
    # via the observer-less job function)
    mm, spec = srv._mm_iface(entry)
    from whisper_tensor_tpu.tokenizer import AnyTokenizer

    mm.text.tokenizer = AnyTokenizer.load("bytes")
    items = srv._mm_items(spec, [{"text": "hi "},
                                 {"image_b64": png64},
                                 {"text": " desc:"}])
    assert items[1].image.pixels.shape == (16, 16, 3)
    out = mm.run_items_in_string_out(items, 5)
    assert isinstance(out, str) and len(out) >= 1

    # OpenAI chat with an image data URI
    api = OpenAIApi(srv, "127.0.0.1", 0).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", api.port,
                                       timeout=300)
        body = {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is this? "},
            {"type": "image_url", "image_url": {
                "url": "data:image/png;base64," + png64}}]}],
            "max_tokens": 5, "temperature": 0}
        c.request("POST", "/v1/chat/completions",
                  body=_json.dumps(body),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        res = _json.loads(r.read())
        c.close()
        assert r.status == 200, res
        msg = res["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert isinstance(msg["content"], str)

        # a non-data URL is rejected (no outbound fetches)
        c = http.client.HTTPConnection("127.0.0.1", api.port,
                                       timeout=60)
        bad = {"messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "https://x/img.png"}}]}]}
        c.request("POST", "/v1/chat/completions", body=_json.dumps(bad),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 400
        r.read()
        c.close()
    finally:
        api.stop()
