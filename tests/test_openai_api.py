"""OpenAI-compatible HTTP API: /v1/models, /v1/completions,
/v1/chat/completions, SSE streaming, response_format -> constrained
decoding, and batcher routing. Net-beyond the reference (which exposes
only its own WebSocket protocol)."""

import http.client
import json
import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def api(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.server.main import Server
    from whisper_tensor_tpu.server.openai_api import OpenAIApi

    torch.manual_seed(23)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=16,
                                  vocab_size=300, n_positions=256))
    d = tmp_path_factory.mktemp("oai") / "tiny-gpt2"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 16,
        "vocab_size": 300, "n_positions": 256}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    srv = Server()
    # one direct model and one ragged (batcher-served) model
    srv.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 256})
    srv.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 256,
        "ragged_decode": True})
    a = OpenAIApi(srv, "127.0.0.1", 0).start()
    yield a
    a.stop()
    for bat in srv._batchers.values():
        bat.stop()


def _req(api, method, path, body=None):
    c = http.client.HTTPConnection("127.0.0.1", api.port, timeout=180)
    c.request(method, path,
              body=None if body is None else json.dumps(body),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, data


def _names(api):
    status, data = _req(api, "GET", "/v1/models")
    assert status == 200
    listing = json.loads(data)
    assert listing["object"] == "list"
    return [m["id"] for m in listing["data"]]


def test_models_listing(api):
    names = _names(api)
    assert len(names) == 2


def test_completions_greedy_and_topk1(api):
    name = _names(api)[0]
    # OpenAI semantics: temperature defaults to 1.0 (sampled); greedy
    # is explicit temperature=0
    body = {"model": name, "prompt": "hi", "max_tokens": 8,
            "temperature": 0}
    s1, d1 = _req(api, "POST", "/v1/completions", body)
    assert s1 == 200, d1
    r1 = json.loads(d1)
    assert r1["object"] == "text_completion"
    text = r1["choices"][0]["text"]
    assert isinstance(text, str) and len(text) >= 1
    assert r1["usage"]["completion_tokens"] >= 1
    # top_k=1 sampling is greedy-equivalent
    s2, d2 = _req(api, "POST", "/v1/completions",
                  body | {"temperature": 0.9, "top_k": 1, "seed": 3})
    assert json.loads(d2)["choices"][0]["text"] == text


def test_completions_batcher_routing(api):
    srv = api.server
    # both entries share a name; the id disambiguates (names resolve to
    # the first match)
    ragged_id = [m["id"] for m in srv.models.list_models()
                 if m["interfaces"]["text"].get("ragged")][0]
    before = len(srv._batchers)
    s, d = _req(api, "POST", "/v1/completions",
                {"model": str(ragged_id), "prompt": "hi", "max_tokens": 6,
                 "temperature": 0.8, "top_k": 1, "seed": 1})
    assert s == 200, d
    assert len(srv._batchers) == before + 1  # served by the batcher
    # and the greedy direct model gives the same top_k=1 text
    direct = _names(api)[0]
    _, dd = _req(api, "POST", "/v1/completions",
                 {"model": direct, "prompt": "hi", "max_tokens": 6,
                  "temperature": 0})
    assert json.loads(d)["choices"][0]["text"] == \
        json.loads(dd)["choices"][0]["text"]


def test_chat_completions_uses_template(api):
    from whisper_tensor_tpu.tokenizer import ByteTokenizer, apply_chat_template

    name = _names(api)[0]
    msgs = [{"role": "user", "content": "hello"}]
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": msgs, "max_tokens": 6,
                 "temperature": 0})
    assert s == 200, d
    r = json.loads(d)
    assert r["object"] == "chat.completion"
    out = r["choices"][0]["message"]["content"]
    rendered = apply_chat_template(ByteTokenizer(), msgs)
    _, d2 = _req(api, "POST", "/v1/completions",
                 {"model": name, "prompt": rendered, "max_tokens": 6,
                  "temperature": 0})
    assert out == json.loads(d2)["choices"][0]["text"]


def test_streaming_matches_nonstream(api):
    # the ragged model streams per token (by id: names collide)
    srv = api.server
    name = str([m["id"] for m in srv.models.list_models()
                if m["interfaces"]["text"].get("ragged")][0])
    body = {"model": name, "prompt": "ab", "max_tokens": 8,
            "temperature": 0}
    _, d = _req(api, "POST", "/v1/completions", body)
    want = json.loads(d)["choices"][0]["text"]

    s, raw = _req(api, "POST", "/v1/completions", body | {"stream": True})
    assert s == 200
    events = [ln[len(b"data: "):] for ln in raw.split(b"\n")
              if ln.startswith(b"data: ")]
    assert events[-1] == b"[DONE]"
    pieces, finish = [], None
    for ev in events[:-1]:
        obj = json.loads(ev)
        ch = obj["choices"][0]
        if ch.get("finish_reason"):
            finish = ch["finish_reason"]
        pieces.append(ch.get("text", ""))
    assert "".join(pieces) == want
    assert finish in ("stop", "length")


def test_constrained_response_format(api):
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "x", "max_tokens": 12,
                 "regex": r"ab{1,4}c"})
    assert s == 200, d
    assert re.fullmatch(r"ab{1,4}c", json.loads(d)["choices"][0]["text"])

    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name,
                 "messages": [{"role": "user", "content": "count"}],
                 "max_tokens": 12,
                 "response_format": {
                     "type": "json_schema",
                     "json_schema": {"schema": {"type": "integer"}}}})
    assert s == 200, d
    int(json.loads(d)["choices"][0]["message"]["content"])


def test_logprobs(api):
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 6,
                 "temperature": 0, "logprobs": 2})
    assert s == 200, d
    ch = json.loads(d)["choices"][0]
    lp = ch["logprobs"]
    assert "".join(lp["tokens"]) == ch["text"]
    assert len(lp["token_logprobs"]) == len(lp["tokens"])
    assert all(v <= 0 for v in lp["token_logprobs"])
    assert lp["text_offset"][0] == 0
    for i, (tok_lp, top) in enumerate(zip(lp["token_logprobs"],
                                          lp["top_logprobs"])):
        assert len(top) <= 2
        # greedy: the chosen token IS the argmax, so its logprob equals
        # the best alternative's
        assert abs(tok_lp - max(top.values())) < 1e-4

    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name,
                 "messages": [{"role": "user", "content": "hey"}],
                 "max_tokens": 4, "temperature": 0,
                 "logprobs": True, "top_logprobs": 3})
    assert s == 200, d
    ch = json.loads(d)["choices"][0]
    content = ch["logprobs"]["content"]
    assert "".join(r["token"] for r in content) == ch["message"]["content"]
    for r in content:
        assert len(r["top_logprobs"]) == 3
        assert bytes(r["bytes"]).decode() == r["token"]

    # logprobs=0 is a VALID request (chosen token only, no
    # alternatives) — 0 must not be eaten by a falsy check; and stop
    # trimming happens at token level so the table still aligns
    full = json.loads(d)["choices"][0]["message"]["content"]
    if len(full) >= 2:
        s, d = _req(api, "POST", "/v1/completions",
                    {"model": name, "prompt": "hi", "max_tokens": 6,
                     "temperature": 0, "logprobs": 0, "stop": full[1]})
        ch = json.loads(d)["choices"][0]
        assert ch["logprobs"] is not None
        assert ch["logprobs"]["top_logprobs"] is None
        if ch["logprobs"]["tokens"]:
            assert "".join(ch["logprobs"]["tokens"]) == ch["text"]

    # chat logprobs=true with no top_logprobs still returns the table
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name,
                 "messages": [{"role": "user", "content": "x"}],
                 "max_tokens": 3, "temperature": 0, "logprobs": True})
    ch = json.loads(d)["choices"][0]
    assert ch["logprobs"] is not None
    assert all(r["top_logprobs"] == [] for r in ch["logprobs"]["content"])


def test_echo_scoring(api):
    """echo + max_tokens=0 is the pure sequence-scoring mode eval
    harnesses (lm-eval) drive through /v1/completions."""
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hello", "max_tokens": 0,
                 "temperature": 0, "echo": True, "logprobs": 0})
    assert s == 200, d
    ch = json.loads(d)["choices"][0]
    assert ch["text"] == "hello"
    lp = ch["logprobs"]
    assert "".join(lp["tokens"]) == "hello"
    assert lp["token_logprobs"][0] is None
    assert all(v <= 0 for v in lp["token_logprobs"][1:])
    assert ch["finish_reason"] == "length"

    # echo + generation: table covers prompt AND completion
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "ab", "max_tokens": 3,
                 "temperature": 0, "echo": True, "logprobs": 1})
    ch = json.loads(d)["choices"][0]
    assert ch["text"].startswith("ab")
    assert "".join(ch["logprobs"]["tokens"]) == ch["text"]


def test_n_multiple_choices(api):
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 6,
                 "temperature": 1.2, "seed": 7, "n": 3})
    assert s == 200, d
    r = json.loads(d)
    assert [c["index"] for c in r["choices"]] == [0, 1, 2]
    assert all(isinstance(c["text"], str) for c in r["choices"])
    assert r["usage"]["completion_tokens"] >= 3  # summed over choices

    # greedy n>1 is pointless and rejected
    s, _ = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 4,
                 "temperature": 0, "n": 2})
    assert s == 400

    # ragged models serve n>1 through the batcher (staggered seeds)
    srv = api.server
    ragged = str([m["id"] for m in srv.models.list_models()
                  if m["interfaces"]["text"].get("ragged")][0])
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": ragged,
                 "messages": [{"role": "user", "content": "go"}],
                 "max_tokens": 4, "temperature": 0.9, "n": 2})
    assert s == 200, d
    r = json.loads(d)
    assert len(r["choices"]) == 2
    assert all(c["message"]["role"] == "assistant" for c in r["choices"])


def test_tool_calling(api):
    """tools -> guided function calling: the token-DFA constrains the
    output to {"name":..., "arguments": <parameters schema>} and the
    response carries OpenAI-shaped tool_calls."""
    name = _names(api)[0]
    # enum-bounded args: an untrained tiny model under an open-ended
    # integer/string constraint can legally ramble digits to the token
    # cap (honest finish_reason "length"); enums terminate deterministically
    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {
                               "city": {"enum": ["oslo", "paris"]},
                               "days": {"enum": [1, 2]}},
                           "required": ["city", "days"]}}},
        {"type": "function", "function": {
            "name": "set_alarm",
            "parameters": {"type": "object",
                           "properties": {"hour": {"enum": [1, 2, 3]}},
                           "required": ["hour"]}}}]
    msgs = [{"role": "user", "content": "weather in oslo"}]
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": msgs, "max_tokens": 64,
                 "temperature": 0, "tools": tools,
                 "tool_choice": {"type": "function",
                                 "function": {"name": "set_alarm"}}})
    assert s == 200, d
    ch = json.loads(d)["choices"][0]
    assert ch["finish_reason"] == "tool_calls"
    call = ch["message"]["tool_calls"][0]
    assert call["type"] == "function"
    assert call["function"]["name"] == "set_alarm"
    args = json.loads(call["function"]["arguments"])
    assert isinstance(args["hour"], int)
    assert ch["message"]["content"] is None

    # multi-tool "required": the constrained output is one of the two
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": msgs, "max_tokens": 80,
                 "temperature": 0, "tools": tools,
                 "tool_choice": "required"})
    assert s == 200, d
    ch = json.loads(d)["choices"][0]
    fn = ch["message"]["tool_calls"][0]["function"]
    assert fn["name"] in ("get_weather", "set_alarm")
    json.loads(fn["arguments"])

    # tool_choice none: plain text answer, no constraint
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": msgs, "max_tokens": 6,
                 "temperature": 0, "tools": tools, "tool_choice": "none"})
    ch = json.loads(d)["choices"][0]
    assert "tool_calls" not in ch["message"]
    assert isinstance(ch["message"]["content"], str)

    # unknown forced tool -> 404
    s, _ = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": msgs, "tools": tools,
                 "tool_choice": {"type": "function",
                                 "function": {"name": "nope"}}})
    assert s == 404

    # an agentic follow-up turn: prior assistant tool_calls (content
    # null) + tool result messages render through the template
    follow = [
        {"role": "user", "content": "a"},
        {"role": "assistant", "content": None, "tool_calls": [
            {"id": "c1", "type": "function",
             "function": {"name": "f", "arguments": "{}"}}]},
        {"role": "tool", "tool_call_id": "c1", "content": "ok"}]
    s, d = _req(api, "POST", "/v1/chat/completions",
                {"model": name, "messages": follow, "max_tokens": 4,
                 "temperature": 0, "tools": tools,
                 "tool_choice": "none"})
    assert s == 200, d
    assert isinstance(
        json.loads(d)["choices"][0]["message"]["content"], str)


def test_embeddings(api):
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/embeddings",
                {"model": name, "input": ["hi", "hello there"]})
    assert s == 200, d
    r = json.loads(d)
    assert r["object"] == "list" and len(r["data"]) == 2
    v0 = np.asarray(r["data"][0]["embedding"])
    v1 = np.asarray(r["data"][1]["embedding"])
    assert v0.shape == (16,)          # n_embd of the tiny model
    np.testing.assert_allclose(np.linalg.norm(v0), 1.0, rtol=1e-6)
    assert r["usage"]["prompt_tokens"] == len("hi") + len("hello there")

    # a single string and the same string in a padded batch agree
    s, d = _req(api, "POST", "/v1/embeddings",
                {"model": name, "input": "hi"})
    alone = np.asarray(json.loads(d)["data"][0]["embedding"])
    np.testing.assert_allclose(alone, v0, atol=1e-5)

    # token-id input and mean pooling
    s, d = _req(api, "POST", "/v1/embeddings",
                {"model": name, "input": [104, 105], "pooling": "mean"})
    assert s == 200, d
    vm = np.asarray(json.loads(d)["data"][0]["embedding"])
    assert vm.shape == (16,) and not np.allclose(vm, alone)

    s, _ = _req(api, "POST", "/v1/embeddings",
                {"model": name, "input": []})
    assert s == 400


@pytest.fixture(scope="module")
def media_api(tmp_path_factory):
    """A server with image (SD pipeline), TTS (piper), and STT (tiny
    whisper) bundles for the media endpoints."""
    import json as _json

    import torch
    from safetensors.torch import save_file

    from tests.test_diffusers_loader import _write_sd_pipeline
    from tests.test_tts_loaders import _write_piper_voice
    from whisper_tensor_tpu.server.main import Server
    from whisper_tensor_tpu.server.openai_api import OpenAIApi

    root = tmp_path_factory.mktemp("oai_media")
    srv = Server()
    srv.models.run_loader("diffusers", {
        "path": _write_sd_pipeline(str(root)), "dtype": "f32"})
    srv.models.run_loader("piper", {"path": _write_piper_voice(str(root))})

    from transformers import WhisperConfig as HFCfg
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(7)
    wcfg = dict(d_model=32, encoder_layers=2, decoder_layers=2,
                encoder_attention_heads=4, decoder_attention_heads=4,
                encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=16,
                max_source_positions=100, max_target_positions=64,
                vocab_size=120)
    hf = WhisperForConditionalGeneration(HFCfg(
        **wcfg, dropout=0.0, attention_dropout=0.0, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=5))
    d = root / "tiny-whisper"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(
        {"model_type": "whisper", "decoder_start_token_id": 5,
         "eos_token_id": 2} | wcfg))
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items() if k != "proj_out.weight"},
              str(d / "model.safetensors"))
    # multilingual-style tokenizer (lang/task special tokens) + the
    # forced SOT prefix in generation_config, as real checkpoints carry
    from tokenizers import Tokenizer, models as tok_models

    t = Tokenizer(tok_models.WordLevel({"a": 0, "b": 1}, unk_token="a"))
    t.add_special_tokens(["<|en|>", "<|de|>", "<|transcribe|>",
                          "<|translate|>"])
    t.save(str(d / "tokenizer.json"))
    (d / "generation_config.json").write_text(_json.dumps({
        "decoder_start_token_id": 5, "eos_token_id": 2,
        "forced_decoder_ids": [[1, t.token_to_id("<|en|>")],
                               [2, t.token_to_id("<|transcribe|>")]]}))
    srv.models.run_loader("transformers", {"path": str(d), "dtype": "f32"})

    a = OpenAIApi(srv, "127.0.0.1", 0).start()
    yield a
    a.stop()


def test_images_generations(media_api):
    import base64

    from whisper_tensor_tpu.utils.image import png_to_array

    s, d = _req(media_api, "POST", "/v1/images/generations",
                {"prompt": "a tpu", "size": "128x128", "steps": 2,
                 "seed": 3, "n": 1})
    assert s == 200, d
    data = json.loads(d)["data"]
    assert len(data) == 1
    img = png_to_array(base64.b64decode(data[0]["b64_json"]))
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8

    s, d = _req(media_api, "POST", "/v1/images/generations",
                {"prompt": "x", "response_format": "url"})
    assert s == 400


def test_audio_speech(media_api):
    c = http.client.HTTPConnection("127.0.0.1", media_api.port, timeout=180)
    c.request("POST", "/v1/audio/speech",
              body=json.dumps({"input": "hi", "voice": "alloy"}),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    wav = r.read()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert int(r.getheader("X-Sample-Rate")) > 0
    c.close()

    s, d = _req(media_api, "POST", "/v1/audio/speech", {"input": ""})
    assert s == 400


def test_audio_transcriptions(media_api):
    from whisper_tensor_tpu.utils.audio import wav_bytes

    rng = np.random.default_rng(0)
    wav = wav_bytes(0.1 * rng.standard_normal(8000).astype(np.float32),
                    16000)
    boundary = "wtboundary42"
    body = (
        (f"--{boundary}\r\n"
         'Content-Disposition: form-data; name="response_format"\r\n\r\n'
         f"json\r\n--{boundary}\r\n"
         'Content-Disposition: form-data; name="max_new_tokens"\r\n\r\n'
         f"4\r\n--{boundary}\r\n"
         'Content-Disposition: form-data; name="file"; '
         'filename="a.wav"\r\nContent-Type: audio/wav\r\n\r\n').encode()
        + wav + f"\r\n--{boundary}--\r\n".encode())
    c = http.client.HTTPConnection("127.0.0.1", media_api.port, timeout=300)
    c.request("POST", "/v1/audio/transcriptions", body=body, headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    r = c.getresponse()
    d = r.read()
    c.close()
    assert r.status == 200, d
    out = json.loads(d)
    assert isinstance(out["text"], str)

    # JSON + audio_b64 extension path gives the same answer
    import base64

    s2, d2 = _req(media_api, "POST", "/v1/audio/transcriptions",
                  {"audio_b64": base64.b64encode(wav).decode(),
                   "max_new_tokens": 4})
    assert s2 == 200, d2
    assert json.loads(d2)["text"] == out["text"]

    # language substitution (whisper <|lang|> SOT token) and the
    # translations route (task forced to translate) run; an unknown
    # language token is a clean 400
    b64 = base64.b64encode(wav).decode()
    s3, d3 = _req(media_api, "POST", "/v1/audio/transcriptions",
                  {"audio_b64": b64, "max_new_tokens": 4,
                   "language": "de"})
    assert s3 == 200, d3
    s4, d4 = _req(media_api, "POST", "/v1/audio/translations",
                  {"audio_b64": b64, "max_new_tokens": 4})
    assert s4 == 200, d4
    s5, d5 = _req(media_api, "POST", "/v1/audio/transcriptions",
                  {"audio_b64": b64, "language": "xx"})
    assert s5 == 400, d5
    assert "tokenizer" in json.loads(d5)["error"]["message"]


def test_whisper_forced_sot_from_generation_config(media_api):
    """The loader reads generation_config.json's forced_decoder_ids
    into the stt spec, and from_bundle drives the multi-token SOT."""
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface

    srv = media_api.server
    entry = next(e for e in srv.models._models.values()
                 if "stt" in (e.interfaces or {}))
    spec = entry.interfaces["stt"]
    assert spec["sot"] == 5 and len(spec["sot_sequence"]) == 3
    assert spec["sot_sequence"][0] == 5
    bundle = srv.models.bundle(int(entry.meta["bundle_id"]))
    iface = SpeechToTextInterface.from_bundle(bundle)
    assert iface.sot_sequence == spec["sot_sequence"]
    # substitution replaces positions 1/2, keeps the rest
    sub = iface.sot_with(language="de", task="translate")
    assert sub[0] == 5 and sub != iface.sot_sequence
    with pytest.raises(ValueError):
        iface.sot_with(language="zz")


def test_logit_bias(api):
    """logit_bias rides the compiled decode as a (V,) argument: +100
    forces a token, -100 bans the natural greedy choice; ragged models
    route to the direct path so bias still applies."""
    from whisper_tensor_tpu.tokenizer import ByteTokenizer

    name = _names(api)[0]
    base = {"model": name, "prompt": "hi", "max_tokens": 5,
            "temperature": 0}
    _, d0 = _req(api, "POST", "/v1/completions", base)
    plain = json.loads(d0)["choices"][0]["text"]

    tok = ByteTokenizer()
    star = tok.encode("*")[0]
    s, d = _req(api, "POST", "/v1/completions",
                base | {"logit_bias": {str(star): 100}})
    assert s == 200, d
    assert json.loads(d)["choices"][0]["text"] == "*****"

    # relative biases order correctly (+100 beats +50)
    plus = tok.encode("+")[0]
    s, d = _req(api, "POST", "/v1/completions",
                base | {"logit_bias": {str(star): 50, str(plus): 100}})
    assert json.loads(d)["choices"][0]["text"] == "+++++"
    assert isinstance(plain, str)

    # ragged model: bias routes through the direct path
    srv = api.server
    ragged = str([m["id"] for m in srv.models.list_models()
                  if m["interfaces"]["text"].get("ragged")][0])
    s, d = _req(api, "POST", "/v1/completions",
                {"model": ragged, "prompt": "hi", "max_tokens": 4,
                 "temperature": 0, "logit_bias": {str(star): 100}})
    assert s == 200, d
    assert json.loads(d)["choices"][0]["text"] == "****"

    s, _ = _req(api, "POST", "/v1/completions",
                base | {"logit_bias": {"999999": 5}})
    assert s == 400            # out of vocab range


def test_best_of_reranking(api):
    """best_of > n: candidates rerank by mean token logprob (one
    in-graph scoring prefill) and the top n return."""
    name = _names(api)[0]
    s, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 6,
                 "temperature": 1.3, "seed": 5, "n": 2, "best_of": 6})
    assert s == 200, d
    r = json.loads(d)
    assert len(r["choices"]) == 2

    # the returned pair must be the top-2 of the SAME 6 candidates by
    # the same scoring rule: reproduce with best_of == n == 6
    s, d6 = _req(api, "POST", "/v1/completions",
                 {"model": name, "prompt": "hi", "max_tokens": 6,
                  "temperature": 1.3, "seed": 5, "n": 6, "best_of": 6})
    all6 = {c["text"] for c in json.loads(d6)["choices"]}
    assert {c["text"] for c in r["choices"]} <= all6

    s, _ = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 4,
                 "temperature": 1.0, "n": 3, "best_of": 2})
    assert s == 400            # best_of < n


def test_metrics_endpoint(api):
    """Prometheus text exposition: registry gauge always present;
    per-batcher counters appear once the ragged model has served."""
    srv = api.server
    ragged = str([m["id"] for m in srv.models.list_models()
                  if m["interfaces"]["text"].get("ragged")][0])
    _req(api, "POST", "/v1/completions",
         {"model": ragged, "prompt": "m", "max_tokens": 3,
          "temperature": 0})
    s, d = _req(api, "GET", "/metrics")
    assert s == 200
    text = d.decode()
    assert "wt_models_loaded 2" in text
    assert "# TYPE wt_batcher_tokens_emitted_total counter" in text
    tok_lines = [ln for ln in text.splitlines()
                 if ln.startswith("wt_batcher_tokens_emitted_total{")]
    assert tok_lines and all(float(ln.split()[-1]) >= 3
                             for ln in tok_lines)


def test_stop_sequences_and_errors(api):
    name = _names(api)[0]
    _, d = _req(api, "POST", "/v1/completions",
                {"model": name, "prompt": "hi", "max_tokens": 8,
                 "temperature": 0})
    full = json.loads(d)["choices"][0]["text"]
    if len(full) >= 2:
        stop = full[1]
        _, d2 = _req(api, "POST", "/v1/completions",
                     {"model": name, "prompt": "hi", "max_tokens": 8,
                      "temperature": 0, "stop": stop})
        r2 = json.loads(d2)
        assert r2["choices"][0]["text"] == full[:full.find(stop)]
        assert r2["choices"][0]["finish_reason"] == "stop"

    s, d = _req(api, "POST", "/v1/completions",
                {"model": "nope", "prompt": "hi"})
    assert s == 404
    assert json.loads(d)["error"]["type"] == "not_found_error"

    s, _ = _req(api, "POST", "/v1/nothing", {})
    assert s == 404


def test_eos_wiring_through_loader_and_batcher(tmp_path):
    """EOS from generation_config.json must flow loader -> server ->
    batcher: responses stop at EOS with finish_reason 'stop', the SSE
    delta stream never emits the eos token's text, and best_of never
    ranks a zero-token completion first (the r3 review findings)."""
    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.server.main import Server
    from whisper_tensor_tpu.server.openai_api import OpenAIApi
    from whisper_tensor_tpu.tokenizer import ByteTokenizer

    torch.manual_seed(23)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=16,
                                  vocab_size=300, n_positions=256))
    d = tmp_path / "tiny-gpt2-eos"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 16,
        "vocab_size": 300, "n_positions": 256}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    # find what greedy decode emits, declare the 4th token as eos
    probe = Server()
    entry, = probe.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 256})
    tok = ByteTokenizer()
    ids = np.asarray(tok.encode("hi"), np.int64)[None]
    ref = [int(t) for t in
           probe._text_iface(entry).generate_tokens(ids, 12)[0]]
    eos = ref[3]

    (d / "generation_config.json").write_text(json.dumps(
        {"eos_token_id": [eos, 299]}))
    srv = Server()
    srv.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 256,
        "ragged_decode": True})
    api2 = OpenAIApi(srv, "127.0.0.1", 0).start()
    try:
        name = _names(api2)[0]
        body = {"model": name, "prompt": "hi", "max_tokens": 12,
                "temperature": 0}
        s, data = _req(api2, "POST", "/v1/completions", body)
        r = json.loads(data)
        ch = r["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert r["usage"]["completion_tokens"] == 3
        assert ch["text"] == tok.decode(ref[:3])

        s, data = _req(api2, "POST", "/v1/completions",
                       body | {"stream": True})
        assert s == 200
        text = "".join(
            json.loads(line[6:])["choices"][0].get("text", "")
            for line in data.decode().splitlines()
            if line.startswith("data: ") and line != "data: [DONE]")
        assert text == tok.decode(ref[:3])

        s, data = _req(api2, "POST", "/v1/completions",
                       body | {"temperature": 0.9, "seed": 5,
                               "n": 1, "best_of": 3})
        assert s == 200
        assert json.loads(data)["choices"][0]["finish_reason"] \
            in ("stop", "length")
    finally:
        api2.stop()
        for bat in srv._batchers.values():
            bat.stop()
