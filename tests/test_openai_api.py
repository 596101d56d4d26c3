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
                                  vocab_size=300, n_positions=64))
    d = tmp_path_factory.mktemp("oai") / "tiny-gpt2"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 16,
        "vocab_size": 300, "n_positions": 64}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    srv = Server()
    # one direct model and one ragged (batcher-served) model
    srv.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 64})
    srv.models.run_loader("transformers", {
        "path": str(d), "dtype": "f32", "max_len": 64,
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
