"""RWKV-7 recipe tests: state-recurrence invariants, oracle/XLA parity,
loader path with a synthetic .pth. (No public RWKV-7 reference impl is
installed, so correctness is established by recurrence invariants +
cross-backend agreement; the vendored 0.1B .pth in the reference repo is
a git-LFS stub.)"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.rwkv7 import (
    Rwkv7Config, build_rwkv7_step, random_rwkv7_weights, rwkv7_config_from_sd)
from whisper_tensor_tpu.interfaces.rnn_text import RnnTextInterface
from whisper_tensor_tpu.model import Model

CFG = Rwkv7Config(n_layer=2, n_embd=32, n_head=4, vocab_size=77,
                  lora_w=8, lora_a=8, lora_v=8, lora_g=8)


@pytest.fixture(scope="module")
def rwkv():
    sd = random_rwkv7_weights(CFG)
    data = build_rwkv7_step(lambda n: sd[n], CFG)
    return Model.new_from_onnx(data, name="tiny-rwkv7"), sd


def _fresh_feeds(model, tok):
    feeds = {"token": np.asarray([tok], dtype=np.int64)}
    for i in range(CFG.n_layer):
        feeds[f"tmix_x_{i}"] = np.zeros((1, CFG.n_embd), np.float32)
        feeds[f"cmix_x_{i}"] = np.zeros((1, CFG.n_embd), np.float32)
        D = CFG.n_embd // CFG.n_head
        feeds[f"vk_state_{i}"] = np.zeros((1, CFG.n_head, D, D), np.float32)
    return feeds


def _step(model, feeds):
    out = model.eval(feeds)
    nxt = dict(feeds)
    for k, v in out.items():
        if k.startswith("new_"):
            nxt[k[4:]] = v
    return out["logits"], nxt


def test_state_carries_information(rwkv):
    model, _ = rwkv
    # same current token, different histories -> different logits
    l_a, st = _step(model, _fresh_feeds(model, 5))
    l_b, _ = _step(model, {**st, "token": np.asarray([9], dtype=np.int64)})
    l_fresh, _ = _step(model, _fresh_feeds(model, 9))
    assert np.abs(l_b - l_fresh).max() > 1e-5
    assert np.isfinite(l_b).all()


def test_determinism_and_state_shapes(rwkv):
    model, _ = rwkv
    f = _fresh_feeds(model, 3)
    l1, st1 = _step(model, f)
    l2, st2 = _step(model, f)
    np.testing.assert_array_equal(l1, l2)
    D = CFG.n_embd // CFG.n_head
    assert st1["vk_state_0"].shape == (1, CFG.n_head, D, D)
    assert np.abs(st1["vk_state_0"]).max() > 0  # state actually updated


def test_decay_bounds_state(rwkv):
    """The decay recurrence must keep the state bounded over many steps
    with repeated input (linear-recurrence stability)."""
    model, _ = rwkv
    f = _fresh_feeds(model, 7)
    norms = []
    for _ in range(32):
        _, f2 = _step(model, f)
        f = {**f2, "token": np.asarray([7], dtype=np.int64)}
        norms.append(float(np.abs(f["vk_state_0"]).max()))
    assert np.isfinite(norms).all()
    assert norms[-1] < 10 * (max(norms[:8]) + 1e-3)


def test_rnn_interface_scan_matches_stepwise(rwkv):
    model, _ = rwkv
    iface = RnnTextInterface(model)
    prompt = np.asarray([[3, 1, 4, 1, 5]], dtype=np.int64)
    toks = iface.generate_tokens(prompt, 6)[0]
    # manual stepwise oracle decode
    f = _fresh_feeds(model, 0)
    for t in prompt[0]:
        f["token"] = np.asarray([t], dtype=np.int64)
        logits, f = _step(model, f)
    manual = []
    cur = int(np.argmax(logits))
    for _ in range(6):
        manual.append(cur)
        f["token"] = np.asarray([cur], dtype=np.int64)
        logits, f = _step(model, f)
        cur = int(np.argmax(logits))
    np.testing.assert_array_equal(toks, manual)


def test_pth_loader_path(tmp_path):
    import torch

    from whisper_tensor_tpu.importers.loaders import identify_and_load

    sd = random_rwkv7_weights(CFG)
    p = str(tmp_path / "RWKV-x070-tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, p)
    bundle = identify_and_load(p)
    assert bundle.meta["architecture"] == "rwkv7"
    (name, model), = bundle.models.items()
    cfg2 = rwkv7_config_from_sd(sd)
    assert cfg2.n_layer == CFG.n_layer and cfg2.n_head == CFG.n_head
    iface = RnnTextInterface(model)
    toks = iface.generate_tokens(np.asarray([[1, 2]], dtype=np.int64), 3)
    assert toks.shape == (1, 3)


def test_rwkv_served_over_ws_and_openai(tmp_path):
    """RWKV serves through the server paths (reference's LLM explorer
    ran RWKV models): WS generate_text routes to the compiled RNN
    scan, and /v1/completions answers greedy text."""
    import http.client
    import json
    import torch

    from whisper_tensor_tpu.server.main import Server
    from whisper_tensor_tpu.server.openai_api import OpenAIApi

    sd = random_rwkv7_weights(CFG)
    p = str(tmp_path / "RWKV-x070-srv.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, p)
    srv = Server()
    entries = srv.models.run_loader("rwkv7", {"path": p})
    entry = entries[0]

    # WS handler path: direct job execution through the scheduler
    iface = srv._rnn_iface(entry)
    ref = iface.generate_tokens(
        np.asarray([[104, 105]], np.int64), 5)[0]

    api = OpenAIApi(srv, "127.0.0.1", 0).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", api.port,
                                       timeout=300)
        c.request("POST", "/v1/completions", body=json.dumps(
            {"prompt": "hi", "max_tokens": 5, "temperature": 0}),
            headers={"Content-Type": "application/json"})
        r = c.getresponse()
        out = json.loads(r.read())
        c.close()
        assert r.status == 200, out
        # byte tokenizer: "hi" -> [104+3? no: ByteTokenizer is b+3] —
        # just pin against the interface run with the same encoding
        from whisper_tensor_tpu.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        ids = np.asarray(tok.encode("hi"), np.int64)
        want = tok.decode([int(t) for t in iface.generate_tokens(
            ids[None], 5)[0]])
        assert out["choices"][0]["text"] == want

        # sampling is honestly rejected
        c = http.client.HTTPConnection("127.0.0.1", api.port,
                                       timeout=60)
        c.request("POST", "/v1/completions", body=json.dumps(
            {"prompt": "hi", "max_tokens": 5, "temperature": 0.8}),
            headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 400
        r.read()
        c.close()
    finally:
        api.stop()
    assert ref.shape == (5,)
