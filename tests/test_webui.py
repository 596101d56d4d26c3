"""WebUI regression checks (VERDICT r3 item 9).

No JS engine ships in this image (no node/chromium), so these are
STATIC contracts that catch the regressions that matter:

1. JS structural syntax: a tokenizer aware of strings, template
   literals (incl. nested ${}), comments, and regex literals verifies
   every (), {}, [] balances — catches the "syntax error ships
   silently" failure mode.
2. Protocol contract, JS -> server: every message `type` the UI sends
   is dispatched by server/main.py.
3. Protocol contract, server -> JS: every report type the UI's
   onmessage switch handles is actually emitted somewhere server-side.
4. DOM contract: every $("id")/getElementById lookup resolves to an
   element id present in the HTML.

Plus one LIVE round trip: the page is fetched over plain HTTP from the
running WebSocket server (the serving path the browser hits).
"""

from __future__ import annotations

import os
import re

import pytest

_UI = os.path.join(os.path.dirname(__file__), "..", "whisper_tensor_tpu",
                   "server", "webui.html")


def _html():
    with open(_UI, "r", encoding="utf-8") as f:
        return f.read()


def _scripts(html: str):
    return re.findall(r"<script[^>]*>(.*?)</script>", html, re.S)


def _strip_js(js: str) -> str:
    """Remove comments / strings / template literals, preserving the
    brackets of ${...} interpolations."""
    out = []
    i, n = 0, len(js)
    while i < n:
        c = js[i]
        if c == "/" and i + 1 < n and js[i + 1] == "/":
            j = js.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and js[i + 1] == "*":
            j = js.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c in "'\"":
            q = c
            i += 1
            while i < n and js[i] != q:
                i += 2 if js[i] == "\\" else 1
            i += 1
            continue
        if c == "/":
            # regex literal iff the previous significant token cannot
            # end an expression (heuristic that covers this file)
            k = len(out) - 1
            while k >= 0 and out[k] in " \t\n":
                k -= 1
            prev = out[k] if k >= 0 else ""
            if prev in "(,=:[!&|?{;" or prev == "":
                i += 1
                in_class = False
                while i < n:
                    if js[i] == "\\":
                        i += 2
                        continue
                    if js[i] == "[":
                        in_class = True
                    elif js[i] == "]":
                        in_class = False
                    elif js[i] == "/" and not in_class:
                        break
                    i += 1
                i += 1
                while i < n and js[i].isalpha():   # flags
                    i += 1
                continue
        if c == "`":
            i += 1
            while i < n and js[i] != "`":
                if js[i] == "\\":
                    i += 2
                    continue
                if js[i] == "$" and i + 1 < n and js[i + 1] == "{":
                    depth = 1
                    out.append("{")
                    i += 2
                    while i < n and depth:
                        if js[i] == "{":
                            depth += 1
                            out.append("{")
                        elif js[i] == "}":
                            depth -= 1
                            out.append("}")
                        elif js[i] in "'\"":
                            q2 = js[i]
                            i += 1
                            while i < n and js[i] != q2:
                                i += 2 if js[i] == "\\" else 1
                        i += 1
                    continue
                i += 1
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def test_webui_js_brackets_balance():
    html = _html()
    scripts = _scripts(html)
    assert scripts, "webui.html lost its <script> body"
    js = "\n".join(scripts)
    stripped = _strip_js(js)
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    line = 1
    for ch in stripped:
        if ch == "\n":
            line += 1
        elif ch in "([{":
            stack.append((ch, line))
        elif ch in ")]}":
            assert stack, f"unmatched {ch!r} at line ~{line}"
            top, tline = stack.pop()
            assert top == pairs[ch], \
                f"bracket mismatch: {top!r} (line {tline}) closed by " \
                f"{ch!r} (line {line})"
    assert not stack, f"unclosed {stack[-3:]}"


def _sent_types(js: str):
    return set(re.findall(r"""type\s*:\s*['"]([a-z_]+)['"]""", js))


def _server_dispatch():
    main_p = os.path.join(os.path.dirname(_UI), "main.py")
    proto_p = os.path.join(os.path.dirname(_UI), "protocol.py")
    with open(main_p, "r", encoding="utf-8") as f:
        main = f.read()
    with open(proto_p, "r", encoding="utf-8") as f:
        proto = f.read()
    consts = dict(re.findall(r"""^([A-Z_]+)\s*=\s*['"]([a-z_]+)['"]""",
                             proto, re.M))
    accepted = set(re.findall(r"""if t == ['"]([a-z_]+)['"]""", main))
    for name in re.findall(r"if t == P\.([A-Z_]+)", main):
        if name in consts:
            accepted.add(consts[name])
    return main, proto, consts, accepted


def test_webui_sends_only_dispatched_types():
    js = "\n".join(_scripts(_html()))
    _, _, _, accepted = _server_dispatch()
    sent = _sent_types(js)
    unknown = sorted(sent - accepted)
    assert not unknown, f"UI sends message types the server drops: " \
        f"{unknown} (accepted: {sorted(accepted)})"


def test_webui_handles_emitted_report_types():
    js = "\n".join(_scripts(_html()))
    # only the onmessage dispatcher's `m.type === "..."` comparisons
    # (field-descriptor `f.type` checks in the loader form are config
    # schema types, not protocol messages)
    handled = set(re.findall(
        r"""\bm\.type\s*===?\s*['"]([a-z_]+)['"]""", js))
    handled |= set(re.findall(r"""case\s*['"]([a-z_]+)['"]""", js))
    assert handled, "UI handles no report types?"
    main, proto, consts, _ = _server_dispatch()
    emitted = set(re.findall(r"""['"]type['"]\s*:\s*['"]([a-z_]+)['"]""",
                             main + proto))
    emitted |= set(re.findall(r"""type=['"]([a-z_]+)['"]""", main + proto))
    emitted |= set(consts.values())
    missing = sorted(handled - emitted)
    assert not missing, \
        f"UI switches on report types the server never emits: {missing}"


def test_webui_dom_ids_resolve():
    html = _html()
    js = "\n".join(_scripts(html))
    ids = set(re.findall(r"""id=["']([\w-]+)["']""", html))
    looked = set(re.findall(r"""\$\(["']([\w-]+)["']\)""", js))
    looked |= set(re.findall(
        r"""getElementById\(["']([\w-]+)["']\)""", js))
    missing = sorted(looked - ids)
    assert not missing, f"JS looks up ids absent from the DOM: {missing}"


def test_webui_served_over_http():
    """Live round trip: the WS server serves the page on plain HTTP."""
    import asyncio
    import socket
    import threading
    import time
    import urllib.request

    from whisper_tensor_tpu.server.main import Server

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = Server()
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run("127.0.0.1", port))
        except RuntimeError:
            pass

    threading.Thread(target=run, daemon=True).start()
    time.sleep(0.5)
    body = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=30).read().decode()
    assert "<script" in body and "explorer" in body
    loop.call_soon_threadsafe(loop.stop)


# ---------------------------------------------------------------------------
# LIVE field contract (round 5): the strongest E2E this image allows.
# No JS engine exists anywhere here (no node/bun/chromium — even the
# harness WebView has no backend), so the UI's JS cannot EXECUTE in CI.
# What breaks a rendered page in practice is a field the JS reads that
# the server stopped sending; this test drives the REAL server through
# the UI's own bootstrap message sequence and asserts every field each
# handle() branch destructures is present in the captured live
# messages, with the structure the render functions index into
# (webui.html:179-273, 302-353, 438-446). scripts/webui_e2e.py holds
# the replayable in-browser drive for environments that have one.
# ---------------------------------------------------------------------------

def _tiny_gpt2_dir(tmp_path):
    import json as _json

    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(7)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=32,
                                  vocab_size=300, n_positions=64))
    d = tmp_path / "tiny-gpt2"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 32,
        "vocab_size": 300, "n_positions": 64}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))
    return d


def test_webui_live_field_contract(tmp_path):
    import asyncio
    import socket
    import threading
    import time

    from tests.test_server_cli import _WSClient
    from whisper_tensor_tpu.server.main import Server

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = Server()
    srv.models.run_loader("transformers", {
        "path": str(_tiny_gpt2_dir(tmp_path)), "dtype": "f32",
        "max_len": 64})
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run("127.0.0.1", port))
        except RuntimeError:
            pass

    threading.Thread(target=run, daemon=True).start()
    time.sleep(0.5)
    c = _WSClient("127.0.0.1", port)

    def ask(msg, want_type):
        c.send(msg)
        for _ in range(200):
            m = c.recv()
            if m["type"] == want_type:
                return m
        raise AssertionError(f"no {want_type} reply to {msg}")

    try:
        # renderLoaderForm: loaders[name].config[].{name,type,default?}
        m = ask({"type": "list_loaders"}, "loaders_report")
        assert len(m["loaders"]) >= 5
        for name, spec in m["loaders"].items():
            for f in spec["config"]:
                assert "name" in f and "type" in f, (name, f)

        # models_report branch: models[].{name,id,n_ops,weight_bytes,
        # interfaces}; draft dropdown filters on interfaces.text
        m = ask({"type": "list_models"}, "models_report")
        assert m["models"], "preloaded model missing"
        e = m["models"][0]
        for k in ("name", "id", "n_ops", "weight_bytes", "interfaces"):
            assert k in e, k
        assert "text" in e["interfaces"]
        mid = e["id"]

        # setGraph/renderOps/selectOp/tensorHtml: graph.name, ops[].{id,
        # op_type,name,properties,inputs,outputs}, tensors{id:{name,
        # kind,dtype}}
        m = ask({"type": "get_model_graph", "model_id": mid},
                "model_graph")
        g = m["graph"]
        assert g["name"] and len(g["ops"]) > 10
        op = g["ops"][0]
        for k in ("id", "op_type", "name", "properties", "inputs",
                  "outputs"):
            assert k in op, k
        some_tid = next(str(t) for o in g["ops"] for t in o["inputs"]
                        if t is not None)
        t = g["tensors"][some_tid]
        for k in ("name", "kind", "dtype"):
            assert k in t, k

        # renderMilli: nodes[].{kind,params,inputs,outputs}
        m = ask({"type": "get_op_milli", "model_id": mid,
                 "op_id": g["ops"][len(g["ops"]) // 2]["id"]}, "op_milli")
        assert m["nodes"], "lowering returned no milli nodes"
        n = m["nodes"][0]
        for k in ("kind", "params", "inputs", "outputs"):
            assert k in n, k

        # inspectStored -> get_tensor_slice -> renderSlice(m): find an
        # initializer tensor name in the graph
        init_name = next(t["name"] for t in g["tensors"].values()
                         if t["kind"] == "initializer")
        m = ask({"type": "get_tensor_slice", "model_id": mid,
                 "name": init_name, "fix": [], "roff": 0, "coff": 0},
                "tensor_slice")
        # renderSlice reads: name/shape/fix/free_axes/values (2-D)/
        # row_off/col_off/slice_shape/dtype/stats.{min,max,mean,std,nan}
        for k in ("name", "shape", "fix", "free_axes", "values",
                  "row_off", "col_off", "slice_shape", "dtype", "stats"):
            assert k in m, k
        assert m["values"] and isinstance(m["values"][0], list)
        for k in ("min", "max", "mean", "std", "nan"):
            assert k in m["stats"], k

        # generate_text job: job_accepted{job} then job_result{job,
        # result.tokens[].{p,text,id}} (with_probs drives the colored
        # transcript render)
        c.send({"type": "generate_text", "model_id": mid,
                "prompt": "ab", "max_new_tokens": 3,
                "with_probs": True, "tensor_subscriptions": []})
        got_acc = got_res = None
        for _ in range(400):
            m = c.recv()
            if m["type"] == "job_accepted":
                got_acc = m
            elif m["type"] == "job_result":
                got_res = m
                break
            elif m["type"] == "job_error":
                raise AssertionError(m)
        assert got_acc and "job" in got_acc
        assert got_res and got_res["job"] == got_acc["job"]
        toks = got_res["result"]["tokens"]
        assert len(toks) == 3
        for tk in toks:
            for k in ("p", "text", "id"):
                assert k in tk, k

        # batcher_stats branch (no ragged model loaded -> stats null,
        # the JS renders the "load with ragged_decode" hint)
        m = ask({"type": "get_batcher_stats", "model_id": mid},
                "batcher_stats")
        assert "stats" in m
    finally:
        c.close()
        loop.call_soon_threadsafe(loop.stop)
