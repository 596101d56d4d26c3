"""WebUI end-to-end drive: boot the WS server with a tiny GPT-2, then
exercise server/webui.html in a real browser.

The image has no JS engine (no node/bun, no chromium, no
playwright/dukpy), so this can't run inside pytest here — it is the
REPLAYABLE half of the round-5 E2E evidence: run `--serve`, point any
browser at the printed URL, and run the checks in `CHECKS` (each is a
JS expression expected truthy after the listed interaction). The
recorded pass of this drive (harness WebView, real DOM) lives in
docs/webui_e2e.md; tests/test_webui.py keeps the JS-contract tests
that DO run in CI.

Reference bar: crates/whisper-tensor-ui graph explorer interaction
depth (graph_layout.rs nested layered layout, inspect_windows.rs).
"""

import asyncio
import json
import socket
import sys
import tempfile
import threading
import time
from pathlib import Path

# Interaction script: (step label, action-kind, payload). Actions:
#   eval: JS expression that must be truthy
#   click: CSS selector to click
#   type: [selector, text] focus + set value + input event
CHECKS = [
    ("page renders: title + tab bar",
     "eval", "document.title.length > 0 && !!document.getElementById('models')"),
    ("loader form populated from list_loaders",
     "eval", "document.getElementById('loader').options.length >= 5"),
    ("model list shows the preloaded tiny gpt2",
     "eval", "document.getElementById('models').textContent.includes('gpt2')"),
    ("op explorer renders symbolic ops",
     "eval", "document.getElementById('ops').children.length > 10"),
    ("click an op row -> detail pane fills",
     "click", "#ops tr, #ops li, #ops div"),
    ("op detail non-empty after click",
     "eval", "document.getElementById('op_detail').textContent.length > 5"),
    ("milli lowering view reachable",
     "eval", "!!document.getElementById('milli_view')"),
    ("generate round trip: type a prompt",
     "type", ["#prompt", "hello"]),
    ("generation produces output text",
     "eval", "document.getElementById('gen_out').textContent.length > 0"),
]


def build_tiny_gpt2(d: Path) -> Path:
    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(23)
    hf = GPT2LMHeadModel(HFConfig(n_layer=2, n_head=2, n_embd=32,
                                  vocab_size=300, n_positions=256))
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps({
        "model_type": "gpt2", "n_layer": 2, "n_head": 2, "n_embd": 32,
        "vocab_size": 300, "n_positions": 256}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))
    return d


def main():
    # CPU-only drive: never grab the (single, shared) axon TPU tunnel.
    # The env var is ignored under the axon sitecustomize; the config
    # update is the one that sticks.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.server.main import Server

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    ckpt = build_tiny_gpt2(Path(tempfile.mkdtemp()) / "tiny-gpt2")
    srv = Server()
    srv.models.run_loader("transformers", {
        "path": str(ckpt), "dtype": "f32", "max_len": 256})

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run("127.0.0.1", port))
        except RuntimeError:
            pass

    threading.Thread(target=run, daemon=True).start()
    time.sleep(0.5)
    print(f"URL=http://127.0.0.1:{port}/", flush=True)
    print(f"checks: {len(CHECKS)} (see CHECKS)", file=sys.stderr)
    while True:
        time.sleep(60)


if __name__ == "__main__":
    main()
