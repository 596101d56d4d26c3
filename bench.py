#!/usr/bin/env python
"""Headline benchmark: GPT-2 (124M) Super-Graph-style batched greedy
decode, tokens/sec on one TPU chip.

Baseline target (driver BASELINE.json): >= 5,000 tokens/sec/chip on
v5e. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Configuration via env:
  WT_BENCH_BATCH   (default 32)
  WT_BENCH_NEW     (default 128 generated tokens)
  WT_BENCH_MAXLEN  (default 512 KV-cache slots)
  WT_BENCH_SMALL=1 tiny model for smoke runs
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TOK_S = 5000.0


def main() -> None:
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    B = int(os.environ.get("WT_BENCH_BATCH", "32"))
    n_new = int(os.environ.get("WT_BENCH_NEW", "128"))
    max_len = int(os.environ.get("WT_BENCH_MAXLEN", "512"))
    small = os.environ.get("WT_BENCH_SMALL") == "1"

    if small:
        cfg = GPT2Config(n_layer=2, n_head=2, n_embd=64, vocab_size=503,
                         n_positions=max_len)
    else:
        cfg = GPT2Config(n_layer=12, n_head=12, n_embd=768, vocab_size=50257,
                         n_positions=1024)

    t0 = time.time()
    onnx_bytes = build_gpt2_step(random_gpt2_weights(cfg), cfg,
                                 max_len=max_len, dtype=DType.BF16)
    model = Model.new_from_onnx(onnx_bytes, name="gpt2-124M")
    iface = TextInferenceInterface(model, max_len=max_len,
                                   cache_dtype=DType.BF16,
                                   prompt_buckets=(16, 32, 64, 128, 256))
    t1 = time.time()
    print(f"# build+ingest: {t1 - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (B, 16)).astype(np.int64)

    # warmup (compiles prefill+decode program)
    toks = iface.generate_tokens(prompt, n_new)
    t2 = time.time()
    print(f"# compile+warmup: {t2 - t1:.1f}s", file=sys.stderr)

    # timed runs
    runs = 3
    t3 = time.time()
    for _ in range(runs):
        toks = iface.generate_tokens(prompt, n_new)
    dt = (time.time() - t3) / runs
    tok_s = B * n_new / dt

    print(f"# {B}x{n_new} tokens in {dt:.3f}s/run -> {tok_s:.0f} tok/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "gpt2_124m_decode_throughput",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
    }))


if __name__ == "__main__":
    main()
