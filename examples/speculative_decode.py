"""Speculative decoding demo: a small draft GPT-2 proposes token
blocks that the target verifies in single forwards — the whole
draft→verify→accept loop compiles to ONE program (interfaces/
speculative.py), and the greedy output is token-exact vs plain decode.

Net-new beyond the reference (its scheduler emits one token per model
evaluation, crates/whisper-tensor-server/src/scheduler.rs); this is
the standard serving-latency lever for big targets with cheap drafts.

Run: python examples/speculative_decode.py [--smoke] [--k 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4,
                    help="block length (k-1 draft proposals per round)")
    ap.add_argument("--tokens", type=int, default=24)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny run for CI (CPU)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.smoke or args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.speculative import SpeculativeDecoder
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    max_len = 128
    tcfg = GPT2Config(n_layer=2, n_head=2, n_embd=64, vocab_size=211,
                      n_positions=max_len)
    dcfg = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=211,
                      n_positions=max_len)

    def iface(cfg, seed):
        m = Model.new_from_onnx(build_gpt2_step(
            random_gpt2_weights(cfg, seed=seed), cfg, max_len=max_len,
            dtype=DType.F32))
        return TextInferenceInterface(m, max_len=max_len,
                                      prompt_buckets=(16, 32))

    target, draft = iface(tcfg, 0), iface(dcfg, 1)
    # a SELF-draft accepts every proposal — the acceptance ceiling;
    # the tiny random draft shows the truthful bad-draft floor
    drafts = [("tiny-draft", draft), ("self-draft", iface(tcfg, 0))]
    prompt = np.asarray([5, 17, 3, 99, 42], np.int64)
    n = 8 if args.smoke else args.tokens

    ref = target.generate_tokens(prompt[None], n)[0]
    for name, d in drafts:
        dec = SpeculativeDecoder(target, d, k=args.k)
        t0 = time.time()
        out = dec.generate_tokens(prompt, n)[0]
        dt = time.time() - t0
        assert (out == ref).all(), (out, ref)
        print(f"{name}: {n} tokens in {dt:.2f}s (incl. compile), "
              f"token-exact vs plain greedy")
    print("ok")


if __name__ == "__main__":
    main()
