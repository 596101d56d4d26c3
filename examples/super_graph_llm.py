"""SuperGraph LLM decode demo: build the serializable decode job, run it
with observers streaming node timings and progress, and cross-check
against the compiled lax.scan path.

Reference equivalent: examples/super_graph_test.rs.
Run: python examples/super_graph_llm.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.super_graph import ExecutionContext, SuperObserver
    from whisper_tensor_tpu.super_graph.llm import build_llm_supergraph
    from whisper_tensor_tpu.tokenizer import ByteTokenizer

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=64, vocab_size=300,
                     n_positions=64)
    model = Model.new_from_onnx(
        build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=64),
        name="demo-gpt2")

    sg = build_llm_supergraph("demo-gpt2", "bytes", n_layers=2, n_kv_heads=2,
                              max_len=64, head_dim=32, n_new=12)
    print("job graph:", sg)
    print("serialized bytes:", len(sg.dumps()))

    class Obs(SuperObserver):
        def on_node_executed(self, node, ms):
            print(f"  [{ms:7.2f} ms] {node.name}")

        def on_progress(self, node, f):
            print(f"  progress {f * 100:5.1f}%")

    ctx = ExecutionContext(models={"demo-gpt2": model}, observer=Obs())
    out = sg.run(ctx, {"text": "hello tpu"})
    print("tokens:", out["tokens"].tolist())
    print("text  :", repr(out["text"]))

    iface = TextInferenceInterface(model, max_len=64, prompt_buckets=(16, 32))
    tok = ByteTokenizer()
    prompt = np.asarray(tok.encode("hello tpu"), dtype=np.int64)[None]
    fast = iface.generate_tokens(prompt, 12)[0]
    assert (out["tokens"] == fast).all(), "super-graph and compiled paths diverge"
    print("compiled lax.scan path produced identical tokens ✓")


if __name__ == "__main__":
    main()
