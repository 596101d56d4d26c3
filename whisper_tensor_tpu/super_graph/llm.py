"""LLM decode SuperGraph builder.

Reference equivalent: the shared rnn_supergraph builder all LLM loaders
use (crates/whisper-tensor-import/src/loaders/shared/rnn_supergraph.rs:
29-37): tokenize -> cache-resume -> per-token Scan over ModelExecution
-> cache-write -> decode.

TPU note: this graph is the *introspectable* path — every step's
tensors stream through observers. The throughput path is
interfaces.text.TextInferenceInterface, which compiles the same step
model into one lax.scan program. Both drive identical step graphs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .graph import ExecutionContext, SuperGraph
from .links import LinkKind
from .nodes import (ModelExecutionNode, RNNCacheReadNode, RNNCacheWriteNode,
                    ScanNode, SuperNode, TokenizerDecodeNode,
                    TokenizerEncodeNode, register_node)


@register_node
class LLMDecodeStepNode(SuperNode):
    """One greedy decode step over a unified step model.

    in: 'tensors' (state tensor map: caches + cur_ids + pos),
    out: 'tensors' (updated state), 'token' (chosen token (B,))
    params: model_ref.
    """

    def execute(self, ctx, ins):
        state = dict(ins["tensors"])
        model = ctx.models[self.params["model_ref"]]
        feeds = {k: v for k, v in state.items() if not k.startswith("_")}
        out = ctx.run_model(model, feeds)
        logits = np.asarray(out["logits"])[:, -1, :]
        nxt = np.argmax(logits, axis=-1).astype(np.int64)
        new_state = dict(state)
        for k, v in out.items():
            if k.startswith("new_cache_"):
                new_state[k.replace("new_", "")] = v
        new_state["input_ids"] = nxt[:, None]
        new_state["pos"] = np.asarray(int(state["pos"]) + state["input_ids"].shape[1],
                                      dtype=np.int64)
        return {"tensors": new_state, "token": nxt}


@register_node
class LLMPrefillNode(SuperNode):
    """Prefill the KV caches from the prompt tokens; emit first token.

    params: model_ref, n_layers, n_kv_heads, max_len, head_dim,
            cache_dtype (numpy dtype name) — all serialized so the graph
            deserializes in a fresh process (ADVICE r2: no closure refs).
    """

    def execute(self, ctx, ins):
        p = self.params
        model = ctx.models[p["model_ref"]]
        cache_dtype = np.dtype(p["cache_dtype"])
        toks = np.asarray(ins["tokens"], dtype=np.int64).reshape(1, -1)
        L = toks.shape[1]
        state = {"input_ids": toks, "pos": np.asarray(0, dtype=np.int64)}
        for i in range(int(p["n_layers"])):
            shape = (1, int(p["n_kv_heads"]), int(p["max_len"]),
                     int(p["head_dim"]))
            state[f"cache_k_{i}"] = np.zeros(shape, dtype=cache_dtype)
            state[f"cache_v_{i}"] = np.zeros(shape, dtype=cache_dtype)
        out = ctx.run_model(model, state)
        logits = np.asarray(out["logits"])[:, L - 1, :]
        first = np.argmax(logits, axis=-1).astype(np.int64)
        new_state = {k.replace("new_", ""): v for k, v in out.items()
                     if k.startswith("new_cache_")}
        new_state["input_ids"] = first[:, None]
        new_state["pos"] = np.asarray(L, dtype=np.int64)
        return {"tensors": new_state, "token": first}


@register_node
class JoinTokensNode(SuperNode):
    """Prepend the prefill's first token to the scanned token column."""

    def execute(self, ctx, ins):
        first = np.asarray(ins["first"]).reshape(1, -1)     # (1,B)
        rest = np.asarray(ins["rest"])                      # (n-1,B)
        return {"tokens": np.concatenate([first, rest], axis=0)[:, 0]}


def build_llm_supergraph(model_name: str, tokenizer_source: str,
                         n_layers: int, n_kv_heads: int, max_len: int,
                         head_dim: int, n_new: int,
                         cache_dtype=np.float32) -> SuperGraph:
    """text -> tokens -> prefill -> scan(decode) -> text."""
    g = SuperGraph(f"llm:{model_name}")
    text_in = g.mark_input("text", g.link(LinkKind.STRING, "text"))
    tok_l = g.link(LinkKind.TOKENIZER, "tokenizer")
    tokens_l = g.link(LinkKind.TENSOR, "prompt_tokens")
    state0_l = g.link(LinkKind.TENSOR_MAP, "prefill_state")
    first_tok_l = g.link(LinkKind.TENSOR, "first_token")
    scan_state_l = g.link(LinkKind.TENSOR_MAP, "final_state")
    toks_out_l = g.link(LinkKind.TENSOR, "generated_tokens")
    text_out_l = g.link(LinkKind.STRING, "generated_text")

    from .nodes import TokenizerLoadNode

    g.add(TokenizerLoadNode(outputs={"tokenizer": tok_l},
                            source=tokenizer_source))
    g.add(TokenizerEncodeNode(inputs={"tokenizer": tok_l, "text": text_in},
                              outputs={"tokens": tokens_l}))

    g.add(LLMPrefillNode(inputs={"tokens": tokens_l},
                         outputs={"tensors": state0_l, "token": first_tok_l},
                         model_ref=model_name, n_layers=n_layers,
                         n_kv_heads=n_kv_heads, max_len=max_len,
                         head_dim=head_dim,
                         cache_dtype=np.dtype(cache_dtype).name))

    # decode loop as a Scan over the step node
    body = SuperGraph("decode_body")
    b_state_in = body.mark_input("state", body.link(LinkKind.TENSOR_MAP))
    b_state_out = body.link(LinkKind.TENSOR_MAP)
    b_tok = body.link(LinkKind.TENSOR)
    body.add(LLMDecodeStepNode(inputs={"tensors": b_state_in},
                               outputs={"tensors": b_state_out, "token": b_tok},
                               model_ref=model_name))
    body.mark_output("state_out", b_state_out)
    body.mark_output("token", b_tok)

    n_iters_l = g.link(LinkKind.TENSOR, "n_iters")
    from .image import ConstNode

    g.add(ConstNode(outputs={"value": n_iters_l}, value=n_new - 1))
    scan = ScanNode(inputs={"state": state0_l, "n_iters": n_iters_l},
                    outputs={"final_state": scan_state_l,
                             "tokens": g.link(LinkKind.TENSOR, "scan_tokens")},
                    state=[("state", "state", "state_out")],
                    scan_inputs=[], scan_outputs=[("token", "tokens", 0)],
                    body=None)
    scan.body = body
    scan_tokens_l = scan.outputs["tokens"]
    g.add(scan)

    g.add(JoinTokensNode(inputs={"first": first_tok_l, "rest": scan_tokens_l},
                         outputs={"tokens": toks_out_l}))
    g.add(TokenizerDecodeNode(inputs={"tokenizer": tok_l, "tokens": toks_out_l},
                              outputs={"text": text_out_l}))
    g.mark_output("text", text_out_l)
    g.mark_output("tokens", toks_out_l)
    g.validate()
    return g
