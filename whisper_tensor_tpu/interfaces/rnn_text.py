"""RNN (constant-state) text interface for RWKV-family step models.

Reference equivalent: the RNN path of build_rnn_supergraph + the
RNN-state caches (src/super_graph/cache.rs). The step graph has named
state I/O pairs (<name> in, new_<name> out); prefill and decode both
compile to lax.scan programs over the traced step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..dtype import DType
from ..model import Model


class RnnTextInterface:
    def __init__(self, model: Model, tokenizer=None):
        self.model = model
        self.tokenizer = tokenizer
        milli, weight_inputs = model.graph.to_milli()
        self.milli = milli
        # RWKV projections (r/k/v/g from one x) fuse especially well —
        # same exact-concat pass as the text interface
        from ..milli.transforms import apply_matmul_fusion

        self._fused, self._get_w = apply_matmul_fusion(
            milli, weight_inputs, model.graph.store)
        self.weight_names = [n for n in milli.inputs
                             if n in weight_inputs or n in self._fused]
        self.state_names = [n for n in milli.inputs
                            if n not in self.weight_names and n != "token"]
        for n in self.state_names:
            assert f"new_{n}" in milli.outputs, n
        self._weights_dev = None
        self._programs: Dict[Tuple, Any] = {}

    def _weights(self):
        if self._weights_dev is None:
            import jax

            self._weights_dev = [jax.device_put(self._get_w(n))
                                 for n in self.weight_names]
        return self._weights_dev

    def fresh_state(self, batch: int) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        out = {}
        for n in self.state_names:
            info = self.model.graph.tensors[self.model.graph.by_name[n]].info
            dims = [batch if not d.is_known else int(d.value())
                    for d in info.dims()]
            out[n] = jnp.zeros(tuple(dims), dtype=info.dtype.to_jax())
        return out

    def _scan_program(self, batch: int, n_tokens: int, greedy_feedback: bool):
        import jax
        import jax.numpy as jnp

        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        key = (batch, n_tokens, greedy_feedback)
        if key in self._programs:
            return self._programs[key]
        fn = _trace_graph(self.milli, {})
        order = list(self.milli.inputs)
        out_names = list(self.milli.outputs)

        def step(tok, states, weights):
            by = {"token": tok}
            by.update(dict(zip(self.state_names, states)))
            by.update(dict(zip(self.weight_names, weights)))
            outs = dict(zip(out_names, fn(*[by[n] for n in order])))
            new_states = [outs[f"new_{n}"] for n in self.state_names]
            return outs["logits"], new_states

        if greedy_feedback:
            def prog(first_tok, states, weights):
                def body(carry, _):
                    tok, states = carry
                    logits, states = step(tok, states, weights)
                    nxt = jnp.argmax(logits, axis=-1)
                    return (nxt, states), tok

                (last, states), toks = jax.lax.scan(
                    body, (first_tok, states), None, length=n_tokens)
                return toks, states
        else:
            def prog(tokens, states, weights):
                def body(states, tok):
                    logits, states = step(tok, states, weights)
                    return states, logits

                states, logits = jax.lax.scan(body, states, tokens)
                return logits, states

        jitted = jax.jit(prog, donate_argnums=(1,))
        self._programs[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def feed_tokens(self, tokens: np.ndarray, states=None):
        """Prefill: run tokens (B, L) through the recurrence.
        Returns (logits_last (B,V), states)."""
        import jax.numpy as jnp

        tokens = np.asarray(tokens, dtype=np.int64)
        if tokens.ndim == 1:
            tokens = tokens[None]
        B, L = tokens.shape
        states = states if states is not None else self.fresh_state(B)
        prog = self._scan_program(B, L, greedy_feedback=False)
        seq = jnp.asarray(tokens.T)  # (L, B)
        logits, states = prog(seq, [states[n] for n in self.state_names],
                              self._weights())
        states = dict(zip(self.state_names, states))
        return np.asarray(logits)[-1], states

    def generate_tokens(self, prompt: np.ndarray, n_new: int) -> np.ndarray:
        import jax.numpy as jnp

        prompt = np.asarray(prompt, dtype=np.int64)
        if prompt.ndim == 1:
            prompt = prompt[None]
        B = prompt.shape[0]
        logits, states = self.feed_tokens(prompt)
        first = np.argmax(logits, axis=-1).astype(np.int64)
        prog = self._scan_program(B, n_new, greedy_feedback=True)
        toks, _ = prog(jnp.asarray(first), [states[n] for n in self.state_names],
                       self._weights())
        return np.asarray(toks).T  # (B, n_new)

    def run_string_in_string_out(self, text: str, n_new: int = 32) -> str:
        ids = np.asarray(self.tokenizer.encode(text), dtype=np.int64)[None]
        toks = self.generate_tokens(ids, n_new)[0]
        return self.tokenizer.decode([int(t) for t in toks])
