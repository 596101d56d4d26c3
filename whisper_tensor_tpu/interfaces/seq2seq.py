"""Sequence-to-sequence (T5-style) text2text interface.

Reference equivalent: the T5 example flow (reference examples/ run T5
through per-token SuperGraph execution). TPU redesign: the encoder runs
once (compiled), its per-layer cross K/V land on device, and the whole
decode loop compiles to ONE lax.scan program over the cached decoder
step graph (recipes.llm.t5.build_t5_decoder_step) — same shape as the
causal-LM text interface.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..dtype import DType
from ..model import Model
from .text import SamplingParams, _pick_token


class Seq2SeqInterface:
    """encoder: input_ids(B,L) -> encoder_states + cross_k_i/cross_v_i.
    decoder_step: input_ids(B,S), pos, cache_*, cross_*, weights ->
    logits + new_cache_*."""

    def __init__(self, encoder: Model, decoder_step: Model, max_len: int,
                 start_token: int = 0, eos_token: int = 1,
                 tokenizer=None, cache_dtype: DType = DType.F32,
                 start_sequence: Optional[List[int]] = None,
                 encoder_feed: str = "input_ids"):
        """start_sequence: multi-token forced decoder prefix (Whisper's
        start-of-transcript sequence); defaults to [start_token].
        encoder_feed: the encoder's input name ('mel' for Whisper)."""
        self.encoder = encoder
        self.decoder = decoder_step
        self.max_len = max_len
        self.start_token = start_token
        self.start_sequence = list(start_sequence) if start_sequence \
            else [start_token]
        self.encoder_feed = encoder_feed
        self.eos_token = eos_token
        self.tokenizer = tokenizer
        self.cache_dtype = cache_dtype
        milli, weight_inputs = decoder_step.graph.to_milli()
        self.milli = milli
        from ..milli.transforms import apply_matmul_fusion

        self._fused, self._get_w = apply_matmul_fusion(
            milli, weight_inputs, decoder_step.graph.store)
        self.weight_names = [n for n in milli.inputs
                             if n in weight_inputs or n in self._fused]
        self.input_names = list(milli.inputs)
        self.output_names = list(milli.outputs)
        self.cache_in = [n for n in self.input_names
                         if n.startswith("cache_")]
        self.cross_in = [n for n in self.input_names
                         if n.startswith("cross_")]
        self.cache_out = [n for n in self.output_names
                          if n.startswith("new_cache_")]
        self._weights_dev: Optional[List[Any]] = None
        self._programs: Dict[Tuple, Any] = {}
        self._enc_backend = None

    # ------------------------------------------------------------------
    def _weights(self) -> List[Any]:
        if self._weights_dev is None:
            import jax

            self._weights_dev = [jax.device_put(self._get_w(n))
                                 for n in self.weight_names]
        return self._weights_dev

    def encode(self, input_ids: np.ndarray) -> Dict[str, np.ndarray]:
        from ..backends.eval_backend import EvalBackend

        if self._enc_backend is None:
            self._enc_backend = EvalBackend("xla")
        return self._enc_backend.run(self.encoder.graph,
                                     {self.encoder_feed: input_ids})

    def fresh_cache(self, batch: int):
        import jax.numpy as jnp

        out = []
        for n in self.cache_in:
            info = self.decoder.graph.tensors[
                self.decoder.graph.by_name[n]].info
            dims = tuple(batch if not d.is_known else int(d.value())
                         for d in info.dims())
            out.append(jnp.zeros(dims, dtype=self.cache_dtype.to_jax()))
        return out

    def _decode_program(self, batch: int, n_new: int,
                        sampling: Optional[SamplingParams]):
        import jax
        import jax.numpy as jnp

        from ..backends.xla.compiler import _trace_graph, ensure_x64

        key = (batch, n_new, sampling)
        if key in self._programs:
            return self._programs[key]
        ensure_x64()
        fn = _trace_graph(self.milli, {})
        order = self.input_names
        sp = sampling

        def step(ids, pos, caches, crosses, weights):
            by_name = {"input_ids": ids, "pos": pos}
            by_name.update(dict(zip(self.cache_in, caches)))
            by_name.update(dict(zip(self.cross_in, crosses)))
            by_name.update(dict(zip(self.weight_names, weights)))
            outs = fn(*[by_name[n] for n in order])
            named = dict(zip(self.output_names, outs))
            return named["logits"], [named[n] for n in self.cache_out]

        prefix = list(self.start_sequence)
        P = len(prefix)

        def run(caches, crosses, weights, rng_key):
            # forced decoder prefix (start token, or Whisper's full
            # start-of-transcript sequence) as one prefill call
            pre = jnp.broadcast_to(
                jnp.asarray(prefix, dtype=jnp.int64)[None], (batch, P))
            lg, caches = step(pre, jnp.asarray(0, dtype=jnp.int64),
                              caches, crosses, weights)
            first = _pick_token(lg[:, P - 1, :],
                                jax.random.fold_in(rng_key, 0), sp)

            def body(carry, i):
                cur, pos, caches = carry
                lg, caches = step(cur[:, None], pos, caches, crosses,
                                  weights)
                nxt = _pick_token(lg[:, -1, :],
                                  jax.random.fold_in(rng_key, i), sp)
                return (nxt, pos + 1, caches), nxt

            (_, _, caches), toks = jax.lax.scan(
                body, (first, jnp.asarray(P, dtype=jnp.int64), caches),
                jnp.arange(1, n_new))
            return jnp.concatenate([first[:, None],
                                    jnp.swapaxes(toks, 0, 1)], axis=1)

        self._programs[key] = jax.jit(run, donate_argnums=(0,))
        return self._programs[key]

    def _beam_program(self, batch: int, beam: int, n_new: int,
                      length_penalty: float):
        """Whole beam search as ONE compiled scan: rows = batch*beam;
        each step re-scores (B, W*V), selects top-W, gathers caches and
        token histories by parent beam (the cache reorder is a batched
        gather — the standard TPU beam-search formulation)."""
        import jax
        import jax.numpy as jnp

        from ..backends.xla.compiler import _trace_graph, ensure_x64

        key = ("beam", batch, beam, n_new, length_penalty)
        if key in self._programs:
            return self._programs[key]
        ensure_x64()
        fn = _trace_graph(self.milli, {})
        order = self.input_names
        B, W = batch, beam
        R = B * W
        eos = self.eos_token

        def step(ids, pos, caches, crosses, weights):
            by_name = {"input_ids": ids, "pos": pos}
            by_name.update(dict(zip(self.cache_in, caches)))
            by_name.update(dict(zip(self.cross_in, crosses)))
            by_name.update(dict(zip(self.weight_names, weights)))
            outs = fn(*[by_name[n] for n in order])
            named = dict(zip(self.output_names, outs))
            return named["logits"], [named[n] for n in self.cache_out]

        prefix = list(self.start_sequence)
        P = len(prefix)

        def select(lp, i, scores, alive, hist, caches):
            """One beam-search selection from per-row log-probs (R, V):
            re-score, top-W per batch, reorder caches/history by parent."""
            V = lp.shape[-1]
            # finished beams may only extend with EOS at zero cost
            eos_only = jnp.full((V,), -jnp.inf).at[eos].set(0.0)
            lp = jnp.where(alive[:, None], lp, eos_only[None])
            total = scores[:, None] + lp                    # (R, V)
            flat = total.reshape(B, W * V)
            top_s, top_i = jax.lax.top_k(flat, W)           # (B, W)
            parent = top_i // V                             # beam in batch
            token = (top_i % V).astype(jnp.int64)
            rows = (jnp.arange(B)[:, None] * W + parent).reshape(-1)
            caches = [c[rows] for c in caches]
            hist = hist[rows].at[:, i].set(token.reshape(-1))
            cur = token.reshape(-1)
            scores = top_s.reshape(-1)
            alive = alive[rows] & (cur != eos)
            return cur, scores, alive, hist, caches

        def run(caches, crosses, weights):
            # only beam 0 of each batch is live initially
            scores = jnp.where(jnp.arange(R) % W == 0, 0.0, -jnp.inf)
            alive = jnp.ones((R,), bool)
            hist = jnp.zeros((R, n_new), dtype=jnp.int64)
            # forced decoder prefix (start token, or Whisper's full
            # start-of-transcript sequence) as one prefill call; the
            # first selection comes from its last-position logits
            pre = jnp.broadcast_to(
                jnp.asarray(prefix, dtype=jnp.int64)[None], (R, P))
            lg0, caches = step(pre, jnp.asarray(0, dtype=jnp.int64),
                               caches, crosses, weights)
            lp0 = jax.nn.log_softmax(
                lg0[:, P - 1, :].astype(jnp.float32), axis=-1)
            cur, scores, alive, hist, caches = select(
                lp0, 0, scores, alive, hist, caches)

            def body(carry, i):
                cur, pos, scores, alive, hist, caches = carry
                lg, caches = step(cur[:, None], pos, caches, crosses,
                                  weights)
                lp = jax.nn.log_softmax(
                    lg[:, -1, :].astype(jnp.float32), axis=-1)  # (R, V)
                cur, scores, alive, hist, caches = select(
                    lp, i, scores, alive, hist, caches)
                return (cur, pos + 1, scores, alive, hist, caches), None

            (cur, pos, scores, alive, hist, caches), _ = jax.lax.scan(
                body, (cur, jnp.asarray(P, dtype=jnp.int64), scores, alive,
                       hist, caches), jnp.arange(1, n_new))
            # pick the best beam per batch (optional length normalization
            # over the pre-EOS length)
            if length_penalty != 0.0:
                lengths = jnp.minimum(
                    jnp.argmax(hist == eos, axis=1)
                    + jnp.where((hist == eos).any(axis=1), 1, n_new), n_new)
                norm = scores.reshape(B, W) / (
                    lengths.reshape(B, W).astype(jnp.float32)
                    ** length_penalty)
            else:
                norm = scores.reshape(B, W)
            best = jnp.argmax(norm, axis=1)
            return hist.reshape(B, W, n_new)[jnp.arange(B), best], \
                norm[jnp.arange(B), best]

        self._programs[key] = jax.jit(run, donate_argnums=(0,))
        return self._programs[key]

    def beam_search_tokens(self, input_ids: np.ndarray, n_new: int,
                           beam: int = 4, length_penalty: float = 0.0
                           ) -> np.ndarray:
        """Beam-search decode: (B, L_enc) -> (B, n_new) best sequences."""
        import jax.numpy as jnp

        input_ids = (np.asarray(input_ids, dtype=np.int64)
                     if self.encoder_feed == "input_ids"
                     else np.asarray(input_ids, dtype=np.float32))
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        B = input_ids.shape[0]
        enc = self.encode(input_ids)
        # tile cross K/V to batch*beam rows
        crosses = [jnp.repeat(jnp.asarray(enc[n]), beam, axis=0)
                   for n in self.cross_in]
        caches = self.fresh_cache(B * beam)
        prog = self._beam_program(B, beam, n_new, length_penalty)
        toks, _scores = prog(caches, crosses, self._weights())
        return np.asarray(toks)

    # ------------------------------------------------------------------
    def generate_tokens(self, input_ids: np.ndarray, n_new: int,
                        sampling: Optional[SamplingParams] = None
                        ) -> np.ndarray:
        """(B, L_enc) encoder ids -> (B, n_new) decoder ids (starting
        after the decoder_start token)."""
        import jax
        import jax.numpy as jnp

        input_ids = (np.asarray(input_ids, dtype=np.int64)
                     if self.encoder_feed == "input_ids"
                     else np.asarray(input_ids, dtype=np.float32))
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        B = input_ids.shape[0]
        enc = self.encode(input_ids)
        crosses = [jnp.asarray(enc[n]) for n in self.cross_in]
        caches = self.fresh_cache(B)
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        prog = self._decode_program(B, n_new, sampling)
        return np.asarray(prog(caches, crosses, self._weights(), rng))

    def run_string_in_string_out(self, text: str, n_new: int = 32,
                                 sampling: Optional[SamplingParams] = None
                                 ) -> str:
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured")
        ids = np.asarray(self.tokenizer.encode(text), dtype=np.int64)[None]
        toks = self.generate_tokens(ids, n_new, sampling=sampling)[0]
        out = []
        for t in toks:
            if int(t) == self.eos_token:
                break
            out.append(int(t))
        return self.tokenizer.decode(out)
