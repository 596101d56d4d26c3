"""Speculative decoding: a small DRAFT model proposes a block of
tokens; the TARGET model verifies the whole block in one forward and
accepts the longest matching prefix, emitting 1..K tokens per target
evaluation instead of exactly 1.

Net-new beyond the reference (its scheduler generates strictly one
token per model evaluation — crates/whisper-tensor-server/src/
scheduler.rs:424-717); this is the standard latency lever for serving
large models. TPU-first design: the ENTIRE loop — draft scan, block
verify, acceptance, emission — is one jitted program built around
`lax.while_loop`, so a generation costs a single host dispatch no
matter how many rounds run (each host dispatch through a remote-device
tunnel costs ~50 ms; a host-side accept loop would drown the win).

Greedy acceptance (temperature 0): a draft token is accepted iff it
equals the target's argmax given the same prefix, and the correction
token is always the target's own argmax — so the emitted sequence is
TOKEN-EXACT vs plain greedy decode on the target, regardless of the
draft's quality. A bad draft only costs speed, never correctness.

Cache discipline (same as server/batching.py slot reuse): block
forwards write K cache entries at pos..pos+K-1, but positions past the
accepted prefix hold wrong-future values. That is safe because a step
at position p only attends to entries < p+1, and pos only advances
over accepted (true-history) entries — stale entries are overwritten
before they ever become visible. The draft runs K steps per round
(one more than it proposes) precisely so its cache covers the
all-accepted case.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .text import TextInferenceInterface, _bucket


def _is_scalar_pos(iface: TextInferenceInterface) -> bool:
    g = iface.model.graph
    info = g.tensors[g.by_name["pos"]].info
    return len(info.dims()) == 0


class SpeculativeDecoder:
    """k: speculation block length — the draft proposes k-1 tokens per
    round and the target verifies a k-token block (k-1 proposals behind
    the current token), emitting between 1 and k tokens per round.

    Both interfaces must be built from unified step graphs over the
    same vocabulary. Batches > 1 need pos_per_row=True recipes (rows
    accept different amounts and their positions diverge — the same
    requirement as continuous batching)."""

    def __init__(self, target: TextInferenceInterface,
                 draft: TextInferenceInterface, k: int = 4):
        if k < 2:
            raise ValueError("k must be >= 2 (k-1 draft proposals)")
        if target._vocab_size() != draft._vocab_size():
            raise ValueError(
                f"target vocab {target._vocab_size()} != draft vocab "
                f"{draft._vocab_size()} — speculative decoding compares "
                "token ids across the two models")
        self.target = target
        self.draft = draft
        self.k = k
        self._t_scalar = _is_scalar_pos(target)
        self._d_scalar = _is_scalar_pos(draft)
        self._programs = {}

    # ------------------------------------------------------------------
    def _program(self, batch: int, bucket: int, n_new: int):
        import jax
        import jax.numpy as jnp

        key = (batch, bucket, n_new)
        if key in self._programs:
            return self._programs[key]
        K = self.k
        cap = n_new + K                       # emission overshoot room
        t_pre = self.target._traced_step(batch, bucket)
        t_ver = self.target._traced_step(batch, K)
        d_pre = self.draft._traced_step(batch, bucket)
        d_step = self.draft._traced_step(batch, 1)
        t_scalar, d_scalar = self._t_scalar, self._d_scalar

        def parg(scalar: bool, pvec):
            # scalar-pos graphs share one position across rows (only
            # batch==1 reaches here — enforced in generate_tokens)
            return pvec[0] if scalar else pvec

        def spec(ids_padded, prompt_len, t_caches, d_caches, tw, dw):
            B = batch
            zero = jnp.zeros(B, jnp.int64)
            tlg, t_caches = t_pre(ids_padded, parg(t_scalar, zero),
                                  t_caches, tw)
            _, d_caches = d_pre(ids_padded, parg(d_scalar, zero),
                                d_caches, dw)
            first = jnp.argmax(tlg[:, prompt_len - 1, :], axis=-1)
            out = jnp.zeros((B, cap), jnp.int64).at[:, 0].set(first)
            pos = jnp.full(B, prompt_len, jnp.int64)
            count = jnp.ones(B, jnp.int64)
            rows = jnp.arange(B)

            def cond(carry):
                return jnp.any(carry[2] < n_new)

            def body(carry):
                cur, pos, count, out, tc, dc = carry
                active = count < n_new

                # K draft steps from cur: proposals q_0..q_{K-2}; the
                # K-th step's output is discarded but its cache write
                # covers position pos+K-1 for the all-accepted case
                def dbody(c, _):
                    tok, dp, dc = c
                    lg, dc = d_step(tok[:, None], parg(d_scalar, dp),
                                    dc, dw)
                    nxt = jnp.argmax(lg[:, -1, :], axis=-1)
                    return (nxt, dp + 1, tuple(dc)), nxt

                (_, _, dc), q_all = jax.lax.scan(
                    dbody, (cur, pos, dc), None, length=K)
                q = jnp.swapaxes(q_all, 0, 1)[:, :K - 1]      # (B, K-1)

                # one target forward verifies the whole block
                seq = jnp.concatenate([cur[:, None], q], axis=1)  # (B, K)
                lg, tc = t_ver(seq, parg(t_scalar, pos), tc, tw)
                t_pred = jnp.argmax(lg, axis=-1)              # (B, K)

                # longest accepted prefix + the target's correction
                match = (q == t_pred[:, :K - 1]).astype(jnp.int64)
                a = jnp.cumprod(match, axis=1).sum(axis=1)    # (B,) 0..K-1
                m = jnp.where(active, a + 1, 0)               # emitted/row
                cols = count[:, None] + jnp.arange(K)[None, :]
                valid = ((jnp.arange(K)[None, :] <= a[:, None])
                         & active[:, None] & (cols < cap))
                cols = jnp.where(valid, cols, cap)            # cap -> drop
                out = out.at[rows[:, None], cols].set(t_pred, mode="drop")
                nxt = jnp.take_along_axis(t_pred, a[:, None], axis=1)[:, 0]
                cur = jnp.where(active, nxt, cur)
                return (cur, pos + m, count + m, out, tuple(tc), tuple(dc))

            carry = (first, pos, count, out, tuple(t_caches),
                     tuple(d_caches))
            carry = jax.lax.while_loop(cond, body, carry)
            return carry[3][:, :n_new]

        jitted = jax.jit(spec, donate_argnums=(2, 3))
        self._programs[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def generate_tokens(self, prompt_ids: np.ndarray, n_new: int
                        ) -> np.ndarray:
        """prompt_ids: (B, L) or (L,). Returns (B, n_new) — token-exact
        vs target.generate_tokens(prompt_ids, n_new) greedy."""
        import jax.numpy as jnp

        ids = np.asarray(prompt_ids, np.int64)
        if ids.ndim == 1:
            ids = ids[None]
        B, L = ids.shape
        if B > 1 and (self._t_scalar or self._d_scalar):
            raise ValueError(
                "batch > 1 speculative decoding needs pos_per_row=True "
                "step graphs for both target and draft (rows accept "
                "different amounts — their positions diverge)")
        bucket = _bucket(L, self.target.prompt_buckets)
        need = bucket + n_new + 2 * self.k
        for which, iface in (("target", self.target),
                             ("draft", self.draft)):
            if need > iface.max_len:
                raise ValueError(
                    f"{which} max_len {iface.max_len} too small: needs "
                    f"bucket {bucket} + n_new {n_new} + 2k slack = {need}")
        padded = np.zeros((B, bucket), np.int64)
        padded[:, :L] = ids
        prog = self._program(B, bucket, n_new)
        toks = prog(jnp.asarray(padded), jnp.asarray(L, jnp.int64),
                    self.target.fresh_cache(B), self.draft.fresh_cache(B),
                    self.target._weights(), self.draft._weights())
        return np.asarray(toks)
