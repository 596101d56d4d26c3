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

temperature > 0 uses modified rejection sampling (Leviathan et al.,
"Fast Inference from Transformers via Speculative Decoding"): accept
draft token x with probability min(1, p_target(x)/p_draft(x)); on the
first rejection, sample the renormalized residual max(0, p_t - p_d).
Emitted tokens are then distributed EXACTLY as target-only sampling at
the same temperature/top-k/top-p (pinned against the analytic joint
distribution in tests/test_speculative.py).

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

from .text import (SamplingParams, TextInferenceInterface, _bucket,
                   _filtered_logits)


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
    def _program(self, batch: int, bucket: int, n_new: int,
                 sampling: Optional[SamplingParams]):
        import jax
        import jax.numpy as jnp

        key = (batch, bucket, n_new, sampling)
        if key in self._programs:
            return self._programs[key]
        K = self.k
        cap = n_new + K                       # emission overshoot room
        t_pre = self.target._traced_step(batch, bucket)
        t_ver = self.target._traced_step(batch, K)
        d_pre = self.draft._traced_step(batch, bucket)
        d_step = self.draft._traced_step(batch, 1)
        t_scalar, d_scalar = self._t_scalar, self._d_scalar
        sp = sampling if (sampling is not None
                          and sampling.temperature > 0.0) else None

        def parg(scalar: bool, pvec):
            # scalar-pos graphs share one position across rows (only
            # batch==1 reaches here — enforced in generate_tokens)
            return pvec[0] if scalar else pvec

        def spec(ids_padded, prompt_len, t_caches, d_caches, tw, dw,
                 rng_key):
            B = batch
            zero = jnp.zeros(B, jnp.int64)
            tlg, t_caches = t_pre(ids_padded, parg(t_scalar, zero),
                                  t_caches, tw)
            _, d_caches = d_pre(ids_padded, parg(d_scalar, zero),
                                d_caches, dw)
            last = tlg[:, prompt_len - 1, :]
            if sp is None:
                first = jnp.argmax(last, axis=-1)
            else:
                first = jax.random.categorical(
                    jax.random.fold_in(rng_key, 0),
                    _filtered_logits(last, sp), axis=-1)
            out = jnp.zeros((B, cap), jnp.int64).at[:, 0].set(first)
            pos = jnp.full(B, prompt_len, jnp.int64)
            count = jnp.ones(B, jnp.int64)
            rows = jnp.arange(B)

            def cond(carry):
                return jnp.any(carry[2] < n_new)

            def greedy_round(cur, pos, dc, tc):
                """Draft argmax proposals; accept while they equal the
                target argmax; emit target argmaxes (a+1 of them)."""
                def dbody(c, _):
                    tok, dp, dc = c
                    lg, dc = d_step(tok[:, None], parg(d_scalar, dp),
                                    dc, dw)
                    nxt = jnp.argmax(lg[:, -1, :], axis=-1)
                    return (nxt, dp + 1, tuple(dc)), nxt

                (_, _, dc), q_all = jax.lax.scan(
                    dbody, (cur, pos, dc), None, length=K)
                q = jnp.swapaxes(q_all, 0, 1)[:, :K - 1]      # (B, K-1)
                seq = jnp.concatenate([cur[:, None], q], axis=1)
                lg, tc = t_ver(seq, parg(t_scalar, pos), tc, tw)
                t_pred = jnp.argmax(lg, axis=-1)              # (B, K)
                match = (q == t_pred[:, :K - 1]).astype(jnp.int64)
                a = jnp.cumprod(match, axis=1).sum(axis=1)    # 0..K-1
                return a, t_pred, dc, tc

            def sampled_round(cur, pos, dc, tc, rnd):
                """Leviathan modified rejection sampling: accept draft
                token x_i with prob min(1, p_t(x_i)/p_d(x_i)); on the
                first rejection sample the residual max(0, p_t - p_d)
                (renormalized). The emitted tokens are distributed
                EXACTLY as target-only sampling, for any draft."""
                rk = jax.random.fold_in(rng_key, rnd)

                def dbody(c, i):
                    tok, dp, dc = c
                    lg, dc = d_step(tok[:, None], parg(d_scalar, dp),
                                    dc, dw)
                    fl = _filtered_logits(lg[:, -1, :], sp)
                    probs = jax.nn.softmax(fl, axis=-1)
                    nxt = jax.random.categorical(
                        jax.random.fold_in(rk, 1 + i), fl, axis=-1)
                    return (nxt, dp + 1, tuple(dc)), (nxt, probs)

                (_, _, dc), (q_all, pd_all) = jax.lax.scan(
                    dbody, (cur, pos, dc), jnp.arange(K))
                q = jnp.swapaxes(q_all, 0, 1)[:, :K - 1]      # (B, K-1)
                pd_full = jnp.swapaxes(pd_all, 0, 1)          # (B, K, V)
                seq = jnp.concatenate([cur[:, None], q], axis=1)
                lg, tc = t_ver(seq, parg(t_scalar, pos), tc, tw)
                pt_full = jax.nn.softmax(_filtered_logits(
                    lg.reshape(B * K, -1), sp).reshape(B, K, -1), axis=-1)
                pd = jnp.take_along_axis(
                    pd_full[:, :K - 1], q[..., None], axis=-1)[..., 0]
                pt = jnp.take_along_axis(
                    pt_full[:, :K - 1], q[..., None], axis=-1)[..., 0]
                u = jax.random.uniform(jax.random.fold_in(rk, 0),
                                       (B, K - 1))
                accept = (u * pd <= pt).astype(jnp.int64)
                a = jnp.cumprod(accept, axis=1).sum(axis=1)   # 0..K-1
                # correction at index a: residual(p_t - p_d); when all
                # K-1 proposals accepted there is no proposal at slot
                # K-1, so p_d there is defined as 0 -> residual = p_t
                pd_res = pd_full.at[:, K - 1, :].set(0.0)
                pt_a = jnp.take_along_axis(
                    pt_full, a[:, None, None], axis=1)[:, 0]  # (B, V)
                pd_a = jnp.take_along_axis(
                    pd_res, a[:, None, None], axis=1)[:, 0]
                res = jnp.clip(pt_a - pd_a, 0.0, None)
                norm = res.sum(axis=-1, keepdims=True)
                res = jnp.where(norm > 0, res / norm, pt_a)
                corr = jax.random.categorical(
                    jax.random.fold_in(rk, K + 1),
                    jnp.log(res + 1e-30), axis=-1)
                # emit accepted proposals then the correction token
                q_pad = jnp.concatenate(
                    [q, jnp.zeros((B, 1), q.dtype)], axis=1)  # (B, K)
                emit = jnp.where(jnp.arange(K)[None, :] < a[:, None],
                                 q_pad, corr[:, None])
                return a, emit, dc, tc

            def body(carry):
                cur, pos, count, out, tc, dc, rnd = carry
                active = count < n_new
                if sp is None:
                    a, emit, dc, tc = greedy_round(cur, pos, dc, tc)
                else:
                    a, emit, dc, tc = sampled_round(cur, pos, dc, tc, rnd)
                m = jnp.where(active, a + 1, 0)               # emitted/row
                cols = count[:, None] + jnp.arange(K)[None, :]
                valid = ((jnp.arange(K)[None, :] <= a[:, None])
                         & active[:, None] & (cols < cap))
                cols = jnp.where(valid, cols, cap)            # cap -> drop
                out = out.at[rows[:, None], cols].set(emit, mode="drop")
                nxt = jnp.take_along_axis(emit, a[:, None], axis=1)[:, 0]
                cur = jnp.where(active, nxt, cur)
                return (cur, pos + m, count + m, out, tuple(tc),
                        tuple(dc), rnd + 1)

            carry = (first, pos, count, out, tuple(t_caches),
                     tuple(d_caches), jnp.asarray(1, jnp.int64))
            carry = jax.lax.while_loop(cond, body, carry)
            # rounds ride out for acceptance-rate accounting (rnd
            # starts at 1 and bumps once per verify round)
            return carry[3][:, :n_new], carry[6] - 1

        jitted = jax.jit(spec, donate_argnums=(2, 3))
        self._programs[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def generate_tokens(self, prompt_ids: np.ndarray, n_new: int,
                        sampling: Optional[SamplingParams] = None
                        ) -> np.ndarray:
        """prompt_ids: (B, L) or (L,). Returns (B, n_new).

        sampling None / temperature 0: greedy — token-exact vs
        target.generate_tokens. temperature > 0: modified rejection
        sampling — each emitted token is distributed exactly as
        target-only sampling at the same temperature/top-k/top-p
        (repetition_penalty is not supported: the acceptance test
        needs fixed per-position distributions, not a history-mutated
        one)."""
        import jax
        import jax.numpy as jnp

        if sampling is not None and (sampling.repetition_penalty != 1.0
                                     or sampling.presence_penalty != 0.0
                                     or sampling.frequency_penalty != 0.0):
            raise ValueError("history-dependent penalties "
                             "(repetition_penalty / presence_penalty / "
                             "frequency_penalty) are not supported in "
                             "speculative decoding")
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
        prog = self._program(B, bucket, n_new, sampling)
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        toks, rounds = prog(
            jnp.asarray(padded), jnp.asarray(L, jnp.int64),
            self.target.fresh_cache(B), self.draft.fresh_cache(B),
            self.target._weights(), self.draft._weights(), rng)
        # acceptance-rate bookkeeping: tokens emitted per verify round
        # is 1 + accepted proposals, so acceptance = (n/rounds - 1)/(k-1)
        self.last_rounds = int(np.asarray(rounds))
        return np.asarray(toks)
