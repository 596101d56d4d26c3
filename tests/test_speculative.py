"""Speculative decoding: greedy draft-verify must be TOKEN-EXACT vs
plain greedy decode on the target, for any draft (a bad draft costs
speed, never correctness). Net-new beyond the reference (one token per
model evaluation, crates/whisper-tensor-server/src/scheduler.rs)."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, random_gpt2_weights)
from whisper_tensor_tpu.interfaces.speculative import SpeculativeDecoder
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

rng = np.random.default_rng(9)
MAX_LEN = 96
VOCAB = 127


def _iface(cfg, seed, pos_per_row=False, max_len=MAX_LEN):
    wg = random_gpt2_weights(cfg, seed=seed)
    m = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=max_len,
                                            dtype=DType.F32,
                                            pos_per_row=pos_per_row))
    return TextInferenceInterface(m, max_len=max_len, prompt_buckets=(16, 32))


TARGET_CFG = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=VOCAB,
                        n_positions=MAX_LEN)
DRAFT_CFG = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=VOCAB,
                       n_positions=MAX_LEN)


def test_matches_plain_greedy_b1():
    target = _iface(TARGET_CFG, seed=0)
    draft = _iface(DRAFT_CFG, seed=1)
    dec = SpeculativeDecoder(target, draft, k=4)
    for L, n in ((5, 12), (11, 7)):
        p = rng.integers(0, VOCAB, (L,)).astype(np.int64)
        out = dec.generate_tokens(p, n)
        ref = target.generate_tokens(p[None], n)
        np.testing.assert_array_equal(out, ref)


def test_matches_plain_greedy_batched_ragged_pos():
    target = _iface(TARGET_CFG, seed=0, pos_per_row=True)
    draft = _iface(DRAFT_CFG, seed=1, pos_per_row=True)
    ref_t = _iface(TARGET_CFG, seed=0)          # scalar-pos referee
    dec = SpeculativeDecoder(target, draft, k=3)
    prompts = rng.integers(0, VOCAB, (3, 9)).astype(np.int64)
    out = dec.generate_tokens(prompts, 10)
    ref = ref_t.generate_tokens(prompts, 10)
    np.testing.assert_array_equal(out, ref)


def test_self_draft_full_acceptance():
    """Draft == target: every proposal accepted, one verify per k-1
    emitted tokens, still exact (exercises the all-accepted cache
    coverage path, the K-th draft step)."""
    target = _iface(TARGET_CFG, seed=0)
    draft = _iface(TARGET_CFG, seed=0)
    dec = SpeculativeDecoder(target, draft, k=5)
    p = rng.integers(0, VOCAB, (7,)).astype(np.int64)
    out = dec.generate_tokens(p, 15)
    ref = target.generate_tokens(p[None], 15)
    np.testing.assert_array_equal(out, ref)


def test_sampled_matches_target_distribution():
    """temperature>0 speculative decoding (modified rejection sampling)
    must emit tokens distributed EXACTLY as target-only sampling —
    checked against the ANALYTIC two-token joint distribution computed
    from the target's logits (4096 i.i.d. rows in one program call;
    fixed seed, so the measured TV distance is deterministic)."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.interfaces.text import (SamplingParams,
                                                    _filtered_logits)

    V = 16
    tcfg = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=V,
                      n_positions=64)
    dcfg = GPT2Config(n_layer=1, n_head=1, n_embd=8, vocab_size=V,
                      n_positions=64)

    def iface(cfg, seed, ppr=True):
        wg = random_gpt2_weights(cfg, seed=seed)
        m = Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=64,
                                                dtype=DType.F32,
                                                pos_per_row=ppr))
        return TextInferenceInterface(m, max_len=64, prompt_buckets=(16,))

    target, draft = iface(tcfg, 3), iface(dcfg, 4)
    ref = iface(tcfg, 3, ppr=False)       # scalar-pos referee for logits()
    sp = SamplingParams(temperature=0.8, seed=5)
    B = 4096
    prompt = np.asarray([3, 9, 1, 14], np.int64)
    dec = SpeculativeDecoder(target, draft, k=3)
    toks = dec.generate_tokens(np.tile(prompt, (B, 1)), 2, sampling=sp)

    # analytic joint: p(t1) from the prompt, p(t2|t1) for every t1
    def probs_after(ids_batch):  # (N, L) -> (N, V) next-token dist
        lg = np.stack([ref.logits(r[None])[0, -1] for r in ids_batch])
        return np.asarray(jax.nn.softmax(
            _filtered_logits(jnp.asarray(lg), sp), axis=-1))

    p1 = probs_after(prompt[None])[0]                       # (V,)
    exts = np.stack([np.concatenate([prompt, [t]]) for t in range(V)])
    p2 = probs_after(exts)                                  # (V, V)
    joint = p1[:, None] * p2                                # (V, V)
    emp = np.zeros((V, V))
    np.add.at(emp, (toks[:, 0], toks[:, 1]), 1.0 / B)
    tv = 0.5 * np.abs(emp - joint).sum()
    # plain target-only sampling at the same B sets the sampling-noise
    # floor (~0.10 for 256 cells at B=4096); a biased sampler would sit
    # well above it (measured: spec 0.099 @4096 halves to 0.050 @16384,
    # exactly the 1/sqrt(B) noise law — no bias term)
    toks_p = ref.generate_tokens(np.tile(prompt, (B, 1)), 2, sampling=sp)
    emp_p = np.zeros((V, V))
    np.add.at(emp_p, (toks_p[:, 0], toks_p[:, 1]), 1.0 / B)
    tv_p = 0.5 * np.abs(emp_p - joint).sum()
    assert tv < max(1.35 * tv_p, 0.12), (tv, tv_p)

    # top-k support: emitted tokens stay inside the target's top-k set
    spk = SamplingParams(temperature=0.9, top_k=3, seed=6)
    toks_k = dec.generate_tokens(np.tile(prompt, (256, 1)), 1, sampling=spk)
    top3 = set(np.argsort(p1)[-3:])
    # p1 was computed at temperature 0.8 but top-3 by logit is
    # temperature-invariant
    assert set(np.unique(toks_k)) <= top3


def test_sampling_temperature_zero_is_greedy():
    target = _iface(TARGET_CFG, seed=0)
    draft = _iface(DRAFT_CFG, seed=1)
    dec = SpeculativeDecoder(target, draft, k=3)
    from whisper_tensor_tpu.interfaces.text import SamplingParams

    p = rng.integers(0, VOCAB, (6,)).astype(np.int64)
    out = dec.generate_tokens(p, 8, sampling=SamplingParams(temperature=0.0))
    ref = target.generate_tokens(p[None], 8)
    np.testing.assert_array_equal(out, ref)
    with pytest.raises(ValueError, match="repetition_penalty"):
        dec.generate_tokens(p, 4, sampling=SamplingParams(
            temperature=0.7, repetition_penalty=1.2))


def test_guards():
    target = _iface(TARGET_CFG, seed=0)
    draft = _iface(DRAFT_CFG, seed=1)
    with pytest.raises(ValueError, match="k must be"):
        SpeculativeDecoder(target, draft, k=1)
    small = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=50,
                       n_positions=MAX_LEN)
    with pytest.raises(ValueError, match="vocab"):
        SpeculativeDecoder(target, _iface(small, seed=2))
    dec = SpeculativeDecoder(target, draft, k=4)
    with pytest.raises(ValueError, match="pos_per_row"):
        dec.generate_tokens(rng.integers(0, VOCAB, (2, 5)), 4)
    with pytest.raises(ValueError, match="max_len"):
        dec.generate_tokens(rng.integers(0, VOCAB, (5,)), MAX_LEN)
