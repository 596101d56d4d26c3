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
