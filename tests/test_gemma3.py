"""Gemma-3 text recipe (QK-norm + alternating sliding-window) vs torch."""

import numpy as np
import pytest

from whisper_tensor_tpu.importers.recipes.llm.gemma3 import (Gemma3Config,
                                                             build_gemma3_step)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model

MAXLEN = 32


@pytest.fixture(scope="module")
def tiny_gemma3():
    import torch
    from transformers import Gemma3TextConfig as HFCfg
    from transformers import Gemma3ForCausalLM

    torch.manual_seed(0)
    common = dict(num_hidden_layers=4, num_attention_heads=4,
                  num_key_value_heads=2, hidden_size=32, head_dim=8,
                  intermediate_size=64, vocab_size=99,
                  query_pre_attn_scalar=8.0, sliding_window=8,
                  rope_theta=1e6, rope_local_base_freq=1e4,
                  rms_norm_eps=1e-6, attention_dropout=0.0)
    hf = Gemma3ForCausalLM(HFCfg(max_position_embeddings=MAXLEN,
                                 sliding_window_pattern=2, **common))
    hf.eval()
    cfg = Gemma3Config.from_hf({**common, "sliding_window_pattern": 2,
                                "model_type": "gemma3_text"})
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}

    def get(name):
        if name == "lm_head.weight" and name not in sd:
            return sd["model.embed_tokens.weight"]
        return sd[name]

    data = build_gemma3_step(get, cfg, max_len=MAXLEN)
    return hf, Model.new_from_onnx(data, name="tiny-gemma3"), cfg


def test_layer_pattern(tiny_gemma3):
    hf, model, cfg = tiny_gemma3
    assert [cfg.is_global_layer(i) for i in range(4)] == [False, True, False, True]


def test_logits_match_torch(tiny_gemma3):
    """Sequence longer than the sliding window so local masking matters."""
    import torch

    hf, model, cfg = tiny_gemma3
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, (1, 14)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16,))
    lg = iface.logits(ids)
    with torch.no_grad():
        tl = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(lg, tl, rtol=4e-3, atol=4e-4)


def test_greedy_matches_torch(tiny_gemma3):
    import torch

    hf, model, cfg = tiny_gemma3
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 99, (1, 10)).astype(np.int64)
    iface = TextInferenceInterface(model, max_len=MAXLEN, prompt_buckets=(16,))
    ours = iface.generate_tokens(prompt, 8)[0]
    with torch.no_grad():
        full = hf.generate(torch.from_numpy(prompt), max_new_tokens=8,
                           do_sample=False, pad_token_id=0)
    np.testing.assert_array_equal(ours, full[0, 10:].numpy())
