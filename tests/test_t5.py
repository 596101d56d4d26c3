"""T5 encoder-decoder recipe vs torch transformers."""

import numpy as np
import pytest

from whisper_tensor_tpu.importers.recipes.llm.t5 import (T5Config,
                                                         build_t5_decoder_step,
                                                         build_t5_encoder)
from whisper_tensor_tpu.model import Model

ENC_LEN, MAX_DEC = 12, 16


@pytest.fixture(scope="module", params=[False, True], ids=["relu", "gated"])
def tiny_t5(request):
    import torch
    from transformers import T5Config as HFCfg
    from transformers import T5ForConditionalGeneration

    gated = request.param
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(HFCfg(
        num_layers=2, num_decoder_layers=2, num_heads=2, d_model=16,
        d_kv=8, d_ff=32, vocab_size=90, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=not gated,
        decoder_start_token_id=0, relative_attention_num_buckets=8,
        relative_attention_max_distance=16))
    hf.eval()
    cfg = T5Config(num_layers=2, num_decoder_layers=2, num_heads=2,
                   d_model=16, d_kv=8, d_ff=32, vocab_size=90,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16,
                   is_gated_act=gated, tie_word_embeddings=not gated)
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}

    def get(name):
        if name == "lm_head.weight" and name not in sd:
            return sd["shared.weight"]
        return sd[name]

    enc = Model.new_from_onnx(build_t5_encoder(get, cfg, seq_len=ENC_LEN),
                              name="t5-enc")
    dec = Model.new_from_onnx(build_t5_decoder_step(
        get, cfg, max_len=MAX_DEC, enc_len=ENC_LEN), name="t5-dec")
    return hf, enc, dec, cfg


def test_encoder_matches_torch(tiny_t5):
    import torch

    hf, enc, dec, cfg = tiny_t5
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 90, (1, ENC_LEN)).astype(np.int64)
    out = enc.eval({"input_ids": ids})
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(out["encoder_states"], ref, rtol=2e-3, atol=2e-4)


def test_cached_decode_matches_torch_teacher_forced(tiny_t5):
    import torch

    hf, enc, dec, cfg = tiny_t5
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 90, (1, ENC_LEN)).astype(np.int64)
    dec_seq = [0, 7, 33, 12]
    with torch.no_grad():
        tl = hf(input_ids=torch.from_numpy(ids),
                decoder_input_ids=torch.tensor([dec_seq])).logits.numpy()
    e = enc.eval({"input_ids": ids})
    feeds = {}
    for i in range(cfg.num_decoder_layers):
        feeds[f"cross_k_{i}"] = e[f"cross_k_{i}"]
        feeds[f"cross_v_{i}"] = e[f"cross_v_{i}"]
        feeds[f"cache_k_{i}"] = np.zeros((1, 2, MAX_DEC, 8), np.float32)
        feeds[f"cache_v_{i}"] = np.zeros((1, 2, MAX_DEC, 8), np.float32)
    for t, tok in enumerate(dec_seq):
        out = dec.eval({**feeds, "input_ids": np.asarray([[tok]], dtype=np.int64),
                        "pos": np.asarray(t, dtype=np.int64)})
        for i in range(cfg.num_decoder_layers):
            feeds[f"cache_k_{i}"] = out[f"new_cache_k_{i}"]
            feeds[f"cache_v_{i}"] = out[f"new_cache_v_{i}"]
        np.testing.assert_allclose(out["logits"][0, 0], tl[0, t],
                                   rtol=3e-3, atol=3e-4, err_msg=f"pos {t}")


def test_rel_bucket_matches_hf():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    from whisper_tensor_tpu.importers.recipes.llm.t5 import _rel_bucket

    rel = np.arange(-20, 21)[None, :] - np.zeros((1, 1), dtype=np.int64)
    for bidir in (True, False):
        ours = _rel_bucket(rel, bidir, 8, 16)
        ref = T5Attention._relative_position_bucket(
            torch.from_numpy(rel), bidirectional=bidir, num_buckets=8,
            max_distance=16).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_seq2seq_interface_greedy_matches_hf_generate(tiny_t5):
    """Compiled scan decode == hf.generate greedy, through the
    Seq2SeqInterface (the reference ran T5 per-token; here one program)."""
    import torch

    from whisper_tensor_tpu.interfaces.seq2seq import Seq2SeqInterface

    hf, enc, dec, cfg = tiny_t5
    iface = Seq2SeqInterface(enc, dec, max_len=MAX_DEC, start_token=0,
                             eos_token=1)
    rng = np.random.default_rng(5)
    ids = rng.integers(2, 90, (2, ENC_LEN)).astype(np.int64)
    n_new = 10
    ours = iface.generate_tokens(ids, n_new)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=n_new,
                          do_sample=False, num_beams=1,
                          min_new_tokens=n_new,
                          eos_token_id=None).numpy()
    # hf output: [decoder_start, t1, ..., t_n]
    np.testing.assert_array_equal(ours, ref[:, 1:1 + n_new])


def test_t5_loader_roundtrip(tmp_path, tiny_t5):
    """transformers loader t5 branch -> Seq2SeqInterface end to end."""
    from whisper_tensor_tpu.importers.loaders import loader_registry
    from whisper_tensor_tpu.interfaces.seq2seq import Seq2SeqInterface

    hf, _enc, _dec, cfg = tiny_t5
    d = tmp_path / "tiny-t5"
    hf.save_pretrained(str(d), safe_serialization=True)
    bundle = loader_registry()["transformers"].load(
        {"path": str(d), "dtype": "f32", "max_len": MAX_DEC,
         "enc_len": ENC_LEN})
    spec = bundle.interfaces["text2text"]
    iface = Seq2SeqInterface(bundle.models[spec["encoder"]],
                             bundle.models[spec["decoder"]],
                             max_len=spec["max_len"],
                             start_token=spec["start"],
                             eos_token=spec["eos"])
    ids = np.random.default_rng(6).integers(2, 90, (1, ENC_LEN)).astype(np.int64)
    out = iface.generate_tokens(ids, 6)
    assert out.shape == (1, 6)
    import torch

    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=6,
                          do_sample=False, num_beams=1, min_new_tokens=6,
                          eos_token_id=None).numpy()
    np.testing.assert_array_equal(out, ref[:, 1:7])


def test_beam_search_matches_hf(tiny_t5):
    """Compiled one-scan beam search == hf.generate(num_beams=W) with
    EOS disabled (pure max-logprob paths, no length effects)."""
    import torch

    from whisper_tensor_tpu.interfaces.seq2seq import Seq2SeqInterface

    hf, enc, dec, cfg = tiny_t5
    iface = Seq2SeqInterface(enc, dec, max_len=MAX_DEC, start_token=0,
                             eos_token=1)
    rng = np.random.default_rng(8)
    ids = rng.integers(2, 90, (2, ENC_LEN)).astype(np.int64)
    n_new, W = 8, 4
    ours = iface.beam_search_tokens(ids, n_new, beam=W)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=n_new,
                          min_new_tokens=n_new, num_beams=W,
                          do_sample=False, eos_token_id=None,
                          early_stopping=False,
                          length_penalty=0.0).numpy()
    np.testing.assert_array_equal(ours, ref[:, 1:1 + n_new])


def test_beam_search_eos_freezes(tiny_t5):
    """After a beam emits EOS it extends only with EOS at zero cost
    (finished sequences stay fixed and comparable)."""
    from whisper_tensor_tpu.interfaces.seq2seq import Seq2SeqInterface

    hf, enc, dec, cfg = tiny_t5
    iface = Seq2SeqInterface(enc, dec, max_len=MAX_DEC, start_token=0,
                             eos_token=1)
    ids = np.random.default_rng(9).integers(2, 90, (1, ENC_LEN)).astype(np.int64)
    out = iface.beam_search_tokens(ids, 10, beam=3)[0]
    lst = list(out)
    if 1 in lst:
        k = lst.index(1)
        assert all(t == 1 for t in lst[k:]), lst
