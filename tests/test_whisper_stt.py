"""Whisper recipe + STT interface vs torch transformers (tiny random)."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.speech.whisper import (
    WhisperConfig, build_whisper_decoder_step, build_whisper_encoder)
from whisper_tensor_tpu.model import Model

N_FRAMES = 200  # tiny mel length for tests (multiple of 2)


@pytest.fixture(scope="module")
def tiny_whisper():
    import torch
    from transformers import WhisperConfig as HFCfg
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFCfg(
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=16,
        max_source_positions=N_FRAMES // 2, max_target_positions=64,
        vocab_size=120, dropout=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=5))
    hf.eval()
    cfg = WhisperConfig(d_model=32, encoder_layers=2, decoder_layers=2,
                        encoder_attention_heads=4, decoder_attention_heads=4,
                        encoder_ffn_dim=64, decoder_ffn_dim=64,
                        num_mel_bins=16, max_source_positions=N_FRAMES // 2,
                        max_target_positions=64, vocab_size=120)
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    enc = Model.new_from_onnx(build_whisper_encoder(
        lambda n: sd[n], cfg, n_frames=N_FRAMES), name="enc")
    dec = Model.new_from_onnx(build_whisper_decoder_step(
        lambda n: sd[n], cfg, max_len=64, n_frames=N_FRAMES), name="dec")
    return hf, enc, dec, cfg


def test_encoder_matches_torch(tiny_whisper):
    import torch

    hf, enc, dec, cfg = tiny_whisper
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, N_FRAMES)).astype(np.float32)
    out = enc.eval({"mel": mel})
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(out["encoder_states"], ref, rtol=2e-3, atol=2e-4)
    assert out["cross_k_0"].shape == (1, 4, N_FRAMES // 2, 8)


def test_cached_decode_matches_torch_teacher_forced(tiny_whisper):
    """Step-by-step cached decode logits must match torch teacher-forced
    logits at every position (greedy free-running comparison is fragile
    under random-weight argmax ties)."""
    import torch

    hf, enc, dec, cfg = tiny_whisper
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 16, N_FRAMES)).astype(np.float32)
    seq = [5, 42, 17, 88, 3]
    with torch.no_grad():
        tl = hf(torch.from_numpy(mel),
                decoder_input_ids=torch.tensor([seq])).logits.numpy()

    e = enc.eval({"mel": mel})
    feeds = {}
    for i in range(cfg.decoder_layers):
        feeds[f"cross_k_{i}"] = e[f"cross_k_{i}"]
        feeds[f"cross_v_{i}"] = e[f"cross_v_{i}"]
        feeds[f"cache_k_{i}"] = np.zeros((1, 4, 64, 8), np.float32)
        feeds[f"cache_v_{i}"] = np.zeros((1, 4, 64, 8), np.float32)
    # one token at a time through the fixed-size cache
    for t, tok in enumerate(seq):
        out = dec.eval({**feeds, "input_ids": np.asarray([[tok]], dtype=np.int64),
                        "pos": np.asarray(t, dtype=np.int64)})
        for i in range(cfg.decoder_layers):
            feeds[f"cache_k_{i}"] = out[f"new_cache_k_{i}"]
            feeds[f"cache_v_{i}"] = out[f"new_cache_v_{i}"]
        np.testing.assert_allclose(out["logits"][0, 0], tl[0, t],
                                   rtol=2e-3, atol=2e-4, err_msg=f"pos {t}")


def test_stt_interface_runs_end_to_end(tiny_whisper):
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    hf, enc, dec, cfg = tiny_whisper
    iface = SpeechToTextInterface(enc, dec, max_len=64, n_mels=16,
                                  n_frames=N_FRAMES, sot_sequence=[5],
                                  eot_token=119)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 16, N_FRAMES)).astype(np.float32)
    iface.mel_from_audio = lambda clip: mel
    toks = iface.transcribe_tokens(AudioClip(np.zeros(100, np.float32), 16000),
                                   max_new=6)
    assert len(toks) <= 6
    assert all(0 <= t < cfg.vocab_size for t in toks)


def test_mel_frontend_shapes():
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    class Dummy:
        pass

    iface = SpeechToTextInterface(Dummy(), Dummy(), n_mels=80, n_frames=3000)
    clip = AudioClip(np.sin(np.linspace(0, 100, 8000)).astype(np.float32), 8000)
    mel = iface.mel_from_audio(clip)
    assert mel.shape == (1, 80, 3000)


def test_whisper_loader_dispatch(tmp_path):
    """HF whisper checkpoint dir -> identify_and_load -> STT interface
    transcribes end to end."""
    import torch
    from transformers import WhisperConfig as HFW
    from transformers import WhisperForConditionalGeneration

    from whisper_tensor_tpu.importers.loaders import identify_and_load
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFW(
        vocab_size=64, d_model=16, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=32,
        decoder_start_token_id=1, pad_token_id=0, eos_token_id=2))
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    bundle = identify_and_load(str(tmp_path), dtype="f32")
    assert bundle.meta["model_type"] == "whisper"
    spec = bundle.interfaces["stt"]
    assert spec["sot"] == 1 and spec["eot"] == 2 and spec["max_len"] == 32
    iface = SpeechToTextInterface.from_bundle(bundle)
    assert iface.max_len == 32 and iface.sot_sequence == [1]
    t = np.linspace(0, 1, 16000)
    clip = AudioClip((0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
                     16000)
    toks = iface.transcribe_tokens(clip, max_new=5)
    assert all(0 <= t_ < 64 for t_ in toks)


def test_compiled_decode_matches_python_loop(tiny_whisper):
    """The one-dispatch compiled scan decode (prefill + greedy loop +
    EOT masking in one jitted program) must emit exactly the python
    per-step loop's tokens."""
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    hf, enc, dec, cfg = tiny_whisper
    iface = SpeechToTextInterface(enc, dec, max_len=64, n_mels=16,
                                  n_frames=N_FRAMES, sot_sequence=[5],
                                  eot_token=119)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 16, N_FRAMES)).astype(np.float32)
    loop = iface._transcribe_mel(mel, 10)
    fast = iface._transcribe_compiled(mel, 10)
    assert fast == loop, (fast, loop)


def test_transcribe_long_chunks_concatenate(tiny_whisper):
    """Audio longer than one mel window transcribes as the
    concatenation of its per-window transcriptions."""
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    hf, enc, dec, cfg = tiny_whisper
    iface = SpeechToTextInterface(enc, dec, max_len=64, n_mels=16,
                                  n_frames=N_FRAMES, sot_sequence=[5],
                                  eot_token=119)
    rng = np.random.default_rng(3)
    chunk_samples = N_FRAMES * 160
    audio = rng.standard_normal(2 * chunk_samples).astype(np.float32) * 0.1
    long_toks = iface.transcribe_long(
        AudioClip(audio, 16000), max_new_per_chunk=8)
    a = iface._transcribe_compiled(
        iface.mel_from_samples(audio[:chunk_samples]), 8)
    b = iface._transcribe_compiled(
        iface.mel_from_samples(audio[chunk_samples:]), 8)
    assert long_toks == a + b


def test_beam_transcription_matches_hf_generate(tiny_whisper):
    """Whisper beam search (the seq2seq one-program beam with a forced
    multi-token SOT prefix) matches hf.generate(num_beams=W)."""
    import torch

    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface
    from whisper_tensor_tpu.super_graph.links import AudioClip

    hf, enc, dec, cfg = tiny_whisper
    iface = SpeechToTextInterface(enc, dec, max_len=64, n_mels=16,
                                  n_frames=N_FRAMES, sot_sequence=[5],
                                  eot_token=119)
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((1, 16, N_FRAMES)).astype(np.float32)
    iface.mel_from_audio = lambda clip: mel
    W, n_new = 3, 6
    ours = iface.transcribe_beam(
        AudioClip(np.zeros(100, np.float32), 16000), max_new=n_new, beam=W)

    with torch.no_grad():
        ref = hf.generate(
            input_features=torch.from_numpy(mel), num_beams=W,
            max_new_tokens=n_new, min_new_tokens=n_new, do_sample=False,
            length_penalty=0.0, early_stopping=False,
            decoder_start_token_id=5,
            suppress_tokens=None, begin_suppress_tokens=None,
            use_cache=True)
    # hf counts the decoder_start token toward max length, so it may
    # return n_new-1 continuation tokens; compare on the overlap
    ref_toks = [int(t) for t in ref[0][1:1 + n_new]]
    k = min(len(ours), len(ref_toks))
    assert k >= n_new - 1
    assert ours[:k] == ref_toks[:k], (ours, ref_toks)


def test_sot_template_null_slots(tiny_whisper):
    """HF forced_decoder_ids null (auto-detect language) keeps its
    POSITION: resolution fills <|en|> by default, sot_with substitutes
    in place without shifting the task slot."""
    from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface

    hf, enc, dec, cfg = tiny_whisper

    class _Inner:
        def token_to_id(self, s):
            return {"<|en|>": 11, "<|de|>": 12,
                    "<|translate|>": 13}.get(s)

    class _StubTok:
        _tok = _Inner()

    iface = SpeechToTextInterface(enc, dec, tokenizer=_StubTok(),
                                  n_mels=16, sot_sequence=[5, None, 7])
    assert iface.sot_template == [5, None, 7]
    assert iface.sot_sequence == [5, 11, 7]        # null lang -> <|en|>
    assert iface.sot_with(language="de") == [5, 12, 7]
    assert iface.sot_with(task="translate") == [5, 11, 13]
    with pytest.raises(ValueError):
        iface.sot_with(language="zz")

    # no tokenizer: the unresolvable slot drops (old behavior)
    bare = SpeechToTextInterface(enc, dec, n_mels=16,
                                 sot_sequence=[5, None, 7])
    assert bare.sot_sequence == [5, 7]


class TestStreaming:
    """StreamingTranscriber: online transcription (net-new beyond the
    reference's batch STT)."""

    def _iface(self, tiny_whisper):
        from whisper_tensor_tpu.interfaces.stt import SpeechToTextInterface

        hf, enc, dec, cfg = tiny_whisper
        return SpeechToTextInterface(enc, dec, max_len=64, n_mels=16,
                                     n_frames=N_FRAMES, sot_sequence=[5],
                                     eot_token=119)

    def test_conservative_stream_equals_long_form(self, tiny_whisper):
        """agreement=None: the final committed token stream equals
        transcribe_long for the same audio, regardless of feed
        chunking."""
        from whisper_tensor_tpu.interfaces.stt import StreamingTranscriber
        from whisper_tensor_tpu.super_graph.links import AudioClip

        iface = self._iface(tiny_whisper)
        rng = np.random.default_rng(11)
        W = N_FRAMES * 160
        audio = rng.standard_normal(int(2.4 * W)).astype(np.float32) * 0.1
        ref = iface.transcribe_long(AudioClip(audio, 16000),
                                    max_new_per_chunk=8)

        st = StreamingTranscriber(iface, local_agreement=None,
                                  max_new_per_window=8)
        got = []
        for off in range(0, len(audio), 7001):  # odd chunk size
            got.extend(st.feed(audio[off:off + 7001]))
        got.extend(st.flush())
        assert got == ref
        assert got == st.committed

    def test_single_window_stream_equals_batch(self, tiny_whisper):
        from whisper_tensor_tpu.interfaces.stt import StreamingTranscriber
        from whisper_tensor_tpu.super_graph.links import AudioClip

        iface = self._iface(tiny_whisper)
        rng = np.random.default_rng(12)
        audio = rng.standard_normal(20000).astype(np.float32) * 0.1
        ref = iface.transcribe_tokens(AudioClip(audio, 16000), 8,
                                      compiled=True)
        st = StreamingTranscriber(iface, local_agreement=None,
                                  max_new_per_window=8)
        st.feed(audio[:9000])
        st.feed(audio[9000:])
        got = list(st.committed) + st.flush()
        assert st.committed == ref and got == ref

    def test_local_agreement_commits_early(self, tiny_whisper):
        """Two consecutive identical hypotheses commit the agreed
        prefix BEFORE flush; an empty feed re-decodes the same buffer,
        which forces full agreement."""
        from whisper_tensor_tpu.interfaces.stt import StreamingTranscriber

        iface = self._iface(tiny_whisper)
        rng = np.random.default_rng(13)
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        hyp = iface._transcribe_compiled(iface.mel_from_samples(audio), 8)

        st = StreamingTranscriber(iface, local_agreement=2,
                                  max_new_per_window=8)
        first = st.feed(audio)
        assert first == []              # only one hypothesis so far
        assert st.pending == hyp        # live (uncommitted) hypothesis
        second = st.feed(np.zeros(0, np.float32))
        assert second == hyp            # agreement reached -> committed
        assert st.pending == []
        assert st.flush() == []         # nothing new at end of stream
        assert st.committed == hyp

    def test_agreement_commits_are_monotonic_prefixes(self, tiny_whisper):
        from whisper_tensor_tpu.interfaces.stt import StreamingTranscriber

        iface = self._iface(tiny_whisper)
        rng = np.random.default_rng(14)
        audio = rng.standard_normal(28000).astype(np.float32) * 0.1
        st = StreamingTranscriber(iface, local_agreement=2,
                                  max_new_per_window=8)
        seen = []
        for off in range(0, len(audio), 5000):
            new = st.feed(audio[off:off + 5000])
            seen.extend(new)
            assert st.committed == seen          # append-only
        seen.extend(st.flush())
        assert st.committed == seen
