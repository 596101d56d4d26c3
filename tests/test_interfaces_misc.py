"""TTS + multimodal interface tests (dummy ONNX vocoders; text+embedding
multimodal round trip over the GPT-2 step model)."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
from whisper_tensor_tpu.model import Model


def _dummy_piper_model():
    """tokens -> repeated upsampled 'audio' (structure-only vocoder)."""
    b = OnnxBuilder("piper-dummy")
    b.input("input", DType.I64, [1, "tokens"])
    b.input("input_lengths", DType.I64, [1])
    b.input("scales", DType.F32, [3])
    f = b.cast("input", DType.F32)
    up = b.node("Unsqueeze", [f, b.const_i64([2])])
    up = b.node("Expand", [up, b.const_i64([1, 1, 64])])
    flat = b.reshape(up, [1, -1])
    scale0 = b.slice_("scales", [0], [1])
    out = b.mul(flat, scale0)
    b.node("Identity", [out], outputs=["output"])
    b.output("output", DType.F32, [1, "samples"])
    return Model.new_from_onnx(b.build(), name="piper-dummy")


def test_piper_tts_interface():
    from whisper_tensor_tpu.interfaces.tts import (TTSInputConfig,
                                                   TextToSpeechInterface)

    cfg = TTSInputConfig(engine="piper", sample_rate=16000,
                         phoneme_id_map={"^": [1], "$": [2], "_": [0],
                                         "h": [10], "i": [11]})
    iface = TextToSpeechInterface(_dummy_piper_model(), cfg, mode="oracle")
    clip = iface.run_text_to_audio("hi")
    assert clip.sample_rate == 16000
    assert clip.samples.size > 64
    assert clip.duration_s > 0


def test_kokoro_tts_preprocessing():
    from whisper_tensor_tpu.phonemization import kokoro_phoneme_ids, phonemize

    ph = phonemize("hello world")
    assert len(ph) > 3
    ids = kokoro_phoneme_ids(ph, {c: i + 1 for i, c in enumerate(set(ph))})
    assert ids[0] == 0 and ids[-1] == 0 and len(ids) > 4


def test_multimodal_text_plus_embedding():
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.multimodal import \
        MultimodalLanguageInterface
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.super_graph.links import MultimodalItem
    from whisper_tensor_tpu.tokenizer import ByteTokenizer

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=300,
                     n_positions=64)
    getter = random_gpt2_weights(cfg)
    model = Model.new_from_onnx(build_gpt2_step(getter, cfg, max_len=64),
                                name="mm-gpt2")
    text_iface = TextInferenceInterface(model, max_len=64,
                                        prompt_buckets=(16, 32))
    text_iface.tokenizer = ByteTokenizer()
    mm = MultimodalLanguageInterface(text_iface, embed_weight_name="wte")
    wte = getter("transformer.wte.weight")
    items = [MultimodalItem(text="ab"),
             MultimodalItem(embedding=wte[50])]  # a raw embedding token
    out = mm.run_items_in_string_out(items, n_new=4)
    assert isinstance(out, str)
    # requantization must be exact for text + exact embedding rows
    fused = mm.embed_items(items)
    assert fused.shape[1] == 3  # 'a','b' + 1 embedding token


class TestSampling:
    """Sampling inside the jitted decode scan (temperature/top-k/top-p)."""

    @pytest.fixture(scope="class")
    def iface(self):
        from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
            GPT2Config, build_gpt2_step, random_gpt2_weights)
        from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
        from whisper_tensor_tpu.model import Model

        cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=97,
                         n_positions=64)
        m = Model.new_from_onnx(build_gpt2_step(random_gpt2_weights(cfg),
                                                cfg, max_len=64))
        return TextInferenceInterface(m, max_len=64, prompt_buckets=(8, 16))

    def _prompt(self):
        return np.random.default_rng(0).integers(0, 97, (2, 6)).astype(np.int64)

    def test_seeded_sampling_is_reproducible(self, iface):
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        sp = SamplingParams(temperature=1.0, seed=7)
        a = iface.generate_tokens(p, 12, sampling=sp)
        b = iface.generate_tokens(p, 12, sampling=sp)
        np.testing.assert_array_equal(a, b)
        c = iface.generate_tokens(p, 12,
                                  sampling=SamplingParams(temperature=1.0,
                                                          seed=8))
        assert not np.array_equal(a, c)

    def test_top_k_1_equals_greedy(self, iface):
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        greedy = iface.generate_tokens(p, 10)
        k1 = iface.generate_tokens(p, 10, sampling=SamplingParams(
            temperature=1.0, top_k=1, seed=3))
        np.testing.assert_array_equal(greedy, k1)

    def test_tiny_top_p_equals_greedy(self, iface):
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        greedy = iface.generate_tokens(p, 10)
        tp = iface.generate_tokens(p, 10, sampling=SamplingParams(
            temperature=1.0, top_p=1e-6, seed=5))
        np.testing.assert_array_equal(greedy, tp)

    def test_high_temperature_diversifies(self, iface):
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        greedy = iface.generate_tokens(p, 16)
        hot = iface.generate_tokens(p, 16, sampling=SamplingParams(
            temperature=5.0, seed=11))
        assert not np.array_equal(greedy, hot)

    def test_min_p_1_equals_greedy(self, iface):
        # min_p=1.0 keeps only tokens at the max probability — the
        # categorical draw collapses to argmax
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        greedy = iface.generate_tokens(p, 10)
        mp = iface.generate_tokens(p, 10, sampling=SamplingParams(
            temperature=1.0, min_p=1.0, seed=13))
        np.testing.assert_array_equal(greedy, mp)

    def test_min_p_filter_matches_reference(self):
        # _filtered_logits min-p mask vs an independent numpy formula
        import jax

        from whisper_tensor_tpu.interfaces.text import (SamplingParams,
                                                        _filtered_logits)

        rng = np.random.default_rng(3)
        lg = rng.normal(size=(4, 50)).astype(np.float32) * 3
        sp = SamplingParams(temperature=0.7, min_p=0.15)
        out = np.asarray(jax.jit(
            lambda x: _filtered_logits(x, sp))(lg))
        t = lg / 0.7
        probs = np.exp(t - t.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        keep = probs >= 0.15 * probs.max(-1, keepdims=True)
        assert np.array_equal(np.isfinite(out), keep)
        np.testing.assert_allclose(out[keep], t[keep], rtol=1e-6)
        assert 0 < keep.sum() < keep.size  # the filter actually bites

    def test_presence_frequency_penalties_match_reference(self, iface):
        # greedy decode with OpenAI-style additive penalties vs an
        # independent teacher-forced numpy loop over iface.logits
        from whisper_tensor_tpu.interfaces.text import SamplingParams

        p = self._prompt()
        n_new = 10
        a_pres, a_freq = 1.5, 0.9
        got = iface.generate_tokens(p, n_new, sampling=SamplingParams(
            temperature=0.0, presence_penalty=a_pres, frequency_penalty=a_freq))

        V = 97
        want = np.zeros((p.shape[0], n_new), np.int64)
        for b in range(p.shape[0]):
            seq = list(p[b])
            cnt = np.zeros(V, np.float32)
            for t in seq:
                cnt[int(t)] += 1
            for i in range(n_new):
                lg = np.asarray(iface.logits(
                    np.asarray(seq, np.int64)[None])[0, -1], np.float32)
                lg = lg - a_pres * (cnt > 0) - a_freq * cnt
                nxt = int(np.argmax(lg))
                want[b, i] = nxt
                seq.append(nxt)
                cnt[nxt] += 1
        np.testing.assert_array_equal(got, want)
        # and the penalties actually change the greedy output
        assert not np.array_equal(got, iface.generate_tokens(p, n_new))
