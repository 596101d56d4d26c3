"""Text-to-speech interface.

Reference equivalent: TextToSpeechInterface (src/interfaces.rs:2824;
TTSInputConfig :2790 with Piper/Kokoro/F5 variants; Kokoro voice
embeddings :2703). The model contract per engine:

  piper : tokens (1,T) i64, input_lengths (1,), scales (3,) -> audio
  kokoro: tokens (1,T), voice embedding (1,E) [per-length style row],
          speed () -> audio
  f5    : text tokens + reference audio tensor -> audio (flow matching)

Text preprocessing runs through phonemization + the per-engine id maps
(the same code the SuperGraph TTS nodes use).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from ..model import Model
from ..phonemization import kokoro_phoneme_ids, phonemize, piper_phoneme_ids
from ..super_graph.links import AudioClip


@dataclass
class TTSInputConfig:
    """Which engine + its preprocessing metadata (reference :2790)."""

    engine: str = "piper"                 # piper | kokoro | f5
    language: str = "en-us"
    sample_rate: int = 22050
    phoneme_id_map: Optional[Dict[str, list]] = None   # piper
    vocab: Optional[Dict[str, int]] = None             # kokoro
    voice_embeddings: Optional[np.ndarray] = None      # kokoro (styles, len, E)
    noise_scale: float = 0.667
    length_scale: float = 1.0
    noise_w: float = 0.8
    speed: float = 1.0


class TextToSpeechInterface:
    def __init__(self, model: Model, config: TTSInputConfig, mode: str = "xla"):
        self.model = model
        self.config = config
        self.voice_names: list = []
        self._backend = None
        self._mode = mode

    @classmethod
    def from_bundle(cls, bundle, mode: str = "xla"):
        """Build from a loader bundle (importers.loaders piper/kokoro/f5).
        Returns an F5Synthesizer for the f5 engine (3-model pipeline)."""
        spec = bundle.interfaces["tts"]
        if spec["engine"] == "f5":
            return F5Synthesizer(
                bundle.models[spec["preprocess"]],
                bundle.models[spec["transformer"]],
                bundle.models[spec["decode"]],
                vocab=spec["vocab"], nfe_steps=spec.get("nfe_steps", 32),
                sample_rate=spec.get("sample_rate", 24000), mode=mode)
        model = bundle.models[spec["model"]]
        cfg = TTSInputConfig(
            engine=spec["engine"],
            language=spec.get("language", "en-us"),
            sample_rate=spec.get("sample_rate", 22050),
            phoneme_id_map=spec.get("phoneme_id_map"),
            vocab=spec.get("vocab"),
            noise_scale=spec.get("noise_scale", 0.667),
            length_scale=spec.get("length_scale", 1.0),
            noise_w=spec.get("noise_w", 0.8))
        iface = cls(model, cfg, mode=mode)
        ve = bundle.meta.get("voice_embeddings")
        if ve:
            iface.voice_names = sorted(ve)
            cfg.voice_embeddings = np.stack([ve[n] for n in iface.voice_names])
        return iface

    def _run(self, feeds):
        from ..backends.eval_backend import EvalBackend

        if self._backend is None:
            self._backend = EvalBackend(self._mode)
        return self._backend.run(self.model.graph, feeds)

    def run_text_to_audio(self, text: str, voice: int = 0) -> AudioClip:
        cfg = self.config
        phonemes = phonemize(text, cfg.language)
        if cfg.engine == "piper":
            ids = piper_phoneme_ids(phonemes, cfg.phoneme_id_map)
            feeds = {
                "input": np.asarray(ids, dtype=np.int64)[None],
                "input_lengths": np.asarray([len(ids)], dtype=np.int64),
                "scales": np.asarray([cfg.noise_scale, cfg.length_scale,
                                      cfg.noise_w], dtype=np.float32),
            }
        elif cfg.engine == "kokoro":
            ids = kokoro_phoneme_ids(phonemes, cfg.vocab)
            feeds = {"tokens": np.asarray(ids, dtype=np.int64)[None],
                     "speed": np.asarray(cfg.speed, dtype=np.float32)}
            if cfg.voice_embeddings is not None:
                style = cfg.voice_embeddings[voice]
                row = style[min(len(ids) - 1, style.shape[0] - 1)]
                feeds["style"] = np.asarray(row, dtype=np.float32)[None]
        elif cfg.engine == "f5":
            vocab = cfg.vocab or {}
            ids = [vocab.get(c, 0) for c in text]
            feeds = {"tokens": np.asarray(ids, dtype=np.int64)[None]}
        else:
            raise ValueError(cfg.engine)
        out = self._run(feeds)
        key = "audio" if "audio" in out else "output"
        samples = np.asarray(out[key], dtype=np.float32).reshape(-1)
        return AudioClip(samples, cfg.sample_rate)


class F5Synthesizer:
    """F5-TTS: 3-model ONNX pipeline + NFE-step ODE denoising loop.

    Reference equivalent: load_f5_tts / build_f5_supergraph /
    build_f5_denoising_loop (crates/whisper-tensor-import/src/models/
    speech/f5_tts.rs:23-380). Per step the transformer predicts the
    denoised signal and the Euler update is
    noise <- (1 - dt) * noise + dt * denoised with dt = 1/NFE.
    """

    def __init__(self, preprocess: Model, transformer: Model, decode: Model,
                 vocab: Dict[str, int], nfe_steps: int = 32,
                 sample_rate: int = 24000, mode: str = "xla"):
        self.preprocess = preprocess
        self.transformer = transformer
        self.decode = decode
        self.vocab = vocab
        self.nfe_steps = nfe_steps
        self.sample_rate = sample_rate
        self._mode = mode
        self._backends: Dict[int, Any] = {}

    def _run(self, model: Model, feeds):
        from ..backends.eval_backend import EvalBackend

        be = self._backends.get(model.id)
        if be is None:
            be = EvalBackend(self._mode)
            self._backends[model.id] = be
        return be.run(model.graph, feeds)

    def text_ids(self, text: str) -> np.ndarray:
        return np.asarray([[self.vocab.get(c, 0) for c in text]],
                          dtype=np.int32)

    def _f5_loop_compiled(self, pre, noise: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        key = ("f5", tuple(np.asarray(noise).shape), self.nfe_steps)
        progs = getattr(self, "_programs", None)
        if progs is None:
            self._programs = progs = {}
        if key not in progs:
            milli, weight_inputs = self.transformer.graph.to_milli()
            from ..milli.transforms import apply_matmul_fusion

            fused, get_w = apply_matmul_fusion(
                milli, weight_inputs, self.transformer.graph.store)
            self._f5_get_w = get_w
            order = list(milli.inputs)
            wnames = [n for n in order
                      if n in weight_inputs or n in fused]
            out_names = list(milli.outputs)
            fn = _trace_graph(milli, {})
            nfe = self.nfe_steps

            def run(noise, fixed_names, fixed, weights):
                by0 = dict(zip(fixed_names, fixed))
                by0.update(dict(zip(wnames, weights)))
                dt = 1.0 / nfe

                def body(noise, i):
                    by = dict(by0)
                    by["noise"] = noise
                    by["time_step"] = i.astype(jnp.int32)
                    outs = fn(*[by[n] for n in order])
                    den = dict(zip(out_names, outs))["denoised"]
                    return ((1.0 - dt) * noise
                            + dt * den.astype(noise.dtype)), None

                noise, _ = jax.lax.scan(body, noise, jnp.arange(nfe))
                return noise

            progs[key] = (jax.jit(run, static_argnums=(1,)), wnames)
        prog, wnames = progs[key]
        fixed_names = tuple(sorted(
            n for n in ("rope_cos", "rope_sin", "cat_mel_text",
                        "cat_mel_text_drop", "qk_rotated_empty")))
        fixed = tuple(jnp.asarray(np.asarray(pre[n])) for n in fixed_names)
        weights = [jnp.asarray(self._f5_get_w(n)) for n in wnames]
        return np.asarray(prog(jnp.asarray(noise, jnp.float32),
                               fixed_names, fixed, weights))

    def run_text_to_audio(self, text: str, ref_audio: AudioClip = None,
                          max_duration: int = 0, observer=None) -> AudioClip:
        if ref_audio is None:
            raise ValueError("F5 needs a reference AudioClip (voice prompt)")
        audio = np.asarray(ref_audio.samples, dtype=np.float32).reshape(1, 1, -1)
        pre = self._run(self.preprocess, {
            "audio": audio,
            "text_ids": self.text_ids(text),
            "max_duration": np.asarray(max_duration, dtype=np.int64)})
        noise = np.asarray(pre["noise"], dtype=np.float32)
        dt = 1.0 / self.nfe_steps
        done_compiled = False
        if self._mode == "xla":
            # fuse the whole ODE loop into one jitted scan (per-step
            # dispatch costs ~55 ms through the TPU tunnel; 32 steps of
            # it would dwarf the model time). External ONNX exports may
            # contain non-jittable ops — fall back to the step loop.
            try:
                noise = self._f5_loop_compiled(pre, noise)
                done_compiled = True
                if observer is not None:
                    observer.on_progress(self, 1.0)
            except Exception as e:
                # expected for external ONNX exports with non-jittable
                # ops (GraphNotJittable / unsupported-variant guards);
                # anything else is a regression in the fused ODE program
                # and must stay visible, not silently become a 32x
                # slower per-step loop (ADVICE r2).
                from ..backends.xla.compiler import GraphNotJittable

                if not isinstance(e, (GraphNotJittable,
                                      NotImplementedError)):
                    import logging

                    logging.getLogger(__name__).warning(
                        "F5 fused ODE program failed (%s: %s); falling "
                        "back to per-step loop", type(e).__name__, e)
        if not done_compiled:
            for i in range(self.nfe_steps):
                out = self._run(self.transformer, {
                    "noise": noise.astype(np.float32),
                    "rope_cos": pre["rope_cos"],
                    "rope_sin": pre["rope_sin"],
                    "cat_mel_text": pre["cat_mel_text"],
                    "cat_mel_text_drop": pre["cat_mel_text_drop"],
                    "qk_rotated_empty": pre["qk_rotated_empty"],
                    "time_step": np.asarray(i, dtype=np.int32)})
                denoised = np.asarray(out["denoised"], dtype=np.float32)
                noise = (1.0 - dt) * noise + dt * denoised
                if observer is not None:
                    observer.on_progress(self, (i + 1) / self.nfe_steps)
        dec = self._run(self.decode, {
            "denoised": noise,
            "ref_signal_len": pre["ref_signal_len"]})
        samples = np.asarray(dec["output_audio"], dtype=np.float32).reshape(-1)
        return AudioClip(samples, self.sample_rate)
