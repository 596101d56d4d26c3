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
    def from_bundle(cls, bundle, mode: str = "xla") -> "TextToSpeechInterface":
        """Build from a loader bundle (importers.loaders piper/kokoro)."""
        spec = bundle.interfaces["tts"]
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
