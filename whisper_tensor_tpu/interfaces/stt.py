"""Speech-to-text interface (Whisper encoder-decoder).

Reference equivalent: SpeechToTextInterface (src/interfaces.rs:2851):
audio -> mel spectrogram -> encoder -> greedy decoder with forced
prefix tokens.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..dtype import DType
from ..model import Model
from ..super_graph.links import AudioClip
from ..utils.audio import log_mel_spectrogram, resample


class SpeechToTextInterface:
    def __init__(self, encoder: Model, decoder_step: Model,
                 tokenizer=None, max_len: Optional[int] = None,
                 n_mels: int = 80, n_frames: int = 3000,
                 sot_sequence: Optional[List[int]] = None,
                 eot_token: int = 50257):
        self.encoder = encoder
        self.decoder = decoder_step
        self.tokenizer = tokenizer
        # default: read the KV-cache length baked into the decoder graph
        # (declared shape of the cache_k_0 input) so callers can't feed
        # caches of the wrong length
        if max_len is None:
            max_len = 448
            graph = getattr(decoder_step, "graph", None)
            if graph is not None:
                for t in graph.inputs:
                    ti = graph.tensors[t]
                    if ti.name == "cache_k_0" and ti.info.shape[2].is_known:
                        max_len = int(ti.info.shape[2].value())
                        break
        self.max_len = max_len
        self.n_mels = n_mels
        self.n_frames = n_frames
        self.sot_sequence = sot_sequence or [50258]
        self.eot_token = eot_token
        self._backends: Dict[int, Any] = {}

    def _run(self, model: Model, feeds, mode="xla"):
        from ..backends.eval_backend import EvalBackend

        be = self._backends.get(model.id)
        if be is None:
            be = EvalBackend(mode)
            self._backends[model.id] = be
        return be.run(model.graph, feeds)

    def mel_from_audio(self, clip: AudioClip) -> np.ndarray:
        samples = np.asarray(clip.samples, dtype=np.float32).reshape(-1)
        if clip.sample_rate != 16000:
            samples = resample(samples, clip.sample_rate, 16000)
        mel = log_mel_spectrogram(samples, 16000, n_mels=self.n_mels,
                                  pad_to_frames=self.n_frames)
        return mel[None]

    def transcribe_tokens(self, clip: AudioClip, max_new: int = 64) -> List[int]:
        mel = self.mel_from_audio(clip)
        enc = self._run(self.encoder, {"mel": mel})
        n_layers = sum(1 for k in enc if k.startswith("cross_k_"))
        cache_shape = None
        feeds: Dict[str, Any] = {}
        for i in range(n_layers):
            feeds[f"cross_k_{i}"] = enc[f"cross_k_{i}"]
            feeds[f"cross_v_{i}"] = enc[f"cross_v_{i}"]
            H, D = enc[f"cross_k_{i}"].shape[1], enc[f"cross_k_{i}"].shape[3]
            feeds[f"cache_k_{i}"] = np.zeros((1, H, self.max_len, D), np.float32)
            feeds[f"cache_v_{i}"] = np.zeros((1, H, self.max_len, D), np.float32)

        # prefill with the forced start-of-transcript sequence
        sot = np.asarray(self.sot_sequence, dtype=np.int64)[None]
        out = self._run(self.decoder, {**feeds, "input_ids": sot,
                                       "pos": np.asarray(0, dtype=np.int64)})
        for i in range(n_layers):
            feeds[f"cache_k_{i}"] = out[f"new_cache_k_{i}"]
            feeds[f"cache_v_{i}"] = out[f"new_cache_v_{i}"]
        logits = np.asarray(out["logits"])[:, sot.shape[1] - 1]
        tokens: List[int] = []
        cur = int(np.argmax(logits, axis=-1)[0])
        pos = sot.shape[1]
        for _ in range(max_new):
            if cur == self.eot_token:
                break
            tokens.append(cur)
            out = self._run(self.decoder, {
                **feeds, "input_ids": np.asarray([[cur]], dtype=np.int64),
                "pos": np.asarray(pos, dtype=np.int64)})
            for i in range(n_layers):
                feeds[f"cache_k_{i}"] = out[f"new_cache_k_{i}"]
                feeds[f"cache_v_{i}"] = out[f"new_cache_v_{i}"]
            cur = int(np.argmax(np.asarray(out["logits"])[:, -1], axis=-1)[0])
            pos += 1
        return tokens

    def run_audio_in_text_out(self, clip: AudioClip, max_new: int = 64) -> str:
        toks = self.transcribe_tokens(clip, max_new)
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured")
        return self.tokenizer.decode(toks)

    @classmethod
    def from_bundle(cls, bundle, tokenizer=None) -> "SpeechToTextInterface":
        """Build from a transformers-loader whisper bundle."""
        spec = bundle.interfaces["stt"]
        tok = tokenizer
        if tok is None and bundle.tokenizer_source:
            from ..tokenizer import AnyTokenizer

            tok = AnyTokenizer.load(bundle.tokenizer_source)
        return cls(bundle.models[spec["encoder"]],
                   bundle.models[spec["decoder"]], tokenizer=tok,
                   max_len=spec.get("max_len"), n_mels=spec.get("n_mels", 80),
                   sot_sequence=[spec.get("sot", 50258)],
                   eot_token=spec.get("eot", 50257))
