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
        # template may carry None slots (HF forced_decoder_ids null =
        # auto-detect language); the runnable sequence resolves them
        self.sot_template = list(sot_sequence or [50258])
        self.eot_token = eot_token
        self._backends: Dict[int, Any] = {}
        self.sot_sequence = self._resolve_sot(self.sot_template)

    def _try_token(self, text: str) -> Optional[int]:
        inner = getattr(self.tokenizer, "_tok", None)
        if inner is not None and hasattr(inner, "token_to_id"):
            t = inner.token_to_id(text)
            return None if t is None else int(t)
        return None

    def _resolve_sot(self, seq) -> List[int]:
        """Fill a template's None slots (position 1 = language: default
        <|en|> when the tokenizer knows it) and drop the unresolvable
        rest."""
        out = []
        for i, t in enumerate(seq):
            if t is None and i == 1:
                t = self._try_token("<|en|>")
            if t is None:
                continue
            out.append(int(t))
        return out

    def _run(self, model: Model, feeds, mode="xla"):
        from ..backends.eval_backend import EvalBackend

        be = self._backends.get(model.id)
        if be is None:
            be = EvalBackend(mode)
            self._backends[model.id] = be
        return be.run(model.graph, feeds)

    def sot_with(self, language: Optional[str] = None,
                 task: Optional[str] = None) -> List[int]:
        """The forced SOT prefix with `<|language|>` / `<|task|>`
        substituted at whisper's conventional TEMPLATE positions 1 / 2
        (looked up in the tokenizer; multilingual checkpoints) —
        auto-detect (None) slots from the checkpoint keep their
        position. Raises ValueError for tokens the tokenizer doesn't
        know."""
        seq = list(self.sot_template)
        if language is None and task is None:
            return list(self.sot_sequence)

        def tid(text):
            t = self._try_token(text)
            if t is None:
                raise ValueError(
                    f"token {text!r} not in this model's tokenizer "
                    "(not a multilingual whisper checkpoint?)")
            return t

        for pos, text in ((1, f"<|{language}|>" if language else None),
                          (2, f"<|{task}|>" if task else None)):
            if text is None:
                continue
            t = tid(text)
            if len(seq) > pos:
                seq[pos] = t
            elif len(seq) == pos:
                seq.append(t)
            else:
                raise ValueError(
                    f"this checkpoint's SOT prefix {seq} is too short "
                    f"to carry a {'language' if pos == 1 else 'task'} "
                    "token")
        return self._resolve_sot(seq)

    def mel_from_samples(self, samples: np.ndarray) -> np.ndarray:
        mel = log_mel_spectrogram(np.asarray(samples, np.float32).reshape(-1),
                                  16000, n_mels=self.n_mels,
                                  pad_to_frames=self.n_frames)
        return mel[None]

    def mel_from_audio(self, clip: AudioClip) -> np.ndarray:
        samples = np.asarray(clip.samples, dtype=np.float32).reshape(-1)
        if clip.sample_rate != 16000:
            samples = resample(samples, clip.sample_rate, 16000)
        return self.mel_from_samples(samples)

    # -- compiled decode: prefill + the whole greedy loop as ONE jitted
    # scan program (the python loop below stays as the oracle referee —
    # per-token dispatch costs ~55 ms through the TPU tunnel, so a 64-
    # token transcription is ~3.5 s of pure dispatch without this)
    def _traced_decoder(self):
        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        milli, weight_inputs = self.decoder.graph.to_milli()
        from ..milli.transforms import apply_matmul_fusion

        self._dec_fused, self._dec_get_w = apply_matmul_fusion(
            milli, weight_inputs, self.decoder.graph.store)
        order = list(milli.inputs)
        self._dec_weights = [n for n in order
                             if n in weight_inputs or n in self._dec_fused]
        self._dec_caches = [n for n in order if n.startswith("cache_")]
        self._dec_cross = [n for n in order if n.startswith("cross_")]
        out_names = list(milli.outputs)
        cache_outs = [n for n in out_names if n.startswith("new_cache_")]
        fn = _trace_graph(milli, {})

        def step(ids, pos, caches, crosses, weights):
            by = {"input_ids": ids, "pos": pos}
            by.update(dict(zip(self._dec_caches, caches)))
            by.update(dict(zip(self._dec_cross, crosses)))
            by.update(dict(zip(self._dec_weights, weights)))
            outs = fn(*[by[n] for n in order])
            named = dict(zip(out_names, outs))
            return named["logits"], [named[n] for n in cache_outs]

        return step

    def _decode_program(self, sot_len: int, max_new: int, n_layers: int,
                        H: int, D: int, T: int, dt):
        import jax
        import jax.numpy as jnp

        key = ("dec", sot_len, max_new, n_layers, H, D, T, str(dt))
        prog = getattr(self, "_programs", None)
        if prog is None:
            self._programs = prog = {}
        if key in prog:
            return prog[key]
        step = self._traced_decoder()
        eot = self.eot_token
        max_len = self.max_len

        def run(sot_ids, crosses, weights):
            caches = [jnp.zeros((1, H, max_len, D), dt)
                      for _ in range(2 * n_layers)]
            logits, caches = step(sot_ids, jnp.asarray(0, jnp.int64),
                                  caches, crosses, weights)
            cur = jnp.argmax(logits[:, sot_len - 1, :],
                             axis=-1)[0].astype(jnp.int64)
            pos = jnp.asarray(sot_len, jnp.int64)

            def body(carry, _):
                cur, pos, caches, alive = carry
                valid = alive & (cur != eot)
                lg, caches = step(cur[None, None], pos, caches, crosses,
                                  weights)
                nxt = jnp.argmax(lg[0, -1, :], axis=-1).astype(jnp.int64)
                cur2 = jnp.where(valid, nxt, cur)
                pos2 = jnp.where(valid & (pos < max_len - 1), pos + 1, pos)
                return (cur2, pos2, caches, valid), (cur, valid)

            (_, _, _, _), (toks, valids) = jax.lax.scan(
                body, (cur, pos, caches, True), None, length=max_new)
            return toks, valids

        prog[key] = jax.jit(run)
        return prog[key]

    def _transcribe_compiled(self, mel: np.ndarray,
                             max_new: int) -> List[int]:
        import jax.numpy as jnp

        enc = self._run(self.encoder, {"mel": mel})
        n_layers = sum(1 for k in enc if k.startswith("cross_k_"))
        ck = np.asarray(enc["cross_k_0"])
        H, T, D = ck.shape[1], ck.shape[2], ck.shape[3]
        if not hasattr(self, "_dec_weights"):
            self._traced_decoder()
        prog = self._decode_program(len(self.sot_sequence), max_new,
                                    n_layers, H, D, T, ck.dtype)
        crosses = [jnp.asarray(np.asarray(enc[n]))
                   for n in self._dec_cross]
        if not hasattr(self, "_dec_weights_dev"):
            self._dec_weights_dev = [jnp.asarray(self._dec_get_w(n))
                                     for n in self._dec_weights]
        sot = np.asarray(self.sot_sequence, dtype=np.int64)[None]
        toks, valids = prog(jnp.asarray(sot), crosses,
                            self._dec_weights_dev)
        toks, valids = np.asarray(toks), np.asarray(valids)
        out: List[int] = []
        for t, v in zip(toks, valids):
            if not v:
                break
            out.append(int(t))
        return out

    def transcribe_long(self, clip: AudioClip, max_new_per_chunk: int = 224,
                        compiled: bool = True) -> List[int]:
        """Long-form transcription: audio beyond one mel window (30 s at
        the Whisper defaults) is split into window-sized segments, each
        transcribed independently, tokens concatenated (sequential
        segmentation — the strategy whisper.cpp calls 'greedy chunking')."""
        samples = np.asarray(clip.samples, dtype=np.float32).reshape(-1)
        if clip.sample_rate != 16000:
            samples = resample(samples, clip.sample_rate, 16000)
        hop = 160
        chunk_samples = self.n_frames * hop
        out: List[int] = []
        for off in range(0, max(len(samples), 1), chunk_samples):
            seg = samples[off:off + chunk_samples]
            if seg.size == 0:
                break
            mel = self.mel_from_samples(seg)
            if compiled:
                out.extend(self._transcribe_compiled(mel, max_new_per_chunk))
            else:
                out.extend(self._transcribe_mel(mel, max_new_per_chunk))
        return out

    def transcribe_beam(self, clip: AudioClip, max_new: int = 64,
                        beam: int = 4,
                        length_penalty: float = 0.0) -> List[int]:
        """Beam-search transcription: the whole search (forced SOT
        prefix prefill + per-step re-score/top-k/cache-reorder) runs as
        the seq2seq interface's ONE compiled beam program."""
        from .seq2seq import Seq2SeqInterface

        s2s = getattr(self, "_s2s", None)
        if s2s is None:
            s2s = Seq2SeqInterface(
                self.encoder, self.decoder, max_len=self.max_len,
                start_sequence=self.sot_sequence, eos_token=self.eot_token,
                encoder_feed="mel")
            self._s2s = s2s
        mel = self.mel_from_audio(clip)
        toks = s2s.beam_search_tokens(mel, max_new, beam=beam,
                                      length_penalty=length_penalty)[0]
        out: List[int] = []
        for t in toks:
            if int(t) == self.eot_token:
                break
            out.append(int(t))
        return out

    def transcribe_tokens(self, clip: AudioClip, max_new: int = 64,
                          compiled: bool = False) -> List[int]:
        mel = self.mel_from_audio(clip)
        if compiled:
            return self._transcribe_compiled(mel, max_new)
        return self._transcribe_mel(mel, max_new)

    def run_audio_in_text_out(self, clip: AudioClip,
                              max_new: int = 64) -> str:
        """User-facing transcription: compiled one-dispatch decode, with
        audio longer than one mel window split into sequential windows
        (long-form)."""
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured")
        n16 = int(round(len(np.asarray(clip.samples).reshape(-1))
                        * 16000.0 / max(clip.sample_rate, 1)))
        if n16 > self.n_frames * 160:
            toks = self.transcribe_long(clip, max_new_per_chunk=max_new)
        else:
            toks = self._transcribe_compiled(self.mel_from_audio(clip),
                                             max_new)
        return self.tokenizer.decode(toks)

    def _transcribe_mel(self, mel: np.ndarray, max_new: int) -> List[int]:
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
                   n_frames=spec.get("n_frames", 3000),
                   sot_sequence=(list(spec.get("sot_sequence") or [])
                                 or [spec.get("sot", 50258)]),
                   eot_token=spec.get("eot", 50257))


class StreamingTranscriber:
    """Online (streaming) transcription over a SpeechToTextInterface —
    net-new beyond the reference's batch STT (src/interfaces.rs:2851).

    Feed audio incrementally with `feed()`; committed tokens come back
    as they stabilize. The active window is re-transcribed per feed —
    cheap here because the whole greedy decode is ONE compiled program
    (one device dispatch per re-decode).

    Commit policy:
      * `local_agreement=N` (default 2): the longest common token
        prefix of the last N consecutive hypotheses is committed early
        (the whisper-streaming LocalAgreement policy). Early commits
        are kept even if a later full-window hypothesis disagrees —
        the standard streaming trade-off.
      * `local_agreement=None`: conservative mode — commits happen only
        when a full mel window closes (and at `flush()`), so the final
        committed token stream is EXACTLY `transcribe_long`'s output
        for the same audio, regardless of how feeds were chunked.

    When the buffer reaches one mel window (n_frames*160 samples at
    16 kHz) the window is finalized: its full-window hypothesis beyond
    the already-committed count is committed and the audio dropped
    (sequential segmentation, matching transcribe_long's chunking).
    """

    def __init__(self, iface: SpeechToTextInterface,
                 local_agreement: Optional[int] = 2,
                 max_new_per_window: int = 224):
        if local_agreement is not None and local_agreement < 2:
            raise ValueError("local_agreement must be >= 2 (or None)")
        self.iface = iface
        self.agreement = local_agreement
        self.max_new = max_new_per_window
        self._buf = np.zeros(0, np.float32)
        self._hyps: List[List[int]] = []   # recent active-window hyps
        self._win_committed = 0            # committed within the window
        self.committed: List[int] = []

    @property
    def _window(self) -> int:
        return self.iface.n_frames * 160

    def _transcribe(self, samples: np.ndarray) -> List[int]:
        mel = self.iface.mel_from_samples(samples)
        return self.iface._transcribe_compiled(mel, self.max_new)

    def _close_full_windows(self) -> List[int]:
        new: List[int] = []
        W = self._window
        while len(self._buf) >= W:
            toks = self._transcribe(self._buf[:W])
            new.extend(toks[self._win_committed:])
            self._buf = self._buf[W:]
            self._win_committed = 0
            self._hyps = []
        return new

    def feed(self, samples, sample_rate: int = 16000) -> List[int]:
        """Append audio; return the NEWLY committed token ids."""
        samples = np.asarray(samples, dtype=np.float32).reshape(-1)
        if sample_rate != 16000:
            samples = resample(samples, sample_rate, 16000)
        self._buf = np.concatenate([self._buf, samples])
        new = self._close_full_windows()
        if len(self._buf) and self.agreement is not None:
            toks = self._transcribe(self._buf)
            self._hyps.append(toks)
            self._hyps = self._hyps[-self.agreement:]
            if len(self._hyps) == self.agreement:
                k = 0
                while all(len(h) > k and h[k] == self._hyps[-1][k]
                          for h in self._hyps):
                    k += 1
                if k > self._win_committed:
                    new.extend(self._hyps[-1][self._win_committed:k])
                    self._win_committed = k
        self.committed.extend(new)
        return new

    @property
    def pending(self) -> List[int]:
        """Uncommitted tail of the latest active-window hypothesis."""
        if not self._hyps:
            return []
        return list(self._hyps[-1][self._win_committed:])

    def flush(self) -> List[int]:
        """End of stream: transcribe and commit everything buffered."""
        new = self._close_full_windows()
        if len(self._buf):
            toks = self._transcribe(self._buf)
            new.extend(toks[self._win_committed:])
        self._buf = np.zeros(0, np.float32)
        self._hyps = []
        self._win_committed = 0
        self.committed.extend(new)
        return new

    def text(self, toks: Optional[List[int]] = None) -> str:
        if self.iface.tokenizer is None:
            raise ValueError("no tokenizer configured")
        return self.iface.tokenizer.decode(
            self.committed if toks is None else toks)
