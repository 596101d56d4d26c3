"""Phonemization: text -> IPA, + per-TTS-model phoneme-id mappings.

Reference equivalent: src/phonemization.rs (native rust IPA + optional
espeak-ng backend, Piper + Kokoro/Misaki mappings, env-var backend
select WHISPER_TENSOR_PHONEMIZER). Here: a small built-in grapheme->
IPA fallback for English plus hooks for an external espeak binary when
present; backend selected via WT_PHONEMIZER.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, List, Optional

# Minimal English grapheme->IPA rules (fallback quality; the reference's
# native backend is similarly approximate — espeak is the quality path).
_DIGRAPHS = [
    ("tch", "tʃ"), ("sch", "ʃ"), ("ch", "tʃ"), ("sh", "ʃ"), ("th", "θ"),
    ("ph", "f"), ("wh", "w"), ("ng", "ŋ"), ("ck", "k"), ("qu", "kw"),
    ("oo", "uː"), ("ee", "iː"), ("ea", "iː"), ("ou", "aʊ"), ("ow", "oʊ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"), ("ar", "ɑːɹ"),
    ("er", "ɚ"), ("or", "ɔːɹ"),
]
_SINGLE = {
    "a": "æ", "b": "b", "c": "k", "d": "d", "e": "ɛ", "f": "f", "g": "ɡ",
    "h": "h", "i": "ɪ", "j": "dʒ", "k": "k", "l": "l", "m": "m", "n": "n",
    "o": "ɑ", "p": "p", "q": "k", "r": "ɹ", "s": "s", "t": "t", "u": "ʌ",
    "v": "v", "w": "w", "x": "ks", "y": "j", "z": "z",
}


def _builtin_phonemize(text: str) -> str:
    out: List[str] = []
    for word in text.lower().split():
        w = "".join(c for c in word if c.isalpha() or c in "'")
        i = 0
        buf = []
        while i < len(w):
            for pat, ipa in _DIGRAPHS:
                if w.startswith(pat, i):
                    buf.append(ipa)
                    i += len(pat)
                    break
            else:
                buf.append(_SINGLE.get(w[i], ""))
                i += 1
        out.append("".join(buf))
    return " ".join(out)


def _espeak_phonemize(text: str, language: str) -> str:
    exe = shutil.which("espeak-ng") or shutil.which("espeak")
    result = subprocess.run(
        [exe, "-q", "--ipa", "-v", language, text],
        capture_output=True, text=True, timeout=30)
    return result.stdout.strip()


def phonemize(text: str, language: str = "en-us") -> str:
    backend = os.environ.get("WT_PHONEMIZER", "auto")
    if backend in ("espeak", "auto") and (shutil.which("espeak-ng")
                                          or shutil.which("espeak")):
        try:
            return _espeak_phonemize(text, language)
        except Exception:
            if backend == "espeak":
                raise
    return _builtin_phonemize(text)


# ---------------------------------------------------------------------------
# Piper: phoneme string -> ids via the model's phoneme_id_map, with
# pad (0) interleaving and BOS(1)/EOS(2) per piper convention.
# ---------------------------------------------------------------------------


def piper_phoneme_ids(phonemes: str, phoneme_id_map: Optional[Dict[str, List[int]]]
                      ) -> List[int]:
    pid = phoneme_id_map or {}

    def lookup(ch: str) -> List[int]:
        v = pid.get(ch)
        if v is None:
            return []
        return v if isinstance(v, list) else [v]

    ids: List[int] = []
    ids += lookup("^") or [1]
    ids += lookup("_") or [0]
    for ch in phonemes:
        got = lookup(ch)
        if not got:
            continue
        ids += got
        ids += lookup("_") or [0]
    ids += lookup("$") or [2]
    return ids


def kokoro_phoneme_ids(phonemes: str, vocab: Optional[Dict[str, int]]) -> List[int]:
    v = vocab or {}
    ids = [0]  # BOS pad
    for ch in phonemes:
        if ch in v:
            ids.append(v[ch])
    ids.append(0)
    return ids
