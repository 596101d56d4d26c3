"""IncrementalDecoder: the streaming detokenizer must reproduce the
full decode() exactly while doing bounded work per token (the serving
paths call it per emitted token on the batcher's scheduler thread —
reference streams tokens the same way through scheduler.rs reports).
"""

import numpy as np

from whisper_tensor_tpu.tokenizer import ByteTokenizer, IncrementalDecoder

rng = np.random.default_rng(11)


def test_matches_full_decode_random_bytes():
    """Random byte streams include multi-byte UTF-8 fragments that
    decode to replacement chars until completed — a blind prefix commit
    would freeze the replacement char; the verified commit must not."""
    tok = ByteTokenizer()
    for trial in range(5):
        ids = rng.integers(0, 256, (300,)).astype(int).tolist()
        dec = IncrementalDecoder(tok, window=16, commit=4)
        for i, t in enumerate(ids):
            dec.push(t)
            assert dec.text == tok.decode(ids[:i + 1]), f"mismatch at {i}"
            assert dec.length == len(tok.decode(ids[:i + 1]))


def test_matches_full_decode_utf8_text():
    tok = ByteTokenizer()
    text = "héllo wörld — ünïcode ★ 日本語のテキスト 🎉 end" * 6
    ids = tok.encode(text)
    dec = IncrementalDecoder(tok, window=8, commit=3)
    for t in ids:
        dec.push(t)
    assert dec.text == tok.decode(ids) == text


def test_text_from_offsets():
    tok = ByteTokenizer()
    text = "abcdefghij" * 30      # forces several commits at window=16
    ids = tok.encode(text)
    dec = IncrementalDecoder(tok, window=16, commit=4)
    for t in ids:
        dec.push(t)
    full = dec.text
    assert full == text
    for off in (0, 1, 7, 50, 123, len(text) - 3, len(text)):
        assert dec.text_from(off) == full[off:]


def test_commits_bound_tail():
    """After many tokens the uncommitted tail must stay bounded — that
    is the entire point (O(window) work per push, not O(n))."""
    tok = ByteTokenizer()
    ids = tok.encode("plain ascii text, nothing fancy. " * 40)
    dec = IncrementalDecoder(tok, window=16, commit=4)
    for t in ids:
        dec.push(t)
    assert len(dec._tail) <= 16
    assert dec._clen > 0
