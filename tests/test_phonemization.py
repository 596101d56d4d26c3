"""Native G2P quality tests (reference src/phonemization.rs — the
builtin backend must produce reasonable IPA without espeak)."""

import os

import pytest

from whisper_tensor_tpu.phonemization import (_builtin_phonemize,
                                              _expand_number, phonemize,
                                              piper_phoneme_ids)


def g2p(text):
    return _builtin_phonemize(text)


def test_lexicon_words():
    assert g2p("the") == "ðə"
    assert g2p("one two three") == "wʌn tuː θɹiː"
    assert g2p("through enough") == "θɹuː ɪnʌf"
    assert g2p("they were with you") == "ðeɪ wɚ wɪθ juː"


def test_context_rules():
    # c/g softening before e/i/y
    assert g2p("city").startswith("s")
    assert g2p("cat").startswith("k")
    assert g2p("gem").startswith("dʒ")
    assert g2p("gap").startswith("ɡ")
    # magic-e lengthens the vowel and silences the e
    assert g2p("make") == "meɪk"
    assert g2p("time") == "taɪm"
    assert g2p("hope") == "hoʊp"
    assert g2p("cube") == "kjuːb"
    # silent onsets
    assert g2p("knee") == "niː"
    assert g2p("write")[0] == "ɹ"
    # -tion / -igh
    assert g2p("nation").endswith("ʃən")
    assert g2p("night") == "naɪt"     # lexicon
    assert g2p("sight") == "saɪt"     # rule
    # final ng
    assert g2p("sing").endswith("ŋ")


def test_suffix_lexicon_retry():
    assert g2p("lights").startswith("laɪt")
    assert g2p("working").startswith("wɜːk")


def test_numbers_expand():
    assert _expand_number("42") == ["forty", "two"]
    assert _expand_number("105") == ["one", "hundred", "five"]
    assert _expand_number("2026") == ["two", "thousand", "twenty", "six"]
    assert _expand_number("1000000") == ["one", "million"]
    out = g2p("i have 3 cats")
    assert "θɹiː" in out


def test_punctuation_preserved():
    out = g2p("hello, world!")
    assert "," in out and "!" in out


def test_piper_ids_interleave_pad():
    pm = {"a": [5], "b": [6], "^": [1], "$": [2], "_": [0]}
    ids = piper_phoneme_ids("ab", pm)
    assert ids == [1, 0, 5, 0, 6, 0, 2]


def test_backend_env_selects_builtin(monkeypatch):
    monkeypatch.setenv("WT_PHONEMIZER", "builtin")
    assert phonemize("the") == "ðə"
