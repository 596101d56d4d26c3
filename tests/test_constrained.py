"""Constrained (structured) decoding: regex engine, JSON-schema regex,
token-DFA construction, and in-scan constrained generation.

Net-new vs the reference (whisper-tensor has no structured output);
the differential oracle for the regex engine is Python's `re`.
"""

import json
import re

import numpy as np
import pytest

from whisper_tensor_tpu.constrained import (ByteDFA, RegexError,
                                            compile_regex_to_dfa,
                                            compile_token_dfa,
                                            json_schema_to_regex,
                                            token_byte_strings)
from whisper_tensor_tpu.tokenizer import ByteTokenizer

PATTERNS = [
    r"abc",
    r"a|b|c",
    r"a*b+c?",
    r"(ab|cd)*ef",
    r"[a-z]+@[a-z]+\.(com|org)",
    r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?",
    r"\d{2,4}-\d{2}",
    r"[^x]*x",
    r"(a(b(c)?)?)*",
    r"a{3}",
    r"a{2,}b",
    r"he(llo)? (world|there)!?",
    r"[0-9a-fA-F]{4}",
    r"x*?y",
    r"\s+\w+\s*",
    r".",
    r".+",
    r'"([^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})*"',
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_regex_dfa_matches_re(pattern):
    dfa = compile_regex_to_dfa(pattern)
    rx = re.compile(pattern, re.DOTALL)
    rng = np.random.default_rng(hash(pattern) % 2**32)
    alpha = list('abcxyz019.@-eE+ \tA_F!"\\')
    base = re.sub(r'[\\\[\]()*+?{}|^]', "", pattern) or "a"
    cands = set()
    for _ in range(300):
        n = int(rng.integers(0, 9))
        cands.add("".join(rng.choice(alpha) for _ in range(n)))
    for _ in range(100):
        n = int(rng.integers(0, 11))
        cands.add("".join(rng.choice(list(base)) for _ in range(n)))
    for s in cands:
        want = rx.fullmatch(s) is not None
        got = dfa.matches(s.encode("utf-8"))
        assert want == got, (pattern, s, want, got)


def test_regex_unicode_dot_and_negated_class():
    dfa = compile_regex_to_dfa(r'"[^"]*"')
    assert dfa.matches('"héllo wörld"'.encode())
    assert dfa.matches('"日本語≠"'.encode())
    assert dfa.matches(b'""')
    assert not dfa.matches('"a"b"'.encode())
    # ill-formed UTF-8 (lone continuation, surrogate encoding) rejected
    assert not dfa.matches(b'"\xff"')
    assert not dfa.matches(b'"\xed\xa0\x80"')
    two = compile_regex_to_dfa(".{2}")
    assert two.matches("日本".encode())
    assert not two.matches("日".encode())
    assert not two.matches("日本語".encode())
    lit = compile_regex_to_dfa("café")
    assert lit.matches("café".encode()) and not lit.matches(b"cafe")


def test_regex_lazy_ok_possessive_rejected():
    # lazy quantifiers recognize the same language
    assert compile_regex_to_dfa("a+?b").matches(b"aab")
    assert not compile_regex_to_dfa("a+?b").matches(b"b")
    with pytest.raises(RegexError):
        compile_regex_to_dfa("a*+b")
    with pytest.raises(RegexError):
        compile_regex_to_dfa("^ab$")


def test_minimization_reduces_and_preserves():
    # (a|b)(a|b) has an obviously mergeable state structure
    dfa = compile_regex_to_dfa("(a|b)(a|b)|aa")
    for s in ["aa", "ab", "ba", "bb"]:
        assert dfa.matches(s.encode())
    assert not dfa.matches(b"a") and not dfa.matches(b"aaa")


# ---------------------------------------------------------------------------
# JSON schema -> regex
# ---------------------------------------------------------------------------

def _assert_lang(pattern, yes, no):
    dfa = compile_regex_to_dfa(pattern)
    for s in yes:
        assert dfa.matches(s.encode("utf-8")), (pattern, s)
    for s in no:
        assert not dfa.matches(s.encode("utf-8")), (pattern, s)


def test_schema_scalars():
    _assert_lang(json_schema_to_regex({"type": "integer"}),
                 ["0", "-7", "123"], ["07", "1.5", "", "+3"])
    _assert_lang(json_schema_to_regex({"type": "number"}),
                 ["0", "-1.25", "3e8", "2.5E-3"], ["1.", ".5", "01"])
    _assert_lang(json_schema_to_regex({"type": "boolean"}),
                 ["true", "false"], ["True", "1"])
    _assert_lang(json_schema_to_regex({"type": "string"}),
                 ['""', '"hi"', '"a\\"b"', '"\\u00e9"', '"héllo"'],
                 ['"', 'hi', '"a"b"'])
    _assert_lang(json_schema_to_regex({"enum": ["red", 7, None]}),
                 ['"red"', "7", "null"], ['"blue"', "8"])


def test_schema_array_and_object():
    _assert_lang(json_schema_to_regex(
        {"type": "array", "items": {"type": "integer"}}),
        ["[]", "[1]", "[1,2,3]"], ["[1,]", "[,1]", "[1 ,2]"])
    _assert_lang(json_schema_to_regex(
        {"type": "array", "items": {"type": "integer"},
         "minItems": 1, "maxItems": 2}),
        ["[1]", "[1,2]"], ["[]", "[1,2,3]"])
    sc = {"type": "object",
          "properties": {"name": {"type": "string"},
                         "age": {"type": "integer"},
                         "tag": {"enum": ["a", "b"]}},
          "required": ["name", "tag"]}
    _assert_lang(json_schema_to_regex(sc),
                 ['{"name":"x","tag":"a"}',
                  '{"name":"x","age":3,"tag":"b"}'],
                 ['{"age":3,"tag":"b"}',           # missing required name
                  '{"name":"x","tag":"a","age":3}',  # order violated
                  '{"name":"x" ,"tag":"a"}'])        # whitespace
    # leading-optional object: comma placement must stay valid
    sc2 = {"type": "object",
           "properties": {"a": {"type": "integer"},
                          "b": {"type": "integer"}},
           "required": ["b"]}
    _assert_lang(json_schema_to_regex(sc2),
                 ['{"a":1,"b":2}', '{"b":2}'],
                 ['{"a":1}', '{,"b":2}', '{"a":1,"b":2,}'])
    # fully-optional object admits {}
    sc3 = {"type": "object", "properties": {"a": {"type": "integer"}},
           "required": []}
    _assert_lang(json_schema_to_regex(sc3), ["{}", '{"a":1}'], ['{"a":}'])


# ---------------------------------------------------------------------------
# token DFA
# ---------------------------------------------------------------------------

def test_token_dfa_byte_tokenizer():
    tok = ByteTokenizer()
    td = compile_token_dfa(r"[ab]{1,3}c", tok, eos_token_id=tok.EOS)
    # start admits exactly 'a' and 'b'
    start_allowed = sorted(chr(t - 3)
                           for t in np.where(td.trans[td.start] >= 0)[0])
    assert start_allowed == ["a", "b"]
    assert not td.accepting[td.start]
    # specials (pad/bos/eos) never have transitions
    assert (td.trans[:, :3] == -1).all()
    # done sink admits nothing but is accepting (eos allowed there)
    assert (td.trans[td.done] == -1).all() and td.accepting[td.done]
    # walking 'abc' lands in an accepting state
    s = td.start
    for ch in "abc":
        s = int(td.trans[s, ord(ch) + 3])
        assert s >= 0
    assert td.accepting[s]


def _mini_bpe_tokenizer():
    """A real `tokenizers` ByteLevel BPE vocab (exercises the GPT-2
    bytes<->unicode mapping path of token_byte_strings)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from whisper_tensor_tpu.constrained import _bytes_to_unicode
    from whisper_tensor_tpu.tokenizer import HFTokenizer

    b2u = _bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    nxt = 256
    for merged in ["ab", "bc", "abc", "th", "the", " the", "12"]:
        enc = "".join(b2u[b] for b in merged.encode())
        vocab[enc] = nxt
        nxt += 1
    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("t", "h"), ("th", "e"),
              ("Ġ", "the"), ("1", "2")]
    t = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.decoder = decoders.ByteLevel()
    return HFTokenizer(t)


def test_token_byte_strings_hf_byte_level():
    tok = _mini_bpe_tokenizer()
    tb = token_byte_strings(tok)
    assert tb[ord("a")] == b"a"          # identity region of the b2u map
    assert b"abc" in tb and b" the" in tb
    # encode/decode round trip agrees with the byte strings
    ids = tok.encode("abc the")
    assert b"".join(tb[i] for i in ids) == b"abc the"


def test_token_dfa_multibyte_tokens():
    # merged tokens must take multi-byte DFA steps: 'abc' from start of
    # [ab]{1,3}c reaches accepting directly
    tok = _mini_bpe_tokenizer()
    td = compile_token_dfa(r"[ab]{1,3}c", tok, eos_token_id=0,
                           vocab_size=tok.vocab_size)
    tb = token_byte_strings(tok)
    abc = tb.index(b"abc")
    s = int(td.trans[td.start, abc])
    assert s >= 0 and td.accepting[s]
    # '12' token is dead from start
    assert td.trans[td.start, tb.index(b"12")] == -1


# ---------------------------------------------------------------------------
# end-to-end constrained generation (tiny model)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_iface():
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=300,
                     n_positions=64)
    m = Model.new_from_onnx(
        build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=64),
        name="constrained-gpt2")
    iface = TextInferenceInterface(m, max_len=64, prompt_buckets=(16,))
    iface.tokenizer = ByteTokenizer()
    return iface


def test_constrained_greedy_and_sampled(tiny_iface):
    from whisper_tensor_tpu.interfaces.text import SamplingParams

    pat = r"-?[1-9][0-9]{0,3}(\.[0-9]{1,2})?"
    out = tiny_iface.run_string_in_string_out("x=", n_new=12, regex=pat)
    assert re.fullmatch(pat, out), out
    for seed in range(4):
        out = tiny_iface.run_string_in_string_out(
            "y=", n_new=12, regex=pat,
            sampling=SamplingParams(temperature=1.4, seed=seed))
        assert re.fullmatch(pat, out), (seed, out)


def test_constrained_json_schema(tiny_iface):
    from whisper_tensor_tpu.interfaces.text import SamplingParams

    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"enum": ["x", "y"]}},
              "required": ["a", "b"]}
    out = tiny_iface.run_string_in_string_out(
        "z", n_new=40, json_schema=schema,
        sampling=SamplingParams(temperature=1.5, seed=3))
    obj = json.loads(out)
    assert isinstance(obj["a"], int) and obj["b"] in ("x", "y")


def test_constraint_program_reuse(tiny_iface):
    # two different regexes with equal DFA state counts share a program
    td1 = tiny_iface.compile_constraint(regex="aaa")
    td2 = tiny_iface.compile_constraint(regex="bbb")
    assert td1.n_states == td2.n_states
    n_before = len(tiny_iface._programs)
    out1 = tiny_iface.run_string_in_string_out("p", n_new=5, regex="aaa")
    n_mid = len(tiny_iface._programs)
    out2 = tiny_iface.run_string_in_string_out("p", n_new=5, regex="bbb")
    assert out1 == "aaa" and out2 == "bbb"
    assert len(tiny_iface._programs) == n_mid > n_before  # no re-jit


def test_constrained_batch(tiny_iface):
    # batched prompts each satisfy the pattern independently
    td = tiny_iface.compile_constraint(regex=r"[abc]{3}")
    ids = np.array([[ord("q") + 3], [ord("r") + 3]], dtype=np.int64)
    toks = tiny_iface.generate_tokens(ids, 6, constraint=td)
    for row in toks:
        row = list(row)
        cut = row.index(tiny_iface.eos_token_id) \
            if tiny_iface.eos_token_id in row else len(row)
        text = bytes(t - 3 for t in row[:cut]).decode()
        assert re.fullmatch(r"[abc]{3}", text), text
        # after completion the row parks on eos
        assert all(t == tiny_iface.eos_token_id for t in row[cut:])


def test_constrained_windowed_decode():
    # the unified windowed program also honors the constraint
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=300,
                     n_positions=64)
    getter = random_gpt2_weights(cfg)
    m = Model.new_from_onnx(build_gpt2_step(getter, cfg, max_len=64),
                            name="cw-gpt2")
    wm = Model.new_from_onnx(build_gpt2_step(getter, cfg, max_len=32),
                             name="cw-gpt2-w32")
    iface = TextInferenceInterface(m, max_len=64, prompt_buckets=(16,),
                                   window_models={32: wm})
    iface.tokenizer = ByteTokenizer()
    pat = r"[ab]{2,6}c"
    out = iface.run_string_in_string_out("w", n_new=10, regex=pat)
    assert re.fullmatch(pat, out), out
