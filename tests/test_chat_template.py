"""Chat templating: [{role, content}] -> prompt rendering.

The jinja environment must match transformers' apply_chat_template
byte-for-byte (sandboxed env, special-token variables, helpers), so the
referee is PreTrainedTokenizerFast rendering the SAME template string.
Reference has no chat layer (raw prompts only) — serving parity beyond it.
"""

import json

import pytest

from whisper_tensor_tpu.tokenizer import (AnyTokenizer, ByteTokenizer,
                                          apply_chat_template,
                                          render_chat_template)

LLAMA3_STYLE = (
    "{% set loop_messages = messages %}"
    "{% for message in loop_messages %}"
    "{% set content = '<|start_header_id|>' + message['role'] + "
    "'<|end_header_id|>\n\n'+ message['content'] | trim + '<|eot_id|>' %}"
    "{% if loop.index0 == 0 %}{% set content = bos_token + content %}"
    "{% endif %}{{ content }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}")

QWEN_STYLE = (
    "{% for message in messages %}"
    "{% if loop.first and messages[0]['role'] != 'system' %}"
    "{{ '<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n' }}"
    "{% endif %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] + "
    "'<|im_end|>' + '\n' }}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}")

MESSAGES = [
    {"role": "system", "content": "Be terse."},
    {"role": "user", "content": "  hi there "},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye"},
]


def _hf_render(template, messages, add_generation_prompt=True,
               bos_token="<s>", eos_token="</s>"):
    from tokenizers import Tokenizer, models
    from transformers import PreTrainedTokenizerFast

    ref = PreTrainedTokenizerFast(
        tokenizer_object=Tokenizer(models.WordLevel({"x": 0},
                                                    unk_token="x")),
        bos_token=bos_token, eos_token=eos_token)
    ref.chat_template = template
    return ref.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=add_generation_prompt)


@pytest.mark.parametrize("template", [LLAMA3_STYLE, QWEN_STYLE],
                         ids=["llama3", "chatml"])
@pytest.mark.parametrize("agp", [True, False], ids=["gen", "nogen"])
def test_render_matches_transformers(template, agp):
    mine = render_chat_template(template, MESSAGES,
                                add_generation_prompt=agp,
                                bos_token="<s>", eos_token="</s>")
    assert mine == _hf_render(template, MESSAGES, add_generation_prompt=agp)
    assert "<|" in mine  # rendered something real


def test_render_without_system_inserts_default():
    msgs = [{"role": "user", "content": "q"}]
    mine = render_chat_template(QWEN_STYLE, msgs, bos_token="", eos_token="")
    assert mine == _hf_render(QWEN_STYLE, msgs)
    assert "You are a helpful assistant." in mine


def test_raise_exception_helper():
    t = "{{ raise_exception('bad role') }}"
    with pytest.raises(ValueError, match="bad role"):
        render_chat_template(t, MESSAGES)


def test_chatml_fallback_for_plain_tokenizers():
    out = apply_chat_template(ByteTokenizer(),
                              [{"role": "user", "content": "hi"}])
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"


def test_tokenizer_dir_loads_chat_template(tmp_path):
    # a real tokenizer dir: tokenizer.json + tokenizer_config.json with a
    # chat_template and AddedToken-dict special tokens
    from tokenizers import Tokenizer, models

    d = tmp_path / "tok"
    d.mkdir()
    Tokenizer(models.WordLevel({"x": 0}, unk_token="x")).save(
        str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "chat_template": LLAMA3_STYLE,
        "bos_token": {"content": "<s>", "lstrip": False},
        "eos_token": "</s>"}))
    tok = AnyTokenizer.load(str(d))
    assert tok.chat_template == LLAMA3_STYLE
    assert tok.special_tokens["bos_token"] == "<s>"
    mine = apply_chat_template(tok, MESSAGES)
    assert mine == _hf_render(LLAMA3_STYLE, MESSAGES)
    assert mine.startswith("<s><|start_header_id|>system")


def test_named_template_list_form(tmp_path):
    from tokenizers import Tokenizer, models

    d = tmp_path / "tok2"
    d.mkdir()
    Tokenizer(models.WordLevel({"x": 0}, unk_token="x")).save(
        str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "chat_template": [
            {"name": "tool_use", "template": "TOOLS"},
            {"name": "default", "template": QWEN_STYLE}]}))
    tok = AnyTokenizer.load(str(d))
    assert tok.chat_template == QWEN_STYLE
