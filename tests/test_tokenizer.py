"""Self-contained tokenizer: pure-python byte-level BPE must be
token-exact vs the `tokenizers` runtime on the same checkpoint files
(parity target: the reference's vendored Qwen2-style tokenizer,
tokenization_dream.py:1-339)."""

import json
import os

import pytest

CORPUS = [
    "Hello world! This is a test.",
    "  leading spaces and\nnewlines\n\n  mixed",
    "Numbers 123, 4,567 and 3.14e-2; contractions don't I'll we're",
    "unicode: café über 中文测试 \U0001f600",
    "code: def f(x):\n    return x ** 2  # comment",
    "<|im_start|>user\nembedded special tokens<|im_end|>\n",
]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Train a small real byte-level BPE with the `tokenizers` lib and
    save it as checkpoint-style files (tokenizer.json + vocab/merges)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    d = tmp_path_factory.mktemp("tok")
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False,
                                                 use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600, special_tokens=["<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 20, trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "eos_token": "<|im_end|>",
        "chat_template": (
            "{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
            "{{ message['content'] }}<|im_end|>\n{% endfor %}"
            "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
        ),
    }))
    return str(d)


def test_pure_bpe_token_exact_vs_tokenizers_runtime(ckpt_dir):
    from tokenizers import Tokenizer

    from lavida_mod_tpu.data.tokenizer import load_pure_bpe

    fast = Tokenizer.from_file(os.path.join(ckpt_dir, "tokenizer.json"))
    pure = load_pure_bpe(ckpt_dir)
    # GPT-2 ByteLevel regex (the trained file uses tokenizers' default
    # ByteLevel pattern, not Qwen's) — pass it explicitly
    import regex

    pure.pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    for text in CORPUS:
        a = fast.encode(text, add_special_tokens=False).ids
        b = pure.encode(text)
        assert a == b, (text, a, b)
        assert pure.decode(b) == fast.decode(b, skip_special_tokens=True)


def test_load_tokenizer_fast_path_and_roundtrip(ckpt_dir):
    from lavida_mod_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(ckpt_dir)
    assert tok.eos_token_id is not None
    for text in CORPUS[:4]:
        ids = tok.encode(text)
        assert isinstance(ids, list) and ids
        # byte-level BPE is lossless
        assert tok.decode(ids) == text

    out = tok.apply_chat_template(
        [{"role": "user", "content": "hi"}], add_generation_prompt=True
    )
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"


def test_special_tokens_split(ckpt_dir):
    from lavida_mod_tpu.data.tokenizer import load_pure_bpe, load_tokenizer

    pure = load_pure_bpe(ckpt_dir)
    text = "<|im_start|>user\nhey<|im_end|>"
    ids = pure.encode(text)
    assert pure.special["<|im_start|>"] in ids
    assert pure.special["<|im_end|>"] in ids
    # decode with specials kept
    kept = pure.decode(ids, skip_special_tokens=False)
    assert "<|im_start|>" in kept and "<|im_end|>" in kept
    fast = load_tokenizer(ckpt_dir)
    assert fast.encode(text) == ids
