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


def test_native_bpe_matches_python_path():
    """The C++ merge engine (csrc/bpe.cpp) must be token-exact vs the
    pure-python _bpe loop on the same tokenizer, and actually be active
    when the toolchain is available."""
    import lavida_mod_tpu.data.tokenizer as T

    tok = _mk_tiny_tokenizer() if "_mk_tiny_tokenizer" in dir() else None
    if tok is None:
        # build a small byte-level BPE by training-free construction:
        # single-byte vocab + a few merges
        b2u = T.bytes_to_unicode()
        vocab = {u: i for i, u in enumerate(b2u.values())}
        def u(s):
            return "".join(b2u[b] for b in s.encode())
        merges = [(u("t"), u("h")), (u("th"), u("e")), (u(" "), u("the")),
                  (u("i"), u("n")), (u("a"), u("n")), (u("an"), u("d"))]
        for l, r in merges:
            vocab.setdefault(l + r, len(vocab))
        tok = T.ByteLevelBPE(vocab, merges)
    assert tok._native is not None, "native BPE engine failed to load"
    texts = ["the theme and then the other thing in an odd and theatrical "
             "in-between", "and", "", "  the  in  ", "xyzé中"]
    for t in texts:
        native_ids = tok._encode_ordinary(t)
        tok2 = T.ByteLevelBPE(dict(tok.vocab), list(
            sorted(tok.ranks, key=tok.ranks.get)))
        tok2._native = None  # force the python path
        py_ids = tok2._encode_ordinary(t)
        assert native_ids == py_ids, (t, native_ids, py_ids)
