"""Self-contained offline tokenizer: checkpoint-dir in, token ids out.

The reference vendors a full Qwen2-style byte-level BPE for Dream
(llava/model/language_model/dream/tokenization_dream.py:1-339) and loads
LLaDA's from the checkpoint directory via AutoTokenizer.  In a zero-egress
serving environment neither hub access nor a warm HF cache exists, so this
module gives prompt ENCODING a real path from nothing but checkpoint files:

  load_tokenizer(ckpt_dir)
    1. `tokenizer.json` via the `tokenizers` runtime when importable
       (fast path, exact HF semantics, still fully offline);
    2. otherwise a pure-python byte-level BPE (`ByteLevelBPE`) built from
       `vocab.json` + `merges.txt` or from `tokenizer.json`'s model
       section — GPT-2 byte<->unicode table, regex pre-tokenization
       (Qwen/Dream PRETOKENIZE pattern by default), ranked merges, and
       added-token splitting, matching tokenization_dream.py behavior
       (token-exact vs the `tokenizers` runtime in tests).

Both return objects with the HF surface the rest of the framework uses:
`__call__(text).input_ids`, `encode`, `decode`, `chat_template` /
`apply_chat_template` (template read from tokenizer_config.json, rendered
with jinja2 when present).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Sequence

# Qwen/Dream pre-tokenization pattern (tokenization_dream.py:41); GPT-2's
# pattern differs only in unicode-category handling of contractions.
PRETOKENIZE_REGEX = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"""
    r""" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode table
    (tokenization_dream.py:44-66 semantics)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class ByteLevelBPE:
    """Pure-python byte-level BPE with HF-compatible results."""

    def __init__(
        self,
        vocab: dict[str, int],
        merges: Sequence[tuple[str, str]],
        special_tokens: Optional[dict[str, int]] = None,
        pattern: str = PRETOKENIZE_REGEX,
        chat_template: Optional[str] = None,
        bos_token_id: Optional[int] = None,
        eos_token_id: Optional[int] = None,
    ):
        import regex

        self.vocab = dict(vocab)
        self.id2tok = {i: t for t, i in self.vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.special = dict(special_tokens or {})
        for t, i in self.special.items():
            self.vocab.setdefault(t, i)
            self.id2tok.setdefault(i, t)
        self.pat = regex.compile(pattern)
        self.b2u = bytes_to_unicode()
        self.u2b = {u: b for b, u in self.b2u.items()}
        self.chat_template = chat_template
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self._special_pat = None
        if self.special:
            import re as _re

            self._special_pat = _re.compile(
                "(" + "|".join(
                    _re.escape(t)
                    for t in sorted(self.special, key=len, reverse=True)
                ) + ")"
            )
        self._bpe_cache: dict[str, list[str]] = {}
        # optional native merge engine (csrc/bpe.cpp via data/native.py):
        # the Python regex / NFC / byte-mapping stays here, the rank-
        # driven merge loop runs in C++ — transparent fallback when the
        # toolchain is absent
        self._native = None
        try:
            from .native import load_bpe_native

            self._native = load_bpe_native(self.vocab, merges)
        except Exception:
            self._native = None

    # -- core BPE ------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs,
                       key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            first, second = best
            out = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        if len(self._bpe_cache) < 65536:
            self._bpe_cache[token] = word
        return word

    def _encode_ordinary(self, text: str) -> list[int]:
        import unicodedata

        text = unicodedata.normalize("NFC", text)
        if self._native is not None:
            words = [
                [self.vocab[self.b2u[b]] for b in tok.encode("utf-8")]
                for tok in self.pat.findall(text)
            ]
            return self._native.apply(words)
        ids = []
        for tok in self.pat.findall(text):
            mapped = "".join(self.b2u[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.vocab[piece])
        return ids

    # -- public HF-like surface ----------------------------------------

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids: list[int] = []
        if self._special_pat is None:
            ids = self._encode_ordinary(text)
        else:
            for chunk in self._special_pat.split(text):
                if not chunk:
                    continue
                if chunk in self.special:
                    ids.append(self.special[chunk])
                else:
                    ids.extend(self._encode_ordinary(chunk))
        if add_special_tokens and self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text: str, add_special_tokens: bool = True):
        class _Result:
            pass

        r = _Result()
        r.input_ids = self.encode(text, add_special_tokens=add_special_tokens)
        return r

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        pieces = []
        for i in ids:
            i = int(i)
            tok = self.id2tok.get(i)
            if tok is None:
                continue
            if i in self.special.values() or tok in self.special:
                if not skip_special_tokens:
                    pieces.append(tok)
                continue
            pieces.append(tok)
        text = "".join(pieces)
        data = bytes(self.u2b[c] for c in text if c in self.u2b)
        return data.decode("utf-8", errors="replace")

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self.vocab.get(tokens)
        return [self.vocab.get(t) for t in tokens]

    def apply_chat_template(self, messages, tokenize: bool = False,
                            add_generation_prompt: bool = True):
        assert self.chat_template, "no chat template in tokenizer_config"
        import jinja2

        env = jinja2.Environment()
        env.filters.setdefault("tojson", lambda v, **kw: json.dumps(v, **kw))
        out = env.from_string(self.chat_template).render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token="", eos_token="",
        )
        return self.encode(out) if tokenize else out


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def _read_json(path: str):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _chat_template_from_config(ckpt_dir: str) -> Optional[str]:
    cfg_path = os.path.join(ckpt_dir, "tokenizer_config.json")
    if os.path.exists(cfg_path):
        return _read_json(cfg_path).get("chat_template")
    return None


def _ids_from_config(ckpt_dir: str, vocab: dict) -> tuple:
    bos = eos = None
    cfg_path = os.path.join(ckpt_dir, "tokenizer_config.json")
    if os.path.exists(cfg_path):
        cfg = _read_json(cfg_path)

        def tok_id(key):
            t = cfg.get(key)
            if isinstance(t, dict):
                t = t.get("content")
            return vocab.get(t) if isinstance(t, str) else None

        bos, eos = tok_id("bos_token"), tok_id("eos_token")
    return bos, eos


def load_pure_bpe(ckpt_dir: str) -> ByteLevelBPE:
    """Build the pure-python tokenizer from checkpoint files."""
    vj = os.path.join(ckpt_dir, "vocab.json")
    mf = os.path.join(ckpt_dir, "merges.txt")
    tj = os.path.join(ckpt_dir, "tokenizer.json")
    special: dict[str, int] = {}
    if os.path.exists(vj) and os.path.exists(mf):
        vocab = _read_json(vj)
        merges = []
        with open(mf, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        if os.path.exists(tj):
            for at in _read_json(tj).get("added_tokens", []):
                special[at["content"]] = at["id"]
    elif os.path.exists(tj):
        data = _read_json(tj)
        model = data.get("model", {})
        assert model.get("type") == "BPE", (
            f"unsupported tokenizer model {model.get('type')!r}"
        )
        vocab = model["vocab"]
        merges = [tuple(m) if isinstance(m, list) else tuple(m.split(" "))
                  for m in model["merges"]]
        for at in data.get("added_tokens", []):
            special[at["content"]] = at["id"]
    else:
        raise FileNotFoundError(
            f"no tokenizer files (tokenizer.json / vocab.json+merges.txt) "
            f"in {ckpt_dir}"
        )
    bos, eos = _ids_from_config(ckpt_dir, {**vocab, **special})
    return ByteLevelBPE(
        vocab, merges, special,
        chat_template=_chat_template_from_config(ckpt_dir),
        bos_token_id=bos, eos_token_id=eos,
    )


class _FastWrapper:
    """`tokenizers`-runtime tokenizer behind the same HF-like surface."""

    def __init__(self, tok, chat_template, bos_token_id, eos_token_id):
        self._tok = tok
        self.chat_template = chat_template
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id

    def encode(self, text, add_special_tokens: bool = False):
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if add_special_tokens and self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text, add_special_tokens: bool = True):
        class _Result:
            pass

        r = _Result()
        r.input_ids = self.encode(text, add_special_tokens=add_special_tokens)
        return r

    def decode(self, ids, skip_special_tokens: bool = True):
        return self._tok.decode([int(i) for i in ids],
                                skip_special_tokens=skip_special_tokens)

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self._tok.token_to_id(tokens)
        return [self._tok.token_to_id(t) for t in tokens]

    def apply_chat_template(self, messages, tokenize: bool = False,
                            add_generation_prompt: bool = True):
        return ByteLevelBPE.apply_chat_template(
            self, messages, tokenize, add_generation_prompt
        )


def load_hf_or_offline(ckpt_dir: str):
    """AutoTokenizer when transformers can build one from the local dir
    (vendored tokenizer classes, sentencepiece files, ...), else the
    self-contained offline path.  Every CLI loads through this, so prompt
    encoding works with nothing but checkpoint files."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(
            ckpt_dir, local_files_only=True, trust_remote_code=True
        )
    except Exception:
        return load_tokenizer(ckpt_dir)


def load_tokenizer(ckpt_dir: str, prefer_pure: bool = False):
    """Checkpoint dir -> tokenizer; `tokenizers` runtime when available,
    pure-python BPE otherwise (or when prefer_pure)."""
    tj = os.path.join(ckpt_dir, "tokenizer.json")
    if not prefer_pure and os.path.exists(tj):
        try:
            from tokenizers import Tokenizer

            tok = Tokenizer.from_file(tj)
            vocab = tok.get_vocab()
            bos, eos = _ids_from_config(ckpt_dir, vocab)
            return _FastWrapper(
                tok, _chat_template_from_config(ckpt_dir), bos, eos
            )
        except ImportError:
            pass
    return load_pure_bpe(ckpt_dir)
