"""Training preprocessors: conversation -> (input_ids, labels).

Parity with reference llava/train/train.py preprocess_llada (:761-885) and
preprocess_dream (:889-1020):

  - system message rendered but fully IGNORE'd;
  - ONE random human->assistant pair is selected from multi-turn data
    (`rng.choice(gpt_indices)`, train.py:820-823 — a diffusion-specific
    choice: the bidirectional model would leak later turns);
  - the user turn is IGNORE'd; the assistant turn supervises everything
    after its header (the reference hard-codes the 6 header tokens,
    train.py:855-860 — here computed from the rendered header);
  - optional FIM corruption of the assistant turn (train.py:838-845);
  - "<image>" occurrences become IMAGE_TOKEN_INDEX.

Works with any tokenizer exposing __call__(text).input_ids; rendering uses
our conversation templates (llama_3 for llada, chatml for dream).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from .conversation import DEFAULT_SYSTEM
from .infill import maybe_corrupt_assistant_turn
from .prompts import _encode

_ROLES = {"human": "user", "gpt": "assistant"}


def _norm_turn(turn: dict) -> tuple[str, str]:
    role = turn.get("role", turn.get("from"))
    content = turn.get("content", turn.get("value"))
    return _ROLES.get(role, role), content


def _render_llada(role: str, content: str) -> str:
    return f"<|start_header_id|>{role}<|end_header_id|>\n\n{content}<|eot_id|>"


def _render_dream(role: str, content: str) -> str:
    return f"<|im_start|>{role}\n{content}<|im_end|>\n"


_STYLES = {
    "llada": (_render_llada,
              "<|start_header_id|>assistant<|end_header_id|>\n\n"),
    "dream": (_render_dream, "<|im_start|>assistant\n"),
}


def _tokenize_with_images(tokenizer, text: str) -> list[int]:
    ids: list[int] = []
    chunks = text.split("<image>")
    for i, c in enumerate(chunks):
        if i > 0:
            ids.append(IMAGE_TOKEN_INDEX)
        if c:
            ids.extend(_encode(tokenizer, c))
    return ids


def preprocess_diffusion(
    source: Sequence[dict],
    tokenizer,
    style: str = "llada",
    has_image: bool = False,
    system_message: str = DEFAULT_SYSTEM,
    rng: Optional[np.random.Generator] = None,
    is_infill_model: bool = False,
) -> dict:
    """One conversation -> {"input_ids": [T], "labels": [T]} (numpy)."""
    rng = rng or np.random.default_rng()
    render, assistant_header = _STYLES[style]

    turns = [_norm_turn(t) for t in source]
    if turns and turns[0][0] != "user":
        turns = turns[1:]

    # random single-turn selection (train.py:820-823)
    human_idx = [i for i, (r, _) in enumerate(turns) if r == "user"]
    human_idx = [i for i in human_idx
                 if i + 1 < len(turns) and turns[i + 1][0] == "assistant"]
    assert human_idx, "no human->assistant pair in source"
    sel = int(rng.choice(human_idx))
    pair = turns[sel : sel + 2]

    input_ids: list[int] = []
    labels: list[int] = []

    sys_text = "<|startoftext|>" if style == "llada" else ""
    sys_text += render("system", system_message)
    sys_ids = _encode(tokenizer, sys_text)
    input_ids += sys_ids
    labels += [IGNORE_INDEX] * len(sys_ids)

    for idx, (role, content) in enumerate(pair):
        if idx == 0 and has_image and "<image>" not in content:
            content = "<image>\n" + content
        if is_infill_model and role == "assistant":
            content = maybe_corrupt_assistant_turn(content, rng)
        text = render(role, content)
        if role == "assistant":
            header_len = len(_encode(tokenizer, assistant_header))
            ids = _tokenize_with_images(tokenizer, text)
            input_ids += ids
            labels += [IGNORE_INDEX] * header_len + ids[header_len:]
        else:
            ids = _tokenize_with_images(tokenizer, text)
            input_ids += ids
            labels += [IGNORE_INDEX] * len(ids)

    assert len(input_ids) == len(labels)
    return {
        "input_ids": np.asarray(input_ids, np.int64),
        "labels": np.asarray(labels, np.int64),
    }
