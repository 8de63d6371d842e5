"""Conversation templates (reference llava/conversation.py).

The reference's `llada` template renders through the LLaDA tokenizer's chat
template — LLaMA-3 header format (conversation.py:98-130, 464-475); `dream`
uses the same path with the Qwen/ChatML-flavored Dream tokenizer
(conversation.py:541-552); `plain` concatenates with "\n" (used by stage-1
pretraining).  Rendered here explicitly so the framework works without
network access to the tokenizer hubs; when a HF tokenizer with a
chat_template is supplied, it takes precedence (matching the reference's
apply_chat_template path).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

DEFAULT_SYSTEM = (
    "You are a helpful language and vision assistant. "
    "You are able to understand the visual content that the user provides, "
    "and assist the user with a variety of tasks using natural language."
)


@dataclass
class Conversation:
    """An accumulating conversation; get_prompt() renders the full string."""

    name: str
    system: str = DEFAULT_SYSTEM
    roles: tuple[str, str] = ("user", "assistant")
    messages: list = field(default_factory=list)
    style: str = "llama_3"          # llama_3 | chatml | plain
    stop_token_ids: tuple[int, ...] = ()
    stop_str: Optional[str] = None
    tokenizer: object = None        # optional HF tokenizer with chat_template

    def copy(self) -> "Conversation":
        return dataclasses.replace(self, messages=list(self.messages))

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        if self.tokenizer is not None and getattr(
            self.tokenizer, "chat_template", None
        ):
            msgs = (
                [{"role": "system", "content": self.system}]
                if self.system else []
            ) + [
                {"role": r, "content": m} for r, m in self.messages if m
            ]
            return self.tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )
        if self.style == "llama_3":
            return self._render_llama3()
        if self.style == "chatml":
            return self._render_chatml()
        if self.style == "plain":
            ret = self.system
            for _, m in self.messages:
                if m:
                    ret += m + "\n"
            return ret
        raise ValueError(self.style)

    def _render_llama3(self) -> str:
        ret = "<|startoftext|>"
        if self.system:
            ret += (
                "<|start_header_id|>system<|end_header_id|>\n\n"
                + self.system + "<|eot_id|>"
            )
        for role, m in self.messages:
            # None placeholders (reference-style "cue the assistant") are
            # skipped: the generation header below covers them, and the
            # tokenizer chat_template path filters them identically
            if m is not None:
                ret += (
                    f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                    + m + "<|eot_id|>"
                )
        ret += "<|start_header_id|>assistant<|end_header_id|>\n\n"
        return ret

    def _render_chatml(self) -> str:
        ret = ""
        if self.system:
            ret += f"<|im_start|>system\n{self.system}<|im_end|>\n"
        for role, m in self.messages:
            if m is not None:  # see _render_llama3 on None placeholders
                ret += f"<|im_start|>{role}\n{m}<|im_end|>\n"
        ret += "<|im_start|>assistant\n"
        return ret


conv_templates: dict[str, Conversation] = {
    "llada": Conversation(
        name="llada", style="llama_3", stop_token_ids=(126348,),
        stop_str="<|eot_id|>",
    ),
    # Dream's chat template is ChatML (Qwen2 lineage — reference
    # conversation.py:541-552 routes through the Dream tokenizer whose
    # template emits <|im_start|> blocks; training preprocessing renders
    # the same format, data/preprocess.py).  The offline fallback must
    # match, otherwise prompts contain LLaMA-3 header tokens that don't
    # exist in Dream's vocab.
    "dream": Conversation(
        name="dream", style="chatml", stop_token_ids=(151643,),
        stop_str="<|im_end|>",
    ),
    "plain": Conversation(name="plain", system="", style="plain"),
    "qwen_1_5": Conversation(
        name="qwen_1_5", style="chatml", stop_str="<|im_end|>",
    ),
}


def get_conv_template(name: str) -> Conversation:
    """Fetch a template; unknown names fall back to `llada` (the reference
    has tokenizer/template fallback chains rather than hard failures,
    conversation.py:447-460)."""
    if name not in conv_templates:
        import warnings

        warnings.warn(f"unknown conversation template {name!r}; "
                      "falling back to 'llada'")
        name = "llada"
    return conv_templates[name].copy()
