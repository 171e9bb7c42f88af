"""Prompt templates.

The active template in every trained/evaluated reference config is Vicuna v1
(reference: revisionllm/conversation.py:373-381 `conv_vicuna_v1`, selected via
`conv_templates["v1"]` at revisionllm/inference.py:31). We implement only the
templates the pipeline exercises (v1 / plain) as a small immutable API instead
of the mutable FastChat registry.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import List, Optional, Tuple


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()
    PLAIN = auto()
    LLAMA_2 = auto()


@dataclasses.dataclass(frozen=True)
class Conversation:
    """Immutable conversation template.

    `get_prompt` reproduces the string layout of the reference
    (revisionllm/conversation.py:29-104, SeparatorStyle.TWO branch at :51-60):
    ``system + sep + role: msg + sep_i`` with alternating separators, and a
    bare ``role:`` (no trailing space) for an empty assistant slot.
    """

    system: str
    roles: Tuple[str, str]
    sep_style: SeparatorStyle = SeparatorStyle.TWO
    sep: str = " "
    sep2: Optional[str] = "</s>"
    version: str = "v1"

    def prompt(self, messages: List[Tuple[str, Optional[str]]]) -> str:
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.LLAMA_2:
            # (reference conversation.py:70-90 llama-2 [INST] wrapping)
            wrap_sys = f"<<SYS>>\n{self.system}\n<</SYS>>\n\n"
            ret = ""
            for i, (role, message) in enumerate(messages):
                if message:
                    if i == 0:
                        message = wrap_sys + message
                    if i % 2 == 0:
                        ret += self.sep + f"[INST] {message} [/INST]"
                    else:
                        ret += " " + message + " " + self.sep2
            return ret.lstrip(self.sep)
        if self.sep_style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2]
            ret = self.system
            for i, (_, message) in enumerate(messages):
                if message:
                    ret += message + seps[i % 2]
            return ret
        raise ValueError(f"Invalid separator style: {self.sep_style}")

    def user_turn_prompt(self, query: str) -> str:
        """Single user turn awaiting an assistant answer — the shape every
        inference call uses (reference: revisionllm/inference.py:31-34)."""
        return self.prompt([(self.roles[0], query), (self.roles[1], None)])

    @property
    def stop_str(self) -> str:
        """Generation stop string (reference: revisionllm/inference.py:40)."""
        return self.sep if self.sep_style != SeparatorStyle.TWO else self.sep2


CONV_VICUNA_V1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1",
)

CONV_PLAIN = Conversation(
    system="",
    roles=("", ""),
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    sep2="\n",
    version="plain",
)

CONV_LLAMA_2 = Conversation(
    system=(
        "You are a helpful, respectful and honest assistant. Always answer as "
        "helpfully as possible, while being safe."
    ),
    roles=("USER", "ASSISTANT"),
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
    version="llama_v2",
)

conv_templates = {
    "v1": CONV_VICUNA_V1,
    "vicuna_v1": CONV_VICUNA_V1,
    "plain": CONV_PLAIN,
    "llama_2": CONV_LLAMA_2,
}

default_conversation = CONV_VICUNA_V1
