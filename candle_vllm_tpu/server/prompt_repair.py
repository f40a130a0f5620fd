"""Rendered-prompt repair: reasoning-scaffold re-insertion for replay.

Python re-design of the reference's ``RenderedPromptRepairer``
(``/root/reference/src/openai/conversation/mod.rs:71-350``): thinking
models generate after a template-emitted scaffold (e.g. ``<think>\\n``)
that HF templates do NOT replay inside historical assistant turns.  On a
multi-turn request the rendered prompt therefore diverges from the bytes
the model actually saw, breaking prefix-cache alignment and degrading
quality.  The repairer extracts the generation-prompt literal from the
template source, splits it into assistant header + reasoning scaffold,
and re-inserts the missing scaffold after every assistant header whose
block doesn't already start with the marker.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_KNOWN_MARKERS: Tuple[Tuple[str, str], ...] = (
    ("<think>", "</think>"),
    ("<thinking>", "</thinking>"),
    ("<reasoning>", "</reasoning>"),
    ("<reflection>", "</reflection>"),
    ("<internal>", "</internal>"),
)

_GEN_BLOCK_RE = re.compile(
    r"\{%-?\s*if\s+add_generation_prompt[^%]*-?%\}(?P<body>.*?)"
    r"\{%-?\s*endif\s*-?%\}",
    re.DOTALL,
)
_LIT_RE = re.compile(
    r"\{\{-?\s*(?P<q>['\"])(?P<lit>(?:\\.|(?!(?P=q)).)*)(?P=q)\s*-?\}\}",
    re.DOTALL,
)
_EOT_RE = re.compile(
    r"message\.role\s*==\s*['\"]assistant['\"].*?"
    r"\{\{-?\s*['\"](?P<eot><\|[^|]+\|>)['\"]\s*-?\}\}",
    re.DOTALL,
)
_THINK_FALSE_RE = re.compile(
    r"enable_thinking\s*(?:==\s*false|is\s+false|is\s+not\s+true)"
)


def _decode(lit: str) -> str:
    return (
        lit.replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\'", "'")
        .replace('\\"', '"')
    )


def _literals(text: str) -> List[str]:
    return [m.group("lit") for m in _LIT_RE.finditer(text)]


def extract_generation_prompt_literal(
    template: str, enable_thinking: bool
) -> Optional[str]:
    """The exact text the template emits for ``add_generation_prompt``
    (handles plain literals and the Qwen3.5-style ``enable_thinking``
    branch; reference: conversation/mod.rs:86-160)."""
    m = _GEN_BLOCK_RE.search(template)
    if m is None:
        return None
    body = m.group("body")
    lits = _literals(body)
    if not lits:
        return None
    if "enable_thinking" not in body:
        return "".join(_decode(x) for x in lits)

    idx = body.find("enable_thinking")
    header_lits = _literals(body[:idx])
    thinking_body = body[idx:]
    pre_else = thinking_body.split("else")[0]
    is_false_first = bool(_THINK_FALSE_RE.search(pre_else))
    sections = re.split(r"\{%-?\s*else\s*-?%\}", thinking_body, maxsplit=1)
    if len(sections) < 2:
        return None
    branch_lits = [_literals(s) for s in sections]
    disabled, enabled = (
        (branch_lits[0], branch_lits[1])
        if is_false_first
        else (branch_lits[1], branch_lits[0])
    )
    suffix = enabled if enable_thinking else disabled
    return "".join(_decode(x) for x in header_lits) + "".join(
        _decode(x) for x in suffix
    )


def _extract_eot(template: str, eos_token: Optional[str]) -> str:
    m = _EOT_RE.search(template)
    if m:
        eot = _decode(m.group("eot"))
        if "end" in eot or "eot" in eot:
            return eot
    return eos_token or "<|im_end|>"


def _escaped_token(token: str) -> str:
    # the display layer escapes special tokens with a zero-width
    # non-joiner after '<' (conversation/mod.rs:71-77)
    if token.startswith("<"):
        return "<‌" + token[1:]
    return token + "‌"


class PromptRepairer:
    """Re-inserts the reasoning scaffold into replayed assistant turns."""

    def __init__(self, assistant_header: str, eot: str,
                 start_marker: Optional[str], end_marker: Optional[str],
                 scaffold: Optional[str]):
        self.assistant_header = assistant_header
        self.eot = eot
        self.start_marker = start_marker
        self.end_marker = end_marker
        self.scaffold = scaffold

    @classmethod
    def from_template(
        cls,
        template: Optional[str],
        eos_token: Optional[str] = None,
        enable_thinking: bool = True,
    ) -> Optional["PromptRepairer"]:
        if not template:
            return None
        lit = extract_generation_prompt_literal(template, enable_thinking)
        if not lit:
            return None
        eot = _extract_eot(template, eos_token)
        for start, end in _KNOWN_MARKERS:
            idx = lit.find(start)
            if idx >= 0:
                header = lit[:idx]
                if not header:
                    return None
                return cls(header, eot, start, end, lit[idx:])
        if "assistant" in lit:
            return cls(lit, eot, None, None, None)
        return None

    @property
    def has_reasoning_scaffold(self) -> bool:
        return self.scaffold is not None

    def repair(self, prompt: str) -> Optional[str]:
        """Insert the missing scaffold after assistant headers; None when
        nothing needed changing (conversation/mod.rs:277-330)."""
        if not (self.start_marker and self.end_marker and self.scaffold):
            return None
        escaped_end = _escaped_token(self.end_marker)
        open_idx = self.scaffold.find(self.end_marker)
        opening = (
            self.scaffold[:open_idx] if open_idx >= 0 else self.scaffold
        )

        out: List[str] = []
        cursor = 0
        changed = False
        while True:
            rel = prompt.find(self.assistant_header, cursor)
            if rel < 0:
                break
            after = rel + len(self.assistant_header)
            out.append(prompt[cursor:after])
            rest = prompt[after:]
            block_end = rest.find(self.eot)
            if block_end < 0:
                block_end = len(rest)
            block = rest[:block_end]
            if not block.lstrip().startswith(self.start_marker):
                has_end = (
                    self.end_marker in block or escaped_end in block
                )
                out.append(opening if has_end else self.scaffold)
                changed = True
            out.append(block)
            cursor = after + block_end
        if not changed:
            return None
        out.append(prompt[cursor:])
        return "".join(out)
