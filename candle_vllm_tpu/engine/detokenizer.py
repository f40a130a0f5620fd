"""Incremental detokenization.

Replaces the reference's per-group ``DecodeStream`` map
(``/root/reference/src/openai/pipelines/mod.rs:130-160``): decoded text is
emitted as soon as it is unambiguous, holding back trailing bytes that are
still an incomplete UTF-8 sequence / merge (the "\\ufffd" guard).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class IncrementalDetokenizer:
    """Per-sequence streaming decoder over any tokenizer exposing
    ``decode(ids, skip_special_tokens=...)``."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        # seq_id -> (prefix_offset, read_offset) into the token list
        self._state: dict[int, Tuple[int, int]] = {}

    def _decode(self, ids: List[int]) -> str:
        if not ids:
            return ""
        return self.tokenizer.decode(ids, skip_special_tokens=self.skip_special)

    def step(self, seq_id: int, token_ids: List[int], num_prompt_tokens: int = 0) -> str:
        """Feed the full token list; returns the new text delta.

        Output text starts after the prompt; a few prompt tokens are kept in
        the decode window as left-context for byte-level merges."""
        if seq_id not in self._state:
            self._state[seq_id] = (
                max(num_prompt_tokens - 5, 0),
                num_prompt_tokens,
            )
        prefix, read = self._state[seq_id]
        prefix_text = self._decode(token_ids[prefix:read])
        full_text = self._decode(token_ids[prefix:])
        if full_text.endswith("�"):
            # incomplete multi-byte sequence — wait for more tokens
            return ""
        delta = full_text[len(prefix_text):]
        # slide the context window: old read becomes the new prefix, so each
        # decode sees just enough left-context for byte-level merges
        self._state[seq_id] = (read, len(token_ids))
        return delta

    def finish(self, seq_id: int) -> None:
        self._state.pop(seq_id, None)
