"""Tokenizer loading + a built-in byte-level fallback.

The reference extracts tokenizers from HF repos or GGUF metadata
(``/root/reference/src/openai/pipelines/pipeline.rs:1649-1813``).  Here:
local HF dirs load through ``transformers.AutoTokenizer``; the
``ByteTokenizer`` serves dummy/bench models (zero-egress environment has
no hub).
"""

from __future__ import annotations

import os
from typing import Any, List, Optional


class ByteTokenizer:
    """UTF-8 bytes as tokens (ids offset past the specials)."""

    BOS, EOS, PAD = 0, 1, 2
    _OFFSET = 3

    def __init__(self):
        self.vocab_size = 256 + self._OFFSET
        self.eos_token_id = self.EOS
        self.bos_token_id = self.BOS

    def encode(self, text: str) -> List[int]:
        return [b + self._OFFSET for b in text.encode("utf-8")]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        # ids past the byte range (models may have a larger padded vocab)
        # are treated like specials and skipped
        data = bytes(
            i - self._OFFSET
            for i in ids
            if self._OFFSET <= i < 256 + self._OFFSET
        )
        return data.decode("utf-8", errors="replace")


def load_tokenizer(model_dir: Optional[str]) -> Any:
    if model_dir is None:
        return ByteTokenizer()
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)

    class _Wrapped:
        """Uniform encode()/decode() surface over transformers'."""

        def __init__(self, t):
            self._t = t
            self.vocab_size = t.vocab_size
            self.eos_token_id = t.eos_token_id
            self.bos_token_id = t.bos_token_id

        def encode(self, text: str) -> List[int]:
            return self._t.encode(text, add_special_tokens=True)

        def decode(self, ids, skip_special_tokens: bool = True) -> str:
            return self._t.decode(ids, skip_special_tokens=skip_special_tokens)

        @property
        def chat_template(self):
            return getattr(self._t, "chat_template", None)

    return _Wrapped(tok)
