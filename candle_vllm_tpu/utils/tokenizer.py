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


class _TokWrapper:
    """Uniform encode()/decode() surface over a `tokenizers.Tokenizer`."""

    def __init__(self, t, bos_id=None, eos_id=None, chat_template=None,
                 add_bos=False):
        self._t = t
        self.vocab_size = t.get_vocab_size()
        self.bos_token_id = bos_id
        self.eos_token_id = eos_id
        self._chat_template = chat_template
        self._add_bos = add_bos

    def encode(self, text: str) -> List[int]:
        ids = self._t.encode(text).ids
        if self._add_bos and self.bos_token_id is not None:
            if not ids or ids[0] != self.bos_token_id:
                ids = [self.bos_token_id] + ids
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self._t.decode(list(ids), skip_special_tokens=skip_special_tokens)

    @property
    def chat_template(self):
        return self._chat_template


def tokenizer_from_gguf_metadata(md: dict) -> Any:
    """Reconstruct a tokenizer from GGUF ``tokenizer.ggml.*`` metadata —
    GGUF checkpoints carry no tokenizer.json (reference rebuilds the same
    way: pipeline.rs:1649-1813 + backend/gguf.rs tokenizer extraction).

    Two families:
    - ``gpt2``: byte-level BPE from tokens + merges (Qwen/GLM GGUFs)
    - ``llama``: SentencePiece-style Unigram from tokens + scores, with
      byte fallback and the ▁ space convention
    """
    from tokenizers import Tokenizer, decoders, models, normalizers, pre_tokenizers

    kind = md.get("tokenizer.ggml.model", "llama")
    tokens = md.get("tokenizer.ggml.tokens")
    if not tokens:
        return ByteTokenizer()
    bos = md.get("tokenizer.ggml.bos_token_id")
    eos = md.get("tokenizer.ggml.eos_token_id")
    template = md.get("tokenizer.chat_template")

    def mark_specials(tok):
        """Register control/unknown tokens as special so decode skips
        them (GGUF token_type: 2=unknown, 3=control)."""
        from tokenizers import AddedToken

        types = md.get("tokenizer.ggml.token_type")
        if types:
            specials = [
                tokens[i] for i, t in enumerate(types) if t in (2, 3)
            ]
        else:
            specials = [
                tokens[i]
                for i in (bos, eos, md.get("tokenizer.ggml.unknown_token_id"))
                if i is not None and 0 <= i < len(tokens)
            ]
        if specials:
            tok.add_special_tokens(
                [AddedToken(s, special=True) for s in dict.fromkeys(specials)]
            )

    if kind == "gpt2":
        vocab = {t: i for i, t in enumerate(tokens)}
        merges = [
            tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
            for m in md.get("tokenizer.ggml.merges", [])
        ]
        tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        mark_specials(tok)
        return _TokWrapper(tok, bos, eos, template)

    # llama / SPM-style
    scores = md.get("tokenizer.ggml.scores") or [0.0] * len(tokens)
    unk_id = md.get("tokenizer.ggml.unknown_token_id", 0)
    pieces = [(t, float(s)) for t, s in zip(tokens, scores)]
    tok = Tokenizer(
        models.Unigram(pieces, unk_id=int(unk_id), byte_fallback=True)
    )
    tok.normalizer = normalizers.Sequence(
        [normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")]
    )
    tok.decoder = decoders.Sequence(
        [
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(content=" ", left=1),
        ]
    )
    mark_specials(tok)
    return _TokWrapper(tok, bos, eos, template, add_bos=True)
