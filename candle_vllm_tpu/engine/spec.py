"""Prompt-lookup (n-gram) speculative decoding — draft proposal.

Beyond the reference's scope (candle-vllm has no speculative decode):
the only structural lever past the single-request weight-stream wall is
producing >1 token per weight pass.  The TPU-shaped trick: the decode
bucket already runs T=8 query rows through every matmul (weight-bound,
so 8 rows cost what 1 costs) — fill the padding rows with DRAFT tokens
and verify them in the same dispatch.  Greedy verification: a drafted
token is accepted iff it equals the model's argmax at the previous row;
the first mismatch row yields the corrected token, so every dispatch
nets between 1 and ``max_draft + 1`` tokens with EXACTLY the baseline's
device cost.  Output equality with plain greedy decode is bit-exact by
construction (the accepted prefix reproduces the sequential argmax
chain).

Drafts come from prompt-lookup: the longest recent n-gram match in the
sequence's own history (prompt + generated).  Free to propose, strong
on the repetitive structures serving actually sees (code edits, RAG
quoting, summaries); on adversarially random text acceptance is ~0 and
the engine falls back to the normal multi-token decode path.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def ngram_draft(
    tokens: Sequence[int],
    max_draft: int,
    ngram: int = 3,
    min_ngram: int = 1,
) -> List[int]:
    """Propose up to ``max_draft`` continuation tokens by matching the
    trailing ``ngram``-gram (falling back to shorter grams down to
    ``min_ngram``) against the sequence's own history and copying what
    followed the most recent earlier occurrence."""
    n = len(tokens)
    if n < min_ngram + 1 or max_draft <= 0:
        return []
    arr = np.asarray(tokens, np.int32)
    for k in range(min(ngram, n - 1), min_ngram - 1, -1):
        key = arr[n - k:]
        # sliding-window equality over all earlier k-gram starts
        windows = np.lib.stride_tricks.sliding_window_view(arr[: n - 1], k)
        hits = np.nonzero((windows == key).all(axis=1))[0]
        if hits.size == 0:
            continue
        # most recent occurrence with a FULL continuation window;
        # otherwise the earliest (longest partial continuation)
        full = hits[hits + k + max_draft <= n]
        j = int(full[-1]) if full.size else int(hits[0])
        start = j + k
        if start >= n:
            continue
        return arr[start : start + max_draft].tolist()
    return []
