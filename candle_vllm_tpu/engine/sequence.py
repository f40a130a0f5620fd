"""Sequences and sequence groups.

Re-designs the reference's ``_Sequence`` / ``SequenceGroup``
(``/root/reference/src/scheduler/sequence.rs``): prompt+output token
tracking, a status machine, chunked-prefill counters
(``num_cached_tokens`` advancing per scheduled chunk), and n-best groups
carrying request metadata and sampling params.

Unlike the reference there is no interior mutability dance — the engine core
is single-threaded asyncio, so plain Python objects suffice
(SURVEY.md §5 "race detection": the TPU build avoids locks by design).
"""

from __future__ import annotations

import enum
import time
from typing import Any, Callable, Dict, List, Optional

from candle_vllm_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @property
    def is_finished(self) -> bool:
        return self in (
            SequenceStatus.FINISHED_STOPPED,
            SequenceStatus.FINISHED_LENGTH_CAPPED,
            SequenceStatus.FINISHED_ABORTED,
            SequenceStatus.FINISHED_IGNORED,
        )

    @property
    def finish_reason(self) -> Optional[str]:
        return {
            SequenceStatus.FINISHED_STOPPED: "stop",
            SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
            SequenceStatus.FINISHED_ABORTED: "abort",
            SequenceStatus.FINISHED_IGNORED: "length",
        }.get(self)


class Sequence:
    """One decoding stream: prompt tokens + generated tokens.

    ``num_computed_tokens`` tracks how many tokens have had their KV written
    (advances by chunk during chunked prefill; reference:
    sequence.rs:279-299 ``prefill_chunk_tokens``).
    """

    __slots__ = (
        "seq_id",
        "prompt_token_ids",
        "output_token_ids",
        "status",
        "num_computed_tokens",
        "num_cached_tokens",
        "output_text",
        "stop_reason",
        "_cumulative_logprob",
        "last_sampled_logprobs",
        "output_logprobs",
        "mm_pos",
        "mm_embeds",
        "hash_seed",
    )

    def __init__(self, seq_id: int, prompt_token_ids: List[int]):
        self.seq_id = seq_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: List[int] = []
        self.status = SequenceStatus.WAITING
        # tokens whose KV is already materialized in device blocks
        self.num_computed_tokens = 0
        # tokens satisfied by a prefix-cache hit (subset of computed)
        self.num_cached_tokens = 0
        self.output_text = ""
        self.stop_reason: Optional[Any] = None
        self._cumulative_logprob = 0.0
        self.last_sampled_logprobs: Optional[Dict[int, float]] = None
        # per sampled token: {"token": id, "logprob": f, "top": {id: f}}
        self.output_logprobs: List[Dict[str, Any]] = []
        # multimodal: per-prompt-position image-embed row (-1 = text) and
        # the encoded embeddings [1+n_ds, M, hidden] (shared np array);
        # hash_seed mixes image content into prefix-cache block hashes
        # (reference: prefix_cache.rs:371-383 mix_seed)
        self.mm_pos: Optional[Any] = None
        self.mm_embeds: Optional[Any] = None
        self.hash_seed: int = 0

    # -- token accessors -----------------------------------------------------
    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def append_token(self, token_id: int, logprob: float = 0.0) -> None:
        self.output_token_ids.append(token_id)
        self._cumulative_logprob += logprob

    @property
    def cumulative_logprob(self) -> float:
        return self._cumulative_logprob

    # -- prefill chunk bookkeeping --------------------------------------------
    @property
    def num_uncomputed_tokens(self) -> int:
        """Tokens still needing KV materialization this or future steps.

        Decode target: with outputs present, the KV target is ``len - 0``
        including the just-appended token (computed one step behind), so a
        decode step always has exactly one uncomputed token.
        """
        return self.get_len() - self.num_computed_tokens

    @property
    def is_prefill(self) -> bool:
        """True while multi-token (prompt or recompute) processing remains."""
        target = self.get_len() - (1 if self.output_token_ids else 0)
        return self.num_computed_tokens < target

    def next_chunk_tokens(self, chunk_size: int) -> int:
        """How many new tokens the next step should process (>=1)."""
        return min(self.num_uncomputed_tokens, chunk_size)

    def fork(self, new_seq_id: int) -> "Sequence":
        child = Sequence(new_seq_id, self.prompt_token_ids)
        child.output_token_ids = list(self.output_token_ids)
        child.status = self.status
        child.num_computed_tokens = self.num_computed_tokens
        child.num_cached_tokens = self.num_cached_tokens
        child.output_text = self.output_text
        child._cumulative_logprob = self._cumulative_logprob
        child.mm_pos = self.mm_pos
        child.mm_embeds = self.mm_embeds
        child.hash_seed = self.hash_seed
        return child

    @property
    def is_finished(self) -> bool:
        return self.status.is_finished

    def __repr__(self) -> str:
        return (
            f"Sequence(id={self.seq_id}, status={self.status.name}, "
            f"len={self.get_len()}, computed={self.num_computed_tokens})"
        )


class SequenceGroup:
    """All sequences spawned by one request (n-best / best_of).

    Carries the request metadata + sampling params; the engine streams
    deltas through ``on_token`` callbacks installed by the server layer
    (reference: SequenceGroup holds the SSE sender, sequence.rs:343-477).
    """

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: SamplingParams,
        arrival_time: Optional[float] = None,
        created_time: Optional[int] = None,
    ):
        self.request_id = request_id
        self.seqs: Dict[int, Sequence] = {s.seq_id: s for s in seqs}
        self.sampling_params = sampling_params
        self.arrival_time = arrival_time if arrival_time is not None else time.monotonic()
        self.created_time = created_time if created_time is not None else int(time.time())
        self.prompt: Optional[str] = None
        self.metrics: Dict[str, float] = {}
        # server-installed stream hook: fn(seq, token_id, text_delta, finished)
        self.on_token: Optional[Callable[..., Any]] = None
        # set when client disconnects; scheduler aborts on next pass
        self.cancelled = False

    def get_seqs(self, status: Optional[SequenceStatus] = None) -> List[Sequence]:
        if status is None:
            return list(self.seqs.values())
        return [s for s in self.seqs.values() if s.status == status]

    def get_unfinished(self) -> List[Sequence]:
        return [s for s in self.seqs.values() if not s.is_finished]

    def num_seqs(self) -> int:
        return len(self.seqs)

    @property
    def is_finished(self) -> bool:
        return all(s.is_finished for s in self.seqs.values())

    @property
    def is_prefill(self) -> bool:
        return any(s.is_prefill for s in self.get_unfinished())

    def total_tokens(self) -> int:
        return sum(s.get_len() for s in self.seqs.values())

    def add_seq(self, seq: Sequence) -> None:
        self.seqs[seq.seq_id] = seq

    def __repr__(self) -> str:
        return f"SequenceGroup(request_id={self.request_id}, n={len(self.seqs)})"
