"""Per-request sampling parameters.

Mirrors the surface of the reference's ``SamplingParams``
(``/root/reference/src/openai/sampling_params.rs``): temperature / top-k /
top-p / min-p strategies, frequency & presence penalties over a last-n
window, n-best generation, stop strings and stop token ids, max-token
budgets, and logprobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union

_SAMPLING_EPS = 1e-5


@dataclass
class SamplingParams:
    n: int = 1
    best_of: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    repeat_last_n: int = 64
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: Optional[int] = None
    stop: Union[None, str, List[str]] = None
    stop_token_ids: List[int] = field(default_factory=list)
    ignore_eos: bool = False
    max_tokens: int = 4096
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    skip_special_tokens: bool = True
    # per-request cap on fused decode micro-steps: 1 restores per-token
    # SSE cadence / stop checks for latency-sensitive streams (the
    # engine-wide default is SchedulerConfig.decode_steps; the batch
    # steps at the minimum across scheduled requests)
    decode_steps: Optional[int] = None

    def __post_init__(self) -> None:
        if self.best_of is None:
            self.best_of = self.n
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        self._verify()

    def _verify(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.best_of < self.n:
            raise ValueError(f"best_of ({self.best_of}) must be >= n ({self.n})")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError(f"presence_penalty must be in [-2, 2], got {self.presence_penalty}")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError(f"frequency_penalty must be in [-2, 2], got {self.frequency_penalty}")
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (disabled) or >= 1, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if self.decode_steps is not None and self.decode_steps < 1:
            raise ValueError(
                f"decode_steps must be >= 1, got {self.decode_steps}"
            )
        if self.logprobs is not None and not 0 <= self.logprobs <= 20:
            raise ValueError(
                f"logprobs must be in [0, 20], got {self.logprobs}"
            )

    @property
    def is_greedy(self) -> bool:
        return self.temperature < _SAMPLING_EPS

    @property
    def has_penalties(self) -> bool:
        return (
            abs(self.presence_penalty) > _SAMPLING_EPS
            or abs(self.frequency_penalty) > _SAMPLING_EPS
            or abs(self.repetition_penalty - 1.0) > _SAMPLING_EPS
        )


def _sp_to_dict(self) -> dict:
    """JSON-safe field dict (multi-host intake replication; defaults
    omitted so the wire stays small)."""
    import dataclasses

    out = {}
    for f in dataclasses.fields(self):
        v = getattr(self, f.name)
        d = f.default if f.default is not dataclasses.MISSING else None
        if v != d and not callable(v):
            out[f.name] = v
    return out


SamplingParams.to_dict = _sp_to_dict
