"""Engine throughput/observability counters.

Reference: the engine's per-step prefill/decode tok/s prints and 5-second
rolling decode window (``llm_engine.rs:563-632, 939-1002``), the KV usage
gauge (scheduler/mod.rs:511-523) — exposed here as a stats object the
server renders at ``/metrics`` and logs periodically.
"""

from __future__ import annotations

import collections
import time
from dataclasses import dataclass, field
from typing import Deque, Dict, Tuple


@dataclass
class EngineStats:
    window_secs: float = 5.0
    num_steps: int = 0
    prefill_tokens_total: int = 0
    decode_tokens_total: int = 0
    requests_finished: int = 0
    requests_received: int = 0
    preemptions: int = 0
    step_time_total: float = 0.0
    # speculative decoding acceptance (engine/spec.py): drafted vs
    # accepted counts — acceptance rate is the lever's health metric
    spec_drafted: int = 0
    spec_accepted: int = 0
    _decode_window: Deque[Tuple[float, int]] = field(
        default_factory=collections.deque
    )
    _last_log: float = field(default_factory=time.monotonic)

    def record_step(
        self,
        prefill_tokens: int,
        decode_tokens: int,
        step_time: float,
        preempted: int = 0,
    ) -> None:
        now = time.monotonic()
        self.num_steps += 1
        self.prefill_tokens_total += prefill_tokens
        self.decode_tokens_total += decode_tokens
        self.preemptions += preempted
        self.step_time_total += step_time
        if decode_tokens:
            self._decode_window.append((now, decode_tokens))
        cutoff = now - self.window_secs
        while self._decode_window and self._decode_window[0][0] < cutoff:
            self._decode_window.popleft()

    def rolling_decode_tok_s(self) -> float:
        if not self._decode_window:
            return 0.0
        now = time.monotonic()
        span = max(now - self._decode_window[0][0], 1e-3)
        return sum(n for _, n in self._decode_window) / span

    def snapshot(self, kv_usage: float, num_running: int, num_waiting: int) -> Dict:
        return {
            "num_steps": self.num_steps,
            "prefill_tokens_total": self.prefill_tokens_total,
            "decode_tokens_total": self.decode_tokens_total,
            "requests_received": self.requests_received,
            "requests_finished": self.requests_finished,
            "preemptions": self.preemptions,
            "rolling_decode_tok_s": round(self.rolling_decode_tok_s(), 2),
            "avg_step_ms": round(
                1e3 * self.step_time_total / max(self.num_steps, 1), 3
            ),
            "kv_usage": round(kv_usage, 4),
            "num_running": num_running,
            "num_waiting": num_waiting,
            "spec_drafted": self.spec_drafted,
            "spec_accepted": self.spec_accepted,
        }

    def prometheus(self, kv_usage: float, num_running: int, num_waiting: int) -> str:
        snap = self.snapshot(kv_usage, num_running, num_waiting)
        lines = []
        for k, v in snap.items():
            lines.append(f"candle_vllm_tpu_{k} {v}")
        return "\n".join(lines) + "\n"


class RequestLogger:
    """Per-request lifecycle JSONL log (reference: the request logger /
    per-rank file logs, SURVEY.md §5 tracing).  One line per finished
    request: timings, token counts, cache hits, finish reason."""

    def __init__(self, path: str):
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log_finished(self, output) -> None:
        import json
        import time as _t

        m = output.metrics
        ttft_ms = (
            (m.first_token_time - m.arrival_time) * 1e3
            if m.first_token_time is not None
            else None
        )
        total_ms = (
            (m.finished_time - m.arrival_time) * 1e3
            if m.finished_time is not None
            else None
        )
        completion = sum(len(o.token_ids) for o in output.outputs)
        decode_tok_s = None
        if (
            m.finished_time is not None
            and m.first_token_time is not None
            and completion > 1
        ):
            d = m.finished_time - m.first_token_time
            if d > 0:
                decode_tok_s = (completion - 1) / d
        rec = {
            "ts": _t.time(),
            "request_id": output.request_id,
            "prompt_tokens": m.prompt_tokens,
            "cached_tokens": m.cached_tokens,
            "completion_tokens": completion,
            "ttft_ms": round(ttft_ms, 1) if ttft_ms is not None else None,
            "total_ms": round(total_ms, 1) if total_ms is not None else None,
            "decode_tok_s": round(decode_tok_s, 2) if decode_tok_s else None,
            "finish_reasons": [o.finish_reason for o in output.outputs],
        }
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()
