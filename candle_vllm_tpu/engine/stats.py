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
        }

    def prometheus(self, kv_usage: float, num_running: int, num_waiting: int) -> str:
        snap = self.snapshot(kv_usage, num_running, num_waiting)
        lines = []
        for k, v in snap.items():
            lines.append(f"candle_vllm_tpu_{k} {v}")
        return "\n".join(lines) + "\n"
