"""Continuous-batching scheduler.

Re-designs the reference's scheduler
(``/root/reference/src/scheduler/mod.rs``): waiting / running / swapped
queues with FCFS priority, token-budget admission
(``max_num_batched_tokens``), chunked prefill interleaved with decode,
preemption by recompute or by swap, and prefix-cache pressure eviction.

TPU-first difference: the reference schedules either a prefill batch or a
decode batch per step with an interleave gate (mod.rs:196-271); here every
step emits ONE mixed batch — decode rows plus as many prefill-chunk tokens
as the budget allows — because the execution path is a single jitted mixed
step (see ops/ragged_paged_attention).  That keeps compiled-shape count low
and the MXU saturated.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Tuple

from candle_vllm_tpu.config import SchedulerConfig
from candle_vllm_tpu.engine.block_engine import AllocStatus, BlockEngine
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup, SequenceStatus


@dataclass
class ScheduledGroup:
    group: SequenceGroup
    # new tokens to compute this step per sequence id
    token_chunks: Dict[int, int]

    @property
    def is_prefill(self) -> bool:
        return any(n > 1 for n in self.token_chunks.values()) or any(
            not self.group.seqs[sid].output_token_ids for sid in self.token_chunks
        )


@dataclass
class SchedulerOutput:
    scheduled: List[ScheduledGroup] = field(default_factory=list)
    blocks_to_swap_in: Dict[int, int] = field(default_factory=dict)
    blocks_to_swap_out: Dict[int, int] = field(default_factory=dict)
    blocks_to_copy: List[Tuple[int, int]] = field(default_factory=list)
    preempted: List[SequenceGroup] = field(default_factory=list)
    ignored: List[SequenceGroup] = field(default_factory=list)

    @property
    def num_scheduled_tokens(self) -> int:
        return sum(sum(s.token_chunks.values()) for s in self.scheduled)

    @property
    def is_empty(self) -> bool:
        return not self.scheduled and not self.blocks_to_swap_in and not self.blocks_to_swap_out


class Scheduler:
    def __init__(self, config: SchedulerConfig, block_engine: BlockEngine):
        self.config = config
        self.block_engine = block_engine
        self.waiting: Deque[SequenceGroup] = deque()
        self.running: List[SequenceGroup] = []
        self.swapped: Deque[SequenceGroup] = deque()
        # logical clock: one tick per schedule() pass.  Swap cooldowns are
        # measured in ticks (not wall-clock) so replicated multi-host
        # schedulers replaying the same intake stream decide identically.
        self._tick = 0

    # -- intake -------------------------------------------------------------
    def add_seq_group(self, group: SequenceGroup) -> None:
        self.waiting.append(group)

    def abort(self, request_id: str) -> Optional[SequenceGroup]:
        for queue in (self.waiting, self.swapped):
            for g in list(queue):
                if g.request_id == request_id:
                    queue.remove(g)
                    self._finish_group(g, SequenceStatus.FINISHED_ABORTED)
                    return g
        for g in self.running:
            if g.request_id == request_id:
                self.running.remove(g)
                self._finish_group(g, SequenceStatus.FINISHED_ABORTED)
                return g
        return None

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def num_unfinished(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    def _finish_group(self, group: SequenceGroup, status: SequenceStatus) -> None:
        for seq in group.get_unfinished():
            seq.status = status
            if self.block_engine.has_table(seq):
                self.block_engine.free(seq)

    # -- the scheduling pass ---------------------------------------------------
    def schedule(self) -> SchedulerOutput:
        self._tick += 1
        out = SchedulerOutput()
        budget = self.config.max_num_batched_tokens
        chunk_cap = self.config.prefill_chunk_size

        # ---- phase 1: decodes (and running prefill chunks), highest priority
        # FCFS priority = arrival order; preempt from the back of `running`.
        self.running.sort(key=lambda g: g.arrival_time)
        still_running: List[SequenceGroup] = []
        queue = deque(self.running)
        while queue:
            group = queue.popleft()
            if group.cancelled:
                self._finish_group(group, SequenceStatus.FINISHED_ABORTED)
                out.preempted.append(group)
                continue
            if group.is_prefill:
                # running group mid-chunked-prefill: handled in phase 2 with
                # the other prefills so decodes get budget first
                still_running.append(group)
                continue
            # make room for one slot per unfinished seq, preempting if needed
            while True:
                if self.block_engine.can_append_slot(group):
                    chunks: Dict[int, int] = {}
                    for seq in group.get_unfinished():
                        cow = self.block_engine.append_slot(seq)
                        if cow is not None:
                            out.blocks_to_copy.append(cow)
                        chunks[seq.seq_id] = 1
                        budget -= 1
                    out.scheduled.append(ScheduledGroup(group, chunks))
                    still_running.append(group)
                    break
                # out of blocks: preempt the lowest-priority running group
                victim = queue.pop() if queue else None
                if victim is None:
                    # no lower-priority group — preempt this one
                    self._preempt(group, out)
                    break
                self._preempt(victim, out)
        self.running = still_running

        # ---- phase 2: continue chunked prefills already in running
        for group in list(self.running):
            if not group.is_prefill or budget <= 0:
                continue
            chunks = self._schedule_prefill_chunks(group, budget, chunk_cap)
            if chunks:
                budget -= sum(chunks.values())
                out.scheduled.append(ScheduledGroup(group, chunks))

        # A pass that preempted is under memory pressure: admitting new work
        # (or swapping back in) would immediately thrash.
        if out.preempted:
            return out

        # ---- phase 3: swap groups back in (before admitting new work)
        while self.swapped and budget > 0:
            group = self.swapped[0]
            if group.cancelled:
                self.swapped.popleft()
                self._finish_group(group, SequenceStatus.FINISHED_ABORTED)
                continue
            if len(self.running) >= self.config.max_num_seqs:
                break
            # swap-in cooling period (reference: mod.rs:39 SWAP_IN_COOLING_
            # PERIOD 300ms): a freshly swapped-out group must not bounce
            # straight back in while the pressure that evicted it persists.
            # Counted in scheduler ticks for cross-host determinism.
            if (
                self._tick - getattr(group, "swapped_at_tick", -(1 << 30))
                < self.config.swap_in_cooldown_steps
            ):
                break
            if not self.block_engine.can_swap_in(group):
                break
            self.swapped.popleft()
            mapping = self.block_engine.swap_in(group)
            out.blocks_to_swap_in.update(mapping)
            chunks = {}
            for seq in group.get_unfinished():
                seq.status = SequenceStatus.RUNNING
            if group.is_prefill:
                # swapped out mid-prefill: resume chunked prefill where the
                # swapped KV left off
                chunks = self._schedule_prefill_chunks(group, budget, chunk_cap)
                budget -= sum(chunks.values())
                if chunks:
                    out.scheduled.append(ScheduledGroup(group, chunks))
            elif self.block_engine.can_append_slot(group):
                # decode groups resume next token (their KV is intact)
                for seq in group.get_unfinished():
                    cow = self.block_engine.append_slot(seq)
                    if cow is not None:
                        out.blocks_to_copy.append(cow)
                    chunks[seq.seq_id] = 1
                    budget -= 1
                out.scheduled.append(ScheduledGroup(group, chunks))
            self.running.append(group)

        # ---- phase 4: admit waiting groups (FCFS, no head-of-line bypass)
        while self.waiting and budget > 0 and not self.swapped:
            group = self.waiting[0]
            if group.cancelled:
                self.waiting.popleft()
                self._finish_group(group, SequenceStatus.FINISHED_ABORTED)
                continue
            seq = group.get_seqs()[0]
            if seq.get_prompt_len() > self.config.max_model_len:
                self.waiting.popleft()
                self._finish_group(group, SequenceStatus.FINISHED_IGNORED)
                out.ignored.append(group)
                continue
            if len(self.running) >= self.config.max_num_seqs:
                break
            status = self.block_engine.can_allocate(group)
            if status == AllocStatus.IMPOSSIBLE:
                # try pressure-evicting prefix cache before giving up
                if not self._evict_prefix_pressure():
                    self.waiting.popleft()
                    self._finish_group(group, SequenceStatus.FINISHED_IGNORED)
                    out.ignored.append(group)
                    continue
                status = self.block_engine.can_allocate(group)
            if status != AllocStatus.OK:
                if not self.running and not self.swapped and not out.scheduled:
                    # nothing running that could ever free blocks — evict
                    # prefix cache or reject, else the queue deadlocks
                    if self._evict_prefix_pressure():
                        continue
                    self.waiting.popleft()
                    self._finish_group(group, SequenceStatus.FINISHED_IGNORED)
                    out.ignored.append(group)
                    continue
                break
            self.waiting.popleft()
            for s in group.get_unfinished():  # n-best: every sibling
                cached = self.block_engine.allocate(s)
                s.num_computed_tokens = cached
                s.status = SequenceStatus.RUNNING
            chunks = self._schedule_prefill_chunks(group, budget, chunk_cap)
            if not chunks:
                # allocated but no budget left this step — it will be picked
                # up by phase 2 next step
                self.running.append(group)
                break
            budget -= sum(chunks.values())
            out.scheduled.append(ScheduledGroup(group, chunks))
            self.running.append(group)

        return out

    def _schedule_prefill_chunks(
        self, group: SequenceGroup, budget: int, chunk_cap: int
    ) -> Dict[int, int]:
        """Pick this step's prefill chunk for a group (single-seq during
        prefill; forks happen after prompt processing)."""
        chunks: Dict[int, int] = {}
        for seq in group.get_unfinished():
            if not seq.is_prefill:
                continue
            n = seq.next_chunk_tokens(min(budget, chunk_cap))
            if n <= 0:
                continue
            if not self.block_engine.allocate_extend_for_chunk(
                seq, seq.num_computed_tokens + n
            ):
                continue
            chunks[seq.seq_id] = n
            budget -= n
        return chunks

    # -- preemption ----------------------------------------------------------
    def _preempt(self, group: SequenceGroup, out: SchedulerOutput) -> None:
        """Evict a running group (reference: _preempt, mod.rs:717-768)."""
        if group in self.running:
            self.running.remove(group)
        out.preempted.append(group)
        if self.config.preemption_mode == "swap" and self.block_engine.can_swap_out(group):
            mapping = self.block_engine.swap_out(group)
            out.blocks_to_swap_out.update(mapping)
            for seq in group.get_unfinished():
                seq.status = SequenceStatus.SWAPPED
            group.swapped_at_tick = self._tick
            self.swapped.append(group)
        else:
            # recompute: drop all KV, back to the head of the waiting queue
            for seq in group.get_unfinished():
                if self.block_engine.has_table(seq):
                    self.block_engine.free(seq)
                seq.status = SequenceStatus.WAITING
                seq.num_computed_tokens = 0
                seq.num_cached_tokens = 0
            self.waiting.appendleft(group)

    def _evict_prefix_pressure(self) -> bool:
        pc = self.block_engine.prefix_cache
        if pc is None or pc.num_evictable() == 0:
            return False
        n = max(1, int(pc.num_evictable() * self.config.prefix_evict_fraction))
        return pc.evict_many(n) > 0

    # -- post-step -------------------------------------------------------------
    def free_finished(self) -> List[SequenceGroup]:
        """Drop finished groups, inserting their blocks into the prefix cache
        (reference: free_finished_sequence_groups_with, mod.rs:439-475)."""
        finished = [g for g in self.running if g.is_finished]
        for group in finished:
            for seq in group.get_seqs():
                if self.block_engine.has_table(seq):
                    self.block_engine.free(
                        seq, cache_prefix=self.config.enable_prefix_caching
                    )
        self.running = [g for g in self.running if not g.is_finished]
        return finished

    def kv_usage(self) -> float:
        return self.block_engine.kv_usage()
