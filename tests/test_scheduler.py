"""Scheduler behavior: chunked prefill, mixed batches, preemption, caps."""

import time

from candle_vllm_tpu.config import SchedulerConfig
from candle_vllm_tpu.engine.block_engine import BlockEngine
from candle_vllm_tpu.engine.scheduler import Scheduler
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup, SequenceStatus
from candle_vllm_tpu.sampling_params import SamplingParams


def make_scheduler(
    block_size=4,
    num_gpu_blocks=64,
    max_num_seqs=8,
    max_batched=64,
    chunk=16,
    max_model_len=128,
    preemption="recompute",
    cooldown=0,
):
    cfg = SchedulerConfig(
        max_num_seqs=max_num_seqs,
        max_num_batched_tokens=max_batched,
        prefill_chunk_size=chunk,
        max_model_len=max_model_len,
        preemption_mode=preemption,
        swap_in_cooldown_steps=cooldown,
    )
    be = BlockEngine(block_size, num_gpu_blocks, num_cpu_blocks=64)
    return Scheduler(cfg, be)


_next_id = [0]


def add_request(sched, prompt_len, arrival=None):
    _next_id[0] += 1
    sid = _next_id[0]
    seq = Sequence(sid, list(range(1000 + sid, 1000 + sid + prompt_len)))
    group = SequenceGroup(f"req-{sid}", [seq], SamplingParams())
    if arrival is not None:
        group.arrival_time = arrival
    sched.add_seq_group(group)
    return group, seq


def run_step(sched):
    """Advance computed-token counters as the engine would after a forward."""
    out = sched.schedule()
    for sg in out.scheduled:
        for sid, n in sg.token_chunks.items():
            seq = sg.group.seqs[sid]
            seq.num_computed_tokens += n
            if seq.num_computed_tokens == seq.get_len():
                seq.append_token(7)  # pretend we sampled token 7
    return out


def test_simple_prefill_then_decode():
    sched = make_scheduler()
    group, seq = add_request(sched, prompt_len=10)
    out = run_step(sched)
    assert len(out.scheduled) == 1
    assert out.scheduled[0].token_chunks == {seq.seq_id: 10}
    assert seq.status == SequenceStatus.RUNNING
    assert len(seq.output_token_ids) == 1
    out = run_step(sched)
    assert out.scheduled[0].token_chunks == {seq.seq_id: 1}
    assert len(seq.output_token_ids) == 2


def test_chunked_prefill_spans_steps():
    sched = make_scheduler(chunk=8, max_batched=8)
    group, seq = add_request(sched, prompt_len=20)
    out = run_step(sched)
    assert out.scheduled[0].token_chunks == {seq.seq_id: 8}
    assert seq.num_computed_tokens == 8
    assert not seq.output_token_ids
    run_step(sched)
    assert seq.num_computed_tokens == 16
    out = run_step(sched)
    assert out.scheduled[0].token_chunks == {seq.seq_id: 4}
    assert len(seq.output_token_ids) == 1  # prefill done -> sampled


def test_mixed_decode_and_prefill_in_one_step():
    sched = make_scheduler(chunk=16, max_batched=32)
    g1, s1 = add_request(sched, prompt_len=8)
    run_step(sched)  # s1 prefilled
    g2, s2 = add_request(sched, prompt_len=16)
    out = run_step(sched)
    kinds = {sg.group.request_id: sum(sg.token_chunks.values()) for sg in out.scheduled}
    assert kinds[g1.request_id] == 1     # decode
    assert kinds[g2.request_id] == 16    # prefill chunk in the same step
    assert out.num_scheduled_tokens == 17


def test_token_budget_respected():
    sched = make_scheduler(chunk=64, max_batched=24)
    add_request(sched, prompt_len=20)
    add_request(sched, prompt_len=20)
    out = run_step(sched)
    assert out.num_scheduled_tokens <= 24


def test_max_num_seqs_cap():
    sched = make_scheduler(max_num_seqs=2)
    for _ in range(4):
        add_request(sched, prompt_len=4)
    out = run_step(sched)
    assert len(out.scheduled) == 2
    assert len(sched.waiting) == 2


def test_preempt_by_recompute_when_blocks_exhausted():
    # 8 blocks of 4 tokens = 32 token slots total
    sched = make_scheduler(num_gpu_blocks=8, max_num_seqs=4, max_batched=64)
    g1, s1 = add_request(sched, prompt_len=12, arrival=1.0)
    g2, s2 = add_request(sched, prompt_len=12, arrival=2.0)
    run_step(sched)  # both prefill: 3 blocks each, 2 free
    # decode until blocks run out; g2 (newer) must be preempted
    preempted = []
    for _ in range(12):
        out = run_step(sched)
        preempted.extend(out.preempted)
        if preempted:
            break
    assert preempted and preempted[0] is g2
    assert s2.status == SequenceStatus.WAITING
    assert s2.num_computed_tokens == 0
    assert sched.waiting[0] is g2
    assert s1.status == SequenceStatus.RUNNING


def test_preempt_by_swap_and_swap_back():
    sched = make_scheduler(
        num_gpu_blocks=8, max_num_seqs=4, max_batched=64, preemption="swap"
    )
    g1, s1 = add_request(sched, prompt_len=12, arrival=1.0)
    g2, s2 = add_request(sched, prompt_len=12, arrival=2.0)
    run_step(sched)
    swapped_out = {}
    for _ in range(12):
        out = run_step(sched)
        if out.blocks_to_swap_out:
            swapped_out = out.blocks_to_swap_out
            break
    assert swapped_out
    assert s2.status == SequenceStatus.SWAPPED
    computed_before = s2.num_computed_tokens
    assert computed_before > 0  # KV preserved
    # finish g1 -> blocks free -> g2 swaps back in
    for seq in g1.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
    sched.free_finished()
    out = run_step(sched)
    assert out.blocks_to_swap_in
    assert s2.status == SequenceStatus.RUNNING
    assert s2.num_computed_tokens >= computed_before


def test_too_long_prompt_ignored():
    sched = make_scheduler(max_model_len=16)
    group, seq = add_request(sched, prompt_len=64)
    out = run_step(sched)
    assert group in out.ignored
    assert seq.status == SequenceStatus.FINISHED_IGNORED


def test_abort_request():
    sched = make_scheduler()
    group, seq = add_request(sched, prompt_len=8)
    run_step(sched)
    sched.abort(group.request_id)
    assert seq.status == SequenceStatus.FINISHED_ABORTED
    assert not sched.has_unfinished()
    assert sched.block_engine.get_num_free_gpu_blocks() == 64


def test_cancelled_group_dropped():
    sched = make_scheduler()
    group, seq = add_request(sched, prompt_len=8)
    run_step(sched)
    group.cancelled = True
    out = run_step(sched)
    assert group in out.preempted
    assert seq.status == SequenceStatus.FINISHED_ABORTED


def test_finished_groups_feed_prefix_cache():
    sched = make_scheduler()
    group, seq = add_request(sched, prompt_len=12)
    run_step(sched)
    for s in group.get_seqs():
        s.status = SequenceStatus.FINISHED_STOPPED
    sched.free_finished()
    # next identical prompt hits the cache
    g2, s2 = add_request(sched, prompt_len=0)
    s2.prompt_token_ids = list(seq.prompt_token_ids)
    out = run_step(sched)
    assert s2.num_cached_tokens == 8  # (12-1)//4*4


def test_swap_in_cooldown_blocks_immediate_return():
    """A freshly swapped-out group must wait out the cooling period before
    swapping back in (reference: mod.rs:39 SWAP_IN_COOLING_PERIOD)."""
    sched = make_scheduler(
        num_gpu_blocks=8, max_num_seqs=4, max_batched=64,
        preemption="swap", cooldown=1000,
    )
    g1, s1 = add_request(sched, prompt_len=12, arrival=1.0)
    g2, s2 = add_request(sched, prompt_len=12, arrival=2.0)
    run_step(sched)
    for _ in range(12):
        out = run_step(sched)
        if out.blocks_to_swap_out:
            break
    assert s2.status == SequenceStatus.SWAPPED
    for seq in g1.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
    sched.free_finished()
    out = run_step(sched)
    assert not out.blocks_to_swap_in          # cooling period holds it out
    assert s2.status == SequenceStatus.SWAPPED
    # cooldown elapsed (logical scheduler ticks, not wall-clock — the
    # tick clock keeps replicated multi-host schedulers deterministic)
    g2.swapped_at_tick = sched._tick - 2000
    out = run_step(sched)
    assert out.blocks_to_swap_in
    assert s2.status == SequenceStatus.RUNNING


def test_swapped_mid_prefill_resumes_chunked():
    """A group swapped out mid-prefill must resume chunked prefill on
    swap-in, not limp along one token per step."""
    sched = make_scheduler(
        block_size=4, num_gpu_blocks=10, max_num_seqs=4, max_batched=8,
        chunk=8, preemption="swap",
    )
    # long prompt: prefill takes several chunks of 8
    g1, s1 = add_request(sched, prompt_len=24, arrival=1.0)
    run_step(sched)          # chunk 1 (8 tokens, 2 blocks)
    # force a swap-out mid-prefill
    out_obj = type(sched.schedule())()
    sched._preempt(g1, out_obj)
    assert s1.status == SequenceStatus.SWAPPED
    assert s1.num_computed_tokens == 8
    g1.swapped_at_tick = sched._tick - 2000
    out = run_step(sched)
    assert out.blocks_to_swap_in
    # resumed with a full prefill chunk, not a single decode slot
    assert out.scheduled and sum(
        out.scheduled[0].token_chunks.values()
    ) == 8
    assert s1.num_computed_tokens == 16
