"""Block engine invariants (modeled on the reference's device-free tests,
/root/reference/src/scheduler/block_engine.rs:1476-1752)."""

import pytest

from candle_vllm_tpu.engine.block_engine import AllocStatus, BlockEngine, Device
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
from candle_vllm_tpu.sampling_params import SamplingParams


def make_group(seq_id, prompt, **kw):
    seq = Sequence(seq_id, prompt)
    return SequenceGroup(f"req-{seq_id}", [seq], SamplingParams(**kw)), seq


def test_allocate_and_free():
    be = BlockEngine(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                     enable_prefix_caching=False)
    group, seq = make_group(0, list(range(10)))  # 10 tokens -> 3 blocks
    assert be.can_allocate(group) == AllocStatus.OK
    cached = be.allocate(seq)
    assert cached == 0
    assert len(be.get_block_ids(seq)) == 3
    assert be.get_num_free_gpu_blocks() == 5
    be.free(seq)
    assert be.get_num_free_gpu_blocks() == 8


def test_allocation_status_boundaries():
    be = BlockEngine(block_size=4, num_gpu_blocks=4, num_cpu_blocks=0,
                     enable_prefix_caching=False)
    too_big, _ = make_group(0, list(range(100)))
    assert be.can_allocate(too_big) == AllocStatus.IMPOSSIBLE
    ok, seq = make_group(1, list(range(16)))
    assert be.can_allocate(ok) == AllocStatus.OK
    be.allocate(seq)
    later, _ = make_group(2, list(range(4)))
    assert be.can_allocate(later) == AllocStatus.LATER


def test_append_slot_grows_blocks():
    be = BlockEngine(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                     enable_prefix_caching=False)
    _, seq = make_group(0, list(range(4)))  # exactly one block
    be.allocate(seq)
    assert len(be.get_block_ids(seq)) == 1
    seq.num_computed_tokens = 4
    seq.append_token(100)  # len=5 -> next slot is index 4 -> needs block 2
    cow = be.append_slot(seq)
    assert cow is None
    assert len(be.get_block_ids(seq)) == 2
    seq.append_token(101)  # len=6 -> slot 5 fits in block 2
    assert be.append_slot(seq) is None
    assert len(be.get_block_ids(seq)) == 2


def test_copy_on_write_on_fork():
    be = BlockEngine(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                     enable_prefix_caching=False)
    _, parent = make_group(0, list(range(6)))  # 2 blocks, last partial
    be.allocate(parent)
    parent.num_computed_tokens = 6
    child = parent.fork(1)
    be.fork(parent, child)
    assert be.get_block_ids(parent) == be.get_block_ids(child)
    # parent appends -> shared partial last block must COW
    parent.append_token(100)
    cow = be.append_slot(parent)
    assert cow is not None
    src, dst = cow
    assert be.get_block_ids(parent)[-1] == dst
    assert be.get_block_ids(child)[-1] == src
    # child then appends: its last block now has refcount 1 -> no COW
    child.append_token(101)
    assert be.append_slot(child) is None


def test_prefix_cache_reuse_on_allocate():
    be = BlockEngine(block_size=4, num_gpu_blocks=16, num_cpu_blocks=0)
    prompt = list(range(12))  # 3 full blocks
    _, s1 = make_group(0, prompt)
    be.allocate(s1)
    ids1 = be.get_block_ids(s1)
    s1.num_computed_tokens = 12
    be.free(s1, cache_prefix=True)
    # same prompt again: full blocks hit, but capped below prompt end
    _, s2 = make_group(1, prompt)
    cached = be.allocate(s2)
    assert cached == 8  # (12-1)//4 = 2 usable blocks
    assert be.get_block_ids(s2)[:2] == ids1[:2]
    assert be.get_block_ids(s2)[2] != ids1[2]


def test_prefix_cache_partial_match():
    be = BlockEngine(block_size=4, num_gpu_blocks=16, num_cpu_blocks=0)
    _, s1 = make_group(0, list(range(8)) )
    be.allocate(s1)
    s1.num_computed_tokens = 8
    be.free(s1, cache_prefix=True)
    # diverges in the second block
    _, s2 = make_group(1, list(range(4)) + [99, 98, 97, 96] + [1, 2])
    cached = be.allocate(s2)
    assert cached == 4


def test_eviction_never_frees_active_blocks():
    be = BlockEngine(block_size=4, num_gpu_blocks=4, num_cpu_blocks=0)
    _, s1 = make_group(0, list(range(8)))
    be.allocate(s1)
    s1.num_computed_tokens = 8
    be.free(s1, cache_prefix=True)  # 2 cached evictable blocks
    assert be.get_num_free_gpu_blocks() == 4
    _, s2 = make_group(1, list(range(8)))
    cached = be.allocate(s2)  # hits 1 block (cap), allocates 1
    assert cached == 4
    active = set(be.get_block_ids(s2))
    # force evictions: allocate the remaining capacity
    _, s3 = make_group(2, list(range(70, 78)))
    be.allocate(s3)
    assert set(be.get_block_ids(s3)).isdisjoint(active)
    for blk in be.gpu_allocator.blocks:
        if blk.block_id in active:
            assert blk.ref_count > 0


def test_swap_out_and_in_roundtrip():
    be = BlockEngine(block_size=4, num_gpu_blocks=8, num_cpu_blocks=8,
                     enable_prefix_caching=False)
    group, seq = make_group(0, list(range(8)))
    be.allocate(seq)
    gpu_ids = be.get_block_ids(seq)
    assert be.can_swap_out(group)
    out_map = be.swap_out(group)
    assert set(out_map.keys()) == set(gpu_ids)
    assert all(b.device == Device.CPU for b in be.block_tables[seq.seq_id])
    assert be.get_num_free_gpu_blocks() == 8
    in_map = be.swap_in(group)
    assert set(in_map.keys()) == set(out_map.values())
    assert all(b.device == Device.GPU for b in be.block_tables[seq.seq_id])
    be.free(seq)
    assert be.get_num_free_gpu_blocks() == 8
    assert be.cpu_allocator.get_num_free() == 8


def test_chunk_extension():
    be = BlockEngine(block_size=4, num_gpu_blocks=4, num_cpu_blocks=0,
                     enable_prefix_caching=False)
    _, seq = make_group(0, list(range(16)))
    # simulate chunked allocation: first chunk of 8 tokens -> 2 blocks...
    # allocate() reserves for the full prompt here, so use a fresh engine
    be2 = BlockEngine(block_size=4, num_gpu_blocks=2, num_cpu_blocks=0,
                      enable_prefix_caching=False)
    _, s = make_group(1, list(range(8)))
    be2.allocate(s)
    assert not be2.allocate_extend_for_chunk(s, 12)  # out of blocks
    assert be2.allocate_extend_for_chunk(s, 8)       # already covered
