"""Paged-KV block management: allocators, block tables, copy-on-write.

Re-designs the reference's ``BlockEngine``
(``/root/reference/src/scheduler/block_engine.rs``): logical→physical block
mapping, GPU + CPU allocators with refcounting, COW on shared last blocks,
prefix-cache integration, and swap in/out mappings — as device-free pure
Python (the reference's own tests construct in-memory BlockEngines with tiny
block sizes; block_engine.rs:1476-1752).

Physical block ids index directly into the device KV page arrays
(``kv_pages[layer][block_id]``), so everything here stays on host and only
integer tables cross to the device each step.
"""

from __future__ import annotations

import enum
from typing import Dict, List, Optional, Sequence as Seq, Tuple

from candle_vllm_tpu.engine.prefix_cache import PrefixCache, hash_block
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup


class Device(enum.Enum):
    GPU = enum.auto()  # device HBM tier (TPU chip)
    CPU = enum.auto()  # host swap tier


class PhysicalTokenBlock:
    __slots__ = ("block_id", "device", "ref_count", "block_hash", "last_access")

    def __init__(self, block_id: int, device: Device):
        self.block_id = block_id
        self.device = device
        self.ref_count = 0
        # content hash when this block is registered in the prefix cache
        self.block_hash: Optional[int] = None
        self.last_access = 0

    def __repr__(self) -> str:
        return (
            f"Block(id={self.block_id}, dev={self.device.name}, "
            f"ref={self.ref_count}, hash={self.block_hash})"
        )


class BlockAllocator:
    """Free-list allocator over a fixed pool of physical blocks.

    When the free list is empty it may reclaim an evictable prefix-cached
    block via ``evictor`` (reference: Allocator<GPU/CPU>,
    block_engine.rs:106-181).
    """

    def __init__(self, device: Device, num_blocks: int):
        self.device = device
        self.num_blocks = num_blocks
        self.blocks = [PhysicalTokenBlock(i, device) for i in range(num_blocks)]
        self.free_list: List[int] = list(range(num_blocks - 1, -1, -1))
        self.evictor: Optional[PrefixCache] = None

    def get_num_free(self) -> int:
        n = len(self.free_list)
        if self.evictor is not None:
            n += self.evictor.num_evictable()
        return n

    def allocate(self) -> PhysicalTokenBlock:
        if self.free_list:
            block = self.blocks[self.free_list.pop()]
        else:
            block = None
            if self.evictor is not None:
                block = self.evictor.evict_one()
            if block is None:
                raise RuntimeError(f"out of {self.device.name} KV blocks")
        assert block.ref_count == 0, f"allocated live block {block}"
        block.ref_count = 1
        block.block_hash = None
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        assert block.ref_count > 0, f"double free of {block}"
        block.ref_count -= 1
        if block.ref_count == 0:
            if block.block_hash is not None and self.evictor is not None:
                # stays resident as an evictable prefix-cache entry
                self.evictor.mark_evictable(block)
            else:
                self.free_list.append(block.block_id)

    def reclaim(self, block: PhysicalTokenBlock) -> None:
        """Return an evicted cache block to the free list (called by cache)."""
        assert block.ref_count == 0
        block.block_hash = None
        self.free_list.append(block.block_id)


class AllocStatus(enum.Enum):
    OK = enum.auto()
    LATER = enum.auto()     # not now — wait for blocks to free up
    IMPOSSIBLE = enum.auto()  # never fits


BlockTable = List[PhysicalTokenBlock]


class BlockEngine:
    """Logical→physical block mapping for every live sequence."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        enable_prefix_caching: bool = True,
    ):
        self.block_size = block_size
        self.gpu_allocator = BlockAllocator(Device.GPU, num_gpu_blocks)
        self.cpu_allocator = BlockAllocator(Device.CPU, num_cpu_blocks)
        self.block_tables: Dict[int, BlockTable] = {}
        self.prefix_cache: Optional[PrefixCache] = None
        if enable_prefix_caching:
            self.prefix_cache = PrefixCache(self.gpu_allocator)
            self.gpu_allocator.evictor = self.prefix_cache
        # hybrid models: caps a prefix match to boundaries whose recurrent
        # state is snapshotted (engine installs GDNSnapshotStore.gate;
        # reference: scheduler/mamba.rs snapshot-gated prefix reuse)
        self.cache_gate = None

    # -- sizing ----------------------------------------------------------------
    def blocks_needed(self, num_tokens: int) -> int:
        return (num_tokens + self.block_size - 1) // self.block_size

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free()

    def kv_usage(self) -> float:
        total = self.gpu_allocator.num_blocks
        return 1.0 - self.gpu_allocator.get_num_free() / max(total, 1)

    # -- prompt allocation -------------------------------------------------------
    def _prompt_block_hashes(self, seq: Sequence) -> List[int]:
        """Chain hashes for each *full* prompt block, mixing the sequence's
        image-content seed so identical token ids with different images
        never share blocks (reference: prefix_cache.rs:371-383
        hash_block/mix_seed).  Runs in native code when csrc/ is built
        (engine/host_ops.py)."""
        from candle_vllm_tpu.engine import host_ops

        return host_ops.chain_hashes(
            seq.get_token_ids(), self.block_size, seed=seq.hash_seed
        )

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs()[0]
        required = self.blocks_needed(seq.get_len())
        free = self.gpu_allocator.get_num_free()
        if required > self.gpu_allocator.num_blocks:
            return AllocStatus.IMPOSSIBLE
        # conservative: ignore potential prefix hits for the admission check
        if required * seq_group.num_seqs() > free:
            return AllocStatus.LATER
        return AllocStatus.OK

    def allocate(self, seq: Sequence) -> int:
        """Build the block table for a prompt; returns prefix-cached tokens.

        Cached coverage is capped to a block boundary strictly below the
        prompt length so at least one token is always computed and writes
        never land in shared blocks (reference: allocate_with_prefix,
        block_engine.rs:1331-1465).
        """
        assert seq.seq_id not in self.block_tables
        num_tokens = seq.get_len()
        required = self.blocks_needed(num_tokens)
        table: BlockTable = []
        cached_tokens = 0
        if self.prefix_cache is not None:
            hashes = self._prompt_block_hashes(seq)
            max_usable = (num_tokens - 1) // self.block_size
            matched = self.prefix_cache.match(hashes[:max_usable])
            if self.cache_gate is not None and matched:
                matched = matched[: self.cache_gate(hashes, len(matched))]
            for blk in matched:
                blk.ref_count += 1
                self.prefix_cache.mark_used(blk)
                table.append(blk)
            cached_tokens = len(matched) * self.block_size
        for _ in range(required - len(table)):
            table.append(self.gpu_allocator.allocate())
        self.block_tables[seq.seq_id] = table
        seq.num_cached_tokens = cached_tokens
        return cached_tokens

    def allocate_extend_for_chunk(self, seq: Sequence, new_total_tokens: int) -> bool:
        """Ensure the table covers ``new_total_tokens`` (chunked prefill grows
        block reservations chunk-by-chunk; reference:
        can_allocate_for_prefill block_engine.rs:296-373)."""
        table = self.block_tables[seq.seq_id]
        need = self.blocks_needed(new_total_tokens) - len(table)
        if need <= 0:
            return True
        if need > self.gpu_allocator.get_num_free():
            return False
        for _ in range(need):
            table.append(self.gpu_allocator.allocate())
        return True

    # -- decode append / COW -------------------------------------------------------
    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        running = len(seq_group.get_unfinished())
        return running <= self.gpu_allocator.get_num_free()

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        """Reserve the KV slot for the sequence's next token.

        Returns a (src_block_id, dst_block_id) pair when copy-on-write was
        needed (shared last block; reference: append_token_slot_to_seq,
        block_engine.rs:1181-1212).
        """
        table = self.block_tables[seq.seq_id]
        slot_index = seq.get_len() - 1  # slot for the token being computed
        block_needed = self.blocks_needed(slot_index + 1)
        if block_needed > len(table):
            table.append(self.gpu_allocator.allocate())
            return None
        last = table[-1]
        if last.ref_count > 1:
            fresh = self.gpu_allocator.allocate()
            table[-1] = fresh
            self._release(last)
            return (last.block_id, fresh.block_id)
        return None

    # -- lifecycle ---------------------------------------------------------------
    def _release(self, block: PhysicalTokenBlock) -> None:
        if block.device == Device.GPU:
            self.gpu_allocator.free(block)
        else:
            self.cpu_allocator.free(block)

    def fork(self, parent: Sequence, child: Sequence) -> None:
        src = self.block_tables[parent.seq_id]
        for blk in src:
            blk.ref_count += 1
        self.block_tables[child.seq_id] = list(src)

    def free(self, seq: Sequence, cache_prefix: bool = False) -> None:
        table = self.block_tables.pop(seq.seq_id, None)
        if table is None:
            return
        if (
            cache_prefix
            and self.prefix_cache is not None
            and table
            and table[0].device == Device.GPU
        ):
            hashes = self._prompt_block_hashes(seq)
            # Only blocks fully covered by *computed* KV are cacheable: at
            # finish the last sampled token's KV was never written
            # (num_computed_tokens == len-1), so a length-aligned final block
            # would otherwise be inserted with an uninitialized slot.
            usable = min(len(hashes), seq.num_computed_tokens // self.block_size)
            self.prefix_cache.insert(hashes[:usable], table[:usable])
        for blk in table:
            self._release(blk)

    def has_table(self, seq: Sequence) -> bool:
        return seq.seq_id in self.block_tables

    def get_block_ids(self, seq: Sequence) -> List[int]:
        return [b.block_id for b in self.block_tables[seq.seq_id]]

    # -- swap ---------------------------------------------------------------------
    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = sum(
            len(self.block_tables.get(s.seq_id, []))
            for s in seq_group.get_unfinished()
        )
        return blocks <= self.cpu_allocator.get_num_free()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Move a group's blocks GPU→CPU; returns {gpu_block: cpu_block}."""
        mapping: Dict[int, int] = {}
        for seq in seq_group.get_unfinished():
            table = self.block_tables.get(seq.seq_id)
            if table is None:
                continue
            new_table: BlockTable = []
            for gpu_blk in table:
                if gpu_blk.block_id in mapping and gpu_blk.device == Device.GPU:
                    cpu_blk = self.cpu_allocator.blocks[mapping[gpu_blk.block_id]]
                    cpu_blk.ref_count += 1
                else:
                    cpu_blk = self.cpu_allocator.allocate()
                    mapping[gpu_blk.block_id] = cpu_blk.block_id
                new_table.append(cpu_blk)
                self._release(gpu_blk)
            self.block_tables[seq.seq_id] = new_table
        return mapping

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        blocks = sum(
            len(self.block_tables.get(s.seq_id, []))
            for s in seq_group.get_unfinished()
        )
        return blocks <= self.gpu_allocator.get_num_free()

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Move a group's blocks CPU→GPU; returns {cpu_block: gpu_block}."""
        mapping: Dict[int, int] = {}
        for seq in seq_group.get_unfinished():
            table = self.block_tables.get(seq.seq_id)
            if table is None:
                continue
            new_table: BlockTable = []
            for cpu_blk in table:
                if cpu_blk.block_id in mapping and cpu_blk.device == Device.CPU:
                    gpu_blk = self.gpu_allocator.blocks[mapping[cpu_blk.block_id]]
                    gpu_blk.ref_count += 1
                else:
                    gpu_blk = self.gpu_allocator.allocate()
                    mapping[cpu_blk.block_id] = gpu_blk.block_id
                new_table.append(gpu_blk)
                self._release(cpu_blk)
            self.block_tables[seq.seq_id] = new_table
        return mapping
