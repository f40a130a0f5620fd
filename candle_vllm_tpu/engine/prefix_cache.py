"""Hash-chained prefix cache over physical KV blocks.

Re-designs the reference's ``PrefixCache``
(``/root/reference/src/scheduler/prefix_cache.rs``): each cached block is
keyed by ``hash(parent_hash, block_tokens)`` forming a trie of chains;
lookups walk the chain from the root and stop at the first miss; eviction is
leaf-first LRU with parent promotion; multimodal content mixes an extra seed
into the hash at the image block (``mix_seed``, prefix_cache.rs:371-383).

Blocks whose ref_count drops to zero stay device-resident as *evictable*
cache entries; the allocator reclaims them lazily when its free list runs
dry, so cache capacity is "all otherwise-unused KV blocks".
"""

from __future__ import annotations

from collections import OrderedDict
from typing import TYPE_CHECKING, Dict, List, Optional, Sequence, Tuple

if TYPE_CHECKING:
    from candle_vllm_tpu.engine.block_engine import BlockAllocator, PhysicalTokenBlock


def hash_block(parent_hash: int, tokens: Tuple[int, ...], seed: int = 0) -> int:
    """Chain hash for one block of tokens — the SAME FNV-1a chain the native
    path (``host_ops.chain_hashes`` / csrc) computes, so every producer and
    consumer of block hashes agrees. ``seed`` isolates multimodal content
    (image bytes hashed into the block containing image tokens); it is mixed
    into the chain root exactly like ``mix_seed`` (prefix_cache.rs:371-383).
    """
    from candle_vllm_tpu.engine import host_ops

    root = parent_hash ^ seed if seed else parent_hash
    return host_ops.chain_hashes(list(tokens), len(tokens), seed=root)[0]


class PrefixCache:
    def __init__(self, allocator: "BlockAllocator"):
        self.allocator = allocator
        # hash -> block currently holding that content (any ref_count)
        self.cached: Dict[int, "PhysicalTokenBlock"] = {}
        # hash -> block with ref_count == 0, in LRU order (front = oldest)
        self.evictable: "OrderedDict[int, PhysicalTokenBlock]" = OrderedDict()
        # trie bookkeeping for leaf-first eviction
        self.parent_of: Dict[int, int] = {}
        self.children_count: Dict[int, int] = {}
        self.hits = 0
        self.queries = 0

    # -- stats ---------------------------------------------------------------
    def num_cached(self) -> int:
        return len(self.cached)

    def num_evictable(self) -> int:
        return len(self.evictable)

    # -- lookup ----------------------------------------------------------------
    def match(self, hashes: Sequence[int]) -> List["PhysicalTokenBlock"]:
        """Longest cached prefix of the hash chain. Caller increfs the
        returned blocks and then calls ``mark_used`` on each."""
        out: List["PhysicalTokenBlock"] = []
        self.queries += 1
        for h in hashes:
            blk = self.cached.get(h)
            if blk is None:
                break
            out.append(blk)
        if out:
            self.hits += 1
        return out

    def mark_used(self, block: "PhysicalTokenBlock") -> None:
        """Block got a new reference — no longer evictable."""
        if block.block_hash is not None:
            self.evictable.pop(block.block_hash, None)

    def mark_evictable(self, block: "PhysicalTokenBlock") -> None:
        """Called by the allocator when a cached block's refcount hits 0."""
        assert block.block_hash is not None
        self.evictable[block.block_hash] = block
        self.evictable.move_to_end(block.block_hash)

    # -- insert ---------------------------------------------------------------
    def insert(
        self, hashes: Sequence[int], blocks: Sequence["PhysicalTokenBlock"]
    ) -> None:
        """Register a chain of full blocks. First writer wins: if a hash is
        already cached by another block, the duplicate is left unregistered
        (it frees normally)."""
        parent: Optional[int] = None
        for h, blk in zip(hashes, blocks):
            existing = self.cached.get(h)
            if existing is None:
                blk.block_hash = h
                self.cached[h] = blk
                self.children_count.setdefault(h, 0)
                if parent is not None and parent in self.cached:
                    self.parent_of[h] = parent
                    self.children_count[parent] = self.children_count.get(parent, 0) + 1
            parent = h

    # -- eviction ---------------------------------------------------------------
    def _unlink(self, h: int) -> "PhysicalTokenBlock":
        blk = self.cached.pop(h)
        self.evictable.pop(h, None)
        self.children_count.pop(h, None)
        parent = self.parent_of.pop(h, None)
        if parent is not None and parent in self.children_count:
            self.children_count[parent] -= 1
        blk.block_hash = None
        return blk

    def evict_one(self) -> Optional["PhysicalTokenBlock"]:
        """Reclaim one evictable block, preferring LRU *leaves* (no cached
        children) so chains shrink from the tip (reference:
        evict_one_leaf_excluding, prefix_cache.rs:318)."""
        if not self.evictable:
            return None
        for h in self.evictable:
            if self.children_count.get(h, 0) == 0:
                return self._unlink(h)
        # all evictable blocks have cached children — fall back to plain LRU
        h = next(iter(self.evictable))
        return self._unlink(h)

    def evict_many(self, n: int) -> int:
        """Pressure eviction: free up to ``n`` blocks back to the allocator
        free list (reference: scheduler/mod.rs:37 evicts 10% under load)."""
        freed = 0
        while freed < n:
            blk = self.evict_one()
            if blk is None:
                break
            self.allocator.reclaim(blk)
            freed += 1
        return freed

    def clear(self) -> int:
        return self.evict_many(len(self.evictable) + 1)

    def match_tokens(
        self, token_ids: Sequence[int], block_size: int, seed: int = 0
    ) -> int:
        """How many prompt tokens a request would hit in cache — used by the
        server's KV admission control (reference: openai_server.rs:239-326)."""
        from candle_vllm_tpu.engine import host_ops

        # Must use the same FNV-1a chain the production insert/match path
        # uses (host_ops.chain_hashes via BlockEngine._prompt_block_hashes)
        # or a production-populated cache never matches.
        hashes = host_ops.chain_hashes(list(token_ids), block_size, seed=seed)
        matched = 0
        for h in hashes:
            if h in self.cached:
                matched += 1
            else:
                break
        return matched * block_size
