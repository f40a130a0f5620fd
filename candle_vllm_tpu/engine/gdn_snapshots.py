"""Host-side recurrent-state snapshot store for hybrid (GDN/mamba) models.

TPU re-design of the reference's mamba scheduler extension
(``/root/reference/src/scheduler/mamba.rs:15-291`` snapshot pool +
capture/restore at prefix-block boundaries): paged-KV prefix caching only
helps attention layers — a prefix hit on a hybrid model must ALSO restore
the linear-attention recurrent state at the matched boundary, or the hit
is silently wrong.  Device-side capture happens inside the GDN scan
(``ops/gdn.py snap_pos``); this module is the byte-capped host LRU those
snapshots land in, keyed by the prefix-cache chain hash of the covered
blocks, plus the admission gate that caps prefix matches to boundaries
with a snapshot.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

DEFAULT_CAPACITY_BYTES = 1 << 30  # 1 GiB of host snapshots


class GDNSnapshotStore:
    """hash -> per-GDN-layer {"rec": np, "conv": np} state, LRU-evicted."""

    def __init__(self, capacity_bytes: int = DEFAULT_CAPACITY_BYTES):
        self.capacity = capacity_bytes
        self._store: "OrderedDict[int, List[Dict[str, np.ndarray]]]" = (
            OrderedDict()
        )
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _size(layers: List[Dict[str, np.ndarray]]) -> int:
        return sum(a.nbytes for layer in layers for a in layer.values())

    def put(self, key: int, layers: List[Dict[str, np.ndarray]]) -> None:
        if key in self._store:
            self._store.move_to_end(key)
            return
        size = self._size(layers)
        while self._bytes + size > self.capacity and self._store:
            _, old = self._store.popitem(last=False)
            self._bytes -= self._size(old)
        if size <= self.capacity:
            self._store[key] = layers
            self._bytes += size

    def get(self, key: int) -> Optional[List[Dict[str, np.ndarray]]]:
        layers = self._store.get(key)
        if layers is not None:
            self._store.move_to_end(key)
            self.hits += 1
        else:
            self.misses += 1
        return layers

    def has(self, key: int) -> bool:
        return key in self._store

    def gate(self, hashes: List[int], matched: int) -> int:
        """Longest usable prefix: the largest k <= matched whose boundary
        hash has a snapshot (0 is always allowed — fresh state)."""
        for k in range(matched, 0, -1):
            if self.has(hashes[k - 1]):
                return k
        return 0

    @property
    def nbytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._store)
