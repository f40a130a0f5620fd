"""Native host-ops bindings (ctypes over csrc/libcvt_host_ops.so).

The native runtime layer: the hot host paths of input tensorization and
prefix-cache hashing run in C++ (csrc/host_ops.cpp), mirroring the
reference's native scheduler/runtime (its whole scheduler is Rust).  The
library is built on demand (``make -C csrc``); numpy fallbacks keep every
environment working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libcvt_host_ops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CVT_DISABLE_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO):
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_SO)
        lib.cvt_fill_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.cvt_chain_hashes.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.cvt_chain_hashes.restype = ctypes.c_int32
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def fill_slots(
    positions: np.ndarray,     # [n] int32 out (contiguous view)
    slots: np.ndarray,         # [n] int32 out
    block_ids: np.ndarray,     # int32
    start: int,
    page_size: int,
) -> None:
    n = positions.shape[0]
    lib = _load()
    if lib is not None and positions.flags.c_contiguous and slots.flags.c_contiguous:
        lib.cvt_fill_slots(
            positions.ctypes.data, slots.ctypes.data, block_ids.ctypes.data,
            start, page_size, n,
        )
        return
    pos = start + np.arange(n, dtype=np.int32)
    positions[:] = pos
    slots[:] = block_ids[pos // page_size] * page_size + pos % page_size


def chain_hashes(
    tokens: List[int] | np.ndarray, block_size: int, seed: int = 0
) -> List[int]:
    """Chained per-block content hashes (prefix-cache keys)."""
    toks = np.ascontiguousarray(tokens, np.int32)
    n_blocks = len(toks) // block_size
    if n_blocks == 0:
        return []
    lib = _load()
    if lib is not None:
        out = np.empty(n_blocks, np.uint64)
        written = lib.cvt_chain_hashes(
            toks.ctypes.data, len(toks), block_size,
            ctypes.c_uint64(seed & (2**64 - 1)), out.ctypes.data, n_blocks,
        )
        return [int(h) for h in out[:written]]
    # numpy fallback: same FNV-1a chain
    hashes = []
    parent = seed & (2**64 - 1)
    for s in range(0, n_blocks * block_size, block_size):
        h = _fnv(parent, toks[s : s + block_size])
        hashes.append(h)
        parent = h
    return hashes


def _fnv(parent: int, block: np.ndarray) -> int:
    h = 14695981039346656037
    prime = 1099511628211
    mask = 2**64 - 1

    def step(h, v):
        for b in range(8):
            h ^= (v >> (8 * b)) & 0xFF
            h = (h * prime) & mask
        return h

    h = step(h, parent)
    for t in block:
        h = step(h, int(np.uint32(t)))
    return h
