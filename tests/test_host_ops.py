"""Native C++ host ops vs numpy fallbacks (bit-exact parity)."""

import numpy as np
import pytest

from candle_vllm_tpu.engine import host_ops


def test_native_builds_and_loads():
    assert host_ops.native_available(), "csrc build failed"


def test_fill_slots_matches_fallback():
    rng = np.random.default_rng(0)
    block_ids = rng.integers(0, 100, size=16).astype(np.int32)
    for start, n, ps in [(0, 7, 8), (13, 40, 8), (120, 5, 16)]:
        pos_n = np.zeros(n, np.int32); slot_n = np.zeros(n, np.int32)
        host_ops.fill_slots(pos_n, slot_n, block_ids, start, ps)
        pos = start + np.arange(n)
        exp_slots = block_ids[pos // ps] * ps + pos % ps
        np.testing.assert_array_equal(pos_n, pos)
        np.testing.assert_array_equal(slot_n, exp_slots)


def test_chain_hashes_native_matches_python(monkeypatch):
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 100000, size=67).tolist()
    native = host_ops.chain_hashes(toks, 16, seed=42)
    assert len(native) == 4
    # force the numpy fallback and compare
    monkeypatch.setattr(host_ops, "_LIB", None)
    monkeypatch.setattr(host_ops, "_TRIED", True)
    fallback = host_ops.chain_hashes(toks, 16, seed=42)
    assert native == fallback
    # chain property: different seed -> completely different hashes
    other = host_ops.chain_hashes(toks, 16, seed=7)
    assert all(a != b for a, b in zip(native, other))
    # prefix property: extending tokens keeps earlier block hashes
    longer = host_ops.chain_hashes(toks + [1, 2, 3], 16, seed=42)
    assert longer[:4] == native
