"""Multi-token decode dispatch (SchedulerConfig.decode_steps > 1).

The engine fuses K decode micro-steps into one device dispatch, feeding
each sampled token into the next forward on-device (llm_engine.py
_device_step n_steps>1 — the analogue of replaying the reference's
captured CUDA decode graph K times, backend/graph.rs).  These tests pin
the semantics: token streams must be identical to K=1 for greedy and
seeded sampling, stop conditions must discard speculative tails, and
block accounting must survive page-boundary crossings mid-burst.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from candle_vllm_tpu.engine.llm_engine import LLMEngine
from candle_vllm_tpu.sampling_params import SamplingParams


def make_engine(decode_steps=8, **kw):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=128,
        max_model_len=kw.pop("max_model_len", 256),
        dtype=jnp.float32,
    )
    sched = SchedulerConfig(
        max_num_seqs=8,
        max_num_batched_tokens=256,
        prefill_chunk_size=64,
        max_model_len=cfg.max_model_len,
        enable_prefix_caching=kw.pop("enable_prefix_caching", False),
        decode_steps=decode_steps,
    )
    cache = CacheConfig(
        block_size=8,
        num_gpu_blocks=kw.pop("num_gpu_blocks", 96),
        num_cpu_blocks=0,
    )
    return LLMEngine(cfg, cache, sched, seed=0, **kw)


def gen(engine, prompts, sp):
    outs = engine.generate(prompts, sp)
    return [o.outputs[0].token_ids for o in outs]


def test_greedy_matches_single_step():
    rng = np.random.default_rng(0)
    ps = [rng.integers(0, 128, size=n).tolist() for n in (5, 17, 30)]
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=21)
    multi = gen(make_engine(decode_steps=8), ps, sp)
    single = gen(make_engine(decode_steps=1), ps, sp)
    assert multi == single
    assert all(len(t) == 21 for t in multi)


def test_seeded_sampling_matches_single_step():
    """Seeded rows draw noise from (seed, position, sub) — independent of
    the step/micro-step split, so K must not change the stream."""
    rng = np.random.default_rng(1)
    ps = [rng.integers(0, 128, size=9).tolist()]
    sp = SamplingParams(temperature=0.9, seed=42, ignore_eos=True,
                        max_tokens=19)
    multi = gen(make_engine(decode_steps=8), ps, sp)
    single = gen(make_engine(decode_steps=1), ps, sp)
    assert multi == single


def test_max_tokens_mid_burst():
    """max_tokens not divisible by K: speculative tail tokens must be
    discarded and the request must finish at exactly max_tokens."""
    rng = np.random.default_rng(2)
    ps = [rng.integers(0, 128, size=6).tolist()]
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=13)
    out = make_engine(decode_steps=8).generate(ps, sp)[0]
    assert len(out.outputs[0].token_ids) == 13
    assert out.outputs[0].finish_reason == "length"


def test_stop_token_mid_burst():
    """An EOS sampled mid-burst stops the request there; later micro-step
    tokens are dropped."""
    eng1 = make_engine(decode_steps=1)
    rng = np.random.default_rng(3)
    p = rng.integers(0, 128, size=8).tolist()
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=24)
    ref = gen(eng1, [p], sp)[0]
    # pick the greedy token at position 4 as the fake EOS
    eos = ref[4]
    eng = make_engine(decode_steps=8)
    eng.model_config.eos_token_ids = {eos}
    sp2 = SamplingParams(temperature=0.0, max_tokens=24)
    out = eng.generate([p], sp2)[0]
    ids = out.outputs[0].token_ids
    assert ids == ref[: ids.index(eos) + 1]
    assert ids[-1] == eos
    assert out.outputs[0].finish_reason == "stop"


def test_page_boundary_mid_burst():
    """K-token bursts crossing page boundaries need the reserved blocks in
    the device page table (regression: blocks reserved after the input was
    built wrote into page 0)."""
    rng = np.random.default_rng(4)
    # prompt of 7 with block_size 8: the very first burst crosses a block
    ps = [rng.integers(0, 128, size=7).tolist(),
          rng.integers(0, 128, size=15).tolist()]
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=40)
    multi = gen(make_engine(decode_steps=8), ps, sp)
    single = gen(make_engine(decode_steps=1), ps, sp)
    assert multi == single


def test_multistep_respects_model_len_cap():
    """Rows within K of max_model_len fall back to single-step (no block
    table overflow past the last page)."""
    eng = make_engine(decode_steps=8, max_model_len=32)
    rng = np.random.default_rng(5)
    ps = [rng.integers(0, 128, size=28).tolist()]
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=64)
    out = eng.generate(ps, sp)[0]
    # finishes by hitting max_model_len, never crashes on page overflow
    assert len(out.prompt_token_ids) + len(out.outputs[0].token_ids) <= 32


def test_penalties_fall_back_to_single_step():
    rng = np.random.default_rng(6)
    ps = [rng.integers(0, 128, size=10).tolist()]
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=12,
                        repetition_penalty=1.3)
    multi = gen(make_engine(decode_steps=8), ps, sp)
    single = gen(make_engine(decode_steps=1), ps, sp)
    assert multi == single
