"""Decode-specialized paged-attention kernel (auto-pipelined page blocks)
vs the jnp oracle; engine e2e under CVT_DECODE_V3=1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.ops.attention import (
    AttentionSpec,
    ragged_paged_attention,
)
from candle_vllm_tpu.ops.kv_cache import (
    allocate_kv_pages,
    allocate_kv_pages_int4,
    allocate_kv_scales,
    write_kv,
)
from candle_vllm_tpu.ops.pallas.decode_attention import (
    decode_paged_attention_pallas,
    decode_supported,
)


def build_decode_case(rng, kv_lens, H=8, K=2, D=128, ps=16, dtype=jnp.float32,
                      quant=None, kv_shared=False):
    S = len(kv_lens)
    n_pages = sum(-(-l // ps) for l in kv_lens) + 1
    maxp = max(-(-max(kv_lens) // ps) + 1, 2)
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5, kv_shared=kv_shared,
                         kv4=quant == "int4")
    if quant == "int4":
        pages = allocate_kv_pages_int4(1, n_pages, ps, K, D)[0]
        scales = allocate_kv_scales(1, n_pages, ps, K)[0]
    elif quant == "int8":
        pages = allocate_kv_pages(1, n_pages, ps, K, D, dtype=jnp.int8,
                                  kv_shared=kv_shared)[0]
        scales = allocate_kv_scales(1, n_pages, ps, K, kv_shared=kv_shared)[0]
    else:
        pages = allocate_kv_pages(1, n_pages, ps, K, D, dtype=dtype,
                                  kv_shared=kv_shared)[0]
        scales = None
    pt = np.zeros((S, maxp), np.int32)
    nxt = 1
    for s, l in enumerate(kv_lens):
        n = -(-l // ps)
        pt[s, :n] = range(nxt, nxt + n)
        nxt += n
    for s, l in enumerate(kv_lens):
        if l == 0:
            continue
        k = jnp.asarray(rng.standard_normal((l, K, D)), jnp.float32)
        v = k if kv_shared else jnp.asarray(
            rng.standard_normal((l, K, D)), jnp.float32)
        pos = np.arange(l)
        slots = jnp.asarray(pt[s, pos // ps] * ps + pos % ps, jnp.int32)
        if scales is not None:
            pages, scales = write_kv(pages, k, v, slots, scales,
                                     kv4=quant == "int4",
                                     kv_shared=kv_shared)
        else:
            pages = write_kv(pages, k, v, slots, kv_shared=kv_shared)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    return q, pages, scales, jnp.asarray(kv_lens, jnp.int32), jnp.asarray(pt), spec


@pytest.mark.parametrize("case", [
    dict(kv_lens=[9]),
    dict(kv_lens=[33, 7, 16, 0]),         # mixed + padding row
    dict(kv_lens=[5, 40], quant="int8"),
    dict(kv_lens=[12, 3], quant="int4"),
    dict(kv_lens=[21], kv_shared=True, K=1),
    dict(kv_lens=[21, 6], kv_shared=True, K=1, quant="int8"),
])
def test_decode_kernel_vs_oracle(case):
    rng = np.random.default_rng(3)
    kv_lens = case.pop("kv_lens")
    q, pages, scales, kl, pt, spec = build_decode_case(rng, kv_lens, **case)
    S = len(kv_lens)
    cu = jnp.asarray(np.arange(S + 1).clip(max=sum(1 for l in kv_lens if l)),
                     jnp.int32)
    # oracle treats each row as one query of its sequence
    cu = jnp.asarray([min(i, sum(1 for l in kv_lens if l > 0))
                      for i in range(S + 1)], jnp.int32)
    # real rows must come first for the flat oracle; all our cases do
    want = ragged_paged_attention(
        q[: int(cu[-1])], pages, kl, pt, cu[: S + 1], spec=spec,
        kv_scales=scales, impl="jnp",
    )
    got = decode_paged_attention_pallas(
        q, pages, kl, pt, scales, spec=spec, interpret=True
    )
    R = int(cu[-1])
    np.testing.assert_allclose(
        np.asarray(got[:R], np.float32), np.asarray(want[:R], np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_decode_supported_matrix():
    base = dict(num_q_heads=8, num_kv_heads=2, head_dim=64, sm_scale=0.1)
    assert decode_supported(AttentionSpec(**base))
    assert not decode_supported(AttentionSpec(**base, sliding_window=128))
    assert not decode_supported(AttentionSpec(**base, logit_soft_cap=30.0))
    assert not decode_supported(AttentionSpec(**base, chunk_size=512))
    assert not decode_supported(AttentionSpec(**base, has_sinks=True))


def test_engine_e2e_with_decode_v3():
    """Generation under CVT_DECODE_V3=1 matches the unified kernel."""
    from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=64,
        intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, max_model_len=128, dtype=jnp.float32,
    )
    cache = CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256,
                            prefill_chunk_size=64, max_model_len=128)
    rng = np.random.default_rng(8)
    ps = [rng.integers(0, 128, size=n).tolist() for n in (11, 7)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    ref = LLMEngine(cfg, cache, sched, seed=0).generate(ps, sp)
    os.environ["CVT_DECODE_V3"] = "1"
    try:
        got = LLMEngine(
            cfg, CacheConfig(block_size=8, num_gpu_blocks=64,
                             num_cpu_blocks=0), sched, seed=0,
        ).generate(ps, sp)
    finally:
        del os.environ["CVT_DECODE_V3"]
    for a, b in zip(ref, got):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_decode_only_flag_set_correctly():
    """build_step_input marks decode_only iff every chunk is one token."""
    from candle_vllm_tpu.engine.block_engine import BlockEngine
    from candle_vllm_tpu.engine.input_builder import build_step_input
    from candle_vllm_tpu.engine.scheduler import ScheduledGroup
    from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
    from candle_vllm_tpu.sampling_params import SamplingParams

    be = BlockEngine(8, 32, 0, enable_prefix_caching=False)
    s1 = Sequence(0, list(range(10)))
    g1 = SequenceGroup("a", [s1], SamplingParams())
    be.allocate(s1)
    # prefill chunk of 10 -> NOT decode_only
    plan = build_step_input([ScheduledGroup(g1, {0: 10})], be, 8, 64)
    assert plan.step.decode_only is False
    # decode row (chunk of 1) -> decode_only
    s1.num_computed_tokens = 9
    plan = build_step_input([ScheduledGroup(g1, {0: 1})], be, 8, 64)
    assert plan.step.decode_only is True
    # mixed: decode row + prefill chunk -> NOT decode_only
    s2 = Sequence(1, list(range(6)))
    g2 = SequenceGroup("b", [s2], SamplingParams())
    be.allocate(s2)
    plan = build_step_input(
        [ScheduledGroup(g1, {0: 1}), ScheduledGroup(g2, {1: 6})], be, 8, 64
    )
    assert plan.step.decode_only is False
