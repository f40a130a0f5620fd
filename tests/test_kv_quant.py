"""Quantized (int8) KV cache: write/dequant roundtrip, attention accuracy
through both implementations, engine E2E, TP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from candle_vllm_tpu.ops.attention import (
    AttentionSpec,
    _ragged_paged_attention_jnp,
    ragged_paged_attention,
)
from candle_vllm_tpu.ops.kv_cache import (
    allocate_kv_pages,
    allocate_kv_scales,
    write_kv,
)
from candle_vllm_tpu.ops.pallas.paged_attention import (
    ragged_paged_attention_pallas,
)


def test_write_quantized_roundtrip():
    ps, K, D = 8, 2, 32
    pages = jnp.zeros((4, ps, 2 * K, D), jnp.int8)
    scales = jnp.ones((4, 2 * K, ps), jnp.float32)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, K, D)) * 2.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, K, D)) * 0.5, jnp.float32)
    slots = jnp.asarray([8, 9, 10], jnp.int32)  # page 1, offs 0..2
    pages, scales = write_kv(pages, k, v, slots, scales)
    # dequantize token 1 head 0 K row
    deq = np.asarray(pages[1, 1, 0], np.float32) * float(scales[1, 0, 1])
    np.testing.assert_allclose(deq, np.asarray(k[1, 0]), atol=2e-2)
    deq_v = np.asarray(pages[1, 2, 3], np.float32) * float(scales[1, 3, 2])
    np.testing.assert_allclose(deq_v, np.asarray(v[2, 1]), atol=2e-2)


def make_quant_case(rng, q_lens, kv_lens, H=4, K=2, D=32, ps=8):
    """Build a quantized cache by writing float K/V through write_kv."""
    S = len(q_lens)
    T = sum(q_lens)
    total_pages = sum(-(-l // ps) for l in kv_lens) + 2
    maxp = max(-(-l // ps) for l in kv_lens)
    pages = jnp.zeros((total_pages, ps, 2 * K, D), jnp.int8)
    scales = jnp.ones((total_pages, 2 * K, ps), jnp.float32)
    fpages = jnp.zeros((total_pages, ps, 2 * K, D), jnp.float32)
    pt = np.zeros((S, maxp), np.int32)
    nxt = 1
    for s, l in enumerate(kv_lens):
        n = -(-l // ps)
        pt[s, :n] = range(nxt, nxt + n)
        nxt += n
    for s, l in enumerate(kv_lens):
        k = jnp.asarray(rng.standard_normal((l, K, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((l, K, D)), jnp.float32)
        pos = np.arange(l)
        slots = jnp.asarray(pt[s, pos // ps] * ps + pos % ps, jnp.int32)
        pages, scales = write_kv(pages, k, v, slots, scales)
        fpages = write_kv(fpages, k, v, slots)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5)
    return (q, pages, scales, fpages, jnp.asarray(kv_lens, jnp.int32),
            jnp.asarray(pt), jnp.asarray(cu), spec)


def test_quantized_attention_jnp_close_to_fp():
    rng = np.random.default_rng(1)
    q, pages, scales, fpages, kv_lens, pt, cu, spec = make_quant_case(
        rng, [1, 7, 1], [20, 7, 33]
    )
    fp = _ragged_paged_attention_jnp(q, fpages, kv_lens, pt, cu, spec=spec)
    qt = _ragged_paged_attention_jnp(
        q, pages, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    np.testing.assert_allclose(
        np.asarray(qt), np.asarray(fp), rtol=5e-2, atol=5e-2
    )


def test_quantized_attention_pallas_matches_jnp():
    rng = np.random.default_rng(2)
    q, pages, scales, fpages, kv_lens, pt, cu, spec = make_quant_case(
        rng, [1, 5, 1, 12], [9, 21, 16, 12]
    )
    ref = _ragged_paged_attention_jnp(
        q, pages, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    got = ragged_paged_attention_pallas(
        q, pages, kv_lens, pt, cu, scales, spec=spec, bq=8, interpret=True
    )
    T = int(cu[-1])
    np.testing.assert_allclose(
        np.asarray(got[:T]), np.asarray(ref[:T]), rtol=2e-2, atol=2e-2
    )


def test_engine_with_int8_kv_cache():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256,
                            prefill_chunk_size=64, max_model_len=128)
    rng = np.random.default_rng(3)
    ps = [rng.integers(0, 128, size=12).tolist() for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    ref = LLMEngine(
        cfg, CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0),
        sched, seed=0,
    ).generate(ps, sp)
    got = LLMEngine(
        cfg,
        CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0,
                    kv_cache_dtype="int8"),
        sched, seed=0,
    ).generate(ps, sp)
    for a, b in zip(ref, got):
        # int8 KV noise may flip late tokens; early tokens should agree
        assert a.outputs[0].token_ids[:2] == b.outputs[0].token_ids[:2]
        assert len(b.outputs[0].token_ids) == 6


# ---------------------------------------------------------------------------
# int4 (TurboQuant turbo4-class) cache: K lo-nibble / V hi-nibble packing
# (reference: cache_engine.rs:401-518, README.md:267-291)
# ---------------------------------------------------------------------------


def test_write_int4_roundtrip():
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages_int4

    ps, K, D = 8, 2, 32
    pages = allocate_kv_pages_int4(1, 4, ps, K, D)[0]
    scales = jnp.ones((4, 2 * K, ps), jnp.float32)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, K, D)) * 2.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, K, D)) * 0.5, jnp.float32)
    slots = jnp.asarray([8, 9, 10], jnp.int32)
    pages, scales = write_kv(pages, k, v, slots, scales, kv4=True)
    b = np.asarray(pages[1, 1, 0], np.float32)  # token 1, head 0
    vq = np.floor(b / 16.0)
    kq = b - 16.0 * vq - 8.0
    deq_k = kq * float(scales[1, 0, 1])
    deq_v = vq * float(scales[1, 1, 1])
    # 4-bit: coarse but bounded by one scale step
    np.testing.assert_allclose(deq_k, np.asarray(k[1, 0]),
                               atol=float(scales[1, 0, 1]) * 0.51)
    np.testing.assert_allclose(deq_v, np.asarray(v[1, 0]),
                               atol=float(scales[1, 1, 1]) * 0.51)


def make_int4_case(rng, q_lens, kv_lens, H=4, K=2, D=32, ps=8):
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages_int4

    S = len(q_lens)
    T = sum(q_lens)
    total_pages = sum(-(-l // ps) for l in kv_lens) + 2
    maxp = max(-(-l // ps) for l in kv_lens)
    pages = allocate_kv_pages_int4(1, total_pages, ps, K, D)[0]
    scales = jnp.ones((total_pages, 2 * K, ps), jnp.float32)
    fpages = jnp.zeros((total_pages, ps, 2 * K, D), jnp.float32)
    pt = np.zeros((S, maxp), np.int32)
    nxt = 1
    for s, l in enumerate(kv_lens):
        n = -(-l // ps)
        pt[s, :n] = range(nxt, nxt + n)
        nxt += n
    for s, l in enumerate(kv_lens):
        k = jnp.asarray(rng.standard_normal((l, K, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((l, K, D)), jnp.float32)
        pos = np.arange(l)
        slots = jnp.asarray(pt[s, pos // ps] * ps + pos % ps, jnp.int32)
        pages, scales = write_kv(pages, k, v, slots, scales, kv4=True)
        fpages = write_kv(fpages, k, v, slots)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5, kv4=True)
    fspec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                          sm_scale=D ** -0.5)
    return (q, pages, scales, fpages, jnp.asarray(kv_lens, jnp.int32),
            jnp.asarray(pt), jnp.asarray(cu), spec, fspec)


def test_int4_attention_jnp_close_to_fp():
    rng = np.random.default_rng(4)
    q, pages, scales, fpages, kv_lens, pt, cu, spec, fspec = make_int4_case(
        rng, [1, 7, 1], [20, 7, 33]
    )
    fp = _ragged_paged_attention_jnp(q, fpages, kv_lens, pt, cu, spec=fspec)
    qt = _ragged_paged_attention_jnp(
        q, pages, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    # 4-bit noise is larger than int8 but attention output stays close
    np.testing.assert_allclose(
        np.asarray(qt), np.asarray(fp), rtol=2e-1, atol=3e-1
    )
    # and correlates strongly with the fp result
    a, b = np.asarray(qt).ravel(), np.asarray(fp).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_int4_attention_pallas_matches_jnp():
    rng = np.random.default_rng(5)
    q, pages, scales, fpages, kv_lens, pt, cu, spec, fspec = make_int4_case(
        rng, [1, 5, 1, 12], [9, 21, 16, 12]
    )
    ref = _ragged_paged_attention_jnp(
        q, pages, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    got = ragged_paged_attention_pallas(
        q, pages, kv_lens, pt, cu, scales, spec=spec, bq=8, interpret=True
    )
    T = int(cu[-1])
    np.testing.assert_allclose(
        np.asarray(got[:T]), np.asarray(ref[:T]), rtol=2e-2, atol=2e-2
    )


def test_engine_with_int4_kv_cache():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256,
                            prefill_chunk_size=64, max_model_len=128)
    rng = np.random.default_rng(6)
    ps = [rng.integers(0, 128, size=12).tolist() for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    eng = LLMEngine(
        cfg,
        CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0,
                    kv_cache_dtype="int4"),
        sched, seed=0,
    )
    # int4 pages carry K (not 2K) byte planes
    assert eng.kv_pages[0][0].shape[2] == 2
    got = eng.generate(ps, sp)
    assert all(len(o.outputs[0].token_ids) == 6 for o in got)


def test_hadamard_rotation_reduces_int4_error():
    """TurboQuant Hadamard trick (reference README.md:267-291): rotating
    k/v/q by a shared orthogonal Hadamard leaves exact attention invariant
    but shrinks the int4 quantization error on outlier-heavy rows."""
    from candle_vllm_tpu.models.layers import (
        _hadamard,
        paged_attention_with_write,
    )
    from candle_vllm_tpu.models.types import StepInput
    from candle_vllm_tpu.ops.attention import AttentionSpec
    from candle_vllm_tpu.ops.kv_cache import (
        allocate_kv_pages,
        allocate_kv_pages_int4,
        allocate_kv_scales,
    )

    rng = np.random.default_rng(12)
    T, H, K, D, ps = 8, 4, 2, 128, 8
    # outlier-heavy rows: a few huge lanes (the case absmax grids hate)
    k = rng.standard_normal((T, K, D)).astype(np.float32)
    v = rng.standard_normal((T, K, D)).astype(np.float32)
    k[:, :, :3] *= 24.0
    v[:, :, :3] *= 24.0
    q = rng.standard_normal((T, H, D)).astype(np.float32)

    had = np.asarray(_hadamard(D))
    assert np.allclose(had @ had.T, np.eye(D), atol=1e-5)  # orthogonal
    assert np.allclose(had, had.T)                         # symmetric

    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5, kv4=True)
    step = StepInput(
        token_ids=None, positions=None,
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        page_tables=jnp.asarray([[0, 1, 0, 0]], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        logits_idx=jnp.asarray([T - 1], jnp.int32),
    )

    # exact f32 reference through the same call (bf16-free dtype)
    fpages = allocate_kv_pages(1, 4, ps, K, D, dtype=jnp.float32)[0]
    sp_f = dataclasses.replace(spec, kv4=False)
    ref, _ = paged_attention_with_write(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), fpages, step, sp_f
    )

    # int4 WITH rotation (production path: kv4 tuple triggers it)
    qpages = allocate_kv_pages_int4(1, 4, ps, K, D)[0]
    qscales = allocate_kv_scales(1, 4, ps, K)[0]
    rot, _ = paged_attention_with_write(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        (qpages, qscales), step, spec,
    )

    # int4 WITHOUT rotation: write/read the raw basis directly
    from candle_vllm_tpu.ops.attention import ragged_paged_attention
    from candle_vllm_tpu.ops.kv_cache import write_kv

    qp2 = allocate_kv_pages_int4(1, 4, ps, K, D)[0]
    qs2 = allocate_kv_scales(1, 4, ps, K)[0]
    qp2, qs2 = write_kv(qp2, jnp.asarray(k), jnp.asarray(v),
                        step.slot_mapping, qs2, kv4=True)
    plain = ragged_paged_attention(
        jnp.asarray(q), qp2, step.kv_lens, step.page_tables,
        step.cu_q_lens, spec=spec, kv_scales=qs2,
    )

    err_rot = float(np.abs(np.asarray(rot) - np.asarray(ref)).max())
    err_plain = float(np.abs(np.asarray(plain) - np.asarray(ref)).max())
    assert err_rot < err_plain * 0.7, (err_rot, err_plain)


def test_perplexity_harness_quant_kv_quality():
    """The perplexity harness runs and quantized KV stays within a tight
    quality band of the bf16 cache (tools/perplexity.py)."""
    import sys

    sys.path.insert(0, "tools")
    from perplexity import compute_perplexity

    from candle_vllm_tpu.models.registry import get_model

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=128,
        intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=64,
        vocab_size=512, max_model_len=512, dtype=jnp.float32,
    )
    model = get_model(cfg)
    params = model.init_params(seed=3)
    rng = np.random.default_rng(4)
    toks = rng.integers(0, 512, size=600)
    base = compute_perplexity(model, params, toks, window=128,
                              page_size=8)
    i8 = compute_perplexity(model, params, toks, window=128,
                            kv_cache_dtype="int8", page_size=8)
    i4 = compute_perplexity(model, params, toks, window=128,
                            kv_cache_dtype="int4", page_size=8)
    assert base["tokens"] == i8["tokens"] == i4["tokens"] > 500
    assert abs(i8["nll"] - base["nll"]) / base["nll"] < 0.02
    assert abs(i4["nll"] - base["nll"]) / base["nll"] < 0.10


# ---------------------------------------------------------------------------
# turbo3 (3-bit K + 4-bit V; reference README.md turbo3 ~4.7x,
# cache_engine.rs:401-518) — TPU-native bitplane layout
# ---------------------------------------------------------------------------


def test_turbo3_pack_unpack_roundtrip():
    from candle_vllm_tpu.ops.kv_cache import (
        pack_turbo3_rows,
        unpack_turbo3_rows,
    )

    K, D = 4, 128
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((5, K, D)) * 2.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((5, K, D)) * 0.5, jnp.float32)
    packed, scales = pack_turbo3_rows(k, v)
    assert packed.shape == (5, K * D // 4 + K * D // 8 + K * D // 2)
    kq, vq = unpack_turbo3_rows(packed, K, D)
    sk = np.asarray(scales, np.float32)[:, 0::2]
    sv = np.asarray(scales, np.float32)[:, 1::2]
    k_deq = np.asarray(kq).reshape(5, K, D) * sk[:, :, None]
    v_deq = np.asarray(vq).reshape(5, K, D) * sv[:, :, None]
    # the integer grids must roundtrip EXACTLY; float error is grid error
    k_ref = np.asarray(k)
    v_ref = np.asarray(v)
    assert np.abs(k_deq - k_ref).max() <= (np.abs(k_ref).max() / 3.5) * 1.01
    assert np.abs(v_deq - v_ref).max() <= (np.abs(v_ref).max() / 7.0) * 0.51 + 1e-6
    # exact code recovery: requantize and compare codes
    code = np.clip(np.round(k_ref / (np.abs(k_ref).max(-1, keepdims=True) / 3.5)), -4, 3)
    np.testing.assert_array_equal(
        np.asarray(kq).reshape(5, K, D),
        np.clip(np.round(k_ref / sk[:, :, None]), -4, 3),
    )


def test_turbo3_attention_jnp_close_to_fp():
    from candle_vllm_tpu.ops.kv_cache import (
        allocate_kv_pages_turbo3,
        allocate_kv_scales,
    )

    S, K, D, ps, P = 2, 8, 128, 8, 6
    H = 8
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5, kv3=True)
    rng = np.random.default_rng(1)
    T = 10
    q = jnp.asarray(rng.standard_normal((T, H, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, K, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, K, D)) * 0.5, jnp.float32)
    pages3 = allocate_kv_pages_turbo3(1, P, ps, K, D)[0]
    scales = allocate_kv_scales(1, P, ps, K)[0]
    # seq 0: 6 tokens in page 1; seq 1: 4 tokens in page 2
    slots = jnp.asarray([8, 9, 10, 11, 12, 13, 16, 17, 18, 19], jnp.int32)
    pages3, scales = write_kv(pages3, k, v, slots, scales, kv3=True)
    pt = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    kv_lens = jnp.asarray([6, 4], jnp.int32)
    cu = jnp.asarray([0, 6, 10], jnp.int32)
    out3 = _ragged_paged_attention_jnp(
        q, pages3, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    # fp reference
    pages_f = allocate_kv_pages(1, P, ps, K, D, dtype=jnp.float32)[0]
    pages_f = write_kv(pages_f, k, v, slots)
    spec_f = dataclasses.replace(spec, kv3=False)
    out_f = _ragged_paged_attention_jnp(
        q, pages_f, kv_lens, pt, cu, spec=spec_f
    )
    rel = np.abs(np.asarray(out3) - np.asarray(out_f)).max() / np.abs(
        np.asarray(out_f)
    ).max()
    assert rel < 0.25, rel  # 3-bit K grid loss, bounded


def test_turbo3_attention_pallas_matches_jnp():
    from candle_vllm_tpu.ops.kv_cache import (
        allocate_kv_pages_turbo3,
        allocate_kv_scales,
    )

    S, K, D, ps, P = 2, 8, 128, 8, 6
    H = 8
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5, kv3=True)
    rng = np.random.default_rng(2)
    T = 10
    q = jnp.asarray(rng.standard_normal((T, H, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, K, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, K, D)) * 0.5, jnp.float32)
    pages3 = allocate_kv_pages_turbo3(1, P, ps, K, D)[0]
    scales = allocate_kv_scales(1, P, ps, K)[0]
    slots = jnp.asarray([8, 9, 10, 11, 12, 13, 16, 17, 18, 19], jnp.int32)
    pages3, scales = write_kv(pages3, k, v, slots, scales, kv3=True)
    pt = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    kv_lens = jnp.asarray([6, 4], jnp.int32)
    cu = jnp.asarray([0, 6, 10], jnp.int32)
    ref = _ragged_paged_attention_jnp(
        q, pages3, kv_lens, pt, cu, spec=spec, kv_scales=scales
    )
    got = ragged_paged_attention_pallas(
        q, pages3, kv_lens, pt, cu, kv_scales=scales, spec=spec, bq=8,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.06, atol=0.02,
    )


def test_engine_with_turbo3_kv_cache_and_capacity():
    from candle_vllm_tpu.config import CacheConfig as CC
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=512,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=128,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    # capacity: bytes/token ratio vs bf16 must be > 4x (README turbo3)
    bf16 = CC.kv_bytes_per_token(cfg, "auto")
    t3 = CC.kv_bytes_per_token(cfg, "turbo3")
    assert bf16 / t3 > 4.0, (bf16, t3)
    i4 = CC.kv_bytes_per_token(cfg, "int4")
    assert t3 < i4

    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256,
                            prefill_chunk_size=64, max_model_len=128)
    rng = np.random.default_rng(7)
    ps = [rng.integers(0, 128, size=12).tolist() for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng = LLMEngine(
        cfg,
        CC(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0,
           kv_cache_dtype="turbo3"),
        sched, seed=0,
    )
    # turbo3 pages: plane-major [P, BYTES/128, ps, 128] int8
    assert eng.kv_pages[0][0].shape[1] == (8 * 128 * 7 // 8) // 128
    got = eng.generate(ps, sp)
    assert all(len(o.outputs[0].token_ids) == 6 for o in got)


def test_turbo3_falls_back_when_unaligned():
    from candle_vllm_tpu.config import CacheConfig as CC
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,   # K*D = 64 -> unaligned
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    eng = LLMEngine(
        cfg,
        CC(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0,
           kv_cache_dtype="turbo3"),
        SchedulerConfig(max_model_len=128),
        seed=0,
    )
    assert eng.cache_config.kv_cache_dtype == "int4"
