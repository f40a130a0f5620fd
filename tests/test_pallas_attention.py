"""Pallas ragged paged attention vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.ops.attention import (
    AttentionSpec,
    _ragged_paged_attention_jnp,
)
from candle_vllm_tpu.ops.pallas.paged_attention import (
    ragged_paged_attention_pallas,
)


def make_case(
    rng,
    q_lens,
    kv_lens,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=32,
    page_size=16,
    dtype=jnp.float32,
    sliding_window=None,
    logit_soft_cap=None,
):
    S = len(q_lens)
    T = int(sum(q_lens))
    maxp = max(-(-l // page_size) for l in kv_lens)
    num_pages = sum(-(-l // page_size) for l in kv_lens) + 3
    q = jnp.asarray(rng.standard_normal((T, num_q_heads, head_dim)), dtype)
    kv_pages = jnp.asarray(
        rng.standard_normal((num_pages, page_size, 2 * num_kv_heads, head_dim)),
        dtype,
    )
    # assign pages round-robin, never reusing a page
    page_tables = np.zeros((S, maxp), np.int32)
    nxt = 1
    for s, l in enumerate(kv_lens):
        n = -(-l // page_size)
        for i in range(n):
            page_tables[s, i] = nxt % num_pages
            nxt += 1
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    spec = AttentionSpec(
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        sm_scale=head_dim**-0.5,
        sliding_window=sliding_window,
        logit_soft_cap=logit_soft_cap,
    )
    return (
        q,
        kv_pages,
        jnp.asarray(kv_lens, jnp.int32),
        jnp.asarray(page_tables),
        jnp.asarray(cu),
        spec,
    )


def check(case, bq=16, atol=2e-2):
    q, kv_pages, kv_lens, page_tables, cu, spec = case
    ref = _ragged_paged_attention_jnp(
        q, kv_pages, kv_lens, page_tables, cu, spec=spec
    )
    got = ragged_paged_attention_pallas(
        q, kv_pages, kv_lens, page_tables, cu, spec=spec, bq=bq, interpret=True
    )
    T = int(cu[-1])
    np.testing.assert_allclose(
        np.asarray(got[:T], np.float32),
        np.asarray(ref[:T], np.float32),
        atol=atol,
        rtol=2e-2,
    )


def test_single_prefill():
    rng = np.random.default_rng(0)
    check(make_case(rng, q_lens=[33], kv_lens=[33]))


def test_decode_batch():
    rng = np.random.default_rng(1)
    check(make_case(rng, q_lens=[1, 1, 1, 1, 1], kv_lens=[17, 3, 64, 29, 1]))


def test_mixed_prefill_decode():
    rng = np.random.default_rng(2)
    check(
        make_case(
            rng, q_lens=[1, 1, 40, 7, 1], kv_lens=[19, 50, 40, 100, 5]
        )
    )


def test_chunked_prefill_continuation():
    # q is the second chunk of a longer prompt: kv_len > q_len
    rng = np.random.default_rng(3)
    check(make_case(rng, q_lens=[24], kv_lens=[56]))


def test_gqa_and_mha():
    rng = np.random.default_rng(4)
    check(make_case(rng, q_lens=[9, 1], kv_lens=[9, 33], num_q_heads=8, num_kv_heads=1))
    check(make_case(rng, q_lens=[9, 1], kv_lens=[9, 33], num_q_heads=4, num_kv_heads=4))


def test_sliding_window():
    rng = np.random.default_rng(5)
    check(
        make_case(rng, q_lens=[40, 1], kv_lens=[40, 70], sliding_window=24)
    )


def test_soft_cap():
    rng = np.random.default_rng(6)
    check(make_case(rng, q_lens=[20, 1], kv_lens=[20, 37], logit_soft_cap=30.0))


def test_bf16():
    rng = np.random.default_rng(7)
    check(
        make_case(rng, q_lens=[1, 12, 1], kv_lens=[25, 12, 40], dtype=jnp.bfloat16),
        atol=5e-2,
    )


def test_padding_seqs_and_blocks():
    # padded seq slots (q_len 0, kv_len 0) and T not a multiple of bq
    rng = np.random.default_rng(8)
    q, kv_pages, kv_lens, page_tables, cu, spec = make_case(
        rng, q_lens=[5, 1], kv_lens=[5, 21]
    )
    S_pad = 4
    kv_lens = jnp.concatenate([kv_lens, jnp.zeros(S_pad - 2, jnp.int32)])
    page_tables = jnp.concatenate(
        [page_tables, jnp.zeros((S_pad - 2, page_tables.shape[1]), jnp.int32)]
    )
    cu = jnp.concatenate([cu, jnp.full((S_pad - 2,), cu[-1], jnp.int32)])
    check((q, kv_pages, kv_lens, page_tables, cu, spec), bq=16)


def test_block_spanning_sequences():
    # bq smaller than seqs so one block spans several sequences
    rng = np.random.default_rng(9)
    check(make_case(rng, q_lens=[7, 9, 3, 1, 14], kv_lens=[7, 30, 11, 6, 14]), bq=8)


def test_attention_sinks():
    import dataclasses

    rng = np.random.default_rng(10)
    case = make_case(rng, q_lens=[1, 9], kv_lens=[21, 9])
    q, kv_pages, kv_lens, page_tables, cu, spec = case
    sinks = jnp.asarray(rng.standard_normal(spec.num_q_heads) * 2, jnp.float32)
    ref = _ragged_paged_attention_jnp(
        q, kv_pages, kv_lens, page_tables, cu, spec=spec, sinks=sinks
    )
    got = ragged_paged_attention_pallas(
        q, kv_pages, kv_lens, page_tables, cu, None, sinks,
        spec=spec, bq=16, interpret=True,
    )
    T = int(cu[-1])
    np.testing.assert_allclose(
        np.asarray(got[:T], np.float32), np.asarray(ref[:T], np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # sinks shrink attention mass: outputs differ from the sink-free case
    base = _ragged_paged_attention_jnp(
        q, kv_pages, kv_lens, page_tables, cu, spec=spec
    )
    assert not np.allclose(np.asarray(ref[:T]), np.asarray(base[:T]))


def test_odd_gqa_ratio_decode_vs_oracle():
    """G=7 (qwen2-0.5b class): the decode bq shrink must keep bq*G a
    multiple of 8 (f32 sublane tiling) — odd ratios hit a Mosaic vreg
    assert on real TPU otherwise (r5 server drive).  Interpret mode
    checks the block-layout math at the shapes that triggered it."""
    from candle_vllm_tpu.ops.attention import (
        AttentionSpec, ragged_paged_attention,
    )
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages, write_kv

    rng = np.random.default_rng(21)
    H, K, D, ps = 14, 2, 64, 16
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5)
    pages = allocate_kv_pages(1, 8, ps, K, D, dtype=jnp.float32)[0]
    Tctx = 12
    k = jnp.asarray(rng.standard_normal((Tctx, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Tctx, K, D)), jnp.float32)
    slots = jnp.arange(Tctx, dtype=jnp.int32) + ps
    pages = write_kv(pages, k, v, slots)
    # decode-shaped batch: T=8 rows, one real
    q = jnp.asarray(rng.standard_normal((8, H, D)), jnp.float32)
    kv_lens = jnp.asarray([Tctx] + [0] * 7, jnp.int32)
    pt = jnp.zeros((8, 4), jnp.int32).at[0, 0].set(1)
    cu = jnp.asarray([0, 1, 1, 1, 1, 1, 1, 1, 1], jnp.int32)
    want = ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec,
                                  impl="jnp", decode_only=True)
    got = ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec,
                                 impl="pallas", decode_only=True)
    np.testing.assert_allclose(np.asarray(got[:1]), np.asarray(want[:1]),
                               atol=2e-2, rtol=2e-2)


def test_kv_shared_pallas_vs_oracle():
    """MLA single-plane (k==v) pages: kernel vs oracle, bf16 and int8
    (reference stores the latent once — cache_engine.rs:172-184)."""
    from candle_vllm_tpu.ops.attention import (
        AttentionSpec, ragged_paged_attention,
    )
    from candle_vllm_tpu.ops.kv_cache import (
        allocate_kv_pages, allocate_kv_scales, write_kv,
    )

    rng = np.random.default_rng(11)
    H, D, ps = 8, 128, 16
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=1, head_dim=D,
                         sm_scale=D ** -0.5, kv_shared=True)
    T = 10
    pages = allocate_kv_pages(1, 8, ps, 1, D, dtype=jnp.float32,
                              kv_shared=True)[0]
    assert pages.shape[2] == 1
    k = jnp.asarray(rng.standard_normal((T, 1, D)), jnp.float32)
    slots = jnp.arange(T, dtype=jnp.int32) + ps  # page 1 onward
    pages = write_kv(pages, k, k, slots, kv_shared=True)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    kv_lens = jnp.asarray([T], jnp.int32)
    pt = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    cu = jnp.asarray([0, T], jnp.int32)
    want = ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec,
                                  impl="jnp")
    got = ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec,
                                 impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)

    # int8 shared cache: one scale plane per head
    pages8 = allocate_kv_pages(1, 8, ps, 1, D, dtype=jnp.int8,
                               kv_shared=True)[0]
    scales = allocate_kv_scales(1, 8, ps, 1, kv_shared=True)[0]
    assert scales.shape[1] == 1
    pages8, scales = write_kv(pages8, k, k, slots, scales, kv_shared=True)
    want8 = ragged_paged_attention(q, pages8, kv_lens, pt, cu, spec=spec,
                                   kv_scales=scales, impl="jnp")
    got8 = ragged_paged_attention(q, pages8, kv_lens, pt, cu, spec=spec,
                                  kv_scales=scales, impl="pallas")
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                               atol=2e-2, rtol=2e-2)
    # int8-vs-f32 sanity: quantization error bounded
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want),
                               atol=8e-2, rtol=8e-2)
