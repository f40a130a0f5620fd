"""Ops: KV cache scatter/copy, ragged paged attention vs dense oracle,
rope, rmsnorm, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.ops import kv_cache as kvc
from candle_vllm_tpu.ops.attention import AttentionSpec, ragged_paged_attention
from candle_vllm_tpu.ops.norms import rms_norm
from candle_vllm_tpu.ops.rope import apply_rope, compute_cos_sin, make_rope_spec
from candle_vllm_tpu.ops.sampling import SamplingTensors, sample
from candle_vllm_tpu.sampling_params import SamplingParams


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def dense_attention_oracle(q, k, v, q_pos, sm_scale, window=None, soft_cap=None):
    """Naive per-seq attention. q: [Tq, H, D]; k/v: [Tk, K, D]."""
    H = q.shape[1]
    K = k.shape[1]
    G = H // K
    k = np.repeat(k, G, axis=1)  # [Tk, H, D]
    v = np.repeat(v, G, axis=1)
    scores = np.einsum("qhd,khd->hqk", q.astype(np.float32), k.astype(np.float32))
    scores *= sm_scale
    if soft_cap is not None:
        scores = soft_cap * np.tanh(scores / soft_cap)
    kv_pos = np.arange(k.shape[0])
    mask = kv_pos[None, :] <= q_pos[:, None]
    if window is not None:
        mask &= kv_pos[None, :] > q_pos[:, None] - window
    scores = np.where(mask[None], scores, -1e30)
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v)


def build_paged_case(seq_specs, K=2, H=4, D=32, ps=4, num_pages=64, seed=0,
                     dtype=jnp.float32):
    """seq_specs: list of (q_len, kv_len). Returns inputs + per-seq dense
    oracle data."""
    rng = np.random.default_rng(seed)
    S = len(seq_specs)
    MAXP = max((kv + ps - 1) // ps for _, kv in seq_specs)
    kv_pages = np.zeros((num_pages, ps, 2 * K, D), np.float32)
    page_tables = np.zeros((S, MAXP), np.int32)
    kv_lens = np.array([kv for _, kv in seq_specs], np.int32)
    cu = np.zeros(S + 1, np.int32)
    next_page = 1  # page 0 left as garbage target
    qs, oracle_kv = [], []
    for i, (q_len, kv_len) in enumerate(seq_specs):
        cu[i + 1] = cu[i] + q_len
        n_pages = (kv_len + ps - 1) // ps
        pages = list(range(next_page, next_page + n_pages))
        next_page += n_pages
        page_tables[i, :n_pages] = pages
        k = rng.standard_normal((kv_len, K, D)).astype(np.float32)
        v = rng.standard_normal((kv_len, K, D)).astype(np.float32)
        for t in range(kv_len):
            kv_pages[pages[t // ps], t % ps, 0::2] = k[t]  # interleaved
            kv_pages[pages[t // ps], t % ps, 1::2] = v[t]
        q = rng.standard_normal((q_len, H, D)).astype(np.float32)
        qs.append(q)
        oracle_kv.append((k, v))
    q_all = np.concatenate(qs, axis=0) if qs else np.zeros((0, H, D), np.float32)
    return (
        jnp.asarray(q_all, dtype),
        jnp.asarray(kv_pages, dtype),
        jnp.asarray(kv_lens),
        jnp.asarray(page_tables),
        jnp.asarray(cu),
        qs,
        oracle_kv,
    )


# ---------------------------------------------------------------------------
# kv cache ops
# ---------------------------------------------------------------------------

def test_write_kv_scatter():
    ps, K, D = 4, 2, 8
    pages = jnp.zeros((8, ps, 2 * K, D), jnp.float32)
    k = jnp.ones((3, K, D)) * jnp.arange(1, 4)[:, None, None]
    v = -jnp.ones((3, K, D)) * jnp.arange(1, 4)[:, None, None]
    slots = jnp.asarray([5, 6, kvc.INVALID_SLOT], jnp.int32)  # page 1, offs 1,2
    out = kvc.write_kv(pages, k, v, slots)
    assert float(out[1, 1, 0, 0]) == 1.0   # K head 0 -> combined idx 0
    assert float(out[1, 2, 0, 0]) == 2.0
    assert float(out[1, 1, 1, 0]) == -1.0  # V head 0 -> combined idx 1 (interleaved)
    assert float(out[1, 1, 2, 0]) == 1.0   # K head 1 -> combined idx 2
    # invalid slot dropped, nothing else written: tokens 1 and 2 only
    assert float(jnp.abs(out).sum()) == pytest.approx((1 + 2) * K * D * 2, rel=1e-5)


def test_copy_blocks():
    pages = jnp.arange(4 * 2 * 2 * 2, dtype=jnp.float32).reshape(4, 2, 2, 2)
    out = kvc.copy_blocks(pages, jnp.asarray([0]), jnp.asarray([3]))
    assert jnp.allclose(out[3], pages[0])
    assert jnp.allclose(out[1], pages[1])


def test_host_swap_roundtrip():
    swap = kvc.HostSwapSpace(num_pages=4)
    pages = [jnp.arange(4 * 2 * 2 * 4, dtype=jnp.float32).reshape(4, 2, 2, 4) * (l + 1)
             for l in range(2)]
    swap.swap_out(pages, {1: 3, 2: 0})
    zeroed = [p.at[1].set(0).at[2].set(0) for p in pages]
    restored = swap.swap_in(zeroed, {3: 1, 0: 2})
    for l in range(2):
        assert jnp.allclose(restored[l], pages[l])


def test_host_swap_roundtrip_quantized_tuple():
    """Quantized caches swap as (pages, scales) tuples; the scale planes
    must ride along (reference: cache_engine.rs:401-518)."""
    swap = kvc.HostSwapSpace(num_pages=4)
    pages = jnp.arange(4 * 2 * 2 * 4, dtype=jnp.int8).reshape(4, 2, 2, 4)
    scales = jnp.arange(4 * 2 * 2, dtype=jnp.float32).reshape(4, 2, 2, 1)
    entry = [(pages, scales)]
    swap.swap_out(entry, {1: 2})
    zeroed = [(pages.at[1].set(0), scales.at[1].set(0))]
    restored = swap.swap_in(zeroed, {2: 1})
    assert jnp.array_equal(restored[0][0], pages)
    assert jnp.allclose(restored[0][1], scales)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", [
    [(1, 9)],                       # single decode
    [(1, 5), (1, 13), (1, 4)],      # decode batch
    [(6, 6)],                       # pure prefill
    [(4, 12)],                      # chunked prefill (8 cached + 4 new)
    [(1, 7), (5, 5), (1, 20), (3, 11)],  # mixed batch
])
def test_ragged_paged_attention_vs_oracle(case):
    spec = AttentionSpec(num_q_heads=4, num_kv_heads=2, head_dim=32,
                         sm_scale=32 ** -0.5)
    q, pages, kv_lens, pt, cu, qs, okv = build_paged_case(case)
    out = ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec, impl="jnp")
    out = np.asarray(out)
    for i, (q_len, kv_len) in enumerate(case):
        k, v = okv[i]
        q_pos = np.arange(kv_len - q_len, kv_len)
        expect = dense_attention_oracle(qs[i], k, v, q_pos, spec.sm_scale)
        got = out[int(cu[i]):int(cu[i + 1])]
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_ragged_attention_sliding_window():
    spec = AttentionSpec(num_q_heads=4, num_kv_heads=2, head_dim=32,
                         sm_scale=32 ** -0.5, sliding_window=6)
    case = [(3, 15), (1, 10)]
    q, pages, kv_lens, pt, cu, qs, okv = build_paged_case(case, seed=3)
    out = np.asarray(
        ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec, impl="jnp"))
    for i, (q_len, kv_len) in enumerate(case):
        k, v = okv[i]
        q_pos = np.arange(kv_len - q_len, kv_len)
        expect = dense_attention_oracle(qs[i], k, v, q_pos, spec.sm_scale, window=6)
        np.testing.assert_allclose(
            out[int(cu[i]):int(cu[i + 1])], expect, rtol=2e-4, atol=2e-4)


def test_ragged_attention_soft_cap():
    spec = AttentionSpec(num_q_heads=2, num_kv_heads=2, head_dim=32,
                         sm_scale=0.2, logit_soft_cap=30.0)
    case = [(2, 8)]
    q, pages, kv_lens, pt, cu, qs, okv = build_paged_case(case, H=2, seed=7)
    out = np.asarray(
        ragged_paged_attention(q, pages, kv_lens, pt, cu, spec=spec, impl="jnp"))
    k, v = okv[0]
    expect = dense_attention_oracle(qs[0], k, v, np.arange(6, 8), 0.2, soft_cap=30.0)
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


def test_ragged_attention_padding_rows_are_finite():
    spec = AttentionSpec(num_q_heads=4, num_kv_heads=2, head_dim=32,
                         sm_scale=32 ** -0.5)
    q, pages, kv_lens, pt, cu, *_ = build_paged_case([(2, 6)])
    # pad: extra q rows + a padded seq slot with kv_len 0
    q_pad = jnp.concatenate([q, jnp.ones((3, 4, 32))], axis=0)
    kv_lens = jnp.concatenate([kv_lens, jnp.zeros(1, jnp.int32)])
    pt = jnp.concatenate([pt, jnp.zeros_like(pt[:1])], axis=0)
    cu = jnp.concatenate([cu, cu[-1:]])
    out = ragged_paged_attention(q_pad, pages, kv_lens, pt, cu, spec=spec, impl="jnp")
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------

def test_rope_matches_hf_formula():
    cfg = ModelConfig(hidden_size=64, num_attention_heads=2, rope_theta=10000.0)
    spec = make_rope_spec(cfg)
    T, H, D = 5, 2, 32
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, H, D)).astype(np.float32)
    positions = np.array([0, 1, 2, 7, 100], np.int32)
    cos, sin = compute_cos_sin(jnp.asarray(positions), spec)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin, spec))
    # HF llama rotate_half reference
    inv = 10000.0 ** (-np.arange(0, D, 2) / D)
    ang = positions[:, None] * inv[None]
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    expect = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_rope_partial_rotary_keeps_tail():
    cfg = ModelConfig(hidden_size=64, num_attention_heads=2,
                      partial_rotary_factor=0.5)
    spec = make_rope_spec(cfg)
    assert spec.rotary_dim == 16
    x = jnp.ones((3, 2, 32))
    cos, sin = compute_cos_sin(jnp.asarray([5, 6, 7]), spec)
    out = apply_rope(x, cos, sin, spec)
    assert jnp.allclose(out[..., 16:], 1.0)
    assert not jnp.allclose(out[..., :16], 1.0)


def test_yarn_spec_scales_frequencies():
    from candle_vllm_tpu.config import RopeScaling
    cfg = ModelConfig(hidden_size=64, num_attention_heads=2, max_model_len=4096,
                      rope_scaling=RopeScaling(rope_type="yarn", factor=4.0,
                                               original_max_position_embeddings=4096))
    spec = make_rope_spec(cfg)
    base = make_rope_spec(ModelConfig(hidden_size=64, num_attention_heads=2))
    # low-frequency (late) dims get interpolated (divided by factor)
    assert spec.inv_freq[-1] == pytest.approx(base.inv_freq[-1] / 4.0, rel=1e-6)
    # high-frequency (early) dims stay extrapolated
    assert spec.inv_freq[0] == pytest.approx(base.inv_freq[0], rel=1e-6)
    assert spec.attention_scale > 1.0


# ---------------------------------------------------------------------------
# rmsnorm / sampling
# ---------------------------------------------------------------------------

def test_rms_norm():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)
    w = jnp.ones(16) * 2.0
    out = rms_norm(x, w, eps=1e-6)
    xn = np.asarray(x)
    expect = xn / np.sqrt((xn ** 2).mean(-1, keepdims=True) + 1e-6) * 2.0
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_sample_greedy_picks_argmax():
    logits = jnp.asarray([[0.1, 5.0, 0.2, 0.3], [9.0, 0.0, 0.0, 0.1]])
    t = SamplingTensors.build(
        [SamplingParams(temperature=0.0), SamplingParams(temperature=0.0)],
        [[], []], vocab_size=4)
    tokens, logprobs = sample(logits, t, jax.random.PRNGKey(0))
    assert tokens.tolist() == [1, 0]
    assert float(logprobs[0]) < 0


def test_sample_top_k_limits_support():
    logits = jnp.asarray([[10.0, 9.0, 1.0, 0.0]] * 64)
    t = SamplingTensors.build(
        [SamplingParams(temperature=1.0, top_k=2)] * 64, [[]] * 64, vocab_size=4)
    keys = jax.random.PRNGKey(1)
    tokens, _ = sample(logits, t, keys)
    assert set(np.asarray(tokens).tolist()) <= {0, 1}


def test_sample_top_p_keeps_head():
    # head token has prob ~1 under low temperature; top_p=0.5 keeps only it
    logits = jnp.asarray([[4.0, 2.0, 1.0, 0.0]] * 32)
    t = SamplingTensors.build(
        [SamplingParams(temperature=1.0, top_p=0.5)] * 32, [[]] * 32, vocab_size=4)
    tokens, _ = sample(logits, t, jax.random.PRNGKey(2))
    assert set(np.asarray(tokens).tolist()) == {0}


def test_penalties_suppress_repeats():
    logits = jnp.asarray([[5.0, 4.9, 0.0, 0.0]])
    # token 0 heavily repeated: frequency penalty should flip argmax to 1
    t = SamplingTensors.build(
        [SamplingParams(temperature=0.0, frequency_penalty=1.0)],
        [[0] * 10], vocab_size=4)
    tokens, _ = sample(logits, t, jax.random.PRNGKey(0))
    assert tokens.tolist() == [1]


def test_repetition_penalty_divides_positive_logits():
    logits = jnp.asarray([[2.0, 1.5, 0.0, 0.0]])
    t = SamplingTensors.build(
        [SamplingParams(temperature=0.0, repetition_penalty=2.0)],
        [[0]], vocab_size=4)
    tokens, _ = sample(logits, t, jax.random.PRNGKey(0))
    assert tokens.tolist() == [1]  # 2.0/2.0 = 1.0 < 1.5
