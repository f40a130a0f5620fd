"""Gated DeltaNet: recurrence vs naive oracle, chunked/decode state
carry-over, hybrid Qwen3-Next model E2E."""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from candle_vllm_tpu.ops import gdn


def run_gdn(mixed, z, a, b, conv_w, a_log, dt_bias, norm_w, rec, conv,
            slots, cu, kv_lens, hk, hv, dk, dv):
    return gdn.gdn_mixed(
        jnp.asarray(mixed), jnp.asarray(z), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(conv_w), None, jnp.asarray(a_log), jnp.asarray(dt_bias),
        jnp.asarray(norm_w),
        jnp.asarray(rec), jnp.asarray(conv),
        jnp.asarray(slots, jnp.int32), jnp.asarray(cu, jnp.int32),
        jnp.asarray(kv_lens, jnp.int32),
        num_k_heads=hk, num_v_heads=hv, head_k_dim=dk, head_v_dim=dv,
        scale=dk ** -0.5,
    )[:3]


def naive_gdn(mixed, z, a, b, conv_w, a_log, dt_bias, norm_w,
              hk, hv, dk, dv):
    """Sequential per-token oracle for one sequence."""
    T, conv_dim = mixed.shape
    W = conv_w.shape[1]
    key_dim = hk * dk
    G = hv // hk
    conv_state = np.zeros((conv_dim, W - 1), np.float32)
    S = np.zeros((hv, dk, dv), np.float32)
    outs = np.zeros((T, hv, dv), np.float32)
    scale = dk ** -0.5
    for t in range(T):
        x = mixed[t]
        acc = x * conv_w[:, -1]
        for w in range(W - 1):
            acc = acc + conv_state[:, w] * conv_w[:, w]
        y = acc / (1 + np.exp(-acc)) * 1.0  # silu = x*sigmoid(x)
        y = acc * (1 / (1 + np.exp(-acc)))
        conv_state = np.concatenate([conv_state[:, 1:], x[:, None]], 1)
        q = y[:key_dim].reshape(hk, dk)
        k = y[key_dim:2 * key_dim].reshape(hk, dk)
        v = y[2 * key_dim:].reshape(hv, dv)
        q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / np.maximum(np.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        q = np.repeat(q, G, 0)
        k = np.repeat(k, G, 0)
        g = np.exp(-np.exp(a_log) * np.log1p(np.exp(a[t] + dt_bias)))
        beta = 1 / (1 + np.exp(-b[t]))
        for h in range(hv):
            Sh = S[h] * g[h]
            v_pred = k[h] @ Sh
            delta = (v[t * 0 + 0 * h + h] - v_pred) * beta[h] if False else (
                v[h] - v_pred
            ) * beta[h]
            Sh = Sh + np.outer(k[h], delta)
            outs[t, h] = (q[h] * scale) @ Sh
            S[h] = Sh
    var = (outs ** 2).mean(-1, keepdims=True)
    outs = outs / np.sqrt(var + 1e-6) * norm_w
    outs = outs * (z / (1 + np.exp(-z)))
    return outs.reshape(T, hv * dv)


def make_inputs(rng, T, hk, hv, dk, dv, W=4):
    conv_dim = 2 * hk * dk + hv * dv
    mixed = rng.standard_normal((T, conv_dim)).astype(np.float32) * 0.5
    z = rng.standard_normal((T, hv, dv)).astype(np.float32) * 0.5
    a = rng.standard_normal((T, hv)).astype(np.float32)
    b = rng.standard_normal((T, hv)).astype(np.float32)
    conv_w = rng.standard_normal((conv_dim, W)).astype(np.float32) * 0.3
    a_log = rng.standard_normal(hv).astype(np.float32) * 0.3
    dt_bias = rng.standard_normal(hv).astype(np.float32) * 0.3
    norm_w = np.ones(dv, np.float32)
    return mixed, z, a, b, conv_w, a_log, dt_bias, norm_w


def test_gdn_matches_naive_oracle():
    rng = np.random.default_rng(0)
    hk, hv, dk, dv, T = 2, 4, 8, 16, 11
    mixed, z, a, b, conv_w, a_log, dt_bias, norm_w = make_inputs(
        rng, T, hk, hv, dk, dv
    )
    rec = np.zeros((4, hv, dk, dv), np.float32)
    conv = np.zeros((4, mixed.shape[1], 3), np.float32)
    out, _, _ = run_gdn(
        mixed, z, a, b, conv_w, a_log, dt_bias, norm_w, rec, conv,
        slots=[2], cu=[0, T], kv_lens=[T], hk=hk, hv=hv, dk=dk, dv=dv,
    )
    ref = naive_gdn(mixed, z, a, b, conv_w, a_log, dt_bias, norm_w,
                    hk, hv, dk, dv)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_gdn_chunked_state_carry():
    rng = np.random.default_rng(1)
    hk, hv, dk, dv, T = 2, 4, 8, 16, 14
    mixed, z, a, b, conv_w, a_log, dt_bias, norm_w = make_inputs(
        rng, T, hk, hv, dk, dv
    )
    rec = np.zeros((4, hv, dk, dv), np.float32)
    conv = np.zeros((4, mixed.shape[1], 3), np.float32)
    full, _, _ = run_gdn(
        mixed, z, a, b, conv_w, a_log, dt_bias, norm_w, rec, conv,
        slots=[1], cu=[0, T], kv_lens=[T], hk=hk, hv=hv, dk=dk, dv=dv,
    )
    # two chunks through the state pool
    c = 9
    o1, rec1, conv1 = run_gdn(
        mixed[:c], z[:c], a[:c], b[:c], conv_w, a_log, dt_bias, norm_w,
        rec, conv, slots=[1], cu=[0, c], kv_lens=[c],
        hk=hk, hv=hv, dk=dk, dv=dv,
    )
    o2, _, _ = run_gdn(
        mixed[c:], z[c:], a[c:], b[c:], conv_w, a_log, dt_bias, norm_w,
        np.asarray(rec1), np.asarray(conv1), slots=[1], cu=[0, T - c],
        kv_lens=[T], hk=hk, hv=hv, dk=dk, dv=dv,
    )
    np.testing.assert_allclose(
        np.asarray(o2), np.asarray(full[c:]), rtol=2e-3, atol=2e-3
    )


def test_gdn_mixed_batch_matches_separate():
    """Two sequences in one ragged batch == each alone."""
    rng = np.random.default_rng(2)
    hk, hv, dk, dv = 2, 2, 8, 8
    Ta, Tb = 7, 5
    ia = make_inputs(rng, Ta, hk, hv, dk, dv)
    ib = make_inputs(rng, Tb, hk, hv, dk, dv)
    conv_w, a_log, dt_bias, norm_w = ia[4], ia[5], ia[6], ia[7]
    rec = np.zeros((4, hv, dk, dv), np.float32)
    conv = np.zeros((4, ia[0].shape[1], 3), np.float32)
    # batch: concat ragged
    mixed = np.concatenate([ia[0], ib[0]])
    z = np.concatenate([ia[1], ib[1]])
    a = np.concatenate([ia[2], ib[2]])
    b = np.concatenate([ia[3], ib[3]])
    out, _, _ = run_gdn(
        mixed, z, a, b, conv_w, a_log, dt_bias, norm_w, rec, conv,
        slots=[0, 3], cu=[0, Ta, Ta + Tb], kv_lens=[Ta, Tb],
        hk=hk, hv=hv, dk=dk, dv=dv,
    )
    oa, _, _ = run_gdn(
        *ia[:4], conv_w, a_log, dt_bias, norm_w, rec, conv,
        slots=[0], cu=[0, Ta], kv_lens=[Ta], hk=hk, hv=hv, dk=dk, dv=dv,
    )
    ob, _, _ = run_gdn(
        *ib[:4], conv_w, a_log, dt_bias, norm_w, rec, conv,
        slots=[3], cu=[0, Tb], kv_lens=[Tb], hk=hk, hv=hv, dk=dk, dv=dv,
    )
    np.testing.assert_allclose(np.asarray(out[:Ta]), np.asarray(oa),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[Ta:]), np.asarray(ob),
                               rtol=2e-3, atol=2e-3)


def hybrid_config():
    return ModelConfig(
        architecture="Qwen3NextForCausalLM",
        model_type="qwen3_next",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        use_qk_norm=True,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        extra={
            "linear_num_value_heads": 4,
            "linear_num_key_heads": 2,
            "linear_key_head_dim": 8,
            "linear_value_head_dim": 16,
            "linear_conv_kernel_dim": 4,
        },
    )


def test_qwen_next_engine_generation():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = hybrid_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                            prefill_chunk_size=64, max_model_len=128,
                            enable_prefix_caching=False)
    eng = LLMEngine(cfg, cache, sched, seed=0)
    assert isinstance(eng.kv_pages[0], dict)        # gdn state
    assert not isinstance(eng.kv_pages[1], dict)    # paged attention
    rng = np.random.default_rng(3)
    ps = [rng.integers(0, 128, size=n).tolist() for n in (11, 7)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    out = eng.generate(ps, sp)
    assert all(len(o.outputs[0].token_ids) == 5 for o in out)
    # chunked prefill must give the same tokens (state across chunks)
    eng2 = LLMEngine(
        cfg, cache,
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=4, max_model_len=128,
                        enable_prefix_caching=False),
        seed=0,
    )
    out2 = eng2.generate(ps, sp)
    for a, b in zip(out, out2):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_qwen_next_checkpoint_fixup_layout():
    """HF Qwen3-Next groups in_proj_qkvz per key head and ships conv1d as
    [dim, 1, W]; checkpoint_fixup must restore the flat [q|k|v|z] layout
    (ADVICE r1 #3; reference fix_qwen3next_projection_order)."""
    from candle_vllm_tpu.models.qwen_next import Qwen3NextForCausalLM

    cfg = hybrid_config()
    m = Qwen3NextForCausalLM(cfg)
    hk, hv, dk, dv = m.hk, m.hv, m.dk, m.dv
    G = hv // hk
    # build the flat-canonical columns, then scramble into the HF per-head
    # grouping and check fixup restores them
    kd, vd = hk * dk, hv * dv
    flat = np.arange(2 * kd + 2 * vd)
    q, k = flat[:kd].reshape(hk, dk), flat[kd:2 * kd].reshape(hk, dk)
    v = flat[2 * kd:2 * kd + vd].reshape(hk, G * dv)
    z = flat[2 * kd + vd:].reshape(hk, G * dv)
    hf_cols = np.concatenate(
        [np.concatenate([q[h], k[h], v[h], z[h]]) for h in range(hk)]
    )
    w_hf = np.tile(hf_cols[None, :], (cfg.hidden_size, 1)).astype(np.float32)  # input-major
    fixed = m.checkpoint_fixup("model.layers.0.linear_attn.in_proj_qkvz.weight", w_hf)
    np.testing.assert_array_equal(fixed[0], flat)

    b = flat[:hv].reshape(hk, G)
    a = flat[hv:2 * hv].reshape(hk, G)
    ba_cols = np.concatenate(
        [np.concatenate([b[h], a[h]]) for h in range(hk)]
    )
    w_ba = np.tile(ba_cols[None, :], (cfg.hidden_size, 1))
    fixed = m.checkpoint_fixup("model.layers.0.linear_attn.in_proj_ba.weight", w_ba)
    np.testing.assert_array_equal(fixed[0], flat[:2 * hv])

    conv = np.zeros((m.conv_dim, 1, m.conv_w))
    fixed = m.checkpoint_fixup("model.layers.0.linear_attn.conv1d.weight", conv)
    assert fixed.shape == (m.conv_dim, m.conv_w)
    # non-GDN tensors untouched
    w = np.ones((4, 4))
    assert m.checkpoint_fixup("model.layers.1.self_attn.q_proj.weight", w) is w


def test_qwen3_5_split_proj_engine_generation():
    """Qwen3.5: from_hf wires (1+w) norms + gated attention + hybrid extra
    keys; the GDN block reads the SPLIT in_proj_qkv/z/b/a checkpoint layout
    (reference: qwen3_5.rs, deltanet.rs GdnProjection::SplitQkvZaLegacy)."""
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.models.qwen_next import Qwen3_5ForCausalLM
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig.from_hf({
        "architectures": ["Qwen3_5ForCausalLM"],
        "model_type": "qwen3_5",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "vocab_size": 128,
        "max_position_embeddings": 128,
        "full_attention_interval": 2,
        "linear_num_value_heads": 4,
        "linear_num_key_heads": 2,
        "linear_key_head_dim": 8,
        "linear_value_head_dim": 16,
        "linear_conv_kernel_dim": 4,
    }, dtype=jnp.float32)
    assert cfg.norm_unit_offset and cfg.attn_output_gate and cfg.use_qk_norm
    m = Qwen3_5ForCausalLM(cfg)
    assert m.gdn_layers == [0, 2]
    shapes = m.param_shapes()
    assert "model.layers.0.linear_attn.in_proj_qkv.weight" in shapes
    assert "model.layers.0.linear_attn.in_proj_qkvz.weight" not in shapes
    # gated attention: q_proj is double width on full-attention layers
    assert shapes["model.layers.1.self_attn.q_proj.weight"] == (64, 2 * 4 * 16)

    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_model_len=128, max_num_seqs=4)
    eng = LLMEngine(cfg, cache, sched)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = eng.generate([[1, 2, 3, 4, 5]], sp)
    assert len(out[0].outputs[0].token_ids) == 6
    # deterministic across a fresh engine
    eng2 = LLMEngine(cfg, cache, sched)
    out2 = eng2.generate([[1, 2, 3, 4, 5]], sp)
    assert out[0].outputs[0].token_ids == out2[0].outputs[0].token_ids


# ---------------------------------------------------------------------------
# prefix snapshots (reference: scheduler/mamba.rs:15-291)
# ---------------------------------------------------------------------------


def snap_engine(chunk=64, **kw):
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    cfg = hybrid_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                            prefill_chunk_size=chunk, max_model_len=128,
                            enable_prefix_caching=kw.pop("prefix", True))
    return LLMEngine(cfg, cache, sched, seed=0)


def gen(eng, prompt, rid="r", max_tokens=5):
    from candle_vllm_tpu.sampling_params import SamplingParams

    eng.add_request(rid, prompt_token_ids=prompt,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=max_tokens))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    return outs[rid]


def test_gdn_snapshot_capture_and_gated_hit():
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=21).tolist()  # 2 full blocks of 8
    eng = snap_engine()
    assert eng._snap_store is not None
    out1 = gen(eng, prompt, rid="a")
    # the boundary snapshot (at (21-1)//8*8 = 16 tokens) was captured
    assert len(eng._snap_store) == 1
    # identical prompt: gated prefix hit restores state
    out2 = gen(eng, prompt, rid="b")
    seq_b_cached = eng._snap_store.hits
    assert seq_b_cached >= 1
    assert out1.outputs[0].token_ids == out2.outputs[0].token_ids
    # tokens must equal a no-cache engine's (state restore is exact)
    ref = gen(snap_engine(prefix=False), prompt, rid="c")
    assert ref.outputs[0].token_ids == out1.outputs[0].token_ids


def test_gdn_snapshot_gate_blocks_unsnapshotted_prefix():
    """A prefix match beyond any snapshot boundary must be capped —
    otherwise the hit would skip recurrent-state computation."""
    rng = np.random.default_rng(8)
    prompt = rng.integers(0, 128, size=21).tolist()
    eng = snap_engine()
    gen(eng, prompt, rid="a")
    store = eng._snap_store
    # simulate snapshot loss (evicted): matches must fall back to 0
    store._store.clear()
    store._bytes = 0
    from candle_vllm_tpu.engine.sequence import Sequence

    seq = Sequence(999, prompt)
    cached = eng.block_engine.allocate(seq)
    assert cached == 0  # gate refused the block match
    eng.block_engine.free(seq)


def test_gdn_snapshot_restored_equals_chunked():
    """Cached-prefix generation must match small-chunk prefill exactly."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 128, size=30).tolist()
    eng = snap_engine(chunk=64)
    out1 = gen(eng, prompt, rid="a")
    out2 = gen(eng, prompt, rid="b")   # snapshot-restored
    chunky = gen(snap_engine(chunk=4, prefix=False), prompt, rid="c")
    assert out1.outputs[0].token_ids == chunky.outputs[0].token_ids
    assert out2.outputs[0].token_ids == chunky.outputs[0].token_ids


def test_chunked_matches_scan_ragged():
    """gdn_mixed_chunked must equal the sequential scan on ragged mixed
    batches (the attention-rs chunked-deltanet analogue)."""
    rng = np.random.default_rng(5)
    hk, hv, dk, dv, W = 2, 4, 8, 16, 4
    conv_dim = 2 * hk * dk + hv * dv
    T = 96
    cu = [0, 40, 41, 96]
    kv_lens = [60, 5, 55]   # seq 0 and 2 mid-prefill (start > 0)
    slots = [0, 1, 2]
    mixed = rng.normal(size=(T, conv_dim)).astype(np.float32)
    z = rng.normal(size=(T, hv, dv)).astype(np.float32)
    av = rng.normal(size=(T, hv)).astype(np.float32)
    bv = rng.normal(size=(T, hv)).astype(np.float32)
    conv_w = (rng.normal(size=(conv_dim, W)) * 0.2).astype(np.float32)
    a_log = (rng.normal(size=hv) * 0.1).astype(np.float32)
    dt_bias = (rng.normal(size=hv) * 0.1).astype(np.float32)
    norm_w = np.ones(dv, np.float32)
    rec0 = (rng.normal(size=(6, hv, dk, dv)) * 0.3).astype(np.float32)
    conv0 = (rng.normal(size=(6, conv_dim, W - 1)) * 0.3).astype(np.float32)
    snap = np.array([31, -1, 16], np.int32)

    def run(fn, **kw):
        return fn(
            jnp.asarray(mixed), jnp.asarray(z), jnp.asarray(av),
            jnp.asarray(bv), jnp.asarray(conv_w), None,
            jnp.asarray(a_log), jnp.asarray(dt_bias), jnp.asarray(norm_w),
            jnp.asarray(rec0), jnp.asarray(conv0),
            jnp.asarray(slots, jnp.int32), jnp.asarray(cu, jnp.int32),
            jnp.asarray(kv_lens, jnp.int32), jnp.asarray(snap),
            num_k_heads=hk, num_v_heads=hv, head_k_dim=dk, head_v_dim=dv,
            scale=dk ** -0.5, **kw,
        )

    o1, r1, c1, (sr1, sc1) = run(gdn.gdn_mixed)
    o2, r2, c2, (sr2, sc2) = run(gdn.gdn_mixed_chunked, chunk=16)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=3e-3, atol=3e-3)
    # snapshots captured at the same boundaries
    np.testing.assert_allclose(np.asarray(sr1[0]), np.asarray(sr2[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(sr1[2]), np.asarray(sr2[2]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(sc1[0]), np.asarray(sc2[0]),
                               rtol=3e-3, atol=3e-3)


def test_hybrid_engine_chunked_prefill_dispatch():
    """Prefill buckets >= 64 route through the chunked kernel; generation
    must stay identical to the small-chunk (scan) configuration."""
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = hybrid_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=48, num_cpu_blocks=0)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 128, size=70).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    big = LLMEngine(
        cfg, cache,
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=128, max_model_len=128,
                        enable_prefix_caching=False,
                        preemption_mode="recompute"),
        seed=0,
    ).generate([prompt], sp)
    small = LLMEngine(
        cfg, cache,
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=8, max_model_len=128,
                        enable_prefix_caching=False,
                        preemption_mode="recompute"),
        seed=0,
    ).generate([prompt], sp)
    assert big[0].outputs[0].token_ids == small[0].outputs[0].token_ids
