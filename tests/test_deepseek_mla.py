"""DeepSeek MLA: absorbed latent attention vs a naive dense oracle,
chunk consistency, MoE layers, engine E2E."""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import MoEConfig, ModelConfig
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.ops.rope import apply_rope, compute_cos_sin
from tests.test_model_forward import run_steps


def mla_config(**kw):
    base = dict(
        architecture="DeepseekV2ForCausalLM",
        model_type="deepseek_v2",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        q_lora_rank=32,
        kv_lora_rank=16,
        qk_rope_head_dim=8,
        qk_nope_head_dim=16,
        v_head_dim=16,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_mla_single_layer_vs_dense_oracle():
    """One-layer forward must match a from-scratch dense MLA computation."""
    cfg = mla_config(num_hidden_layers=1)
    model = get_model(cfg)
    params = model.init_params(seed=0)
    rng = np.random.default_rng(0)
    Tn = 9
    prompt = rng.integers(0, 128, size=Tn).tolist()
    got = run_steps(model, params, prompt, [Tn])  # logits of last token

    # ---- naive dense MLA (decompressed K/V, full attention) ----
    import numpy as onp

    P = {k: onp.asarray(v, onp.float32) for k, v in params.items()}

    def rms(x, w, eps=1e-6):
        v = (x * x).mean(-1, keepdims=True)
        return x / onp.sqrt(v + eps) * w

    x = P["model.embed_tokens.weight"][prompt]
    c = cfg
    H, nope, rope_d, L, v_dim = (
        c.num_attention_heads, c.qk_nope_head_dim, c.qk_rope_head_dim,
        c.kv_lora_rank, c.v_head_dim,
    )
    a = "model.layers.0.self_attn"
    h = rms(x, P["model.layers.0.input_layernorm.weight"])
    cq = rms(h @ P[f"{a}.q_a_proj.weight"], P[f"{a}.q_a_layernorm.weight"])
    q = (cq @ P[f"{a}.q_b_proj.weight"]).reshape(Tn, H, nope + rope_d)
    ckv = h @ P[f"{a}.kv_a_proj_with_mqa.weight"]
    c_kv = rms(ckv[:, :L], P[f"{a}.kv_a_layernorm.weight"])
    k_pe = ckv[:, L:]

    pos = jnp.arange(Tn)
    cos, sin = compute_cos_sin(pos, model.rope)
    q_pe = onp.asarray(
        apply_rope(jnp.asarray(q[..., nope:]), cos, sin, model.rope)
    )
    k_pe = onp.asarray(
        apply_rope(jnp.asarray(k_pe[:, None, :]), cos, sin, model.rope)
    )[:, 0]

    kv_b = P[f"{a}.kv_b_proj.weight"].reshape(L, H, nope + v_dim)
    k_nope = onp.einsum("tl,lhn->thn", c_kv, kv_b[..., :nope])
    v = onp.einsum("tl,lhv->thv", c_kv, kv_b[..., nope:])
    scores = (
        onp.einsum("thn,shn->hts", q[..., :nope], k_nope)
        + onp.einsum("thr,sr->hts", q_pe, k_pe)
    ) * (nope + rope_d) ** -0.5
    mask = onp.tril(onp.ones((Tn, Tn), bool))
    scores = onp.where(mask[None], scores, -1e30)
    p_att = onp.exp(scores - scores.max(-1, keepdims=True))
    p_att /= p_att.sum(-1, keepdims=True)
    attn = onp.einsum("hts,shv->thv", p_att, v).reshape(Tn, H * v_dim)
    attn = attn @ P[f"{a}.o_proj.weight"]
    x = x + attn
    h = rms(x, P["model.layers.0.post_attention_layernorm.weight"])
    gate = h @ P["model.layers.0.mlp.gate_proj.weight"]
    up = h @ P["model.layers.0.mlp.up_proj.weight"]
    silu = gate / (1 + onp.exp(-gate))
    x = x + (silu * up) @ P["model.layers.0.mlp.down_proj.weight"]
    x = rms(x, P["model.norm.weight"])
    ref_logits = x[-1] @ P["lm_head.weight"]

    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-3)


def test_mla_chunked_and_decode_consistency():
    cfg = mla_config()
    model = get_model(cfg)
    assert model.kv_cache_spec() == (1, 24)  # kv_lora + rope
    params = model.init_params(seed=1)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 128, size=16).tolist()
    full = run_steps(model, params, toks, [16])
    chunked = run_steps(model, params, toks, [10, 6])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)
    decoded = run_steps(model, params, toks[:13], [13], decode_tokens=toks[13:])
    np.testing.assert_allclose(full, decoded, rtol=3e-4, atol=3e-4)


def test_deepseek_moe_layers():
    cfg = mla_config(
        moe=MoEConfig(
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            num_shared_experts=1,
            first_k_dense_replace=1,
            scoring_func="sigmoid",
            topk_method="noaux_tc",
            n_group=2,
            topk_group=1,
        )
    )
    model = get_model(cfg)
    shapes = model.param_shapes()
    assert "model.layers.0.mlp.gate_proj.weight" in shapes   # dense first
    assert "model.layers.1.mlp.experts.gate_proj" in shapes  # moe after
    assert "model.layers.1.mlp.shared_experts.gate_proj.weight" in shapes
    params = model.init_params(seed=2)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 128, size=11).tolist()
    full = run_steps(model, params, toks, [11])
    chunked = run_steps(model, params, toks, [6, 5])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)


def test_deepseek_engine_e2e():
    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = mla_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                            prefill_chunk_size=64, max_model_len=128)
    eng = LLMEngine(cfg, cache, sched, seed=0)
    # cache allocated with the compressed latent shape: ONE shared plane
    # (k == v == the latent row; kv_shared single-copy MLA cache)
    assert eng.kv_pages[0].shape[2] == 1
    rng = np.random.default_rng(3)
    out = eng.generate(
        [rng.integers(0, 128, size=9).tolist()],
        SamplingParams(temperature=0.0, max_tokens=5),
    )
    assert len(out[0].outputs[0].token_ids) == 5


def test_mla_yarn_mscale_and_interleaved_rope():
    """DeepSeek checkpoints ship yarn rope_scaling; MLA must apply the
    mscale^2 score correction and GPT-J interleaved rope pairing
    (ADVICE r1 #2/#4; reference mla_attention.rs:243-245, deepseek.rs:475)."""
    import math

    from candle_vllm_tpu.config import RopeScaling
    from candle_vllm_tpu.models.deepseek import DeepseekForCausalLM

    cfg = mla_config(
        rope_scaling=RopeScaling(
            rope_type="yarn", factor=40.0, mscale=1.0, mscale_all_dim=1.0,
            original_max_position_embeddings=4096,
        )
    )
    m = DeepseekForCausalLM(cfg)
    expect = (0.1 * 1.0 * math.log(40.0) + 1.0) ** 2
    assert abs(m.mla_mscale_sq - expect) < 1e-9
    assert m.rope.interleaved

    # no yarn -> no correction (but still interleaved pairing)
    m2 = DeepseekForCausalLM(mla_config())
    assert m2.mla_mscale_sq == 1.0
    assert m2.rope.interleaved
