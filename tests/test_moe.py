"""MoE: routing variants, grouped-GEMM FFN vs per-expert oracle, model
forward consistency, TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import MoEConfig, ModelConfig
from candle_vllm_tpu.models.moe import moe_ffn, route


def make_params(rng, E, hidden, inter, prefix="mlp", shared=None):
    p = {
        f"{prefix}.gate.weight": jnp.asarray(
            rng.standard_normal((hidden, E)), jnp.float32
        ),
        f"{prefix}.experts.gate_proj": jnp.asarray(
            rng.standard_normal((E, hidden, inter)) * 0.05, jnp.float32
        ),
        f"{prefix}.experts.up_proj": jnp.asarray(
            rng.standard_normal((E, hidden, inter)) * 0.05, jnp.float32
        ),
        f"{prefix}.experts.down_proj": jnp.asarray(
            rng.standard_normal((E, inter, hidden)) * 0.05, jnp.float32
        ),
    }
    if shared:
        p[f"{prefix}.shared_expert.gate_proj.weight"] = jnp.asarray(
            rng.standard_normal((hidden, shared)) * 0.05, jnp.float32)
        p[f"{prefix}.shared_expert.up_proj.weight"] = jnp.asarray(
            rng.standard_normal((hidden, shared)) * 0.05, jnp.float32)
        p[f"{prefix}.shared_expert.down_proj.weight"] = jnp.asarray(
            rng.standard_normal((shared, hidden)) * 0.05, jnp.float32)
        p[f"{prefix}.shared_expert_gate.weight"] = jnp.asarray(
            rng.standard_normal((hidden, 1)), jnp.float32)
    return p


def oracle_moe(x, p, moe, prefix="mlp"):
    """Per-token dense loop oracle."""
    topk_w, topk_idx = route(x, p[f"{prefix}.gate.weight"], moe)
    topk_w = np.asarray(topk_w)
    topk_idx = np.asarray(topk_idx)
    xn = np.asarray(x, np.float32)
    wg = np.asarray(p[f"{prefix}.experts.gate_proj"])
    wu = np.asarray(p[f"{prefix}.experts.up_proj"])
    wd = np.asarray(p[f"{prefix}.experts.down_proj"])
    out = np.zeros_like(xn)
    for t in range(xn.shape[0]):
        for j in range(moe.num_experts_per_tok):
            e = topk_idx[t, j]
            g = xn[t] @ wg[e]
            u = xn[t] @ wu[e]
            h = (g / (1 + np.exp(-g))) * u
            out[t] += topk_w[t, j] * (h @ wd[e])
    return out


def test_moe_ffn_matches_oracle():
    rng = np.random.default_rng(0)
    E, hidden, inter, T = 8, 32, 64, 12
    moe = MoEConfig(num_experts=E, num_experts_per_tok=2, moe_intermediate_size=inter)
    p = make_params(rng, E, hidden, inter)
    x = jnp.asarray(rng.standard_normal((T, hidden)), jnp.float32)
    got = np.asarray(moe_ffn(x, p, "mlp", moe))
    ref = oracle_moe(x, p, moe)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_moe_sigmoid_and_scaling():
    rng = np.random.default_rng(1)
    moe = MoEConfig(
        num_experts=8, num_experts_per_tok=3, moe_intermediate_size=64,
        scoring_func="sigmoid", routed_scaling_factor=2.5, norm_topk_prob=True,
    )
    p = make_params(rng, 8, 32, 64)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    got = np.asarray(moe_ffn(x, p, "mlp", moe))
    ref = oracle_moe(x, p, moe)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_grouped_topk_routing():
    rng = np.random.default_rng(2)
    moe = MoEConfig(
        num_experts=16, num_experts_per_tok=4, moe_intermediate_size=8,
        topk_method="noaux_tc", n_group=4, topk_group=2,
        scoring_func="sigmoid",
    )
    x = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    tw, ti = route(x, w, moe, e_score_bias=bias)
    ti = np.asarray(ti)
    # selected experts lie in at most topk_group distinct groups per token
    for t in range(6):
        groups = set(int(e) // 4 for e in ti[t])
        assert len(groups) <= 2


def test_shared_expert():
    rng = np.random.default_rng(3)
    moe = MoEConfig(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
        shared_expert_intermediate_size=32,
    )
    p = make_params(rng, 4, 32, 16, shared=32)
    x = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    with_shared = np.asarray(moe_ffn(x, p, "mlp", moe))
    p2 = {k: v for k, v in p.items() if "shared" not in k}
    without = np.asarray(moe_ffn(x, p2, "mlp", moe))
    assert not np.allclose(with_shared, without)


def test_qwen_moe_model_consistency():
    from tests.test_model_forward import run_steps

    from candle_vllm_tpu.models.registry import get_model

    cfg = ModelConfig(
        architecture="Qwen3MoeForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        use_qk_norm=True,
        moe=MoEConfig(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=32),
    )
    model = get_model(cfg)
    assert "model.layers.0.mlp.experts.gate_proj" in model.param_shapes()
    params = model.init_params(seed=0)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=14).tolist()
    full = run_steps(model, params, prompt, [14])
    chunked = run_steps(model, params, prompt, [9, 5], decode_tokens=())
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)


def test_moe_model_tp():
    from jax.sharding import Mesh

    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
    from candle_vllm_tpu.parallel.sharding import ShardingPlan, make_mesh
    from tests.test_tensor_parallel import make_inputs

    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    cfg = ModelConfig(
        architecture="Qwen3MoeForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        moe=MoEConfig(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=32),
    )
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 128, size=9).tolist()
    base = get_model(cfg)
    params = base.init_params(seed=1)
    kv = allocate_kv_pages(2, 32, 8, 2, cfg.head_dim, dtype=jnp.float32)
    step = make_inputs(cfg, prompt)
    ref_logits, _ = base.forward(params, kv, step)

    mesh = make_mesh(tp_size=2)
    plan = ShardingPlan(mesh)
    model = get_model(cfg, mesh=mesh)
    sp = plan.apply(params)
    skv = [jax.device_put(p, plan.kv_pages_sharding()) for p in kv]
    got_logits, _ = model.forward(sp, skv, step)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
