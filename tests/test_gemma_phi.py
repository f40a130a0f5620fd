"""Gemma-family structure (sandwich norms, unit-offset RMS, softcaps,
query scale) and Phi3 fused-weight splitting."""

import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.registry import get_model
from tests.test_model_forward import run_steps


def gemma_config(**kw):
    cfg = ModelConfig.from_hf(
        dict(
            architectures=["Gemma2ForCausalLM"],
            model_type="gemma2",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            vocab_size=128,
            max_position_embeddings=256,
            hidden_activation="gelu_pytorch_tanh",
            query_pre_attn_scalar=32,
            sliding_window=16,
            sliding_window_pattern=2,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            **kw,
        ),
        dtype=jnp.float32,
    )
    return cfg


def test_gemma_config_flags():
    cfg = gemma_config()
    assert cfg.scale_embeddings and cfg.norm_unit_offset and cfg.sandwich_norms
    assert cfg.tie_word_embeddings
    assert cfg.query_pre_attn_scalar == 32


def test_gemma_forward_consistency():
    cfg = gemma_config()
    model = get_model(cfg)
    shapes = model.param_shapes()
    assert "model.layers.0.pre_feedforward_layernorm.weight" in shapes
    assert "model.layers.0.post_feedforward_layernorm.weight" in shapes
    assert "lm_head.weight" not in shapes  # tied
    params = model.init_params(seed=0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=21).tolist()
    full = run_steps(model, params, prompt, [21])
    chunked = run_steps(model, params, prompt, [12, 9])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)
    # final softcap bounds logits
    assert np.abs(full).max() <= 30.0 + 1e-3


def test_gemma3_local_rope():
    cfg = gemma_config()
    cfg.model_type = "gemma3"
    cfg.rope_local_base_freq = 10000.0
    cfg.rope_theta = 1000000.0
    model = get_model(cfg)
    assert model.rope_local is not None
    params = model.init_params(seed=1)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=10).tolist()
    out = run_steps(model, params, prompt, [10])
    assert np.isfinite(out).all()


def test_phi3_fused_weight_split():
    from candle_vllm_tpu.models.weights import split_fused_weights

    cfg = ModelConfig(
        architecture="Phi3ForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        dtype=jnp.float32,
    )
    H = 4 * cfg.head_dim
    K = 2 * cfg.head_dim
    rng = np.random.default_rng(2)
    fused = {
        "model.layers.0.self_attn.qkv_proj.weight": jnp.asarray(
            rng.standard_normal((64, H + 2 * K)), jnp.float32
        ),
        "model.layers.0.mlp.gate_up_proj.weight": jnp.asarray(
            rng.standard_normal((64, 256)), jnp.float32
        ),
        "model.norm.weight": jnp.ones(64),
    }
    split = split_fused_weights(fused, cfg)
    assert split["model.layers.0.self_attn.q_proj.weight"].shape == (64, H)
    assert split["model.layers.0.self_attn.k_proj.weight"].shape == (64, K)
    assert split["model.layers.0.self_attn.v_proj.weight"].shape == (64, K)
    assert split["model.layers.0.mlp.gate_proj.weight"].shape == (64, 128)
    assert split["model.layers.0.mlp.up_proj.weight"].shape == (64, 128)
    assert "model.norm.weight" in split
    qkv = np.asarray(fused["model.layers.0.self_attn.qkv_proj.weight"])
    np.testing.assert_array_equal(
        np.asarray(split["model.layers.0.self_attn.v_proj.weight"]),
        qkv[:, H + K :],
    )


def test_stablelm_layernorm_partial_rotary():
    cfg = ModelConfig.from_hf(
        dict(
            architectures=["StableLmForCausalLM"],
            model_type="stablelm",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=128,
            max_position_embeddings=256,
            partial_rotary_factor=0.25,
            use_qkv_bias=True,
        ),
        dtype=jnp.float32,
    )
    assert cfg.norm_type == "layernorm"
    assert cfg.qkv_bias
    model = get_model(cfg)
    shapes = model.param_shapes()
    assert "model.layers.0.input_layernorm.bias" in shapes
    assert "model.norm.bias" in shapes
    assert model.rope.rotary_dim == 4  # 16 * 0.25
    params = model.init_params(seed=0)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 128, size=13).tolist()
    full = run_steps(model, params, prompt, [13])
    chunked = run_steps(model, params, prompt, [7, 6])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)


def test_phi2_parallel_block():
    """Phi2: parallel attn/MLP residual, LayerNorm+bias, non-gated MLP,
    partial rotary, lm_head bias (reference: phi2.rs)."""
    cfg = ModelConfig.from_hf(
        dict(
            architectures=["PhiForCausalLM"],
            model_type="phi",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            vocab_size=128,
            max_position_embeddings=256,
            hidden_act="gelu_new",
            partial_rotary_factor=0.5,
            layer_norm_eps=1e-5,
        ),
        dtype=jnp.float32,
    )
    assert cfg.parallel_block and not cfg.gated_mlp
    assert cfg.norm_type == "layernorm" and cfg.lm_head_bias
    model = get_model(cfg)
    shapes = model.param_shapes()
    assert "model.layers.0.post_attention_layernorm.weight" not in shapes
    assert "model.layers.0.mlp.gate_proj.weight" not in shapes
    assert "model.layers.0.mlp.up_proj.bias" in shapes
    assert "model.layers.0.self_attn.o_proj.bias" in shapes
    assert "lm_head.bias" in shapes
    assert model.rope.rotary_dim == 8  # 16 * 0.5
    params = model.init_params(seed=0)
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=17).tolist()
    full = run_steps(model, params, prompt, [17])
    chunked = run_steps(model, params, prompt, [9, 8])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)


def test_phi2_weight_name_canonicalization():
    from candle_vllm_tpu.models.weights import canonical_name

    assert canonical_name("model.final_layernorm.weight") == "model.norm.weight"
    assert (
        canonical_name("model.layers.3.self_attn.dense.weight")
        == "model.layers.3.self_attn.o_proj.weight"
    )
    assert canonical_name("model.layers.0.mlp.fc1.bias") == "model.layers.0.mlp.up_proj.bias"
    assert canonical_name("model.layers.0.mlp.fc2.weight") == "model.layers.0.mlp.down_proj.weight"
    assert canonical_name("lm_head.weight") == "lm_head.weight"


# ---------------------------------------------------------------------------
# Gemma4: per-layer heterogeneous KV (reference: gemma4.rs,
# models/mod.rs:1124-1192 gemma4_per_layer_cache_config)
# ---------------------------------------------------------------------------


def gemma4_config(**kw):
    return ModelConfig.from_hf(
        dict(
            architectures=["Gemma4ForCausalLM"],
            model_type="gemma4",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=6,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,             # swa layers
            global_head_dim=32,      # full-attention layers
            num_global_key_value_heads=1,
            vocab_size=128,
            max_position_embeddings=256,
            hidden_activation="gelu_pytorch_tanh",
            query_pre_attn_scalar=32,
            sliding_window=16,
            rope_parameters={
                "full_attention": {"rope_theta": 500000.0,
                                   "partial_rotary_factor": 0.5},
                "sliding_attention": {"rope_theta": 9000.0},
            },
            **kw,
        ),
        dtype=jnp.float32,
    )


def test_gemma4_config_hetero():
    cfg = gemma4_config()
    # default pattern: every 6th layer is full attention
    assert [cfg.is_sliding_layer(i) for i in range(6)] == [True] * 5 + [False]
    assert cfg.layer_kv_spec(0) == (2, 16)
    assert cfg.layer_kv_spec(5) == (1, 32)
    assert cfg.has_hetero_kv
    assert cfg.global_rope_theta == 500000.0
    assert cfg.rope_local_base_freq == 9000.0
    assert cfg.partial_rotary_factor == 0.5
    assert cfg.sandwich_norms and cfg.norm_unit_offset


def run_steps_hetero(model, params, prompt, chunk_plan):
    from candle_vllm_tpu.engine.block_engine import BlockEngine
    from candle_vllm_tpu.engine.input_builder import build_step_input
    from candle_vllm_tpu.engine.scheduler import ScheduledGroup
    from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = model.config
    PAGE = 16
    be = BlockEngine(PAGE, num_gpu_blocks=64, num_cpu_blocks=8,
                     enable_prefix_caching=False)
    kv_pages = []
    for K_i, D_i in model.per_layer_kv_spec():
        kv_pages += allocate_kv_pages(1, 64, PAGE, K_i, D_i, dtype=cfg.dtype)
    seq = Sequence(0, list(prompt))
    group = SequenceGroup("r0", [seq], SamplingParams())
    be.allocate(seq)
    logits = None
    for chunk in chunk_plan:
        be.allocate_extend_for_chunk(seq, seq.num_computed_tokens + chunk)
        plan = build_step_input(
            [ScheduledGroup(group, {0: chunk})], be, PAGE, cfg.max_model_len
        )
        logits, kv_pages = model.forward(params, kv_pages, plan.step)
        seq.num_computed_tokens += chunk
    return np.asarray(logits[0])


def test_gemma4_hetero_forward_consistency():
    cfg = gemma4_config()
    model = get_model(cfg)
    shapes = model.param_shapes()
    # swa layer 0: K*D = 2*16; global layer 5: K*D = 1*32
    assert shapes["model.layers.0.self_attn.k_proj.weight"] == (64, 32)
    assert shapes["model.layers.5.self_attn.k_proj.weight"] == (64, 32)
    assert shapes["model.layers.5.self_attn.q_proj.weight"] == (64, 128)
    assert shapes["model.layers.0.self_attn.q_proj.weight"] == (64, 64)
    params = model.init_params(seed=0)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=23).tolist()
    full = run_steps_hetero(model, params, prompt, [23])
    chunked = run_steps_hetero(model, params, prompt, [13, 10])
    np.testing.assert_allclose(full, chunked, rtol=3e-4, atol=3e-4)


def test_gemma4_engine_end_to_end():
    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = gemma4_config()
    eng = LLMEngine(
        cfg,
        CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0),
        SchedulerConfig(max_model_len=cfg.max_model_len,
                        preemption_mode="recompute"),
        seed=0,
    )
    # per-layer pages have per-layer shapes
    assert eng.kv_pages[0].shape[2:] == (4, 16)   # 2 kv heads * 2, d=16
    assert eng.kv_pages[5].shape[2:] == (2, 32)
    eng.add_request("g", prompt_token_ids=[1, 2, 3, 4, 5],
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=6))
    while eng.has_unfinished_requests():
        outs = eng.step()
    assert outs and outs[0].finished
