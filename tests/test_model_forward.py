"""Dense model forward over paged KV: chunking/decode consistency.

The same prompt must yield identical next-token logits whether processed
as one prefill chunk, several chunks, or prefill + decode steps — this
pins the slot-mapping / positions / kv-length wiring.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import CacheConfig, ModelConfig
from candle_vllm_tpu.engine.block_engine import BlockEngine
from candle_vllm_tpu.engine.input_builder import build_step_input
from candle_vllm_tpu.engine.scheduler import ScheduledGroup
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
from candle_vllm_tpu.sampling_params import SamplingParams

PAGE = 8


def tiny_config(**kw):
    defaults = dict(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=256,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def run_steps(model, params, prompt, chunk_plan, decode_tokens=()):
    """Process `prompt` with the given chunk sizes, then feed
    decode_tokens one at a time. Returns logits of the last step."""
    cfg = model.config
    be = BlockEngine(PAGE, num_gpu_blocks=64, num_cpu_blocks=8,
                     enable_prefix_caching=False)
    kv_heads, kv_dim = (
        model.kv_cache_spec()
        if hasattr(model, "kv_cache_spec")
        else (cfg.num_key_value_heads, cfg.head_dim)
    )
    kv_pages = allocate_kv_pages(
        cfg.num_hidden_layers, 64, PAGE, kv_heads, kv_dim, dtype=cfg.dtype,
    )
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
    for tok in decode_tokens:
        seq.append_token(int(tok))
        be.allocate_extend_for_chunk(seq, seq.get_len())
        plan = build_step_input(
            [ScheduledGroup(group, {0: 1})], be, PAGE, cfg.max_model_len
        )
        logits, kv_pages = model.forward(params, kv_pages, plan.step)
        seq.num_computed_tokens += 1
    return np.asarray(logits[0])


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = get_model(cfg)
    return model, model.init_params(seed=3)


def test_chunked_prefill_consistency(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=13).tolist()
    full = run_steps(model, params, prompt, [13])
    chunked = run_steps(model, params, prompt, [8, 5])
    np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-4)


def test_decode_matches_prefill(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 128, size=16).tolist()
    # logits after prefilling all 16 tokens
    full = run_steps(model, params, toks, [16])
    # prefill 13, then feed tokens 13..15 as "decode" steps
    decoded = run_steps(model, params, toks[:13], [13], decode_tokens=toks[13:])
    np.testing.assert_allclose(full, decoded, rtol=2e-4, atol=2e-4)


def test_qk_norm_and_bias_variants():
    cfg = tiny_config(use_qk_norm=True, qkv_bias=True,
                      architecture="Qwen3ForCausalLM")
    model = get_model(cfg)
    params = model.init_params(seed=5)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 128, size=9).tolist()
    full = run_steps(model, params, prompt, [9])
    chunked = run_steps(model, params, prompt, [4, 5])
    np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-4)
    assert np.isfinite(full).all()


def test_sliding_window_layers():
    cfg = tiny_config(sliding_window=8, sliding_window_pattern=2)
    model = get_model(cfg)
    params = model.init_params(seed=7)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 128, size=20).tolist()
    full = run_steps(model, params, prompt, [20])
    chunked = run_steps(model, params, prompt, [11, 9])
    np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-4)


def test_tied_embeddings():
    cfg = tiny_config(tie_word_embeddings=True)
    model = get_model(cfg)
    params = model.init_params(seed=9)
    assert "lm_head.weight" not in params
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=6).tolist()
    out = run_steps(model, params, prompt, [6])
    assert out.shape == (128,) and np.isfinite(out).all()


def test_weights_roundtrip(tmp_path, model_and_params):
    from candle_vllm_tpu.models.weights import load_safetensors, save_safetensors

    model, params = model_and_params
    path = tmp_path / "model.safetensors"
    # save in our layout, reload through the HF path (transposing), so
    # save transposed to emulate an HF checkpoint
    import numpy as onp
    from safetensors.numpy import save_file

    hf = {}
    for k, v in params.items():
        a = onp.asarray(v)
        if a.ndim == 2 and "embed_tokens" not in k:
            a = onp.ascontiguousarray(a.T)  # HF stores [out, in]
        hf[k] = a
    save_file(hf, str(path))
    loaded = load_safetensors(str(tmp_path), dtype=jnp.float32)
    for k in params:
        assert loaded[k].shape == params[k].shape, k
        np.testing.assert_allclose(
            onp.asarray(loaded[k]), onp.asarray(params[k]), rtol=1e-6
        )


def test_phi4_longrope_spec():
    """Phi4 longrope: short/long per-dim factors with the sqrt magnitude
    correction; positions past the original window switch frequency sets
    (reference: Phi4RotaryEmbedding, phi4.rs:77-250)."""
    import math

    import numpy as np

    from candle_vllm_tpu.config import ModelConfig
    from candle_vllm_tpu.ops.rope import compute_cos_sin, make_rope_spec

    half = 64  # head_dim 128
    cfg = ModelConfig.from_hf({
        "architectures": ["Phi4ForCausalLM"],
        "model_type": "phi3",
        "hidden_size": 1024,
        "num_attention_heads": 8,
        "head_dim": 128,
        "max_position_embeddings": 131072,
        "original_max_position_embeddings": 4096,
        "rope_scaling": {
            "type": "longrope",
            "short_factor": [1.0] * half,
            "long_factor": [4.0] * half,
            "original_max_position_embeddings": 4096,
        },
    })
    spec = make_rope_spec(cfg)
    assert spec.inv_freq_long is not None and spec.long_switch == 4096
    s = 131072 / 4096
    expect = math.sqrt(1.0 + math.log(s) / math.log(4096))
    assert abs(spec.attention_scale - expect) < 1e-9
    # long positions use freqs divided by the long factor
    import jax.numpy as jnp

    cos, sin = compute_cos_sin(jnp.asarray([10, 5000]), spec)
    short_angle = 10 * spec.inv_freq[1]
    long_angle = 5000 * spec.inv_freq_long[1]
    np.testing.assert_allclose(
        float(cos[0, 1]), math.cos(short_angle) * spec.attention_scale, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(cos[1, 1]), math.cos(long_angle) * spec.attention_scale, rtol=1e-3
    )


def test_minimax_and_glm4_moe_lite_registry():
    """MiniMax-M2 (Qwen-MoE shape, forced norm_topk_prob) and GLM4-MoE-Lite
    (DeepSeek MLA shape) resolve to working model classes."""
    from candle_vllm_tpu.config import ModelConfig
    from candle_vllm_tpu.models.deepseek import DeepseekForCausalLM
    from candle_vllm_tpu.models.qwen_moe import QwenMoeForCausalLM
    from candle_vllm_tpu.models.registry import get_model

    mm = ModelConfig.from_hf({
        "architectures": ["MiniMaxM2ForCausalLM"],
        "model_type": "minimax_m2",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 128,
        "num_local_experts": 4,
        "num_experts_per_tok": 2,
        "norm_topk_prob": False,  # forced back on (minimax.rs:181-188)
        "scoring_func": "sigmoid",
    })
    assert mm.moe is not None and mm.moe.norm_topk_prob
    assert mm.moe.moe_intermediate_size == 128
    assert isinstance(get_model(mm), QwenMoeForCausalLM)

    glm = ModelConfig.from_hf({
        "architectures": ["Glm4MoeLiteForCausalLM"],
        "model_type": "glm4_moe_lite",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 4,
        "vocab_size": 128,
        "q_lora_rank": 32,
        "kv_lora_rank": 32,
        "qk_rope_head_dim": 16,
        "qk_nope_head_dim": 16,
        "v_head_dim": 16,
        "n_routed_experts": 4,
        "num_experts_per_tok": 2,
        "first_k_dense_replace": 1,
    })
    assert isinstance(get_model(glm), DeepseekForCausalLM)
