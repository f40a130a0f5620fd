"""DSA lightning indexer + sparse MLA prefill (reference:
layers/indexer.rs, attention-rs dsa_lightning_indexer_prefill /
mla_sparse_paged_prefill)."""

import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.registry import get_model
from tests.test_model_forward import run_steps


def v32_config(topk=64, use_dsa=False):
    return ModelConfig(
        architecture="DeepseekV32ForCausalLM",
        model_type="deepseek_v32",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        q_lora_rank=32,
        kv_lora_rank=32,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=32,
        extra={
            "index_n_heads": 2,
            "index_head_dim": 32,
            "index_topk": topk,
            "use_dsa_prefill": use_dsa,
        },
    )


def test_indexer_params_registered():
    model = get_model(v32_config())
    shapes = model.param_shapes()
    assert shapes["model.layers.0.self_attn.indexer.wq_b.weight"] == (32, 64)
    assert shapes["model.layers.0.self_attn.indexer.wk.weight"] == (64, 32)
    assert shapes["model.layers.0.self_attn.indexer.weights_proj.weight"] \
        == (64, 2)
    assert model.has_dsa and not model.use_dsa


def test_lightning_index_causal_and_segmented():
    """Selected indices must be causal and within the query's sequence."""
    from candle_vllm_tpu.ops.dsa import lightning_index

    model = get_model(v32_config())
    params = model.init_params(seed=0)
    rng = np.random.default_rng(0)
    T = 24
    x = jnp.asarray(rng.normal(size=(T, 64)).astype(np.float32))
    cq = jnp.asarray(rng.normal(size=(T, 32)).astype(np.float32))
    cu = jnp.asarray([0, 10, 24], jnp.int32)     # two sequences
    kv_lens = jnp.asarray([10, 14], jnp.int32)
    from candle_vllm_tpu.ops.rope import compute_cos_sin

    pos = jnp.concatenate([jnp.arange(10), jnp.arange(14)]).astype(jnp.int32)
    cos, sin = compute_cos_sin(pos, model.rope)
    idxs, valid = lightning_index(
        x, cq, params, "model.layers.0.self_attn.indexer",
        cu, kv_lens, n_heads=2, head_dim=32, rope_dim=16, topk=8,
        cos=cos, sin=sin, rope_spec=model.rope,
    )
    idxs, valid = np.asarray(idxs), np.asarray(valid)
    assert idxs.shape == (24, 8)
    for t in range(24):
        seq = 0 if t < 10 else 1
        lo = 0 if seq == 0 else 10
        for k in range(8):
            if valid[t, k]:
                assert lo <= idxs[t, k] <= t, (t, k, idxs[t, k])
    # each query sees at most (t - lo + 1) valid slots
    assert valid[0].sum() == 1
    assert valid[10].sum() == 1  # first token of second sequence


def test_sparse_prefill_matches_dense_when_topk_covers():
    """With topk >= prompt length the sparse path attends over exactly the
    causal set — outputs must match the dense paged path."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=20).tolist()
    dense_model = get_model(v32_config(topk=64, use_dsa=False))
    params = dense_model.init_params(seed=0)
    dense = run_steps(dense_model, params, prompt, [20])
    sparse_model = get_model(v32_config(topk=64, use_dsa=True))
    assert sparse_model.use_dsa
    sparse = run_steps(sparse_model, params, prompt, [20])
    np.testing.assert_allclose(sparse, dense, rtol=2e-4, atol=2e-4)


def test_sparse_prefill_small_topk_runs():
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 128, size=30).tolist()
    model = get_model(v32_config(topk=4, use_dsa=True))
    params = model.init_params(seed=0)
    out = run_steps(model, params, prompt, [30])
    assert np.isfinite(out).all()


def test_engine_dsa_prefill_matches_dense():
    """Engine auto-enables DSA for whole-prompt prefill steps; with
    topk >= prompt length generation must match a non-DSA model exactly
    (decode stays dense over the written pages)."""
    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (12, 9)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    cache = CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256,
                            prefill_chunk_size=128, max_model_len=128)

    dense_eng = LLMEngine(v32_config(topk=64, use_dsa=False), cache, sched,
                          seed=0)
    assert not dense_eng.model.use_dsa
    dense = dense_eng.generate(prompts, sp)

    # fresh engine, same weights seed; has_dsa drives per-step enablement
    sparse_eng = LLMEngine(v32_config(topk=64, use_dsa=False),
                           CacheConfig(block_size=8, num_gpu_blocks=64,
                                       num_cpu_blocks=0),
                           sched, seed=0)
    assert sparse_eng.model.has_dsa
    flags = []
    orig = sparse_eng._jit_step

    def spy(*a, **k):
        flags.append(k.get("dsa_prefill"))
        return orig(*a, **k)

    sparse_eng._jit_step = spy
    sparse = sparse_eng.generate(prompts, sp)
    assert flags[0] is True          # prefill step took the sparse path
    assert not any(flags[1:])        # decode steps stayed dense
    for a, b in zip(dense, sparse):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_engine_dsa_disabled_for_chunked_prefill():
    """Chunked prompts (context split across steps) must NOT take the
    in-batch sparse path — outputs still correct vs one-shot prefill."""
    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 128, size=40).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    whole = LLMEngine(
        v32_config(topk=64), CacheConfig(block_size=8, num_gpu_blocks=64,
                                         num_cpu_blocks=0),
        SchedulerConfig(max_num_batched_tokens=256, prefill_chunk_size=128,
                        max_model_len=128),
        seed=0,
    ).generate([prompt], sp)
    chunked = LLMEngine(
        v32_config(topk=64), CacheConfig(block_size=8, num_gpu_blocks=64,
                                         num_cpu_blocks=0),
        SchedulerConfig(max_num_batched_tokens=256, prefill_chunk_size=16,
                        max_model_len=128),
        seed=0,
    ).generate([prompt], sp)
    assert whole[0].outputs[0].token_ids == chunked[0].outputs[0].token_ids
