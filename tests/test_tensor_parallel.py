"""Tensor-parallel forward on a virtual 8-device CPU mesh.

The sharded model (GSPMD params + shard_map'd paged attention) must match
the unsharded forward bit-for-bit-ish — the TPU analogue of validating the
reference's NCCL TP layers (distributed.rs) against single-GPU execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.engine.block_engine import BlockEngine
from candle_vllm_tpu.engine.input_builder import build_step_input
from candle_vllm_tpu.engine.scheduler import ScheduledGroup
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
from candle_vllm_tpu.parallel.sharding import ShardingPlan, make_mesh
from candle_vllm_tpu.sampling_params import SamplingParams

PAGE = 8


def make_inputs(cfg, prompt):
    be = BlockEngine(PAGE, 32, 8, enable_prefix_caching=False)
    seq = Sequence(0, list(prompt))
    group = SequenceGroup("r", [seq], SamplingParams())
    be.allocate(seq)
    plan = build_step_input(
        [ScheduledGroup(group, {0: len(prompt)})], be, PAGE, cfg.max_model_len
    )
    return plan.step


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_forward_matches_single(tp):
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=11).tolist()

    base = get_model(cfg)
    params = base.init_params(seed=1)
    kv = allocate_kv_pages(2, 32, PAGE, 4, cfg.head_dim, dtype=jnp.float32)
    step = make_inputs(cfg, prompt)
    ref_logits, ref_kv = base.forward(params, kv, step)

    mesh = make_mesh(tp_size=tp)
    plan = ShardingPlan(mesh)
    sharded_params = plan.apply(params)
    skv = [jax.device_put(p, plan.kv_pages_sharding()) for p in kv]
    model = get_model(cfg, mesh=mesh)
    got_logits, got_kv = model.forward(sharded_params, skv, step)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # KV pages must match too (they carry state across steps)
    np.testing.assert_allclose(
        np.asarray(got_kv[0]), np.asarray(ref_kv[0]), rtol=2e-4, atol=2e-4
    )


def test_tp_jitted_with_donation():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=64,
        max_model_len=128,
        dtype=jnp.float32,
    )
    mesh = make_mesh(tp_size=2)
    plan = ShardingPlan(mesh)
    model = get_model(cfg, mesh=mesh)
    params = plan.apply(model.init_params(seed=2))
    kv = [
        jax.device_put(p, plan.kv_pages_sharding())
        for p in allocate_kv_pages(2, 32, PAGE, 2, cfg.head_dim, dtype=jnp.float32)
    ]
    rng = np.random.default_rng(1)
    step = make_inputs(cfg, rng.integers(0, 64, size=7).tolist())

    fwd = jax.jit(model.forward, donate_argnums=(1,))
    logits, kv = fwd(params, kv, step)
    logits2, kv = fwd(params, kv, step)
    assert np.isfinite(np.asarray(logits)).all()


def test_kv_head_replication():
    """K=1 kv heads with tp=4: replicated KV, outputs match unsharded."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=1,  # MQA
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=9).tolist()
    base = get_model(cfg)
    params = base.init_params(seed=1)
    kv = allocate_kv_pages(2, 32, PAGE, 1, cfg.head_dim, dtype=jnp.float32)
    step = make_inputs(cfg, prompt)
    ref_logits, _ = base.forward(params, kv, step)

    mesh = make_mesh(tp_size=4)
    plan = ShardingPlan(mesh)
    model = get_model(cfg, mesh=mesh)
    kh, kd = model.kv_cache_spec()
    assert kh == 4  # replicated to tp
    skv = [
        jax.device_put(p, plan.kv_pages_sharding())
        for p in allocate_kv_pages(2, 32, PAGE, kh, kd, dtype=jnp.float32)
    ]
    got_logits, _ = model.forward(plan.apply(params), skv, step)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )


def test_deepseek_mla_tp():
    """MLA latent-MQA under TP (kv replication path)."""
    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    from tests.test_deepseek_mla import mla_config

    cfg = mla_config()
    rng = np.random.default_rng(8)
    prompt = rng.integers(0, 128, size=9).tolist()
    base = get_model(cfg)
    params = base.init_params(seed=2)
    kh, kd = base.kv_cache_spec()
    kv = allocate_kv_pages(2, 32, PAGE, kh, kd, dtype=jnp.float32)
    step = make_inputs(cfg, prompt)
    ref_logits, _ = base.forward(params, kv, step)

    mesh = make_mesh(tp_size=2)
    plan = ShardingPlan(mesh)
    model = get_model(cfg, mesh=mesh)
    kh2, kd2 = model.kv_cache_spec()
    assert kh2 == 2
    skv = [
        jax.device_put(p, plan.kv_pages_sharding())
        for p in allocate_kv_pages(2, 32, PAGE, kh2, kd2, dtype=jnp.float32)
    ]
    got_logits, _ = model.forward(plan.apply(params), skv, step)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=5e-4, atol=5e-4
    )
