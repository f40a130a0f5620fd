"""Quantization: pack/unpack roundtrip, quantize accuracy, fused matmul
kernel vs dequant oracle, ISQ end-to-end generation."""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.ops import quant
from candle_vllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(128, 512)).astype(np.int8)
    packed = quant.pack_int4(q)
    assert packed.shape == (128, 256)
    np.testing.assert_array_equal(quant.unpack_int4(packed), q)


def test_quantize_w4a16_accuracy():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
    qw, s = quant.quantize_w4a16(w, group_size=128)
    deq = quant.unpack_int4(qw).astype(np.float32)
    deq = deq.reshape(2, 128, 512) * s[:, None, :]
    deq = deq.reshape(256, 512)
    err = np.abs(deq - w)
    # max error is bounded by half a quantization step per group
    step = s.repeat(128, axis=0)
    assert (err <= step * 0.5 + 1e-6).all()


def test_dequantize_jnp_matches_numpy():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.1
    qw, s = quant.quantize_w4a16(w)
    params = {
        "m.qweight": jnp.asarray(qw),
        "m.scales": jnp.asarray(s, jnp.bfloat16),
    }
    deq = np.asarray(quant.dequantize(params, "m"))
    ref = quant.unpack_int4(qw).astype(np.float32).reshape(2, 128, 512)
    ref = (ref * s.astype(np.float32)[:, None, :]).reshape(256, 512)
    np.testing.assert_allclose(deq, ref, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("T", [1, 8, 100])
def test_quant_matmul_kernel_vs_oracle(T):
    rng = np.random.default_rng(3)
    IN, OUT = 256, 512
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((T, IN)), jnp.float32)
    qw, s = quant.quantize_w4a16(w)
    params = {"m.qweight": jnp.asarray(qw), "m.scales": jnp.asarray(s, jnp.bfloat16)}
    ref = np.asarray(jnp.dot(x, quant.dequantize(params, "m").astype(x.dtype)))
    got = np.asarray(
        quant_matmul_pallas(
            x, params["m.qweight"], params["m.scales"], w4=True, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_quant_matmul_int8():
    rng = np.random.default_rng(4)
    IN, OUT = 384, 256  # IN not a multiple of 256 -> tile fallback
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((4, IN)), jnp.float32)
    qw, s = quant.quantize_int8(w)
    params = {"m.qweight": jnp.asarray(qw), "m.scales": jnp.asarray(s, jnp.bfloat16)}
    ref = np.asarray(jnp.dot(x, quant.dequantize(params, "m").astype(x.dtype)))
    got = np.asarray(
        quant_matmul_pallas(
            x, params["m.qweight"], params["m.scales"], w4=False, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_isq_model_generates():
    """Quantized model must produce close logits + valid generation."""
    from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=512,
        max_model_len=128,
        dtype=jnp.float32,
    )
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=4)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                            prefill_chunk_size=64, max_model_len=128)
    eng = LLMEngine(cfg, cache, sched, seed=0)
    qparams = quant.quantize_params(eng.params, method="w4a16")
    assert any(k.endswith(".qweight") for k in qparams)
    assert "model.embed_tokens.weight" in qparams  # kept in bf16
    engq = LLMEngine(cfg, cache, sched, params=qparams, seed=0)

    rng = np.random.default_rng(5)
    p = rng.integers(0, 512, size=12).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    ref = eng.generate([p], sp)[0].outputs[0].token_ids
    got = engq.generate([p], sp)[0].outputs[0].token_ids
    # int4 noise can flip late tokens; the first couple should agree
    assert got[:1] == ref[:1]
    assert len(got) == 6


def _pack_gptq(q_u, group=128):
    """Pack unsigned [in, out] 4-bit values the GPTQ way (8 rows / int32)."""
    n_in, n_out = q_u.shape
    w = np.zeros((n_in // 8, n_out), np.uint32)
    for k in range(8):
        w |= q_u[k::8].astype(np.uint32) << (4 * k)
    return w.view(np.int32)


def _pack_gptq_zeros(z_u, minus_one=True):
    g, n_out = z_u.shape
    zz = (z_u.astype(np.int32) - (1 if minus_one else 0)).astype(np.uint32)
    w = np.zeros((g, n_out // 8), np.uint32)
    for k in range(8):
        w |= zz[:, k::8] << (4 * k)
    return w.view(np.int32)


def test_gptq_conversion_roundtrip():
    rng = np.random.default_rng(7)
    IN, OUT, G = 256, 512, 128
    q_u = rng.integers(0, 16, size=(IN, OUT)).astype(np.uint8)
    z_u = rng.integers(1, 15, size=(IN // G, OUT)).astype(np.uint8)
    s = (rng.random((IN // G, OUT)).astype(np.float32) + 0.5) * 0.01
    # ground truth dequant: w = (q - z) * s
    w_true = (q_u.astype(np.float32) - np.repeat(z_u, G, 0)) * np.repeat(s, G, 0)

    packed, s_out, zoff = quant.convert_gptq_tensor(
        _pack_gptq(q_u), _pack_gptq_zeros(z_u), s
    )
    params = {
        "m.qweight": jnp.asarray(packed),
        "m.scales": jnp.asarray(s_out, jnp.float32),
        "m.qzeros": jnp.asarray(zoff, jnp.float32),
    }
    deq = np.asarray(quant.dequantize(params, "m"))
    np.testing.assert_allclose(deq, w_true, rtol=1e-4, atol=1e-5)

    # fused kernel with zero offsets (interpret)
    x = jnp.asarray(rng.standard_normal((4, IN)), jnp.float32)
    got = np.asarray(
        quant_matmul_pallas(
            x, params["m.qweight"], params["m.scales"], params["m.qzeros"],
            w4=True, interpret=True,
        )
    )
    ref = np.asarray(x, np.float32) @ w_true
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_awq_unpack_order():
    rng = np.random.default_rng(8)
    IN, OUT = 8, 16
    q_u = rng.integers(0, 16, size=(IN, OUT)).astype(np.uint8)
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    packed = np.zeros((IN, OUT // 8), np.uint32)
    for k in range(8):
        packed |= q_u[:, [j * 8 + order[k] for j in range(OUT // 8)]].astype(
            np.uint32
        ) << (4 * k)
    got = quant._unpack_awq_qweight(packed.view(np.int32))
    np.testing.assert_array_equal(got, q_u)


def test_isq_merged_projections():
    from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,  # k/v out = 256: every projection tile-aligned
        vocab_size=512,
        max_model_len=128,
        dtype=jnp.float32,
    )
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=4)
    sched = SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                            prefill_chunk_size=64, max_model_len=128)
    eng = LLMEngine(cfg, cache, sched, seed=0)
    q_split = quant.quantize_params(eng.params, method="w4a16")
    q_merged = quant.quantize_params(eng.params, method="w4a16",
                                     merge_fused=True)
    assert "model.layers.0.self_attn.qkv_proj.qweight" in q_merged
    assert "model.layers.0.mlp.gate_up_proj.qweight" in q_merged
    rng = np.random.default_rng(11)
    p = rng.integers(0, 512, size=10).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    a = LLMEngine(cfg, cache, sched, params=q_split, seed=0).generate([p], sp)
    b = LLMEngine(cfg, cache, sched, params=q_merged, seed=0).generate([p], sp)
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids
