"""Fused RMSNorm prologue / residual epilogue in the decode kernels.

The XLA glue between pallas calls (input norm, residual add,
post-attention norm) measured ~46 us/layer of the decode step
(tools/abl_r4c.py: marginal per-layer 214.8 us vs isolated kernel sum
~169 us); fusing them into the quant-matmul / fused-MLP kernels removes
four fusion launches per layer.  Reference keeps these as separate CUDA
launches (candle's fused add-rmsnorm analogue: layers/others.rs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.ops.norms import rms_norm
from candle_vllm_tpu.ops.pallas.quant_matmul import (
    dequant_int8_jnp,
    dequant_w4_jnp,
    quant_matmul_pallas,
)
from candle_vllm_tpu.ops.quant import quantize_int8, quantize_w4a16

RNG = np.random.default_rng(0)


def _mk(IN, OUT, T):
    w = (RNG.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((T, IN)) * 0.5, jnp.float32)
    nw = jnp.asarray(RNG.standard_normal(IN) * 0.1 + 1.0, jnp.float32)
    res = jnp.asarray(RNG.standard_normal((T, OUT)) * 0.3, jnp.float32)
    return w, x, nw, res


@pytest.mark.parametrize("T", [3, 8, 96])  # decode, padded decode, prefill
def test_quant_matmul_norm_residual_w4(T):
    IN, OUT = 512, 1024
    w, x, nw, res = _mk(IN, OUT, T)
    qw, s = quantize_w4a16(w)
    wd = np.asarray(dequant_w4_jnp(jnp.asarray(qw), jnp.asarray(s)))
    ref = np.asarray(rms_norm(x, nw), np.float32) @ wd + np.asarray(res)
    got = np.asarray(quant_matmul_pallas(
        x, jnp.asarray(qw), jnp.asarray(s), w4=True,
        norm_w=nw, residual=res, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=0, atol=np.abs(ref).max() * 0.02)


def test_quant_matmul_norm_only_and_residual_only_int8():
    IN, OUT, T = 512, 1024, 8
    w, x, nw, res = _mk(IN, OUT, T)
    qw, s = quantize_int8(w)
    wd = np.asarray(dequant_int8_jnp(jnp.asarray(qw), jnp.asarray(s)))
    ref_n = np.asarray(rms_norm(x, nw), np.float32) @ wd
    got_n = np.asarray(quant_matmul_pallas(
        x, jnp.asarray(qw), jnp.asarray(s), w4=False, norm_w=nw,
        interpret=True))
    np.testing.assert_allclose(
        got_n, ref_n, atol=np.abs(ref_n).max() * 0.02)
    ref_r = np.asarray(x) @ wd + np.asarray(res)
    got_r = np.asarray(quant_matmul_pallas(
        x, jnp.asarray(qw), jnp.asarray(s), w4=False, residual=res,
        interpret=True))
    np.testing.assert_allclose(
        got_r, ref_r, atol=np.abs(ref_r).max() * 0.02)


@pytest.mark.parametrize("T", [8, 96])
def test_quant_matmul_rope_epilogue(T):
    """Fused qkv rope epilogue == matmul then apply_rope on q and k
    (v columns pass through)."""
    from candle_vllm_tpu.ops.rope import RopeSpec, apply_rope

    H, K, D, IN = 2, 1, 128, 256
    OUT = (H + 2 * K) * D  # packed qkv: 512
    w, x, nw, _ = _mk(IN, OUT, T)
    qw, s = quantize_w4a16(w, tile_out=256)
    wd = np.asarray(dequant_w4_jnp(jnp.asarray(qw), jnp.asarray(s)))
    pos = jnp.asarray(RNG.integers(0, 1000, size=T), jnp.int32)
    spec = RopeSpec(rotary_dim=D, inv_freq=tuple(
        10000.0 ** (-2.0 * i / D) for i in range(D // 2)))
    from candle_vllm_tpu.ops.rope import compute_cos_sin

    cos, sin = compute_cos_sin(pos, spec)
    y = jnp.asarray(np.asarray(x) @ wd, jnp.float32)
    q = apply_rope(y[:, : H * D].reshape(T, H, D), cos, sin, spec)
    k = apply_rope(
        y[:, H * D : (H + K) * D].reshape(T, K, D), cos, sin, spec)
    ref = np.concatenate(
        [np.asarray(q).reshape(T, H * D), np.asarray(k).reshape(T, K * D),
         np.asarray(y[:, (H + K) * D :])], axis=1)

    c2 = jnp.concatenate([cos, cos], -1)
    s2 = jnp.concatenate([-sin, sin], -1)
    c_full = jnp.concatenate(
        [jnp.tile(c2, (1, H + K)), jnp.ones((T, K * D), c2.dtype)], axis=1)
    s_full = jnp.concatenate(
        [jnp.tile(s2, (1, H + K)), jnp.zeros((T, K * D), s2.dtype)], axis=1)
    got = np.asarray(quant_matmul_pallas(
        x, jnp.asarray(qw), jnp.asarray(s), w4=True,
        rope_cs=(c_full, s_full), interpret=True))
    np.testing.assert_allclose(
        got, ref, atol=np.abs(ref).max() * 0.02)


def test_fused_mlp_norm_residual():
    from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4

    H, I, T = 512, 1024, 8
    gate = (RNG.standard_normal((H, I)) * 0.05).astype(np.float32)
    up = (RNG.standard_normal((H, I)) * 0.05).astype(np.float32)
    down = (RNG.standard_normal((I, H)) * 0.05).astype(np.float32)
    gu_q, gu_s = quantize_w4a16(np.concatenate([gate, up], 1), tile_out=512)
    dn_q, dn_s = quantize_w4a16(down, tile_out=512)
    x = jnp.asarray(RNG.standard_normal((T, H)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(RNG.standard_normal(H) * 0.1 + 1.0, jnp.float32)
    res = jnp.asarray(RNG.standard_normal((T, H)) * 0.3, jnp.bfloat16)

    gud = np.asarray(dequant_w4_jnp(jnp.asarray(gu_q), jnp.asarray(gu_s)))
    dnd = np.asarray(dequant_w4_jnp(jnp.asarray(dn_q), jnp.asarray(dn_s)))
    xn = np.asarray(rms_norm(x, nw), np.float32)
    g, u = xn @ gud[:, :I], xn @ gud[:, I:]
    ref = (g / (1 + np.exp(-g)) * u) @ dnd + np.asarray(res, np.float32)
    got = np.asarray(fused_mlp_w4(
        x, jnp.asarray(gu_q), jnp.asarray(gu_s), jnp.asarray(dn_q),
        jnp.asarray(dn_s), norm_w=nw, residual=res, interpret=True),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=np.abs(ref).max() * 0.06)


def test_model_glue_fusion_matches_unfused():
    """forward through the plain_glue path == composing the same math by
    hand (the CPU fallback wiring; the kernels are covered above)."""
    from candle_vllm_tpu.config import ModelConfig
    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
    from candle_vllm_tpu.ops.quant import quantize_params
    from tests.test_tensor_parallel import PAGE, make_inputs

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=256,
        intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
        vocab_size=128, max_model_len=128, dtype=jnp.float32,
    )
    model = get_model(cfg)
    params = quantize_params(model.init_params(seed=2), method="w4a16")
    prompt = RNG.integers(0, 128, size=9).tolist()
    step = make_inputs(cfg, prompt)
    kv = allocate_kv_pages(2, 32, PAGE, 2, 64, dtype=jnp.float32)
    logits, _ = model.forward(params, kv, step)
    assert np.isfinite(np.asarray(logits)).all()

    # hand-composed single layer: norm -> qkv ... o + residual must equal
    # attention_block's fused form
    from candle_vllm_tpu.models.layers import (
        attention_block, make_attn_specs,
    )
    from candle_vllm_tpu.ops.rope import compute_cos_sin

    spec = make_attn_specs(cfg)[0]
    Tpad = int(step.token_ids.shape[0])  # bucket-padded batch rows
    x = jnp.asarray(RNG.standard_normal((Tpad, 256)) * 0.5, jnp.float32)
    nw = params["model.layers.0.input_layernorm.weight"]
    cs = compute_cos_sin(step.positions, model.rope)
    kv1 = allocate_kv_pages(1, 32, PAGE, 2, 64, dtype=jnp.float32)
    fused_out, _ = attention_block(
        x, params, "model.layers.0.self_attn", spec, model.rope, cs,
        kv1[0], step, norm_w=nw, norm_eps=cfg.rms_norm_eps, residual=x,
    )
    kv2 = allocate_kv_pages(1, 32, PAGE, 2, 64, dtype=jnp.float32)
    manual, _ = attention_block(
        rms_norm(x, nw, cfg.rms_norm_eps), params,
        "model.layers.0.self_attn", spec, model.rope, cs, kv2[0], step,
    )
    manual = (manual.astype(jnp.float32) + x.astype(jnp.float32)).astype(
        manual.dtype
    )
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(manual), rtol=2e-4, atol=2e-4
    )
