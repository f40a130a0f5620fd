"""Layer megakernel (o_proj + residual + norm + MLP) vs the unfused
oracle path, interpret mode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from candle_vllm_tpu.ops.pallas.fused_layer import fused_o_mlp_w4  # noqa: E402
from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp  # noqa: E402
from candle_vllm_tpu.ops.quant import pack_int4, tile_packed_w4  # noqa: E402


def _rand_w4(rng, n_in, n_out, to, g=128):
    q = rng.integers(-8, 8, size=(n_in, n_out)).astype(np.int8)
    s = rng.uniform(0.005, 0.02, size=(n_in // g, n_out)).astype(np.float32)
    qw = jnp.asarray(tile_packed_w4(pack_int4(q, to), to))
    return qw, jnp.asarray(s)


@pytest.mark.parametrize("T", [1, 8])
def test_fused_layer_matches_oracle(T):
    rng = np.random.default_rng(0)
    H, HA, I, TO = 2048, 1024, 4096, 512
    eps = 1e-6
    o_q, o_s = _rand_w4(rng, HA, H, TO)
    # gate_up bank: gate tiles then up tiles along the tile axis
    g_q, g_s = _rand_w4(rng, H, I, TO)
    u_q, u_s = _rand_w4(rng, H, I, TO)
    gu_q = jnp.concatenate([g_q, u_q], axis=0)
    gu_s = jnp.concatenate([g_s, u_s], axis=1)
    dn_q, dn_s = _rand_w4(rng, I, H, TO)
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.bfloat16)
    attn = jnp.asarray(rng.normal(size=(T, HA)), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32)

    got = np.asarray(
        fused_o_mlp_w4(x, attn, o_q, o_s, gu_q, gu_s, dn_q, dn_s, nw,
                       eps=eps),
        np.float32,
    )

    # oracle: exact dequant + f32 matmuls, same residual/norm structure
    wo = dequant_w4_jnp(o_q, o_s)
    wg = dequant_w4_jnp(g_q, g_s)
    wu = dequant_w4_jnp(u_q, u_s)
    wd = dequant_w4_jnp(dn_q, dn_s)
    xf = np.asarray(x, np.float32)
    x2 = (xf + np.asarray(attn, np.float32) @ np.asarray(wo)).astype(
        jnp.bfloat16
    ).astype(np.float32)
    scale = 1.0 / np.sqrt((x2 * x2).mean(axis=1, keepdims=True) + eps)
    h = (x2 * scale * np.asarray(nw)).astype(jnp.bfloat16).astype(np.float32)
    gate = h @ np.asarray(wg)
    up = h @ np.asarray(wu)
    act = gate / (1 + np.exp(-gate)) * up
    ref = x2 + act @ np.asarray(wd)

    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 4e-2, rel


@pytest.mark.parametrize("T", [8])
def test_fused_layer_qkv_chain_matches_oracle(T):
    """Phase 4: the next layer's input-norm + qkv projection join the
    weight stream; (residual, qkv) must match the unfused oracle."""
    rng = np.random.default_rng(1)
    H, HA, I, TO = 2048, 1024, 4096, 512
    OQ = 1536  # qkv width
    eps = 1e-6
    o_q, o_s = _rand_w4(rng, HA, H, TO)
    g_q, g_s = _rand_w4(rng, H, I, TO)
    u_q, u_s = _rand_w4(rng, H, I, TO)
    gu_q = jnp.concatenate([g_q, u_q], axis=0)
    gu_s = jnp.concatenate([g_s, u_s], axis=1)
    dn_q, dn_s = _rand_w4(rng, I, H, TO)
    qk_q, qk_s = _rand_w4(rng, H, OQ, TO)
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.bfloat16)
    attn = jnp.asarray(rng.normal(size=(T, HA)), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32)
    n2w = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32)

    got_x, got_qkv = fused_o_mlp_w4(
        x, attn, o_q, o_s, gu_q, gu_s, dn_q, dn_s, nw,
        qkv_q=qk_q, qkv_s=qk_s, norm2_w=n2w, eps=eps,
    )
    got_x = np.asarray(got_x, np.float32)
    got_qkv = np.asarray(got_qkv, np.float32)

    wo = dequant_w4_jnp(o_q, o_s)
    wg = dequant_w4_jnp(g_q, g_s)
    wu = dequant_w4_jnp(u_q, u_s)
    wd = dequant_w4_jnp(dn_q, dn_s)
    wq = dequant_w4_jnp(qk_q, qk_s)
    xf = np.asarray(x, np.float32)
    x2 = (xf + np.asarray(attn, np.float32) @ np.asarray(wo)).astype(
        jnp.bfloat16
    ).astype(np.float32)
    scale = 1.0 / np.sqrt((x2 * x2).mean(axis=1, keepdims=True) + eps)
    h = (x2 * scale * np.asarray(nw)).astype(jnp.bfloat16).astype(np.float32)
    gate = h @ np.asarray(wg)
    act = gate / (1 + np.exp(-gate)) * (h @ np.asarray(wu))
    x3 = (x2 + act @ np.asarray(wd)).astype(jnp.bfloat16).astype(np.float32)
    s3 = 1.0 / np.sqrt((x3 * x3).mean(axis=1, keepdims=True) + eps)
    h3 = (x3 * s3 * np.asarray(n2w)).astype(jnp.bfloat16).astype(np.float32)
    ref_qkv = h3 @ np.asarray(wq)

    rel_x = np.abs(got_x - x3).max() / max(np.abs(x3).max(), 1e-9)
    rel_q = np.abs(got_qkv - ref_qkv).max() / max(np.abs(ref_qkv).max(), 1e-9)
    assert rel_x < 4e-2, rel_x
    assert rel_q < 6e-2, rel_q
