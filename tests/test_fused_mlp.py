"""Fused W4A16 decode-MLP megakernel vs the dequant oracle (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4
from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp


def run_case(H, I, TO=256, T=8, seed=0):
    rng = np.random.default_rng(seed)
    gu_q = rng.integers(-128, 127, size=(2 * I // TO, H, TO // 2),
                        dtype=np.int8)
    gu_s = (rng.normal(size=(H // 128, 2 * I)) * 0.01).astype(np.float32)
    dn_q = rng.integers(-128, 127, size=(H // TO, I, TO // 2),
                        dtype=np.int8)
    dn_s = (rng.normal(size=(I // 128, H)) * 0.01).astype(np.float32)
    x = rng.normal(size=(T, H)).astype(np.float32)
    got = np.asarray(
        fused_mlp_w4(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(gu_q),
            jnp.asarray(gu_s), jnp.asarray(dn_q), jnp.asarray(dn_s),
        )
    )
    wgu = np.asarray(dequant_w4_jnp(jnp.asarray(gu_q), jnp.asarray(gu_s)))
    wdn = np.asarray(dequant_w4_jnp(jnp.asarray(dn_q), jnp.asarray(dn_s)))
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    gu = xb @ wgu
    g, u = gu[:, :I], gu[:, I:]
    want = ((g / (1 + np.exp(-g))) * u) @ wdn
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-2, (H, I, TO, T, rel)


def test_single_tile():
    run_case(256, 256)


def test_multi_gu_tiles():
    run_case(256, 1024)


def test_multi_down_tiles():
    run_case(512, 256)


def test_odd_intermediate():
    run_case(512, 1792)  # I not a multiple of the chunk cap


def test_decode_t1():
    run_case(512, 1024, T=1)
