"""Quantized MoE expert banks: grouped W4 GEMM (kernel + chunked paths)
vs the dequant oracle, bank quantization, and engine E2E (reference:
FusedMoeISQ / moe_gemm_gguf, moe.rs:483+)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from candle_vllm_tpu.ops.quant import (  # noqa: E402
    grouped_quant_matmul,
    quantize_expert_bank,
    quantize_moe_banks,
)


def _bank(rng, E, IN, OUT):
    return (rng.standard_normal((E, IN, OUT)) * 0.1).astype(np.float32)


def _oracle(xs, bank, group_sizes):
    csum = np.concatenate([[0], np.cumsum(group_sizes)])
    out = np.zeros((xs.shape[0], bank.shape[2]), np.float32)
    for e in range(bank.shape[0]):
        lo, hi = csum[e], csum[e + 1]
        if hi > lo:
            out[lo:hi] = xs[lo:hi].astype(np.float32) @ bank[e]
    return out


@pytest.mark.parametrize("R,gs", [
    (16, [0, 5, 0, 3, 8, 0, 0, 0]),        # decode-sized: kernel path
    (8, [8, 0, 0, 0, 0, 0, 0, 0]),         # single expert
    (300, None),                            # chunked dequant path
])
def test_grouped_quant_matmul_matches_oracle(R, gs):
    rng = np.random.default_rng(0)
    E, IN, OUT = 8, 256, 512
    bank = _bank(rng, E, IN, OUT)
    qw, s = quantize_expert_bank(bank)
    deq = np.zeros_like(bank)
    # dequant oracle bank from the quantized form (isolates matmul error
    # from grid error)
    from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp

    for e in range(E):
        deq[e] = np.asarray(dequant_w4_jnp(jnp.asarray(qw[e]),
                                           jnp.asarray(s[e])))
    if gs is None:
        gs = rng.multinomial(R, np.ones(E) / E)
    gs = np.asarray(gs, np.int32)
    assert gs.sum() == R
    xs = (rng.standard_normal((R, IN)) * 0.5).astype(np.float32)
    got = np.asarray(
        grouped_quant_matmul(
            jnp.asarray(xs, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(s, jnp.bfloat16), jnp.asarray(gs)
        ),
        np.float32,
    )
    ref = _oracle(xs, deq, gs)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 4e-2


def test_quantize_moe_banks_param_rewrite():
    rng = np.random.default_rng(1)
    E, H, I = 4, 256, 512
    params = {
        "model.layers.0.mlp.experts.gate_proj": jnp.asarray(_bank(rng, E, H, I)),
        "model.layers.0.mlp.experts.up_proj": jnp.asarray(_bank(rng, E, H, I)),
        "model.layers.0.mlp.experts.down_proj": jnp.asarray(_bank(rng, E, I, H)),
        "model.layers.0.mlp.gate.weight": jnp.zeros((H, E)),
    }
    out = quantize_moe_banks(params)
    assert "model.layers.0.mlp.experts.gate_up_proj.qweight" in out
    assert "model.layers.0.mlp.experts.down_proj.qweight" in out
    assert "model.layers.0.mlp.experts.gate_proj" not in out
    q = out["model.layers.0.mlp.experts.gate_up_proj.qweight"]
    assert q.shape[0] == E and q.dtype == jnp.int8


def test_moe_ffn_quantized_close_to_bf16():
    from candle_vllm_tpu.config import MoEConfig
    from candle_vllm_tpu.models.moe import moe_ffn

    rng = np.random.default_rng(2)
    E, H, I, T = 4, 256, 512, 8
    moe = MoEConfig(num_experts=E, num_experts_per_tok=2,
                    moe_intermediate_size=I)
    params = {
        "m.gate.weight": jnp.asarray(
            rng.standard_normal((H, E)).astype(np.float32) * 0.1
        ),
        "m.experts.gate_proj": jnp.asarray(_bank(rng, E, H, I)),
        "m.experts.up_proj": jnp.asarray(_bank(rng, E, H, I)),
        "m.experts.down_proj": jnp.asarray(_bank(rng, E, I, H)),
    }
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.5, jnp.float32)
    ref = np.asarray(moe_ffn(x, params, "m", moe), np.float32)
    qparams = quantize_moe_banks(params)
    got = np.asarray(moe_ffn(x, qparams, "m", moe), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    # three stacked W4 matmuls on random (worst-case) banks: grid loss
    # compounds — sanity bound only
    assert np.abs(got - ref).max() / denom < 0.3

    # exactness check: the quantized path must match the bf16 path run on
    # the DEQUANTIZED banks (isolates kernel correctness from grid loss)
    from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp

    def deq_bank(prefix):
        qw = qparams[f"{prefix}.qweight"]
        s = qparams[f"{prefix}.scales"]
        return jnp.stack([
            dequant_w4_jnp(qw[e], s[e]) for e in range(qw.shape[0])
        ]).astype(jnp.float32)

    dparams = {
        "m.gate.weight": params["m.gate.weight"],
        "m.experts.gate_up_proj": deq_bank("m.experts.gate_up_proj"),
        "m.experts.down_proj": deq_bank("m.experts.down_proj"),
    }
    dref = np.asarray(moe_ffn(x, dparams, "m", moe), np.float32)
    ddenom = max(np.abs(dref).max(), 1e-6)
    assert np.abs(got - dref).max() / ddenom < 2e-2


def test_gguf_moe_quantized_load_and_generate(tmp_path):
    """GGUF MoE with quantize='w4a16': expert banks land as W4 and the
    model still generates."""
    import struct

    from candle_vllm_tpu.models import gguf
    from tests.test_gguf import (
        _meta_f32, _meta_str, _meta_u32, _t_f32, _gen_smoke, write_gguf,
    )

    rng = np.random.default_rng(7)
    hidden, vocab, heads, kv = 256, 64, 4, 2
    hd = hidden // heads
    E, k, moe_I = 4, 2, 512

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("output.weight", *_t_f32(lin(hidden, vocab))),
    ]
    for i in range(2):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q.weight", *_t_f32(lin(hidden, heads * hd))),
            (f"blk.{i}.attn_k.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_v.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_output.weight", *_t_f32(lin(heads * hd, hidden))),
            (f"blk.{i}.attn_q_norm.weight", *_t_f32(np.ones(hd))),
            (f"blk.{i}.attn_k_norm.weight", *_t_f32(np.ones(hd))),
            (f"blk.{i}.ffn_gate_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_up_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_down_exps.weight",
             *_t_f32(rng.standard_normal((E, hidden, moe_I)) * 0.05)),
            (f"blk.{i}.ffn_gate_inp.weight", *_t_f32(lin(hidden, E))),
        ]
    meta = {
        "general.architecture": _meta_str("qwen3moe"),
        "qwen3moe.embedding_length": _meta_u32(hidden),
        "qwen3moe.feed_forward_length": _meta_u32(64),
        "qwen3moe.block_count": _meta_u32(2),
        "qwen3moe.attention.head_count": _meta_u32(heads),
        "qwen3moe.attention.head_count_kv": _meta_u32(kv),
        "qwen3moe.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "qwen3moe.context_length": _meta_u32(256),
        "qwen3moe.vocab_size": _meta_u32(vocab),
        "qwen3moe.rope.freq_base": _meta_f32(10000.0),
        "qwen3moe.expert_count": _meta_u32(E),
        "qwen3moe.expert_used_count": _meta_u32(k),
        "qwen3moe.expert_feed_forward_length": _meta_u32(moe_I),
    }
    path = tmp_path / "moe_q.gguf"
    write_gguf(str(path), meta, tensors)
    config, params = gguf.load_gguf(str(path), quantize="w4a16")
    assert "model.layers.0.mlp.experts.gate_up_proj.qweight" in params
    assert not any(
        n.endswith(".experts.gate_proj") for n in params
    )
    _gen_smoke(config, params, vocab)
