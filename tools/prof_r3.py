"""Decode-step budget profiler: times each sub-op of the 8B W4A16 decode
layer with the real model arrays, plus the full step, in ONE process.

Run ON TPU:  PYTHONPATH=. python tools/prof_r3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT, allocate_kv_pages
from candle_vllm_tpu.ops.quant import random_quantized_params




def time_op(make_body, carry0, extras, n_lo=8, n_hi=264):
    """extras are passed as jit ARGUMENTS so weights become XLA
    parameters, not HLO literals (the remote-compile request body has a
    hard size limit)."""

    @jax.jit
    def loop(c, extras, n):
        return jax.lax.fori_loop(
            0, n, lambda k, c: make_body(c, extras), c
        )

    def run(n):
        return np.asarray(jax.tree_util.tree_leaves(
            loop(carry0, extras, jnp.int32(n))
        )[0])

    run(n_lo)
    t0 = time.time()
    run(n_lo)
    d_lo = time.time() - t0
    t0 = time.time()
    run(n_hi)
    d_hi = time.time() - t0
    return (d_hi - d_lo) / (n_hi - n_lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    hidden, inter, layers, heads, kv_heads, head_dim, vocab = (
        4096, 14336, 32, 32, 8, 128, 128256
    )
    PAGE, CTX = 128, 1024
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=hidden,
        intermediate_size=inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, vocab_size=vocab, max_model_len=4096,
        dtype=jnp.bfloat16,
    )
    model = get_model(cfg)
    params = random_quantized_params(model, "w4a16", jax.random.PRNGKey(0))
    n_pages = cfg.max_model_len // PAGE
    kv_pages = allocate_kv_pages(layers, n_pages + 2, PAGE, kv_heads,
                                 head_dim, dtype=cfg.dtype,
                                 pad_head_dim_to=128)
    rng = np.random.default_rng(0)
    T = 8
    x0 = jnp.asarray(rng.normal(size=(T, hidden)), jnp.bfloat16)
    a0 = jnp.asarray(rng.normal(size=(T, heads * head_dim)), jnp.bfloat16)

    p0 = "model.layers.0"
    results = {}

    # qkv quant matmul
    from candle_vllm_tpu.ops.quant import quantized_matmul

    def rec(name, dt):
        results[name] = dt
        print(f"{name}: {dt*1e6:.1f} us", flush=True)

    def qkv_body(x, pr):
        y = quantized_matmul(x, pr, f"{p0}.self_attn.qkv_proj")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    rec("qkv(4096->6144)", time_op(qkv_body, x0, params))

    def o_body(x, pr):
        y = quantized_matmul(x, pr, f"{p0}.self_attn.o_proj")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    rec("o(4096->4096)", time_op(o_body, x0, params))

    # fused layer megakernel (o + norm + mlp)
    from candle_vllm_tpu.models.layers import fused_layer_tail

    def mega_body(c, pr):
        x, a = c
        y = fused_layer_tail(x, a, pr, p0, 1e-6)
        return (y.astype(jnp.bfloat16), a)

    rec("megalayer(o+norm+mlp 96MB)",
        time_op(mega_body, (x0, a0), params))

    # fused MLP alone
    from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4

    def mlp_body(x, pr):
        y = fused_mlp_w4(
            x, pr[f"{p0}.mlp.gate_up_proj.qweight"],
            pr[f"{p0}.mlp.gate_up_proj.scales"],
            pr[f"{p0}.mlp.down_proj.qweight"],
            pr[f"{p0}.mlp.down_proj.scales"],
        )
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    rec("fused_mlp(88MB)", time_op(mlp_body, x0, params))

    # attention (unified kernel, decode row, 1k ctx)
    from candle_vllm_tpu.ops.attention import AttentionSpec, ragged_paged_attention

    spec = AttentionSpec(num_q_heads=heads, num_kv_heads=kv_heads,
                         head_dim=head_dim, sm_scale=head_dim ** -0.5)
    q0 = jnp.asarray(rng.normal(size=(T, heads, head_dim)), jnp.bfloat16)
    kv1 = kv_pages[0]
    kv_lens = jnp.zeros(T, jnp.int32).at[0].set(CTX)
    pt = np.zeros((T, n_pages), np.int32)
    pt[0, :CTX // PAGE] = np.arange(1, CTX // PAGE + 1)
    pt = jnp.asarray(pt)
    cu = jnp.arange(T + 1, dtype=jnp.int32)

    def attn_body(q, kvx):
        y = ragged_paged_attention(q, kvx, kv_lens, pt, cu, spec=spec,
                                   decode_only=True)
        return q * (1 + y[0, 0, 0].astype(jnp.float32) * 1e-24).astype(q.dtype)

    rec("attention(1k ctx)", time_op(attn_body, q0, kv1))

    # attention + write_kv (the real per-layer call)
    from candle_vllm_tpu.models.layers import paged_attention_with_write

    k0 = jnp.asarray(rng.normal(size=(T, kv_heads, head_dim)), jnp.bfloat16)
    slots0 = jnp.full(T, INVALID_SLOT, jnp.int32).at[0].set(
        int(pt[0, CTX // PAGE - 1]) * PAGE
    )
    step0 = StepInput(
        token_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.zeros(T, jnp.int32).at[0].set(CTX - 1),
        slot_mapping=slots0,
        kv_lens=kv_lens, page_tables=pt, cu_q_lens=cu,
        logits_idx=jnp.zeros(T, jnp.int32), decode_only=True,
    )

    def attnw_body(c, unused):
        q, kvx = c
        y, kvx = paged_attention_with_write(q, k0, k0, kvx, step0, spec)
        q = q * (1 + y[0, 0, 0].astype(jnp.float32) * 1e-24).astype(q.dtype)
        return (q, kvx)

    rec("attention+write_kv", time_op(attnw_body, (q0, kv1), x0))

    from candle_vllm_tpu.ops.kv_cache import write_kv

    def write_body(c, unused):
        q, kvx = c
        kvx = write_kv(kvx, k0 * (1 + q[0, 0, 0] * 1e-24).astype(k0.dtype),
                       k0, step0.slot_mapping)
        return (q * (1 + kvx[0, 0, 0, 0].astype(jnp.float32) * 1e-24
                     ).astype(q.dtype), kvx)

    rec("write_kv_alone", time_op(write_body, (q0, kv1), x0))

    # lm_head int8
    def lm_body(x, pr):
        y = quantized_matmul(x, pr, "lm_head")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    rec("lm_head(int8 525MB)", time_op(lm_body, x0, params))

    # full decode step (model.forward)
    pt_full = pt
    def step_body(c, pr):
        tok, kv = c
        token_ids = jnp.zeros(T, jnp.int32).at[0].set(tok)
        positions = jnp.zeros(T, jnp.int32).at[0].set(CTX)
        slots = jnp.full(T, INVALID_SLOT, jnp.int32).at[0].set(
            pt_full[0, CTX // PAGE] * PAGE
        )
        s = StepInput(
            token_ids=token_ids, positions=positions, slot_mapping=slots,
            kv_lens=kv_lens, page_tables=pt_full, cu_q_lens=cu,
            logits_idx=jnp.zeros(T, jnp.int32), decode_only=True,
        )
        logits, kv = model.forward(pr, kv, s)
        return (jnp.argmax(logits[0]).astype(jnp.int32), kv)

    rec("FULL_STEP", time_op(step_body, (jnp.int32(5), kv_pages), params,
                             n_lo=4, n_hi=68))

    per_layer = (results["qkv(4096->6144)"]
                 + results["megalayer(o+norm+mlp 96MB)"]
                 + results["attention(1k ctx)"])
    total = per_layer * 32 + results["lm_head(int8 525MB)"]
    print(f"sum(32x(qkv+mega+attn)+lm_head) = {total*1e3:.2f} ms "
          f"vs FULL_STEP {results['FULL_STEP']*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
