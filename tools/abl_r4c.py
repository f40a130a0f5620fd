"""Round-4c ablation: where does FULL_STEP's ~1.75 ms of non-kernel time
live?  prof_r3 measured isolated ops summing to 5.84 ms vs FULL_STEP
7.59 ms.  Hypothesis: the XLA elementwise glue between pallas calls
(norms, rope, residuals — each its own fusion launch + activation
round-trip) costs ~6-9 us per fusion x ~5-7 fusions x 32 layers.

Measures:
  1. qkv kernel alone (baseline from prof_r3)
  2. rmsnorm -> qkv chain (XLA norm fusion + kernel)
  3. residual-add -> rmsnorm -> qkv chain
  4. FULL_STEP at L=4 vs L=12: marginal per-layer cost
     (vs the isolated per-layer sum ~169 us)

Run ON TPU:  PYTHONPATH=. python tools/abl_r4c.py
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
from candle_vllm_tpu.ops.norms import rms_norm
from candle_vllm_tpu.ops.quant import quantized_matmul, random_quantized_params
from tools.prof_r3 import time_op

HIDDEN, INTER, HEADS, KV_HEADS, HD, VOCAB = 4096, 14336, 32, 8, 128, 128256
PAGE, CTX, T = 128, 1024, 8


def cfg_layers(layers, **kw):
    return ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=HIDDEN,
        intermediate_size=INTER, num_hidden_layers=layers,
        num_attention_heads=HEADS, num_key_value_heads=KV_HEADS,
        head_dim=HD, vocab_size=VOCAB, max_model_len=4096,
        dtype=jnp.bfloat16, **kw,
    )


def full_step_time(layers, params=None, model=None, **cfg_kw):
    cfg = cfg_layers(layers, **cfg_kw)
    if model is None:
        model = get_model(cfg)
    if params is None:
        params = random_quantized_params(model, "w4a16", jax.random.PRNGKey(0))
    n_pages = cfg.max_model_len // PAGE
    kv_pages = allocate_kv_pages(layers, n_pages + 2, PAGE, KV_HEADS, HD,
                                 dtype=cfg.dtype, pad_head_dim_to=128)
    kv_lens = jnp.zeros(T, jnp.int32).at[0].set(CTX)
    pt = np.zeros((T, n_pages), np.int32)
    pt[0, : CTX // PAGE] = np.arange(1, CTX // PAGE + 1)
    pt = jnp.asarray(pt)
    cu = jnp.arange(T + 1, dtype=jnp.int32)

    def step_body(c, pr):
        tok, kv = c
        token_ids = jnp.zeros(T, jnp.int32).at[0].set(tok)
        positions = jnp.zeros(T, jnp.int32).at[0].set(CTX)
        slots = jnp.full(T, INVALID_SLOT, jnp.int32).at[0].set(
            pt[0, CTX // PAGE] * PAGE
        )
        s = StepInput(
            token_ids=token_ids, positions=positions, slot_mapping=slots,
            kv_lens=kv_lens, page_tables=pt, cu_q_lens=cu,
            logits_idx=jnp.zeros(T, jnp.int32), decode_only=True,
        )
        logits, kv = model.forward(pr, kv, s)
        return (jnp.argmax(logits[0]).astype(jnp.int32), kv)

    return time_op(step_body, (jnp.int32(5), kv_pages), params,
                   n_lo=4, n_hi=68)


def main():
    print("backend:", jax.default_backend(), flush=True)
    model4 = get_model(cfg_layers(4))
    params4 = random_quantized_params(model4, "w4a16", jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(T, HIDDEN)), jnp.bfloat16)
    r0 = jnp.asarray(rng.normal(size=(T, HIDDEN)), jnp.bfloat16)
    p0 = "model.layers.0"

    def rec(name, dt):
        print(f"{name}: {dt*1e6:.1f} us", flush=True)
        return dt

    def qkv_body(x, pr):
        y = quantized_matmul(x, pr, f"{p0}.self_attn.qkv_proj")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    t_qkv = rec("qkv", time_op(qkv_body, x0, params4))

    def norm_qkv_body(x, pr):
        h = rms_norm(x, pr[f"{p0}.input_layernorm.weight"], 1e-6)
        y = quantized_matmul(h, pr, f"{p0}.self_attn.qkv_proj")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    t_nq = rec("rmsnorm+qkv", time_op(norm_qkv_body, x0, params4))

    def res_norm_qkv_body(x, pr):
        x2 = (x.astype(jnp.float32) + r0.astype(jnp.float32)).astype(x.dtype)
        h = rms_norm(x2, pr[f"{p0}.input_layernorm.weight"], 1e-6)
        y = quantized_matmul(h, pr, f"{p0}.self_attn.qkv_proj")
        return x * (1 + y[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

    t_rnq = rec("residual+rmsnorm+qkv", time_op(res_norm_qkv_body, x0, params4))
    print(f"  norm glue: {1e6*(t_nq-t_qkv):.1f} us; "
          f"residual glue: {1e6*(t_rnq-t_nq):.1f} us", flush=True)

    t4 = rec("FULL_STEP L=4", full_step_time(4, params4, model4))
    t12 = rec("FULL_STEP L=12", full_step_time(12))
    per_layer = (t12 - t4) / 8
    print(f"marginal per-layer: {per_layer*1e6:.1f} us "
          f"(isolated kernel sum ~169 us)", flush=True)
    # rope cost: iRoPE config with no_rope_step=1 skips rope EVERY layer
    # (identical weight bytes, no rope fusions)
    t4n = rec("FULL_STEP L=4 norope", full_step_time(4, no_rope_step=1))
    t12n = rec("FULL_STEP L=12 norope", full_step_time(12, no_rope_step=1))
    print(f"marginal per-layer NOROPE: {(t12n-t4n)/8*1e6:.1f} us "
          f"(rope glue = {((t12-t4)-(t12n-t4n))/8*1e6:.1f} us/layer)",
          flush=True)


if __name__ == "__main__":
    main()
