"""Benchmark: single-request decode tok/s on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Methodology (see .claude/skills/verify/SKILL.md — the axon tunnel's
block_until_ready returns early, so): the decode loop runs entirely
on-device (lax.fori_loop feeding each sampled token into the next step's
paged forward — the TPU analogue of the reference's CUDA-graph decode
replay, backend/graph.rs), and wall-clock is measured by differencing two
loop lengths with forced host fetches.

vs_baseline: fraction of the reference's LLaMa-8B BF16 single-request
decode (119 tok/s on Hopper 80G, README.md:88), weight-bandwidth
normalized to this chip: SOL tok/s = HBM_BW / model_bytes, so
vs_baseline = (measured / SOL) * (119_SOL_frac_assumed=1.0) — i.e. we
report measured/SOL_fraction relative to the reference hitting its own
roofline. Until W4A16 lands this benches a ~1.6B BF16 dense model (the
largest that leaves headroom on a 16G v5e alongside growth room).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from candle_vllm_tpu.config import ModelConfig
    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.models.types import StepInput
    from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT, allocate_kv_pages

    PAGE = 128
    CTX = 1024          # prompt length prefc
    DECODE_STEPS = 256  # timed decode span
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=24,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        vocab_size=32768,
        max_model_len=4096,
        dtype=jnp.bfloat16,
    )
    model = get_model(cfg)
    params = model.init_params(seed=0)
    n_pages = cfg.max_model_len // PAGE
    kv_pages = allocate_kv_pages(
        cfg.num_hidden_layers, n_pages + 2, PAGE, cfg.num_key_value_heads,
        cfg.head_dim, dtype=cfg.dtype, pad_head_dim_to=128,
    )
    param_bytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize
                     for p in params.values())

    maxp = n_pages
    page_table = np.arange(1, maxp + 1, dtype=np.int32)[None, :]  # seq 0
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=CTX).astype(np.int32)

    # ---- prefill (one chunk) --------------------------------------------
    S = 8
    pt = np.zeros((S, maxp), np.int32)
    pt[0] = page_table[0]
    positions = np.arange(CTX, dtype=np.int32)
    slot = page_table[0, positions // PAGE] * PAGE + positions % PAGE
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = CTX
    kv_lens = np.zeros(S, np.int32)
    kv_lens[0] = CTX
    prefill_step = StepInput(
        token_ids=jnp.asarray(prompt),
        positions=jnp.asarray(positions),
        slot_mapping=jnp.asarray(slot),
        kv_lens=jnp.asarray(kv_lens),
        page_tables=jnp.asarray(pt),
        cu_q_lens=jnp.asarray(cu),
        logits_idx=jnp.full(S, CTX - 1, dtype=jnp.int32),
    )
    fwd = jax.jit(model.forward, donate_argnums=(1,))
    t0 = time.time()
    logits, kv_pages = fwd(params, kv_pages, prefill_step)
    first_tok = int(np.asarray(jnp.argmax(logits[0])))
    ttft = time.time() - t0  # includes compile; re-measured below

    t0 = time.time()
    logits2, kv_pages = fwd(params, kv_pages, prefill_step)
    _ = np.asarray(logits2[0, 0])
    ttft = time.time() - t0

    # ---- device-resident greedy decode loop -----------------------------
    pt_j = jnp.asarray(pt)

    def decode_loop(params, kv_pages, tok0, start_pos, n):
        T = 8

        def body(i, carry):
            tok, pos, kv = carry
            token_ids = jnp.zeros(T, jnp.int32).at[0].set(tok)
            positions = jnp.zeros(T, jnp.int32).at[0].set(pos)
            slots = jnp.full(T, INVALID_SLOT, jnp.int32).at[0].set(
                pt_j[0, pos // PAGE] * PAGE + pos % PAGE
            )
            kv_lens = jnp.zeros(S, jnp.int32).at[0].set(pos + 1)
            cu = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.ones(S, jnp.int32)]
            )
            step = StepInput(
                token_ids=token_ids,
                positions=positions,
                slot_mapping=slots,
                kv_lens=kv_lens,
                page_tables=pt_j,
                cu_q_lens=cu,
                logits_idx=jnp.zeros(S, jnp.int32),
            )
            logits, kv = model.forward(params, kv, step)
            tok = jnp.argmax(logits[0]).astype(jnp.int32)
            return (tok, pos + 1, kv)

        return jax.lax.fori_loop(0, n, body, (tok0, start_pos, kv_pages))

    loop = jax.jit(decode_loop, donate_argnums=(1,))

    tok, pos, kv_warm = loop(params, kv_pages, jnp.int32(first_tok),
                             jnp.int32(CTX), jnp.int32(8))
    _ = int(np.asarray(tok))  # force full execution (compile + warm)
    t0 = time.time()
    tok_a, pos_a, kv_warm = loop(params, kv_warm, jnp.int32(first_tok),
                                 jnp.int32(CTX), jnp.int32(8))
    _ = int(np.asarray(tok_a))
    d_short = time.time() - t0
    t0 = time.time()
    tok_b, pos_b, kv_warm = loop(params, kv_warm, jnp.int32(first_tok),
                                 jnp.int32(CTX), jnp.int32(8 + DECODE_STEPS))
    _ = int(np.asarray(tok_b))
    d_long = time.time() - t0

    dt = max(d_long - d_short, 1e-9) / DECODE_STEPS
    toks_per_s = 1.0 / dt

    hbm_bw = 819e9  # v5e
    sol_toks = hbm_bw / param_bytes
    result = {
        "metric": "decode_tok_s_1req_1.6B_bf16_1k_ctx",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / sol_toks, 3),
        "notes": {
            "sol_tok_s": round(sol_toks, 1),
            "param_bytes": param_bytes,
            "ttft_ms_1k_prompt": round(ttft * 1e3, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
