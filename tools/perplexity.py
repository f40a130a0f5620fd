"""Perplexity harness — the quality bar for quantized weights/KV.

Computes token-level NLL/perplexity of a model over a token stream by
driving ``model.forward`` directly with all-position logits (the engine
path gathers only sampled rows).  Used to hold the W4A16 / int8 / int4-KV
quality bar (reference analogue: candle-vllm quality checks are manual;
README.md:267-291 quotes TurboQuant quality claims).

Usage:
  python tools/perplexity.py --dummy-model llama-8b --isq w4a16 \
      --tokens tokens.npy --window 1024
  python tools/perplexity.py --model-dir /path/to/hf --kvcache-dtype int8
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

sys.path.insert(0, ".")


def _make_step(tokens: np.ndarray, page_size: int, num_pages: int):
    import jax.numpy as jnp

    from candle_vllm_tpu.models.types import StepInput

    T = len(tokens)
    n_pages = -(-T // page_size)
    assert n_pages <= num_pages
    pt = np.zeros((1, num_pages), np.int32)
    pt[0, :n_pages] = np.arange(n_pages)
    return StepInput(
        token_ids=jnp.asarray(tokens, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        page_tables=jnp.asarray(pt),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        logits_idx=jnp.arange(T, dtype=jnp.int32),
    )


def compute_perplexity(
    model, params, tokens: np.ndarray, window: int = 1024,
    kv_cache_dtype: str = "auto", page_size: int = 128,
) -> dict:
    """Sliding non-overlapping windows; predicts tokens[1:] within each
    window.  Returns {nll, ppl, tokens}."""
    import jax
    import jax.numpy as jnp

    from candle_vllm_tpu.ops.kv_cache import (
        allocate_kv_pages,
        allocate_kv_pages_int4,
        allocate_kv_scales,
    )

    cfg = model.config
    if cfg.kv_cache_dtype != kv_cache_dtype:
        # layer specs bake in the cache dtype (int4 nibble packing)
        import copy

        from candle_vllm_tpu.models.registry import get_model

        cfg = copy.copy(cfg)
        cfg.kv_cache_dtype = kv_cache_dtype
        model = get_model(cfg)
    kh, kd = model.kv_cache_spec()
    num_pages = -(-window // page_size) + 1
    pad = 128 if jax.default_backend() == "tpu" else 1
    shared = bool(getattr(model, "kv_shared", False))

    def fresh_pages():
        if kv_cache_dtype == "int4":
            pages = allocate_kv_pages_int4(
                cfg.num_hidden_layers, num_pages, page_size, kh, kd,
                pad_head_dim_to=pad,
                pad_planes_to=4 if pad > 1 else 1)
            scales = allocate_kv_scales(
                cfg.num_hidden_layers, num_pages, page_size, kh,
                pad_planes_to=8 if pad > 1 else 1)
            return list(zip(pages, scales))
        if kv_cache_dtype == "int8":
            pages = allocate_kv_pages(
                cfg.num_hidden_layers, num_pages, page_size, kh, kd,
                dtype=jnp.int8, pad_head_dim_to=pad,
                pad_planes_to=4 if pad > 1 else 1, kv_shared=shared)
            scales = allocate_kv_scales(
                cfg.num_hidden_layers, num_pages, page_size, kh,
                pad_planes_to=8 if pad > 1 else 1, kv_shared=shared)
            return list(zip(pages, scales))
        return allocate_kv_pages(
            cfg.num_hidden_layers, num_pages, page_size, kh, kd,
            dtype=cfg.dtype, pad_head_dim_to=pad, kv_shared=shared)

    @jax.jit
    def window_nll(params, kv_pages, step, targets, n_valid):
        logits, _ = model.forward(params, kv_pages, step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp[:-1], targets[:, None], axis=-1)
        mask = jnp.arange(tok_lp.shape[0]) < n_valid
        return -jnp.sum(jnp.where(mask, tok_lp[:, 0], 0.0))

    total_nll, total_tok = 0.0, 0
    for s in range(0, max(len(tokens) - 1, 1), window):
        w = tokens[s : s + window]
        if len(w) < 2:
            break
        padded = np.zeros(window, w.dtype)
        padded[: len(w)] = w
        targets = np.zeros(window - 1, np.int32)
        targets[: len(w) - 1] = w[1:]
        n_pred = len(w) - 1
        step = _make_step(padded, page_size, num_pages)
        nll = float(np.asarray(window_nll(
            params, fresh_pages(), step, jnp.asarray(targets),
            jnp.int32(n_pred),
        )))
        total_nll += nll
        total_tok += n_pred
    nll_per_tok = total_nll / max(total_tok, 1)
    return {
        "nll": round(nll_per_tok, 4),
        "ppl": round(math.exp(min(nll_per_tok, 30.0)), 4),
        "tokens": total_tok,
    }


def main() -> None:
    import jax.numpy as jnp

    from candle_vllm_tpu.models.registry import get_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir")
    ap.add_argument("--gguf")
    ap.add_argument("--dummy-model", help="random weights (sanity only)")
    ap.add_argument("--isq", choices=["w4a16", "int8"])
    ap.add_argument("--kvcache-dtype", default="auto",
                    choices=["auto", "int8", "int4"])
    ap.add_argument("--tokens", help=".npy int token file (else synthetic)")
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--limit", type=int, default=16384)
    args = ap.parse_args()

    if args.gguf:
        from candle_vllm_tpu.models.gguf import load_gguf

        cfg, params = load_gguf(args.gguf, quantize=args.isq or "w4a16")
        model = get_model(cfg)
    elif args.model_dir:
        import json as _json
        import os as _os

        from candle_vllm_tpu.config import ModelConfig
        from candle_vllm_tpu.models.weights import load_safetensors

        with open(_os.path.join(args.model_dir, "config.json")) as f:
            cfg = ModelConfig.from_hf(_json.load(f))
        model = get_model(cfg)
        params = load_safetensors(args.model_dir, dtype=cfg.dtype,
                                  config=cfg, quantize=args.isq,
                                  fixup=getattr(model, "checkpoint_fixup", None))
    else:
        import jax.numpy as _jnp

        from candle_vllm_tpu.config import ModelConfig
        from candle_vllm_tpu.server.__main__ import DUMMY_PRESETS

        h, i, l, a, k, d, v = DUMMY_PRESETS[args.dummy_model or "tiny"]
        cfg = ModelConfig(
            architecture="LlamaForCausalLM", hidden_size=h,
            intermediate_size=i, num_hidden_layers=l,
            num_attention_heads=a, num_key_value_heads=k, head_dim=d,
            vocab_size=max(v, 259), max_model_len=8192, dtype=_jnp.bfloat16,
        )
        model = get_model(cfg)
        if args.isq:
            from candle_vllm_tpu.ops.quant import random_quantized_params
            import jax

            params = random_quantized_params(
                model, args.isq, jax.random.PRNGKey(0))
        else:
            params = model.init_params(seed=0)

    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int64)[: args.limit]
    else:
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, cfg.vocab_size, size=args.limit)

    out = compute_perplexity(model, params, tokens, window=args.window,
                             kv_cache_dtype=args.kvcache_dtype)
    out["config"] = {
        "isq": args.isq, "kvcache_dtype": args.kvcache_dtype,
        "window": args.window,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
