"""Quantization quality gate: logit divergence of each quantized tier vs
the full-precision baseline on a shared model.

The reference's quality statement is perplexity on real checkpoints
(README.md Q4K/FP8 notes); this environment is zero-egress (no weights on
disk), so the gate measures the same grid loss directly: mean KL of the
next-token distribution and top-1 agreement between the baseline model
and each quantized variant, on identical inputs.  Relative orderings
(int8-KV < int4-KV loss, w4a16 weights ~ small KL) transfer to real
checkpoints; run tools/perplexity.py for absolute ppl once weights are
available.

Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/quant_quality.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(dtype_kv="auto", quantize=None, lm_head=None, seed=0,
          params=None):
    import os

    import jax.numpy as jnp

    from candle_vllm_tpu.config import (
        CacheConfig, ModelConfig, SchedulerConfig,
    )
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    if lm_head:
        os.environ["CVT_LM_HEAD"] = lm_head
    else:
        os.environ.pop("CVT_LM_HEAD", None)
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=128,  # K*D = 1024: turbo3's bitplane layout gate
        vocab_size=2048,
        max_model_len=512,
        dtype=jnp.float32,
    )
    eng = LLMEngine(
        cfg,
        CacheConfig(block_size=16, num_gpu_blocks=128, num_cpu_blocks=0,
                    kv_cache_dtype=dtype_kv),
        SchedulerConfig(max_model_len=512, enable_prefix_caching=False,
                        decode_steps=1),
        seed=seed,
        quantization=quantize,
        params=dict(params) if params is not None else None,
    )
    return eng


def next_token_logits(eng, prompts):
    """Teacher-forced next-token distributions: each prompt runs as TWO
    chunks (the second chunk's attention reads the pages the first chunk
    WROTE — so quantized-KV grid loss shows up), and the final row's
    full-vocab logits come back for divergence metrics.  Fixed tokens, no
    sampling — robust to the near-zero logit margins of random weights."""
    import jax

    from candle_vllm_tpu.engine.input_builder import build_step_input
    from candle_vllm_tpu.engine.scheduler import ScheduledGroup
    from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
    from candle_vllm_tpu.sampling_params import SamplingParams

    fwd = jax.jit(eng.model.forward)
    out_rows = []
    for ids in prompts:
        seq = Sequence(eng._next_seq_id, list(ids))
        eng._next_seq_id += 1
        g = SequenceGroup(f"q-{seq.seq_id}", [seq], SamplingParams())
        eng.block_engine.allocate(seq)
        seq.num_cached_tokens = seq.num_computed_tokens = 0
        cut = len(ids) - 8
        for start, n in ((0, cut), (cut, len(ids) - cut)):
            seq.num_computed_tokens = start
            plan = build_step_input(
                [ScheduledGroup(g, {seq.seq_id: n})],
                eng.block_engine, eng.cache_config.block_size,
                eng.scheduler_config.max_model_len,
            )
            logits, eng.kv_pages = fwd(eng.params, eng.kv_pages, plan.step)
        out_rows.append(np.asarray(logits, np.float32)[0])
        eng.block_engine.free(seq)
    return np.stack(out_rows), [tuple(r) for r in prompts]


def main():
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 2048, size=n).tolist()
               for n in (24, 40, 64, 96)]

    variants = {
        "baseline_f32": dict(),
        "w4a16+int8head": dict(quantize="w4a16"),
        "w4a16+w4head": dict(quantize="w4a16", lm_head="w4a16"),
        "w8a16+int8head": dict(quantize="int8"),
        "kv_int8": dict(dtype_kv="int8"),
        "kv_int4_hadamard": dict(dtype_kv="int4"),
        "kv_turbo3": dict(dtype_kv="turbo3"),
    }
    base_logits = None
    base_rows = None
    results = {}
    base_params = None
    for name, kw in variants.items():
        # quantized variants quantize the BASELINE's weights so the
        # divergence measures grid loss, not different random draws
        eng = build(params=base_params, **kw)
        if base_params is None:
            base_params = eng.params
        logits, rows = next_token_logits(eng, prompts)
        if base_logits is None:
            base_logits, base_rows = logits, rows
            continue
        a, b = base_logits, logits
        la = a - a.max(-1, keepdims=True)
        lb = b - b.max(-1, keepdims=True)
        pa = np.exp(la) / np.exp(la).sum(-1, keepdims=True)
        loga = la - np.log(np.exp(la).sum(-1, keepdims=True))
        logb = lb - np.log(np.exp(lb).sum(-1, keepdims=True))
        kl = float((pa * (loga - logb)).sum(-1).mean())
        top1 = float((a.argmax(-1) == b.argmax(-1)).mean())
        # top-8 overlap: robust to tiny-margin argmax flips
        ta = np.argsort(-a, -1)[:, :8]
        tb = np.argsort(-b, -1)[:, :8]
        ov = np.mean([len(set(x) & set(y)) / 8.0 for x, y in zip(ta, tb)])
        results[name] = {
            "kl_vs_baseline": round(kl, 6),
            "top1_agreement": round(top1, 4),
            "top8_overlap": round(float(ov), 4),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)
    return results


if __name__ == "__main__":
    main()
