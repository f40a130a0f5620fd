"""Profile the engine's HOST cost per decode dispatch on the real TPU.

The pipelined engine hides host work behind device compute, but the
host cost is the serving ceiling once the device gets faster (spec
decode, aggregate).  bench.py measured ~33 ms/dispatch at 1k ctx and
~43-47 ms at 4k — this isolates where it goes (cProfile over the step
loop; the device fetch rows are attributed to jax's blocking calls).

Run (one TPU client at a time):  python tools/prof_host_r5.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from candle_vllm_tpu.config import (
        CacheConfig, ModelConfig, SchedulerConfig,
    )
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.ops.quant import random_quantized_params
    from candle_vllm_tpu.sampling_params import SamplingParams

    CTX = int(os.environ.get("PROF_CTX", "4096"))
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        vocab_size=128256, max_model_len=CTX + 2048, dtype=jnp.bfloat16,
    )
    model = get_model(cfg)
    params = random_quantized_params(model, "w4a16", jax.random.PRNGKey(0))
    eng = LLMEngine(
        cfg,
        CacheConfig(block_size=128,
                    num_gpu_blocks=(CTX + 2048) // 128 + 8,
                    num_cpu_blocks=0),
        SchedulerConfig(max_model_len=CTX + 2048,
                        enable_prefix_caching=False),
        params=params,
    )
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=CTX).astype(np.int32)
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=1500)
    eng.add_request("p", prompt_token_ids=list(prompt), sampling_params=sp)
    eng.step()  # prefill + compile
    for _ in range(8):
        eng.step()  # warm decode variants

    N = 40
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    for _ in range(N):
        eng.step()
    pr.disable()
    wall = time.time() - t0
    print(f"\n=== {N} steps, {wall*1e3/N:.1f} ms/step wall (ctx {CTX}) ===")
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    st.print_stats(28)
    print(s.getvalue())


if __name__ == "__main__":
    main()
