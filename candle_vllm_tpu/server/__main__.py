"""Server CLI: ``python -m candle_vllm_tpu.server``.

Re-designs the reference's clap CLI (``/root/reference/src/main.rs:32-197``):
model source flags, dtype, KV sizing, scheduler knobs, TP size, port —
wired into engine construction mirroring main.rs:242-916 startup.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from aiohttp import web


DUMMY_PRESETS = {
    # name -> (hidden, inter, layers, heads, kv_heads, head_dim, vocab)
    # tiny vocab == ByteTokenizer range so random-weight decode yields text
    "tiny": (256, 512, 2, 4, 2, 64, 259),
    "qwen2-0.5b": (896, 4864, 24, 14, 2, 64, 151936),
    "llama-1b": (2048, 8192, 16, 32, 8, 64, 128256),
    "llama-8b": (4096, 14336, 32, 32, 8, 128, 128256),
}


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("candle-vllm-tpu server")
    p.add_argument("--model-dir", help="local HF model directory (config.json + safetensors)")
    p.add_argument("--gguf", help="local GGUF checkpoint (Q4_K/Q6_K/Q8_0/F16)")
    # hub download arm (reference: --m/--f/--hf-token, main.rs +
    # pipeline.rs:520-702 download_model/download_gguf_model)
    p.add_argument("--m", dest="model_id", default=None,
                   help="HF hub model id (org/name); downloads config + "
                        "safetensors into the local cache, or — with "
                        "--f — a GGUF file set")
    p.add_argument("--f", dest="weight_file", default=None,
                   help="GGUF filename (or subfolder) inside the --m repo")
    p.add_argument("--revision", default="main",
                   help="hub revision/branch for --m")
    p.add_argument("--hf-token", default=None,
                   help="hub access token (default: HF_TOKEN env or "
                        "~/.cache/huggingface/token)")
    p.add_argument("--hf-token-path", default=None,
                   help="file containing the hub access token")
    p.add_argument("--dummy-model", choices=sorted(DUMMY_PRESETS),
                   help="random-weight model for testing/benchmarks")
    p.add_argument("--served-name", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--block-size", type=int, default=None,
                   help="KV page size (default: 128 on TPU, 16 elsewhere)")
    p.add_argument("--kv-blocks", type=int, default=None,
                   help="device KV pages (default: sized from --kv-fraction)")
    p.add_argument("--kv-fraction", type=float, default=0.7,
                   help="fraction of free HBM for KV cache")
    p.add_argument("--cpu-kv-blocks", type=int, default=256)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-num-batched-tokens", type=int, default=8192)
    p.add_argument("--prefill-chunk-size", type=int, default=8192)
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--yarn-scaling-factor", type=float, default=None,
                   help="force YaRN rope scaling by this factor "
                        "(stretches max context; reference: "
                        "--yarn-scaling-factor, models/mod.rs:600-652)")
    p.add_argument("--disable-prefix-cache", action="store_true")
    p.add_argument("--preemption-mode", default="recompute", choices=["recompute", "swap"])
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    # multi-host (reference: multi-node bootstrap, communicator.rs:218-324)
    p.add_argument("--num-nodes", type=int, default=1)
    p.add_argument("--node-rank", type=int, default=0)
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port "
                        "(rank 0 host)")
    p.add_argument("--bridge-port", type=int, default=18515,
                   help="request-replication TCP port on rank 0")
    p.add_argument("--isq", choices=["w4a16", "int8"], default=None,
                   help="in-situ weight quantization at load")
    p.add_argument("--kvcache-dtype", choices=["auto", "fp8", "int8", "int4", "turbo3"], default="auto",
                   help="KV cache dtype (int8 ~2x, int4 ~4x capacity)")
    p.add_argument("--num-experts-offload", type=int, default=0,
                   help="keep the last N experts of every MoE bank in "
                        "pinned host memory; routed experts' W4 tiles DMA "
                        "to HBM per step (reference: "
                        "num_experts_offload_per_rank) — serves MoE "
                        "checkpoints whose expert bytes exceed HBM")
    p.add_argument("--holding-time-ms", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tool-parser", default=None,
                   help="force the tool-parser family (llama/llama4/qwen3/"
                        "gemma/gemma4/glm/minimax/mistral/phi); default "
                        "infers from model_type (reference: "
                        "--enforce-parser)")
    p.add_argument("--mcp-config", default=None,
                   help="JSON config of MCP servers whose tools are "
                        "injected into chat requests")
    p.add_argument("--log-requests", default=None, metavar="PATH",
                   help="append per-request lifecycle records (JSONL) to "
                        "PATH (reference: request logger)")
    p.add_argument("--speculative", choices=["ngram"], default=None,
                   help="speculative decoding (beyond-reference): "
                        "prompt-lookup drafts verified in the decode "
                        "bucket's padding rows; bit-identical to greedy "
                        "decode, 1..N+1 tokens per weight pass")
    p.add_argument("--spec-draft-len", type=int, default=7,
                   help="max draft tokens per speculative dispatch "
                        "(<= 63; larger windows ride the T=16/32/64 "
                        "buckets at ~constant device cost)")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile common batch shapes before serving "
                        "(the analogue of the reference's CUDA-graph "
                        "capture at init, backend/graph.rs)")
    return p


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from candle_vllm_tpu.config import (
        CacheConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.utils.tokenizer import load_tokenizer

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if getattr(args, "model_id", None):
        from candle_vllm_tpu.models.hub import download_gguf, resolve_model

        if args.weight_file:
            args.gguf = download_gguf(
                args.model_id, args.weight_file, revision=args.revision,
                token=args.hf_token, token_path=args.hf_token_path,
            )
        else:
            args.model_dir = resolve_model(
                args.model_id, revision=args.revision,
                token=args.hf_token, token_path=args.hf_token_path,
            )
            if args.served_name is None:
                args.served_name = args.model_id
    gguf_params = None
    if args.gguf:
        from candle_vllm_tpu.models.gguf import load_gguf

        cfg, gguf_params = load_gguf(
            args.gguf, dtype=dtype, quantize=args.isq or "w4a16",
            # separate banks: TP needs scale-aligned column shards and
            # offload needs per-expert gate/up splits
            fuse_moe_gate_up=(args.tp <= 1 and not args.num_experts_offload),
        )
        from candle_vllm_tpu.models.gguf import GGUFFile
        from candle_vllm_tpu.utils.tokenizer import tokenizer_from_gguf_metadata

        tokenizer = tokenizer_from_gguf_metadata(GGUFFile(args.gguf).metadata)
        model_name = args.served_name or os.path.basename(args.gguf)
    elif args.model_dir:
        cfg = ModelConfig.from_json(
            os.path.join(args.model_dir, "config.json"), dtype=dtype
        )
        tokenizer = load_tokenizer(args.model_dir)
        model_name = args.served_name or os.path.basename(
            os.path.normpath(args.model_dir)
        )
    elif args.dummy_model:
        h, i, l, a, k, d, v = DUMMY_PRESETS[args.dummy_model]
        cfg = ModelConfig(
            architecture="LlamaForCausalLM",
            hidden_size=h, intermediate_size=i, num_hidden_layers=l,
            num_attention_heads=a, num_key_value_heads=k, head_dim=d,
            vocab_size=max(v, 259), max_model_len=4096, dtype=dtype,
            eos_token_ids=[1],
        )
        tokenizer = load_tokenizer(None)
        model_name = args.served_name or f"dummy-{args.dummy_model}"
    else:
        raise SystemExit("one of --model-dir / --dummy-model is required")

    if args.num_experts_offload:
        if cfg.moe is None:
            raise SystemExit("--num-experts-offload requires a MoE model")
        cfg.moe.num_experts_offload = args.num_experts_offload

    if args.yarn_scaling_factor:
        from candle_vllm_tpu.config import RopeScaling, derive_yarn_parameters

        f = max(args.yarn_scaling_factor, 1.0)
        beta_fast, beta_slow, _, _ = derive_yarn_parameters(f)
        cfg.rope_scaling = RopeScaling(
            rope_type="yarn", factor=f,
            original_max_position_embeddings=cfg.max_model_len,
            beta_fast=beta_fast, beta_slow=beta_slow,
            # attention_factor stays None so ops/rope.py applies the
            # standard YaRN mscale (0.1*ln(f)+1) at stretched context
        )
        cfg.max_model_len = int(cfg.max_model_len * f)
    if args.max_model_len:
        cfg.max_model_len = args.max_model_len

    on_tpu = jax.default_backend() == "tpu"
    block_size = args.block_size or (128 if on_tpu else 16)
    # weight-footprint estimate (reference: lib.rs:128-281 get_cache_config)
    linear_bytes = cfg.num_hidden_layers * (
        cfg.hidden_size * (cfg.num_attention_heads + 2 * cfg.num_key_value_heads)
        * cfg.head_dim + cfg.hidden_size * cfg.head_dim * cfg.num_attention_heads
        + 3 * cfg.hidden_size * cfg.intermediate_size
    ) * 2
    head_bytes = 2 * cfg.vocab_size * cfg.hidden_size * 2
    if args.isq == "w4a16":  # int4 linears + int8 lm_head + scales
        linear_bytes = int(linear_bytes / 3.5)
        head_bytes = int(head_bytes * 0.75)
    elif args.isq == "int8":
        linear_bytes = int(linear_bytes / 1.9)
        head_bytes = int(head_bytes * 0.75)
    param_bytes = linear_bytes + head_bytes
    hbm = 15e9 if on_tpu else 4e9
    if args.kv_blocks:
        num_blocks = args.kv_blocks
    else:
        budget = max(int((hbm - param_bytes) * args.kv_fraction), 0)
        kv_per_block = CacheConfig.kv_bytes_per_token(cfg, "auto") * block_size
        num_blocks = max(16, budget // max(kv_per_block, 1))
        # never more pages than every seq at full length could use
        num_blocks = min(
            num_blocks,
            args.max_num_seqs * -(-cfg.max_model_len // block_size) + 1,
        )

    # quantized caches pack more tokens into the same byte budget
    kv_factor = {"int8": 2, "fp8": 2, "int4": 4}.get(args.kvcache_dtype, 1)
    cache = CacheConfig(
        block_size=block_size,
        num_gpu_blocks=num_blocks * kv_factor,
        num_cpu_blocks=args.cpu_kv_blocks,
        kv_cache_dtype=args.kvcache_dtype,
    )
    # solve the concurrency cap from KV + workspace capacity, bounded by
    # the user's --max-num-seqs (reference: compute_max_num_parallel_reqs,
    # lib.rs:425-471).  Free workspace = HBM after weights and KV.
    from candle_vllm_tpu.config import compute_max_num_parallel_reqs

    solved = compute_max_num_parallel_reqs(
        cache.num_gpu_blocks * cache.block_size,
        args.prefill_chunk_size,
        max(int((hbm - param_bytes) * (1 - args.kv_fraction)), 0),
        cfg,
    )
    max_num_seqs = min(args.max_num_seqs, solved)
    sched = SchedulerConfig(
        max_num_seqs=max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        prefill_chunk_size=args.prefill_chunk_size,
        max_model_len=cfg.max_model_len,
        enable_prefix_caching=not args.disable_prefix_cache,
        preemption_mode=args.preemption_mode,
        speculative=args.speculative,
        spec_draft_len=args.spec_draft_len,
    )
    engine = LLMEngine(
        cfg, cache, sched, ParallelConfig(tp_size=args.tp),
        params=gguf_params,
        model_dir=None if gguf_params is not None else args.model_dir,
        tokenizer=tokenizer, seed=args.seed,
        quantization=None if gguf_params is not None else args.isq,
    )
    if args.log_requests:
        from candle_vllm_tpu.engine.stats import RequestLogger

        engine.request_logger = RequestLogger(args.log_requests)
    if args.warmup:
        warmup_engine(engine)
    return engine, model_name


def warmup_engine(engine) -> None:
    """Pre-compile the hot jit shapes: a small prefill bucket, a larger
    chunked-prefill bucket, and the decode bucket — so first requests
    don't pay multi-second compiles."""
    import numpy as np

    from candle_vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    vocab = engine.model_config.vocab_size
    cap = min(
        engine.scheduler_config.max_num_batched_tokens - 8,
        engine.scheduler_config.max_model_len - 8,
    )
    lens = sorted({24, min(200, cap), min(900, cap)})
    prompts = [rng.integers(0, vocab, size=n).tolist() for n in lens]
    print(f"warmup: compiling shapes for prompt lens {lens} ...", flush=True)
    engine.generate(prompts, SamplingParams(temperature=0.0, max_tokens=3))
    print("warmup: done", flush=True)


def main(argv=None) -> None:
    args = make_parser().parse_args(argv)
    if args.num_nodes > 1:
        # join the global mesh BEFORE any jax usage; every host then sees
        # all devices and builds identical engine replicas
        from candle_vllm_tpu.parallel.multihost import init_distributed

        init_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_nodes,
            process_id=args.node_rank,
        )
    engine, model_name = build_engine(args)

    if args.num_nodes > 1 and args.node_rank > 0:
        # follower host: replay the leader's intake sequence in lockstep —
        # no HTTP server (reference: daemon ranks, communicator.rs)
        from candle_vllm_tpu.parallel.multihost import FollowerLink

        leader_host = (args.coordinator or "127.0.0.1:0").rsplit(":", 1)[0]
        print(f"follower rank {args.node_rank}: linking to "
              f"{leader_host}:{args.bridge_port}", flush=True)
        link = FollowerLink(leader_host, args.bridge_port)
        link.run_engine_loop(engine)
        link.close()
        return

    from candle_vllm_tpu.engine.async_engine import AsyncLLMEngine
    from candle_vllm_tpu.server.chat_template import ChatTemplate
    from candle_vllm_tpu.server.openai_server import ServerState, build_app

    template = None
    if args.model_dir:
        tc = os.path.join(args.model_dir, "tokenizer_config.json")
        if os.path.exists(tc):
            template = ChatTemplate.from_tokenizer_config(
                tc, engine.model_config.model_type
            )
    if template is None:
        tmpl = getattr(engine.tokenizer, "chat_template", None)
        template = ChatTemplate(tmpl, engine.model_config.model_type)

    mcp_manager = None
    if args.mcp_config:
        from candle_vllm_tpu.mcp import MCPManager

        mcp_manager = MCPManager.from_config(args.mcp_config)

    bridge = None
    if args.num_nodes > 1:
        from candle_vllm_tpu.parallel.multihost import RequestBridge

        bridge = RequestBridge(args.bridge_port,
                               num_followers=args.num_nodes - 1)
        print(f"waiting for {args.num_nodes - 1} follower host(s) on "
              f":{args.bridge_port} ...", flush=True)
        bridge.wait_for_followers()

    state = ServerState(
        AsyncLLMEngine(engine, holding_time_ms=args.holding_time_ms,
                       bridge=bridge),
        model_name,
        template,
        mcp_manager=mcp_manager,
        tool_parser=args.tool_parser,
    )
    app = build_app(state)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
