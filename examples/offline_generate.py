"""Offline batch generation through the embedded engine API.

Parity with the reference's ``examples/simple_gen.rs`` (EngineBuilder /
Engine::generate, api.rs): build an engine in-process, no HTTP server.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", help="local HF model directory")
    ap.add_argument("--dummy-model", default=None)
    ap.add_argument("--isq", choices=["w4a16", "int8"], default=None)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("prompts", nargs="*", default=["Hello, my name is"])
    args = ap.parse_args()

    from candle_vllm_tpu.sampling_params import SamplingParams
    from candle_vllm_tpu.server.__main__ import build_engine, make_parser

    sargs = make_parser().parse_args(
        (["--model-dir", args.model_dir] if args.model_dir else
         ["--dummy-model", args.dummy_model or "tiny"])
        + (["--isq", args.isq] if args.isq else [])
    )
    engine, name = build_engine(sargs)
    print(f"engine ready: {name}")
    outs = engine.generate(
        list(args.prompts),
        SamplingParams(
            temperature=args.temperature, max_tokens=args.max_tokens
        ),
    )
    for p, o in zip(args.prompts, outs):
        print(f"--- {p!r}\n{o.outputs[0].text}\n"
              f"[{o.outputs[0].finish_reason}, "
              f"{len(o.outputs[0].token_ids)} tokens]")


if __name__ == "__main__":
    main()
