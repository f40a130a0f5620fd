"""Offline embeddings through the embedded engine API.

Parity with the reference's ``examples/simple_embed.rs`` (Engine::embed,
api.rs): pooled hidden-state vectors, no HTTP server.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", help="local HF model directory")
    ap.add_argument("--dummy-model", default=None)
    ap.add_argument("--pooling", choices=["last", "mean"], default="last")
    ap.add_argument("texts", nargs="*", default=["Hello world"])
    args = ap.parse_args()

    import numpy as np

    from candle_vllm_tpu.server.__main__ import build_engine, make_parser

    sargs = make_parser().parse_args(
        ["--model-dir", args.model_dir] if args.model_dir else
        ["--dummy-model", args.dummy_model or "tiny"]
    )
    engine, name = build_engine(sargs)
    print(f"engine ready: {name}")
    ids = [engine.tokenizer.encode(t) for t in args.texts]
    vecs = engine.embed(ids, pooling=args.pooling)
    for t, v in zip(args.texts, vecs):
        a = np.asarray(v)
        print(f"{t!r}: dim={a.shape[-1]} norm={np.linalg.norm(a):.4f} "
              f"head={np.round(a[:4], 4).tolist()}")


if __name__ == "__main__":
    main()
