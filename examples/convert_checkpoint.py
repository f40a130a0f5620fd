"""Offline checkpoint converter (reference: examples/convert_marlin.py /
convert_awq_marlin.py): decode a GPTQ/AWQ/FP8/MXFP4/NVFP4/bf16 HF
checkpoint and save it in this framework's native layout (input-major
linears, tile-contiguous W4A16/int8 qweights) so server startup skips
the decode+requantize pass.

  python examples/convert_checkpoint.py --model-dir /path/in \
      --out /path/out.safetensors [--isq w4a16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out", required=True, help="output .safetensors path")
    ap.add_argument("--isq", choices=["w4a16", "int8"], default=None,
                    help="quantize bf16 linears while converting")
    args = ap.parse_args()

    from candle_vllm_tpu.config import ModelConfig
    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.models.weights import (
        load_safetensors,
        save_safetensors,
    )

    with open(os.path.join(args.model_dir, "config.json")) as f:
        cfg = ModelConfig.from_hf(json.load(f))
    model = get_model(cfg)
    params = load_safetensors(
        args.model_dir, dtype=cfg.dtype, config=cfg, quantize=args.isq,
        fixup=getattr(model, "checkpoint_fixup", None),
    )
    save_safetensors(params, args.out)
    n_q = sum(1 for k in params if k.endswith(".qweight"))
    print(json.dumps({
        "tensors": len(params), "quantized_linears": n_q, "out": args.out,
    }))


if __name__ == "__main__":
    main()
