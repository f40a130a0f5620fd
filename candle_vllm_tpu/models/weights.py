"""Weight loading: HF safetensors -> sharded device param dict.

Replaces the reference's loader surface
(``/root/reference/src/openai/pipelines/pipeline.rs:410-702``:
hub download, local safetensors via ``model.safetensors.index.json``,
sharded reads).  There is no hub client here (zero-egress environment);
local directories carry the same layout.

Layout convention: 2-D linear weights are stored **input-major**
([in, out]) so forward matmuls need no transpose; HF checkpoints are
output-major, so each linear is transposed once at load.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.parallel.sharding import ShardingPlan

# params whose HF layout is already correct (not transposed)
_NO_TRANSPOSE = re.compile(
    r"(embed_tokens\.weight|pos_embed\.weight|norm\.weight|\.bias$|rotary|scale)"
)

# checkpoint-name aliases → canonical names (Phi2's dense/fc1/fc2 layout,
# reference: phi2.rs weight names; Qwen3-VL nests the text stack under
# model.language_model, reference: qwen3_vl/mod.rs text_prefix)
_RENAMES = (
    ("model.final_layernorm.", "model.norm."),
    (".self_attn.dense.", ".self_attn.o_proj."),
    (".mlp.fc1.", ".mlp.up_proj."),
    (".mlp.fc2.", ".mlp.down_proj."),
    ("model.language_model.", "model."),
    # llama4 names its MLP/MoE block feed_forward with a `router` gate
    # (reference: llama4/mod.rs vb.pp("feed_forward"), vb.pp("router"))
    (".feed_forward.", ".mlp."),
    (".mlp.router.", ".mlp.gate."),
)

# per-expert HF tensors stacked into [E, in, out] banks at load
_EXPERT_RE = re.compile(
    r"^(?P<prefix>.*\.experts)\.(?P<idx>\d+)\.(?P<proj>\w+_proj)\.weight$"
)


def canonical_name(name: str) -> str:
    for old, new in _RENAMES:
        if old in name:
            name = name.replace(old, new)
    return name


def _iter_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yields tensors shard by shard, logging load progress every ~10%
    of the total checkpoint bytes (the single-host analogue of the
    reference's per-rank progress bars, backend/progress.rs:96-189; under
    multi-host each host logs its own line, host id in the logger name)."""
    import logging
    import time as _time

    from safetensors import safe_open

    log = logging.getLogger("candle_vllm_tpu.load")

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = sorted(
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        )
    total = sum(
        os.path.getsize(os.path.join(model_dir, s)) for s in shards
    ) or 1
    done = 0
    next_mark = 0.1
    t0 = _time.monotonic()
    for shard in shards:
        path = os.path.join(model_dir, shard)
        with safe_open(path, framework="numpy") as f:
            pt = None
            for name in f.keys():
                try:
                    yield name, f.get_tensor(name)
                except Exception:
                    # float8 tensors: numpy has no f8 dtype — read via
                    # torch and yield the raw e4m3 bits as uint8
                    import torch

                    if pt is None:
                        pt = safe_open(path, framework="pt")
                    t = pt.get_tensor(name)
                    yield name, t.view(torch.uint8).numpy()
        done += os.path.getsize(path)
        if done / total >= next_mark or done == total:
            dt = max(_time.monotonic() - t0, 1e-6)
            log.info(
                "loading weights: %d%% (%.1f/%.1f GB, %.2f GB/s)",
                round(100 * done / total), done / 1e9, total / 1e9,
                done / 1e9 / dt,
            )
            next_mark = done / total + 0.1


def split_fused_weights(params: Dict, config) -> Dict:
    """Split merged projections (Phi3-style ``qkv_proj`` /
    ``gate_up_proj``) into the canonical separate tensors.  The reference
    supports both packed and separate layouts (attention.rs:193-357)."""
    H = config.num_attention_heads * config.head_dim
    K = config.num_key_value_heads * config.head_dim
    out: Dict = {}
    for name, a in params.items():
        if ".qkv_proj." in name:
            q, k, v = a[..., :H], a[..., H : H + K], a[..., H + K : H + 2 * K]
            out[name.replace(".qkv_proj.", ".q_proj.")] = q
            out[name.replace(".qkv_proj.", ".k_proj.")] = k
            out[name.replace(".qkv_proj.", ".v_proj.")] = v
        elif ".gate_up_proj." in name:
            half = a.shape[-1] // 2
            out[name.replace(".gate_up_proj.", ".gate_proj.")] = a[..., :half]
            out[name.replace(".gate_up_proj.", ".up_proj.")] = a[..., half:]
        elif name.endswith(".experts.gate_up_proj"):
            # llama4 fused expert bank [E, hidden, 2I] -> separate banks so
            # the TP plan can column-shard each half
            half = a.shape[-1] // 2
            out[name.replace(".gate_up_proj", ".gate_proj")] = a[..., :half]
            out[name.replace(".gate_up_proj", ".up_proj")] = a[..., half:]
        else:
            out[name] = a
    return out


def load_prequantized_safetensors(
    model_dir: str,
    config,
    dtype=jnp.bfloat16,
    plan: Optional[ShardingPlan] = None,
    requant: Optional[str] = None,
    fixup=None,
) -> Dict[str, jnp.ndarray]:
    """Load FP8-blockwise / MXFP4 / NVFP4 checkpoints.

    TPU-native normalization (the analogue of the reference's in-situ
    Marlin repack, backend/gptq.rs, and its LnFp8/LnMxfp4/LnNvfp4 zoo,
    linear.rs:920,1678,1760): each quantized tensor is decoded *exactly*
    to float, then re-encoded into the kernel-native format — int8 for
    8-bit sources, w4a16 for 4-bit sources — so the hot path stays on the
    one fused Pallas dequant-matmul.  Tensors stream one at a time; the
    bf16 intermediate exists only per-tensor on host.
    """
    from candle_vllm_tpu.ops.quant import (
        dequant_fp8_blockwise,
        dequant_mxfp4,
        dequant_nvfp4,
        quantize_tensor_np,
    )

    method = config.quant.method
    if requant is None:
        # int8 re-encode is near-exact for every source grid (≤0.4% of
        # group max); w4a16 would add a half-step regrid error (~7%) on
        # the non-uniform e2m1 grid.  Callers wanting 4-bit bandwidth
        # can pass requant="w4a16" explicitly.
        requant = "int8"
    block = tuple(config.quant.weight_block_size or (128, 128))
    # fp4 sources re-encode at their own block granularity (16 nvfp4 /
    # 32 mxfp4) so each group shares exactly one source scale
    group_size = 128 if method == "fp8" else config.quant.group_size

    params: Dict[str, jnp.ndarray] = {}
    pending: Dict[str, Dict[str, np.ndarray]] = {}
    global_scales: Dict[str, float] = {}

    def emit(prefix: str, w_out_major: np.ndarray) -> None:
        arr = np.ascontiguousarray(w_out_major.T)  # input-major
        if fixup is not None:
            arr = fixup(prefix + ".weight", arr)
        q = quantize_tensor_np(prefix + ".weight", arr, requant,
                               group_size=group_size)
        if q:
            params[f"{prefix}.qweight"] = jnp.asarray(q["qweight"])
            params[f"{prefix}.scales"] = jnp.asarray(q["scales"], jnp.bfloat16)
        else:  # ineligible shape (unaligned dims) — dense bf16 fallback
            params[f"{prefix}.weight"] = jnp.asarray(arr, dtype)

    def try_emit(prefix: str) -> None:
        p = pending.get(prefix)
        if p is None or "w" not in p or "scale" not in p:
            return
        if method == "fp8":
            w = dequant_fp8_blockwise(p["w"], p["scale"], block)
        elif method == "nvfp4":
            w = dequant_nvfp4(p["w"], p["scale"],
                              global_scales.get(prefix, 1.0))
        else:  # mxfp4
            w = dequant_mxfp4(p["w"], p["scale"])
        del pending[prefix]
        emit(prefix, w)

    for name, arr in _iter_safetensors(model_dir):
        name = canonical_name(name)
        prefix = slot = None
        if name.endswith(".weight_scale_inv") or name.endswith(".weight_scale"):
            prefix, slot = name[: name.rindex(".weight_scale")], "scale"
        elif name.endswith(".weight_scale_2"):
            prefix = name[: -len(".weight_scale_2")]
            s2 = float(np.asarray(arr, np.float32).reshape(-1)[0])
            global_scales[prefix] = s2
            if f"{prefix}.scales" in params:  # already emitted: rescale
                params[f"{prefix}.scales"] = (
                    params[f"{prefix}.scales"].astype(jnp.float32) * s2
                ).astype(jnp.bfloat16)
            continue
        elif name.endswith(".input_scale"):
            continue  # activation scales: our activations stay bf16
        elif name.endswith("_blocks") or name.endswith(".blocks"):
            cut = -len("_blocks") if name.endswith("_blocks") else -len(".blocks")
            prefix, slot = name[:cut], "w"
        elif name.endswith("_scales") or name.endswith(".scales"):
            cut = -len("_scales") if name.endswith("_scales") else -len(".scales")
            prefix, slot = name[:cut], "scale"
        elif name.endswith(".weight") and arr.dtype == np.uint8:
            prefix, slot = name[: -len(".weight")], "w"

        if prefix is not None:
            pending.setdefault(prefix, {})[slot] = arr
            try_emit(prefix)
            continue

        # unquantized passthrough (embeddings, norms, biases, lm_head)
        if arr.ndim == 2 and not _NO_TRANSPOSE.search(name):
            arr = arr.T
        if fixup is not None:
            arr = fixup(name, arr)
        tgt = dtype if arr.dtype == np.float32 or str(arr.dtype) == "bfloat16" else arr.dtype
        params[name] = jnp.asarray(arr, tgt)

    for prefix in list(pending):
        try_emit(prefix)
    if pending:
        raise ValueError(f"incomplete quantized tensors: {sorted(pending)}")
    if plan is not None:
        params = plan.apply(params)
    return params


def load_safetensors(
    model_dir: str,
    dtype=jnp.bfloat16,
    plan: Optional[ShardingPlan] = None,
    config=None,
    quantize: Optional[str] = None,
    fixup=None,
) -> Dict[str, jnp.ndarray]:
    """Load every tensor, transposing linears to input-major and placing
    shards directly on their devices (no full-model host copy).

    With ``quantize`` ("w4a16"/"int8"), each eligible linear is quantized
    host-side BEFORE device placement, so the bf16 weights of an 8B+
    model never co-reside in HBM (reference ISQ streams similarly)."""
    from candle_vllm_tpu.ops.quant import quantize_tensor_np

    if (
        config is not None
        and getattr(config, "quant", None) is not None
        and config.quant.method in ("fp8", "mxfp4", "nvfp4")
    ):
        return load_prequantized_safetensors(
            model_dir, config, dtype=dtype, plan=plan, fixup=fixup
        )

    params: Dict[str, jnp.ndarray] = {}
    fused = False
    expert_stash: Dict[str, Dict[int, np.ndarray]] = {}
    for name, arr in _iter_safetensors(model_dir):
        name = canonical_name(name)
        m = _EXPERT_RE.match(name)
        if m is not None:
            # per-expert tensor: stash [out, in] -> stacked bank later
            bank = f"{m['prefix']}.{m['proj']}"
            expert_stash.setdefault(bank, {})[int(m["idx"])] = arr.T
            continue
        if arr.ndim == 2 and not _NO_TRANSPOSE.search(name):
            arr = arr.T
        if fixup is not None:
            arr = fixup(name, arr)
        fused |= ".qkv_proj." in name or ".gate_up_proj." in name
        fused |= name.endswith(".experts.gate_up_proj")
        if quantize and not fused:
            q = quantize_tensor_np(name, np.ascontiguousarray(arr), quantize)
            if q:
                prefix = name[: -len(".weight")]
                params[f"{prefix}.qweight"] = jnp.asarray(q["qweight"])
                params[f"{prefix}.scales"] = jnp.asarray(
                    q["scales"], jnp.bfloat16
                )
                continue
        if arr.dtype == np.float32 or str(arr.dtype) == "bfloat16":
            tgt = dtype
        else:
            tgt = arr.dtype
        params[name] = jnp.asarray(arr, tgt)
    for bank, tensors in expert_stash.items():
        E = max(tensors) + 1
        assert len(tensors) == E, f"missing experts in {bank}"
        stacked = np.stack([tensors[i] for i in range(E)])  # [E, in, out]
        params[bank] = jnp.asarray(stacked, dtype)
    if fused and config is not None:
        params = split_fused_weights(params, config)
        if quantize:
            from candle_vllm_tpu.ops.quant import quantize_params

            params = quantize_params(
                params, method=quantize, moe_fuse_gate_up=plan is None
            )
    if plan is not None:
        params = plan.apply(params)
    return params


def save_safetensors(params: Dict[str, jnp.ndarray], path: str) -> None:
    """Write a checkpoint in our input-major layout (round-trip format for
    tests and converted/quantized weights)."""
    from safetensors.numpy import save_file

    host = {}
    for k, v in params.items():
        host[k] = np.ascontiguousarray(np.asarray(jax.device_get(v)))
    save_file(host, path)
