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
    r"(embed_tokens\.weight|norm\.weight|\.bias$|rotary|scale)"
)

# checkpoint-name aliases → canonical names (Phi2's dense/fc1/fc2 layout,
# reference: phi2.rs weight names)
_RENAMES = (
    ("model.final_layernorm.", "model.norm."),
    (".self_attn.dense.", ".self_attn.o_proj."),
    (".mlp.fc1.", ".mlp.up_proj."),
    (".mlp.fc2.", ".mlp.down_proj."),
)


def canonical_name(name: str) -> str:
    for old, new in _RENAMES:
        if old in name:
            name = name.replace(old, new)
    return name


def _iter_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = sorted(
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        )
    for shard in shards:
        with safe_open(os.path.join(model_dir, shard), framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


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
        else:
            out[name] = a
    return out


def load_safetensors(
    model_dir: str,
    dtype=jnp.bfloat16,
    plan: Optional[ShardingPlan] = None,
    config=None,
    quantize: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Load every tensor, transposing linears to input-major and placing
    shards directly on their devices (no full-model host copy).

    With ``quantize`` ("w4a16"/"int8"), each eligible linear is quantized
    host-side BEFORE device placement, so the bf16 weights of an 8B+
    model never co-reside in HBM (reference ISQ streams similarly)."""
    from candle_vllm_tpu.ops.quant import quantize_tensor_np

    params: Dict[str, jnp.ndarray] = {}
    fused = False
    for name, arr in _iter_safetensors(model_dir):
        name = canonical_name(name)
        if arr.ndim == 2 and not _NO_TRANSPOSE.search(name):
            arr = arr.T
        fused |= ".qkv_proj." in name or ".gate_up_proj." in name
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
    if fused and config is not None:
        params = split_fused_weights(params, config)
        if quantize:
            from candle_vllm_tpu.ops.quant import quantize_params

            params = quantize_params(params, method=quantize)
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
