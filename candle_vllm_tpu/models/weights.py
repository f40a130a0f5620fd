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


def load_safetensors(
    model_dir: str,
    dtype=jnp.bfloat16,
    plan: Optional[ShardingPlan] = None,
) -> Dict[str, jnp.ndarray]:
    """Load every tensor, transposing linears to input-major and placing
    shards directly on their devices (no full-model host copy)."""
    params: Dict[str, jnp.ndarray] = {}
    for name, arr in _iter_safetensors(model_dir):
        if arr.ndim == 2 and not _NO_TRANSPOSE.search(name):
            arr = arr.T
        if arr.dtype == np.float32 or str(arr.dtype) == "bfloat16":
            tgt = dtype
        else:
            tgt = arr.dtype
        a = jnp.asarray(arr, tgt)
        if plan is not None:
            a = jax.device_put(a, plan.sharding(name))
        params[name] = a
    return params


def save_safetensors(params: Dict[str, jnp.ndarray], path: str) -> None:
    """Write a checkpoint in our input-major layout (round-trip format for
    tests and converted/quantized weights)."""
    from safetensors.numpy import save_file

    host = {}
    for k, v in params.items():
        host[k] = np.ascontiguousarray(np.asarray(jax.device_get(v)))
    save_file(host, path)
