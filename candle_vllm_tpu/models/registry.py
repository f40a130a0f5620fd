"""Architecture dispatch (reference: pipeline.rs:1268-1578 arch match).

Maps HF ``architectures[0]`` to a model class.  One dense implementation
covers the whole llama-shaped family; bespoke classes register here as
they land (MoE, MLA, hybrid GDN, VL).
"""

from __future__ import annotations

from typing import Dict, Optional, Type

from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig

_REGISTRY: Dict[str, type] = {}


def register(*archs: str):
    def deco(cls):
        for a in archs:
            _REGISTRY[a] = cls
        return cls
    return deco


def get_model(config: ModelConfig, mesh: Optional[Mesh] = None):
    from candle_vllm_tpu.models import (  # noqa: F401  (populates registry)
        deepseek,
        gemma3_vl,
        llama,
        llama4,
        mistral3_vl,
        qwen3_vl,
        qwen_moe,
        qwen_next,
    )

    cls = _REGISTRY.get(config.architecture)
    if cls is None:
        raise ValueError(
            f"unsupported architecture {config.architecture!r}; "
            f"known: {sorted(_REGISTRY)}"
        )
    return cls(config, mesh=mesh)
