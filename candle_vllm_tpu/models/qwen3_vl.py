"""Qwen3-VL: vision tower + Qwen3 dense/MoE text stack.

TPU re-design of the reference's ``src/openai/models/qwen3_vl/mod.rs``
(Qwen3VLForConditionalGeneration): the vision encoder runs as its own
bucketed jit once per request (``encode_vision``), its merged embeddings
come back to host, and each engine step carries only the image rows the
scheduled prompt chunks need (``StepInput.mm_embeds``/``mm_idx`` — the
analogue of the reference's image_token_offset chunked-prefill slicing,
mod.rs:233-268).  Deepstack features add into the first ``n_ds`` decoder
layers at image positions (qwen.rs:270-292 apply_deep_stack).

Text weights load from the HF ``model.language_model.*`` names via a
rename in ``models/weights.py``; vision weights keep their HF names
(``model.visual.*``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.llama import LlamaForCausalLM, Params
from candle_vllm_tpu.models.qwen_moe import QwenMoeForCausalLM
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.models.vision import VisionTower


class _VisionMixin:
    """Shared VL plumbing for dense and MoE text stacks."""

    has_vision = True

    def _init_vision(self, config: ModelConfig) -> None:
        assert config.vision is not None, "VL model requires vision_config"
        self.vision_tower = VisionTower(config)
        self._encode_jit = jax.jit(self.vision_tower.encode)

    def vision_param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        return self.vision_tower.param_shapes()

    def checkpoint_fixup(self, name: str, arr):
        # conv3d patch kernel [hidden, C, tps, ps, ps] -> matmul weight
        # [C*tps*ps*ps, hidden]; host patchify flattens patches in the
        # same (C, tps, ps, ps) order (reference: vision.rs:42-53)
        if name == "model.visual.patch_embed.proj.weight" and arr.ndim == 5:
            return np.ascontiguousarray(arr.reshape(arr.shape[0], -1).T)
        return super().checkpoint_fixup(name, arr)

    def encode_vision(
        self, params: Params, host_inputs: Dict[str, np.ndarray]
    ) -> np.ndarray:
        """Run the vision tower on host-prepared padded inputs; returns
        [1 + n_ds, Np/merge_unit, out_hidden] float32 on host."""
        out = self._encode_jit(
            params,
            jnp.asarray(host_inputs["patches"]),
            jnp.asarray(host_inputs["seg_ids"]),
            jnp.asarray(host_inputs["pos_idx"]),
            jnp.asarray(host_inputs["pos_w"]),
            jnp.asarray(host_inputs["cos"]),
            jnp.asarray(host_inputs["sin"]),
        )
        return np.asarray(out.astype(jnp.float32))

    # -- step-time injection ----------------------------------------------
    def _embed(self, params: Params, step: StepInput) -> jnp.ndarray:
        x = super()._embed(params, step)
        if step.mm_embeds is None:
            return x
        sel = step.mm_embeds[0][jnp.clip(step.mm_idx, 0)].astype(x.dtype)
        return jnp.where((step.mm_idx >= 0)[:, None], sel, x)

    def _layer_inject(
        self, x: jnp.ndarray, layer_idx: int, step: StepInput
    ) -> jnp.ndarray:
        if step.mm_embeds is None:
            return x
        n_ds = len(self.config.vision.deepstack_visual_indexes)
        if layer_idx >= n_ds:
            return x
        sel = step.mm_embeds[1 + layer_idx][jnp.clip(step.mm_idx, 0)]
        mask = (step.mm_idx >= 0)[:, None]
        return x + jnp.where(mask, sel.astype(x.dtype), 0)


@register("Qwen3VLForConditionalGeneration")
class Qwen3VLForConditionalGeneration(_VisionMixin, LlamaForCausalLM):
    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        super().__init__(config, mesh=mesh)
        self._init_vision(config)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        shapes.update(self.vision_param_shapes())
        return shapes


@register("Qwen3VLMoeForConditionalGeneration")
class Qwen3VLMoeForConditionalGeneration(_VisionMixin, QwenMoeForCausalLM):
    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        super().__init__(config, mesh=mesh)
        self._init_vision(config)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        shapes.update(self.vision_param_shapes())
        return shapes
