"""Mistral3-VL (Mistral Small 3.x): Pixtral vision tower + Mistral text
stack.

TPU re-design of the reference's ``src/openai/models/mistral3_vl/mod.rs``
(Mistral3ForConditionalGeneration): the Pixtral encoder + patch-merger
projector run as a bucketed jit at request intake; merged image
embeddings replace the ``[IMG]`` token rows while ``[IMG_BREAK]`` /
``[IMG_END]`` stay text tokens (multimodal.rs:453-475 row layout).  The
text stack is the config-driven Mistral dense path with weights loaded
via the ``model.language_model.*`` rename.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.llama import LlamaForCausalLM
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.models.vision import PixtralVisionTower


@register("Mistral3ForConditionalGeneration")
class Mistral3ForConditionalGeneration(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        super().__init__(config, mesh=mesh)
        self.has_vision = config.vision is not None
        if self.has_vision:
            self.vision_tower = PixtralVisionTower(config)
            self._encode_jit = jax.jit(self.vision_tower.encode)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        if self.has_vision:
            shapes.update(self.vision_tower.param_shapes())
        return shapes

    def checkpoint_fixup(self, name: str, arr):
        # conv2d patch kernel [hidden, C, ps, ps] -> matmul weight
        # [C*ps*ps, hidden]; host patchify flattens (C, ps, ps) the same
        # way (mistral3_vl/vision.rs:249-260 patch_conv)
        if name == "vision_tower.patch_conv.weight" and arr.ndim == 4:
            return np.ascontiguousarray(arr.reshape(arr.shape[0], -1).T)
        return super().checkpoint_fixup(name, arr)

    def prepare_vision_inputs(self, mm) -> Dict[str, np.ndarray]:
        from candle_vllm_tpu.multimodal.processor import pixtral_host_inputs

        return pixtral_host_inputs(mm, self.config.vision)

    def encode_vision(self, params, host_inputs) -> np.ndarray:
        import jax.numpy as jnp

        out = self._encode_jit(
            params,
            jnp.asarray(host_inputs["patches"]),
            jnp.asarray(host_inputs["seg_ids"]),
            jnp.asarray(host_inputs["cos"]),
            jnp.asarray(host_inputs["sin"]),
        )
        return np.asarray(out.astype(jnp.float32))

    def _embed(self, params, step):
        from candle_vllm_tpu.models.vision import merge_mm_embeds

        return merge_mm_embeds(super()._embed(params, step), step)
