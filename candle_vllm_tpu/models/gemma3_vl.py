"""Gemma3-VL: SigLIP vision tower + Gemma3 text stack.

TPU re-design of the reference's ``src/openai/models/gemma3_vl/mod.rs``
(Gemma3ForConditionalGeneration): the SigLIP encoder + avg-pool
projector run as their own jit at request intake (fixed image size ->
fixed [N, P, pd] shapes, one compile per image count); the text stack is
the config-driven Gemma3 dense path.  Image embeddings replace the
``<image_soft_token>`` rows of the (scaled) token embeddings — the same
``StepInput.mm_embeds`` plumbing as Qwen3-VL, with no deepstack rows.

Text weights load via the ``model.language_model.*`` rename; vision
weights keep their HF names (``vision_tower.vision_model.*``,
``multi_modal_projector.*``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.llama import LlamaForCausalLM
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.models.vision import SiglipVisionTower


@register("Gemma3VLForConditionalGeneration",
          "Gemma3ForConditionalGeneration")
class Gemma3VLForConditionalGeneration(LlamaForCausalLM):
    """Registered under its own name; ``Gemma3ForConditionalGeneration``
    checkpoints with a vision_config dispatch here via the registry hook
    in ``models/llama.py`` (text-only ones keep the dense stack)."""

    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        super().__init__(config, mesh=mesh)
        self.has_vision = config.vision is not None
        if self.has_vision:
            self.vision_tower = SiglipVisionTower(config)
            self._encode_jit = jax.jit(self.vision_tower.encode)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        if self.has_vision:
            shapes.update(self.vision_tower.param_shapes())
        return shapes

    def checkpoint_fixup(self, name: str, arr):
        # conv2d patch kernel [hidden, C, ps, ps] -> matmul weight
        # [C*ps*ps, hidden] (host patchify flattens (C, ps, ps) the same
        # way; gemma3_vl/mod.rs:27-43)
        if (
            name == "vision_tower.vision_model.embeddings."
            "patch_embedding.weight" and arr.ndim == 4
        ):
            return np.ascontiguousarray(arr.reshape(arr.shape[0], -1).T)
        return super().checkpoint_fixup(name, arr)

    # -- intake-time vision encode ----------------------------------------
    def prepare_vision_inputs(self, mm) -> Dict[str, np.ndarray]:
        """Raster-order patches [N_images, P, pd] (fixed size, no
        padding buckets needed)."""
        P = self.vision_tower.num_patches
        n = max(len(mm.grids), 1)
        patches = np.asarray(mm.patches, np.float32).reshape(n, P, -1)
        return {"patches": patches}

    def encode_vision(self, params, host_inputs) -> np.ndarray:
        import jax.numpy as jnp

        out = self._encode_jit(params, jnp.asarray(host_inputs["patches"]))
        return np.asarray(out.astype(jnp.float32))

    # -- step-time injection (no deepstack) --------------------------------
    def _embed(self, params, step):
        from candle_vllm_tpu.models.vision import merge_mm_embeds

        return merge_mm_embeds(super()._embed(params, step), step)
