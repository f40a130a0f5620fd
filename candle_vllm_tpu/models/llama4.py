"""Llama4: iRoPE dense/MoE text stack.

TPU re-design of the reference's ``src/openai/models/llama4/mod.rs``:
- every ``no_rope_step``-th layer (default 4) is a NoPE global-attention
  layer with position-dependent query temperature tuning
  (mod.rs:185, 270-280); the other layers use rope + chunked attention
  of ``attention_chunk_size`` + weightless L2 qk-norm (mod.rs:194).
  These are all per-layer ``AttnLayerSpec`` flags resolved in
  ``models/layers.py make_attn_specs``.
- MoE layers follow ``interleave_moe_layer_step`` / ``moe_layers`` with
  a sigmoid top-1 router whose weight multiplies the expert INPUT
  (mod.rs:103-109) plus an always-on shared expert; experts ship as a
  fused ``gate_up`` bank and run as one ``lax.ragged_dot`` grouped GEMM
  (models/moe.py).
- checkpoint names: ``feed_forward`` -> ``mlp``, ``router`` -> ``gate``
  (models/weights.py _RENAMES); the vision tower of the VL variant is
  not implemented yet (text weights load via ``language_model`` rename).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.qwen_moe import QwenMoeForCausalLM
from candle_vllm_tpu.models.registry import register


@register(
    "Llama4ForCausalLM",
    "Llama4TextForCausalLM",
    "Llama4ForConditionalGeneration",
)
class Llama4ForCausalLM(QwenMoeForCausalLM):
    def is_moe_layer(self, i: int) -> bool:
        if self.config.moe is None:
            return False
        return super().is_moe_layer(i)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        c = self.config
        m = c.moe
        if m is None:
            return shapes
        for i in range(c.num_hidden_layers):
            if not self.is_moe_layer(i):
                continue
            p = f"model.layers.{i}.mlp"
            # llama4 ships experts as ONE fused [E, hidden, 2I] bank
            shapes.pop(f"{p}.experts.gate_proj", None)
            shapes.pop(f"{p}.experts.up_proj", None)
            shapes[f"{p}.experts.gate_up_proj"] = (
                m.num_experts, c.hidden_size, 2 * m.moe_intermediate_size
            )
            # top-1 sigmoid router has no qwen-style shared-expert gate
            shapes.pop(f"{p}.shared_expert_gate.weight", None)
        return shapes


# vision wiring below the text stack: the registry resolves
# "Llama4ForConditionalGeneration" to this LAST registration
@register("Llama4ForConditionalGeneration")
class Llama4ForConditionalGeneration(Llama4ForCausalLM):
    """Llama4 VL: vision tower + projector feeding image embeddings into
    the iRoPE text stack (reference: llama4/mod.rs:330-343, 518-571 —
    image features replace image_token rows of the input embeddings).
    NOTE: the reference never wires Llama4 into its server-side image
    preprocessor (multimodal.rs has no Llama4 arm), so this model-level
    path plus our single-tile preprocessing exceeds reference parity."""

    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        super().__init__(config, mesh=mesh)
        self.has_vision = config.vision is not None
        if self.has_vision:
            from candle_vllm_tpu.models.vision import Llama4VisionTower

            self.vision_tower = Llama4VisionTower(config)
            self._encode_jit = jax.jit(self.vision_tower.encode)

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.has_vision:
            shapes.update(self.vision_tower.param_shapes())
        return shapes

    def checkpoint_fixup(self, name: str, arr):
        # HF ships the unfold linear as [hidden, C*ps*ps]
        if (
            name == "vision_model.patch_embedding.linear.weight"
            and arr.ndim == 2
            and arr.shape[0] == self.config.vision.hidden_size
        ):
            return np.ascontiguousarray(arr.T)
        return super().checkpoint_fixup(name, arr)

    def prepare_vision_inputs(self, mm):
        """Tiles are fixed-size: raster patches [B_tiles, N, pd] in the
        unfold feature order (c, di, dj)."""
        N = self.vision_tower.num_patches
        n = max(len(mm.grids), 1)
        patches = np.asarray(mm.patches, np.float32).reshape(n, N, -1)
        return {"patches": patches}

    def encode_vision(self, params, host_inputs) -> np.ndarray:
        import jax.numpy as jnp

        out = self._encode_jit(params, jnp.asarray(host_inputs["patches"]))
        return np.asarray(out.astype(jnp.float32))

    def _embed(self, params, step):
        from candle_vllm_tpu.models.vision import merge_mm_embeds

        return merge_mm_embeds(super()._embed(params, step), step)
