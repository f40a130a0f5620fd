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

from typing import Dict, Tuple

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
