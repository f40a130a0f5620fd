"""Qwen MoE family: Qwen2-MoE / Qwen3-MoE (and the GLM4-MoE-lite shape).

Reference: ``/root/reference/src/openai/models/qwen3_moe.rs`` (and
``glm4_moe_lite.rs``) — a dense attention stack whose MLP is a sparse
expert layer on scheduled layers (``decoder_sparse_step``,
``mlp_only_layers``; models/mod.rs MoEConfig).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from candle_vllm_tpu.models.llama import LlamaForCausalLM, Params
from candle_vllm_tpu.models.moe import moe_ffn
from candle_vllm_tpu.models.registry import register


@register(
    "Qwen2MoeForCausalLM",
    "Qwen3MoeForCausalLM",
    "Glm4MoeForCausalLM",
    # MiniMax-M2: Qwen-MoE-shaped dense-attention MoE; config normalization
    # (forced norm_topk_prob, moe_intermediate_size default) happens in
    # ModelConfig.from_hf (reference: minimax.rs:150-193)
    "MiniMaxM2ForCausalLM",
)
class QwenMoeForCausalLM(LlamaForCausalLM):
    def is_moe_layer(self, i: int) -> bool:
        m = self.config.moe
        assert m is not None, "MoE model requires config.moe"
        if i in m.mlp_only_layers:
            return False
        if i < m.first_k_dense_replace:
            return False
        return (i + 1) % m.decoder_sparse_step == 0 if m.decoder_sparse_step > 1 \
            else True

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        c = self.config
        m = c.moe
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}.mlp"
            if not self.is_moe_layer(i):
                continue
            # replace the dense MLP with router + expert banks
            for t in ("gate_proj", "up_proj", "down_proj"):
                shapes.pop(f"{p}.{t}.weight")
            shapes[f"{p}.gate.weight"] = (c.hidden_size, m.num_experts)
            shapes[f"{p}.experts.gate_proj"] = (
                m.num_experts, c.hidden_size, m.moe_intermediate_size
            )
            shapes[f"{p}.experts.up_proj"] = (
                m.num_experts, c.hidden_size, m.moe_intermediate_size
            )
            shapes[f"{p}.experts.down_proj"] = (
                m.num_experts, m.moe_intermediate_size, c.hidden_size
            )
            if m.shared_expert_intermediate_size:
                s = m.shared_expert_intermediate_size
                shapes[f"{p}.shared_expert.gate_proj.weight"] = (c.hidden_size, s)
                shapes[f"{p}.shared_expert.up_proj.weight"] = (c.hidden_size, s)
                shapes[f"{p}.shared_expert.down_proj.weight"] = (s, c.hidden_size)
                shapes[f"{p}.shared_expert_gate.weight"] = (c.hidden_size, 1)
        return shapes

    def _mlp_block(
        self, params: Params, prefix: str, h: jnp.ndarray, layer_idx: int,
        norm_w=None, norm_eps: float = 1e-6, residual=None,
    ) -> jnp.ndarray:
        if not self.is_moe_layer(layer_idx):
            return super()._mlp_block(params, prefix, h, layer_idx,
                                      norm_w=norm_w, norm_eps=norm_eps,
                                      residual=residual)
        # MoE layers: norm/residual stay XLA ops (the routed grouped GEMM
        # has no single prologue/epilogue site)
        if norm_w is not None:
            from candle_vllm_tpu.ops.norms import rms_norm

            h = rms_norm(h, norm_w, norm_eps)
        y = moe_ffn(h, params, prefix, self.config.moe,
                    self.config.hidden_act, mesh=self.mesh)
        if residual is not None:
            y = (y.astype(jnp.float32)
                 + residual.astype(jnp.float32)).astype(y.dtype)
        return y
