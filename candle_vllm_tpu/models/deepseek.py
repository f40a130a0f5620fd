"""DeepSeek V2/V3 family: Multi-head Latent Attention + MoE.

Reference: ``/root/reference/src/openai/models/deepseek.rs`` and
``models/layers/mla_attention.rs:83-555`` (q/kv LoRA projections,
absorbed-weight decode, rope on pe-parts only, compressed ckv+kpe paged
cache).

TPU-first design: rather than separate MLA kernels (the reference binds
``mla_paged_prefill/decode`` from attention-rs), the absorbed formulation
is expressed as plain MQA over the *latent* space and runs on the SAME
unified ragged paged-attention kernel:

  q_eff[h]   = q_nope[h] @ W_uk[h]            (absorb into latent space)
  k_latent   = [c_kv, k_pe]                   (one shared "KV head")
  score[h]   = q_eff[h]·c_kv + q_pe[h]·k_pe   = [q_eff, q_pe]·k_latent
  out[h]     = (attn @ c_kv) @ W_uv[h]

so the KV cache stores (kv_lora+rope) per token ONCE (``kv_shared``
single-plane pages), independent of the head count — the same
compression the reference's MLA cache achieves (cache_engine.rs:172-184).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from candle_vllm_tpu.models.layers import linear, mlp
from candle_vllm_tpu.models.moe import moe_ffn
from candle_vllm_tpu.models.llama import LlamaForCausalLM, Params
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.attention import AttentionSpec
from candle_vllm_tpu.models.layers import paged_attention_with_write
from candle_vllm_tpu.ops.norms import rms_norm
from candle_vllm_tpu.ops.rope import apply_rope, compute_cos_sin, make_rope_spec


@register(
    "DeepseekV2ForCausalLM",
    "DeepseekV3ForCausalLM",
    # GLM-4.x MoE-lite / GLM MoE DSA reuse the DeepSeek MLA + first-k-dense
    # MoE stack with interleaved (GPT-J) rotary (reference:
    # glm4_moe_lite.rs:339-420 MlaConfig::from_config, is_gpt_neox=false)
    "Glm4MoeLiteForCausalLM",
    "GlmMoeDsaForCausalLM",
    # V3.2: MLA + DSA lightning indexer (reference: layers/indexer.rs,
    # mla_attention.rs sparse prefill)
    "DeepseekV32ForCausalLM",
)
class DeepseekForCausalLM(LlamaForCausalLM):
    def __init__(self, config, mesh=None):
        super().__init__(config, mesh=mesh)
        c = config
        assert c.kv_lora_rank and c.qk_rope_head_dim and c.qk_nope_head_dim
        self.latent_dim = c.kv_lora_rank + c.qk_rope_head_dim
        # rope over the pe-part only (reference: rope on pe-parts,
        # mla_attention.rs)
        import copy

        rc = copy.copy(config)
        rc.head_dim = c.qk_rope_head_dim
        rc.partial_rotary_factor = 1.0
        # DeepSeek rotary is GPT-J/interleaved pairing (reference:
        # deepseek.rs:475-479 is_gpt_neox=false) — half-rotation would
        # scramble q_pe/k_pe lanes on real checkpoints.
        self.rope = make_rope_spec(rc, interleaved=True)
        # YaRN mscale correction on attention scores (reference:
        # mla_attention.rs:243-245): official V2/V3 checkpoints ship yarn
        # rope_scaling (factor 40, mscale_all_dim 1.0) and expect
        # sm_scale *= mscale^2 with mscale = 0.1*mscale_all_dim*ln(f)+1.
        self.mla_mscale_sq = 1.0
        # DSA sparse-prefill indexer (V3.2/GLM5 class; reference:
        # indexer.rs).  ``use_dsa`` routes whole-prompt prefill through
        # the sparse path; it must stay False for engines running mixed
        # prefill+decode steps (in-batch indexing has no paged reads yet)
        ex = config.extra or {}
        self.dsa_heads = int(ex.get("index_n_heads", 0) or 0)
        self.dsa_head_dim = int(ex.get("index_head_dim", 0) or 0)
        self.dsa_topk = int(ex.get("index_topk", 0) or 0)
        self.has_dsa = bool(self.dsa_heads and self.dsa_head_dim
                            and self.dsa_topk and c.q_lora_rank)
        self.use_dsa = bool(ex.get("use_dsa_prefill", False)) and self.has_dsa
        rs = c.rope_scaling
        if (
            rs is not None
            and rs.rope_type == "yarn"
            and (rs.mscale_all_dim or 0) > 0
            and rs.factor > 1.0
        ):
            import math

            m = 0.1 * rs.mscale_all_dim * math.log(rs.factor) + 1.0
            self.mla_mscale_sq = m * m

    # MLA latent rows serve as both K and V — pages store them ONCE
    # (ops/kv_cache.py kv_shared; reference stores ckv+kpe single-copy,
    # cache_engine.rs:172-184): half the KV bytes and page bandwidth
    kv_shared = True

    def kv_cache_spec(self) -> Tuple[int, int]:
        """(num_kv_heads, head_dim) for cache allocation: one latent head
        (replicated across TP shards when a mesh is active)."""
        K = 1
        if self.mesh is not None:
            K = max(K, self.mesh.shape.get("tp", 1))
        return K, self.latent_dim

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        c = self.config
        H = c.num_attention_heads
        nope, rope_d, v_dim = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        qk_dim = nope + rope_d
        shapes: Dict[str, Tuple[int, ...]] = {
            "model.embed_tokens.weight": (c.vocab_size, c.hidden_size),
            "model.norm.weight": (c.hidden_size,),
            "lm_head.weight": (c.hidden_size, c.vocab_size),
        }
        m = c.moe
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}"
            shapes[f"{p}.input_layernorm.weight"] = (c.hidden_size,)
            shapes[f"{p}.post_attention_layernorm.weight"] = (c.hidden_size,)
            a = f"{p}.self_attn"
            if c.q_lora_rank:
                shapes[f"{a}.q_a_proj.weight"] = (c.hidden_size, c.q_lora_rank)
                shapes[f"{a}.q_a_layernorm.weight"] = (c.q_lora_rank,)
                shapes[f"{a}.q_b_proj.weight"] = (c.q_lora_rank, H * qk_dim)
            else:
                shapes[f"{a}.q_proj.weight"] = (c.hidden_size, H * qk_dim)
            shapes[f"{a}.kv_a_proj_with_mqa.weight"] = (
                c.hidden_size, c.kv_lora_rank + rope_d
            )
            shapes[f"{a}.kv_a_layernorm.weight"] = (c.kv_lora_rank,)
            shapes[f"{a}.kv_b_proj.weight"] = (
                c.kv_lora_rank, H * (nope + v_dim)
            )
            shapes[f"{a}.o_proj.weight"] = (H * v_dim, c.hidden_size)
            if self.has_dsa:
                # DSA lightning indexer weights (reference: indexer.rs:38-76)
                Hn, Dh = self.dsa_heads, self.dsa_head_dim
                shapes[f"{a}.indexer.wq_b.weight"] = (c.q_lora_rank, Hn * Dh)
                shapes[f"{a}.indexer.wk.weight"] = (c.hidden_size, Dh)
                shapes[f"{a}.indexer.k_norm.weight"] = (Dh,)
                shapes[f"{a}.indexer.k_norm.bias"] = (Dh,)
                shapes[f"{a}.indexer.weights_proj.weight"] = (c.hidden_size, Hn)
            # dense or MoE mlp per layer
            if m is not None and self.is_moe_layer(i):
                shapes[f"{p}.mlp.gate.weight"] = (c.hidden_size, m.num_experts)
                if m.topk_method == "noaux_tc":
                    shapes[f"{p}.mlp.gate.e_score_correction_bias"] = (
                        m.num_experts,
                    )
                for t, dims in (
                    ("gate_proj", (m.num_experts, c.hidden_size, m.moe_intermediate_size)),
                    ("up_proj", (m.num_experts, c.hidden_size, m.moe_intermediate_size)),
                    ("down_proj", (m.num_experts, m.moe_intermediate_size, c.hidden_size)),
                ):
                    shapes[f"{p}.mlp.experts.{t}"] = dims
                if m.num_shared_experts:
                    s = m.moe_intermediate_size * m.num_shared_experts
                    shapes[f"{p}.mlp.shared_experts.gate_proj.weight"] = (c.hidden_size, s)
                    shapes[f"{p}.mlp.shared_experts.up_proj.weight"] = (c.hidden_size, s)
                    shapes[f"{p}.mlp.shared_experts.down_proj.weight"] = (s, c.hidden_size)
            else:
                shapes[f"{p}.mlp.gate_proj.weight"] = (c.hidden_size, c.intermediate_size)
                shapes[f"{p}.mlp.up_proj.weight"] = (c.hidden_size, c.intermediate_size)
                shapes[f"{p}.mlp.down_proj.weight"] = (c.intermediate_size, c.hidden_size)
        return shapes

    def is_moe_layer(self, i: int) -> bool:
        m = self.config.moe
        if m is None:
            return False
        return i >= m.first_k_dense_replace and (
            m.decoder_sparse_step <= 1 or (i + 1) % m.decoder_sparse_step == 0
        )

    def _mlp_block(self, params, prefix, h, layer_idx,
                   norm_w=None, norm_eps: float = 1e-6, residual=None):
        if self.is_moe_layer(layer_idx):
            if norm_w is not None:
                from candle_vllm_tpu.ops.norms import rms_norm

                h = rms_norm(h, norm_w, norm_eps)
            y = moe_ffn(h, params, prefix, self.config.moe,
                        self.config.hidden_act, mesh=self.mesh)
            if residual is not None:
                y = (y.astype(jnp.float32)
                     + residual.astype(jnp.float32)).astype(y.dtype)
            return y
        return mlp(h, params, prefix, self.config.hidden_act,
                   norm_w=norm_w, norm_eps=norm_eps, residual=residual)

    def _attn(self, params: Params, a: str, x, cos_sin, kv_pages, step):
        c = self.config
        T = x.shape[0]
        H = c.num_attention_heads
        nope, rope_d, v_dim = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        L = c.kv_lora_rank
        qk_dim = nope + rope_d

        cq = None
        if c.q_lora_rank:
            cq = linear(x, params, f"{a}.q_a_proj")
            cq = rms_norm(cq, params[f"{a}.q_a_layernorm.weight"], c.rms_norm_eps)
            q = linear(cq, params, f"{a}.q_b_proj")
        else:
            q = linear(x, params, f"{a}.q_proj")
        q = q.reshape(T, H, qk_dim)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        ckv = linear(x, params, f"{a}.kv_a_proj_with_mqa")  # [T, L + rope]
        c_kv = rms_norm(ckv[:, :L], params[f"{a}.kv_a_layernorm.weight"],
                        c.rms_norm_eps)
        k_pe = ckv[:, L:].reshape(T, 1, rope_d)

        cos, sin = cos_sin
        q_pe = apply_rope(q_pe, cos, sin, self.rope)
        k_pe = apply_rope(k_pe, cos, sin, self.rope)

        # absorb W_uk: kv_b [L, H*(nope+v)] -> W_uk [L, H, nope]
        kv_b = params[f"{a}.kv_b_proj.weight"].reshape(L, H, nope + v_dim)
        w_uk = kv_b[..., :nope]                       # [L, H, nope]
        w_uv = kv_b[..., nope:]                       # [L, H, v_dim]
        q_eff = jnp.einsum("thn,lhn->thl", q_nope, w_uk)  # [T, H, L]
        q_lat = jnp.concatenate([q_eff, q_pe], axis=-1)   # [T, H, L+rope]

        k_lat = jnp.concatenate([c_kv[:, None, :], k_pe], axis=-1)  # [T,1,L+r]
        spec = AttentionSpec(
            num_q_heads=H,
            num_kv_heads=1,
            head_dim=L + rope_d,
            sm_scale=qk_dim ** -0.5 * self.mla_mscale_sq,
            kv_shared=True,
        )
        if self.use_dsa:
            # DSA sparse prefill (reference: indexer.rs:29-120 +
            # mla_sparse_paged_prefill): the lightning indexer picks each
            # query's index_topk context rows; attention runs only over
            # those.  In-batch scope — the engine enables this path only
            # for whole-prompt prefill steps; KV still writes to pages so
            # decode continues dense.
            from candle_vllm_tpu.ops.dsa import (
                lightning_index,
                sparse_latent_attention,
            )
            from candle_vllm_tpu.ops.kv_cache import write_kv

            idx, valid = lightning_index(
                x, cq, params, f"{a}.indexer",
                step.cu_q_lens, step.kv_lens,
                n_heads=self.dsa_heads, head_dim=self.dsa_head_dim,
                rope_dim=rope_d, topk=self.dsa_topk,
                cos=cos, sin=sin, rope_spec=self.rope,
            )
            out_lat = sparse_latent_attention(
                q_lat, k_lat[:, 0, :], idx, valid, spec.sm_scale
            )
            if isinstance(kv_pages, tuple):  # quantized (pages, scales)
                kv_pages = write_kv(kv_pages[0], k_lat, k_lat,
                                    step.slot_mapping, kv_pages[1],
                                    kv_shared=True)
            else:
                kv_pages = write_kv(kv_pages, k_lat, k_lat,
                                    step.slot_mapping, kv_shared=True)
        else:
            # v := k_lat too; latent output's first L lanes are attn@c_kv
            out_lat, kv_pages = paged_attention_with_write(
                q_lat, k_lat, k_lat, kv_pages, step, spec, mesh=self.mesh
            )
        latent = out_lat[..., :L]                     # [T, H, L]
        out = jnp.einsum("thl,lhv->thv", latent, w_uv)  # [T, H, v_dim]
        return linear(out.reshape(T, H * v_dim), params, f"{a}.o_proj"), kv_pages

    def forward_hidden(self, params, kv_pages, step: StepInput):
        c = self.config
        x = params["model.embed_tokens.weight"][step.token_ids]
        cos_sin = compute_cos_sin(step.positions, self.rope)
        new_pages: List = []
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}"
            h = rms_norm(x, params[f"{p}.input_layernorm.weight"], c.rms_norm_eps)
            attn_out, pages = self._attn(
                params, f"{p}.self_attn", h, cos_sin, kv_pages[i], step
            )
            new_pages.append(pages)
            x = x + attn_out
            h = rms_norm(x, params[f"{p}.post_attention_layernorm.weight"],
                         c.rms_norm_eps)
            x = x + self._mlp_block(params, f"{p}.mlp", h, i)
        x = rms_norm(x, params["model.norm.weight"], c.rms_norm_eps)
        return x, new_pages
