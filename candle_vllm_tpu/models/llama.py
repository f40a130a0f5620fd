"""Dense decoder family: Llama, Mistral, Qwen2/3, Yi, GLM4-dense, Gemma-ish.

One parameterized implementation covers the reference's separate dense
model files (``/root/reference/src/openai/models/{llama,mistral,qwen,yi,
glm4,gemma}.rs``) — they differ only in config flags (qkv bias, qk-norm,
sliding-window pattern, tied embeddings, embedding scaling, activation),
all of which live in ``ModelConfig``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.layers import (
    AttnLayerSpec,
    attention_block,
    linear,
    make_attn_specs,
    mlp,
)
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.ops.norms import layer_norm, rms_norm
from candle_vllm_tpu.ops.rope import RopeSpec, compute_cos_sin, make_rope_spec

Params = Dict[str, jnp.ndarray]


@register(
    "LlamaForCausalLM",
    "MistralForCausalLM",
    "Qwen2ForCausalLM",
    "Qwen3ForCausalLM",
    "YiForCausalLM",
    "Glm4ForCausalLM",
    "GemmaForCausalLM",
    "Gemma2ForCausalLM",
    "Gemma3ForCausalLM",
    "Gemma4ForCausalLM",
    "Gemma4ForConditionalGeneration",
    "Gemma4TextForCausalLM",
    "Phi3ForCausalLM",
    "Phi4ForCausalLM",
    "PhiForCausalLM",
    "StableLmForCausalLM",
    "StableLmEpochForCausalLM",
)
class LlamaForCausalLM:
    """Functional dense decoder over paged KV."""

    def __init__(self, config: ModelConfig, mesh: Optional[Mesh] = None):
        self.config = config
        self.mesh = mesh
        self.layer_specs: List[AttnLayerSpec] = make_attn_specs(config)
        # global/full-attention rope: gemma4 gives full layers their own
        # theta and head_dim (reference: gemma4.rs:879-900 rope_parameters)
        g_dim = config.global_head_dim or config.head_dim
        self.rope: RopeSpec = make_rope_spec(
            config,
            theta_override=config.global_rope_theta,
            rotary_dim_override=int(g_dim * config.partial_rotary_factor)
            if g_dim != config.head_dim else None,
        )
        # gemma3-style: sliding layers use a different (local) rope theta
        self.rope_local: Optional[RopeSpec] = None
        if config.rope_local_base_freq is not None:
            self.rope_local = make_rope_spec(
                config, theta_override=config.rope_local_base_freq
            )

    # -- parameters --------------------------------------------------------
    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        c = self.config
        H, K, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        shapes: Dict[str, Tuple[int, ...]] = {
            "model.embed_tokens.weight": (c.vocab_size, c.hidden_size),
            "model.norm.weight": (c.hidden_size,),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head.weight"] = (c.hidden_size, c.vocab_size)
            if c.lm_head_bias:
                shapes["lm_head.bias"] = (c.vocab_size,)
        if c.norm_type == "layernorm":
            shapes["model.norm.bias"] = (c.hidden_size,)
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}"
            # per-layer KV shapes (gemma4 heterogeneous global/swa layers)
            K, D = c.layer_kv_spec(i)
            shapes[f"{p}.input_layernorm.weight"] = (c.hidden_size,)
            if c.norm_type == "layernorm":
                shapes[f"{p}.input_layernorm.bias"] = (c.hidden_size,)
            if not c.parallel_block:
                shapes[f"{p}.post_attention_layernorm.weight"] = (c.hidden_size,)
                if c.norm_type == "layernorm":
                    shapes[f"{p}.post_attention_layernorm.bias"] = (c.hidden_size,)
            if c.sandwich_norms:
                shapes[f"{p}.pre_feedforward_layernorm.weight"] = (c.hidden_size,)
                shapes[f"{p}.post_feedforward_layernorm.weight"] = (c.hidden_size,)
            if c.model_type == "glm4":
                # GLM4-dense output norms (glm4.rs:103-140)
                shapes[f"{p}.post_self_attn_layernorm.weight"] = (c.hidden_size,)
                shapes[f"{p}.post_mlp_layernorm.weight"] = (c.hidden_size,)
            qw = H * D * (2 if c.attn_output_gate else 1)
            shapes[f"{p}.self_attn.q_proj.weight"] = (c.hidden_size, qw)
            shapes[f"{p}.self_attn.k_proj.weight"] = (c.hidden_size, K * D)
            shapes[f"{p}.self_attn.v_proj.weight"] = (c.hidden_size, K * D)
            shapes[f"{p}.self_attn.o_proj.weight"] = (H * D, c.hidden_size)
            if c.qkv_bias:
                shapes[f"{p}.self_attn.q_proj.bias"] = (qw,)
                shapes[f"{p}.self_attn.k_proj.bias"] = (K * D,)
                shapes[f"{p}.self_attn.v_proj.bias"] = (K * D,)
            if c.o_bias:
                shapes[f"{p}.self_attn.o_proj.bias"] = (c.hidden_size,)
            if c.use_qk_norm:
                shapes[f"{p}.self_attn.q_norm.weight"] = (D,)
                shapes[f"{p}.self_attn.k_norm.weight"] = (D,)
            if c.gated_mlp:
                shapes[f"{p}.mlp.gate_proj.weight"] = (c.hidden_size, c.intermediate_size)
            shapes[f"{p}.mlp.up_proj.weight"] = (c.hidden_size, c.intermediate_size)
            shapes[f"{p}.mlp.down_proj.weight"] = (c.intermediate_size, c.hidden_size)
            if c.mlp_bias:
                shapes[f"{p}.mlp.up_proj.bias"] = (c.intermediate_size,)
                shapes[f"{p}.mlp.down_proj.bias"] = (c.hidden_size,)
                if c.gated_mlp:
                    shapes[f"{p}.mlp.gate_proj.bias"] = (c.intermediate_size,)
        return shapes

    def checkpoint_fixup(self, name: str, arr):
        """Per-tensor checkpoint normalization hook, applied at load time
        (after transposition to input-major, before any quantization).
        Models with non-flat checkpoint layouts (e.g. Qwen3-Next's
        per-key-head-grouped GDN projections) override this; load-time
        permutation keeps the hot path free of gather/scatter."""
        return arr

    def init_params(self, seed: int = 0) -> Params:
        """Random init (bench / tests; real loads go through
        models/weights.py).  One jitted dispatch for the whole tree —
        eager per-param init costs a compile round-trip each."""
        c = self.config
        shapes = self.param_shapes()

        def init(key):
            params: Params = {}
            for i, (name, shape) in enumerate(shapes.items()):
                if name.endswith("norm.weight"):
                    params[name] = jnp.ones(shape, c.dtype)
                elif name.endswith(".bias"):
                    params[name] = jnp.zeros(shape, c.dtype)
                else:
                    std = 0.4 / (shape[0] ** 0.5)
                    params[name] = (
                        jax.random.normal(
                            jax.random.fold_in(key, i), shape, jnp.float32
                        ) * std
                    ).astype(c.dtype)
            return params

        return jax.jit(init)(jax.random.PRNGKey(seed))

    def _mlp_block(
        self, params: Params, prefix: str, h: jnp.ndarray, layer_idx: int,
        norm_w: Optional[jnp.ndarray] = None, norm_eps: float = 1e-6,
        residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Dense MLP; MoE models override per layer.  ``norm_w`` /
        ``residual`` fuse the pre-norm / residual-add into the decode
        kernels (models/layers.py mlp)."""
        return mlp(h, params, prefix, self.config.hidden_act,
                   norm_w=norm_w, norm_eps=norm_eps, residual=residual)

    def kv_cache_spec(self) -> Tuple[int, int]:
        """(num_kv_heads, head_dim) the KV cache must be allocated with.
        KV heads are replicated up to the TP degree when K < tp
        (reference: kv_head_shard, distributed.rs:725)."""
        K = self.config.num_key_value_heads
        if self.mesh is not None:
            K = max(K, self.mesh.shape.get("tp", 1))
        return K, self.config.head_dim

    def per_layer_kv_spec(self) -> "List[Tuple[int, int]]":
        """Per-layer (kv_heads, head_dim) — heterogeneous for gemma4-class
        models; the engine allocates each layer's pages to its own shape
        (reference: cache_engine.rs:198-235 gemma4 per-layer shapes)."""
        tp = self.mesh.shape.get("tp", 1) if self.mesh is not None else 1
        return [
            (max(spec.attn.num_kv_heads, tp), spec.attn.head_dim)
            for spec in self.layer_specs
        ]

    def _norm(self, params: Params, x: jnp.ndarray, name: str) -> jnp.ndarray:
        """rmsnorm or StableLM-class LayerNorm+bias per config.norm_type."""
        c = self.config
        if c.norm_type == "layernorm":
            return layer_norm(
                x, params[f"{name}.weight"], params.get(f"{name}.bias"),
                c.rms_norm_eps,
            )
        return rms_norm(
            x, params[f"{name}.weight"], c.rms_norm_eps,
            add_unit_offset=c.norm_unit_offset,
        )

    # -- forward -----------------------------------------------------------
    def _embed(self, params: Params, step: StepInput) -> jnp.ndarray:
        """Token embedding; VL models override to merge image embeddings
        (reference: qwen3_vl/mod.rs embed_forward + scatter)."""
        c = self.config
        x = params["model.embed_tokens.weight"][step.token_ids]
        if c.scale_embeddings:
            x = (x.astype(jnp.float32) * (c.hidden_size ** 0.5)).astype(x.dtype)
        return x

    def _layer_inject(
        self, x: jnp.ndarray, layer_idx: int, step: StepInput
    ) -> jnp.ndarray:
        """Post-layer hook; VL deepstack injection overrides this."""
        return x

    def forward(
        self,
        params: Params,
        kv_pages: List[jnp.ndarray],
        step: StepInput,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Returns (logits [S, vocab] f32, updated kv_pages).

        Only rows ``step.logits_idx`` reach the lm_head (reference gathers
        last tokens before lm_head during prefill, llama.rs:190-194).
        """
        x, new_pages = self.forward_hidden(params, kv_pages, step)
        c = self.config
        sel = x[step.logits_idx]  # [S, hidden]
        if c.tie_word_embeddings:
            logits = jnp.dot(sel, params["model.embed_tokens.weight"].T)
        else:
            logits = linear(sel, params, "lm_head")
            if logits.shape[-1] != c.vocab_size:
                # quantized lm_head may carry zero-scale pad columns so the
                # kernel gets TILE_OUT-divisible tiles (quant.pad_vocab_out)
                logits = logits[..., : c.vocab_size]
        logits = logits.astype(jnp.float32)
        if c.logit_softcapping:
            cap = c.logit_softcapping
            logits = cap * jnp.tanh(logits / cap)
        return logits, new_pages

    def forward_hidden(
        self,
        params: Params,
        kv_pages: List[jnp.ndarray],
        step: StepInput,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Returns (final-norm hidden states [T, hidden], updated kv_pages)
        — the embeddings path (reference: forward_embedding variants,
        llama.rs / llm_engine.rs process_embedding_batch)."""
        c = self.config
        x = self._embed(params, step)

        cos_sin = compute_cos_sin(step.positions, self.rope)
        cos_sin_local = (
            compute_cos_sin(step.positions, self.rope_local)
            if self.rope_local is not None
            else None
        )

        new_pages: List[jnp.ndarray] = []
        fused_qkv = None  # next layer's qkv from the megakernel chain
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}"
            spec = self.layer_specs[i]
            is_sliding = spec.attn.sliding_window is not None
            rope = self.rope_local if (is_sliding and self.rope_local) else self.rope
            cs = cos_sin_local if (is_sliding and cos_sin_local) else cos_sin

            uo = c.norm_unit_offset
            # decode-path layer megakernel: o_proj + residual + norm +
            # MLP (+ next layer's input-norm + qkv) stream as ONE
            # pallas_call (fused_layer.py) — kills the weight-stream
            # bubble at every kernel boundary
            from candle_vllm_tpu.models.layers import (
                can_fuse_layer_tail, can_fuse_next_qkv, fused_layer_tail,
            )

            if (
                not c.parallel_block
                and not c.sandwich_norms
                and not uo
                and self.mesh is None
                and step.decode_only
                and can_fuse_layer_tail(x, params, p, c.hidden_act)
            ):
                if fused_qkv is None:
                    h = self._norm(params, x, f"{p}.input_layernorm")
                else:
                    h = x  # unused: qkv precomputed by the previous layer
                raw, pages = attention_block(
                    h, params, f"{p}.self_attn", spec, rope, cs,
                    kv_pages[i], step, mesh=self.mesh, skip_o=True,
                    qkv=fused_qkv,
                )
                new_pages.append(pages)
                p_next = f"model.layers.{i + 1}"
                chain = (
                    i + 1 < c.num_hidden_layers
                    # deepstack injection would edit x AFTER qkv was taken
                    and step.mm_idx is None
                    and can_fuse_layer_tail(x, params, p_next, c.hidden_act)
                    and can_fuse_next_qkv(params, p, p_next)
                )
                if chain:
                    x, fused_qkv = fused_layer_tail(
                        x, raw, params, p, c.rms_norm_eps,
                        next_qkv_prefix=p_next,
                    )
                else:
                    x = fused_layer_tail(x, raw, params, p, c.rms_norm_eps)
                    fused_qkv = None
                x = self._layer_inject(x, i, step)
                continue
            fused_qkv = None
            pa = params.get(f"{p}.post_self_attn_layernorm.weight")
            # plain pre-norm transformer block: the input RMSNorm fuses
            # into the qkv kernel prologue and the residual-add into the
            # o_proj epilogue — the XLA glue fusions between pallas calls
            # measured ~46 us/layer of the decode step (tools/abl_r4c.py)
            plain_glue = (
                c.norm_type != "layernorm" and not c.norm_unit_offset
                and not c.parallel_block and not c.sandwich_norms
            )
            if plain_glue:
                h = x  # unused; norm rides the qkv kernel
                attn_out, pages = attention_block(
                    x, params, f"{p}.self_attn", spec, rope, cs,
                    kv_pages[i], step, mesh=self.mesh,
                    norm_w=params[f"{p}.input_layernorm.weight"],
                    norm_eps=c.rms_norm_eps,
                    residual=x if pa is None else None,
                )
            else:
                h = self._norm(params, x, f"{p}.input_layernorm")
                attn_out, pages = attention_block(
                    h, params, f"{p}.self_attn", spec, rope, cs,
                    kv_pages[i], step, mesh=self.mesh,
                )
            new_pages.append(pages)
            if c.parallel_block:
                # Phi2: attn and MLP both read the same normed input and
                # their outputs sum into the residual (reference: phi2.rs)
                x = x + attn_out + self._mlp_block(params, f"{p}.mlp", h, i)
            elif c.sandwich_norms:
                # gemma2/3: norm the sublayer output before the residual
                attn_out = rms_norm(
                    attn_out, params[f"{p}.post_attention_layernorm.weight"],
                    c.rms_norm_eps, add_unit_offset=uo,
                )
                x = x + attn_out
                h = rms_norm(
                    x, params[f"{p}.pre_feedforward_layernorm.weight"],
                    c.rms_norm_eps, add_unit_offset=uo,
                )
                m = self._mlp_block(params, f"{p}.mlp", h, i)
                m = rms_norm(
                    m, params[f"{p}.post_feedforward_layernorm.weight"],
                    c.rms_norm_eps, add_unit_offset=uo,
                )
                x = x + m
            else:
                # GLM4-dense ships extra norms on the sublayer OUTPUTS
                # (reference: glm4.rs:103,182 post_self_attn_layernorm /
                # post_mlp_layernorm) — presence-driven like qk-norm
                if pa is not None:
                    attn_out = rms_norm(attn_out, pa, c.rms_norm_eps,
                                        add_unit_offset=uo)
                # with plain_glue and no GLM output norm the residual
                # already rode the o_proj epilogue
                x = attn_out if (plain_glue and pa is None) else x + attn_out
                pm = params.get(f"{p}.post_mlp_layernorm.weight")
                if plain_glue and pm is None:
                    x = self._mlp_block(
                        params, f"{p}.mlp", x, i,
                        norm_w=params[f"{p}.post_attention_layernorm.weight"],
                        norm_eps=c.rms_norm_eps, residual=x,
                    )
                else:
                    h = self._norm(params, x, f"{p}.post_attention_layernorm")
                    m = self._mlp_block(params, f"{p}.mlp", h, i)
                    if pm is not None:
                        m = rms_norm(m, pm, c.rms_norm_eps,
                                     add_unit_offset=uo)
                    x = x + m
            x = self._layer_inject(x, i, step)

        x = self._norm(params, x, "model.norm")
        return x, new_pages
