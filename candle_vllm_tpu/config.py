"""Model / cache / scheduler configuration.

Re-designs the reference's config layer
(``/root/reference/src/openai/models/mod.rs:547-1192``): HF ``config.json``
deserialization (including multimodal ``text_config`` nesting), rope-scaling
/ YaRN parameter derivation, MoE configs, quantization config normalization,
and KV-cache dtype selection — expressed as plain dataclasses consumed by
JAX model builders.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# KV cache dtypes (reference: models/mod.rs:45-121 `KvCacheDtype`)
# ---------------------------------------------------------------------------

KV_DTYPE_AUTO = "auto"      # follow model compute dtype (bf16)
KV_DTYPE_FP8 = "fp8"        # fp8_e4m3 with per-block scales
KV_DTYPE_INT8 = "int8"      # turboquant-style 8-bit
KV_DTYPE_INT4 = "int4"      # turboquant-style 4-bit (turbo4)
KV_DTYPE_TURBO3 = "turbo3"  # 3-bit K + 4-bit V (reference turbo3, ~4.7x)

_VALID_KV_DTYPES = (KV_DTYPE_AUTO, KV_DTYPE_FP8, KV_DTYPE_INT8,
                    KV_DTYPE_INT4, KV_DTYPE_TURBO3)


@dataclass
class QuantConfig:
    """Normalized weight-quantization config.

    The reference normalizes compressed-tensors / GPTQ / AWQ / modelopt /
    MLX configs into a small set of methods (models/mod.rs:165-405).  We do
    the same: ``method`` in {"gptq", "awq", "q4k", "fp8", "int8", "w4a16"}.
    """

    method: str
    bits: int = 4
    group_size: int = 128
    sym: bool = True
    # blockwise fp8 scale block shape (weight_block_size in HF configs)
    weight_block_size: Optional[List[int]] = None

    @classmethod
    def from_hf(cls, qc: Dict[str, Any]) -> Optional["QuantConfig"]:
        if not qc:
            return None
        method = (qc.get("quant_method") or "").lower()
        if method in ("gptq", "awq"):
            return cls(
                method=method,
                bits=int(qc.get("bits", 4)),
                group_size=int(qc.get("group_size", 128)),
                sym=bool(qc.get("sym", True)),
            )
        if method == "mxfp4":
            return cls(method="mxfp4", bits=4, group_size=32)
        if method == "compressed-tensors":
            # Only map to fp8 when the config actually describes an FP8
            # weight scheme; int-packed schemes (wNa16 "pack-quantized")
            # are a different wire format (reference gates the same way,
            # models/mod.rs:165-405).
            weights = None
            for g in (qc.get("config_groups") or {}).values():
                if isinstance(g, dict) and isinstance(g.get("weights"), dict):
                    weights = g["weights"]
                    break
            if weights is not None and not (
                str(weights.get("type", "float")).lower() == "float"
                and int(weights.get("num_bits", 8)) == 8
            ):
                return None  # non-FP8 compressed-tensors: unsupported here
            block = qc.get("weight_block_size")
            if block is None and weights is not None:
                bs = weights.get("block_structure")
                if isinstance(bs, (list, tuple)) and len(bs) == 2:
                    block = list(bs)
            return cls(method="fp8", bits=8, weight_block_size=block)
        if method in ("fp8", "modelopt"):
            # modelopt tags the algorithm: NVFP4 vs FP8
            # (reference normalizes the same way, models/mod.rs:165-405)
            algo = qc.get("quant_algo") or ""
            if "FP4" in str(algo).upper():
                return cls(method="nvfp4", bits=4, group_size=16)
            return cls(
                method="fp8",
                bits=8,
                weight_block_size=qc.get("weight_block_size"),
            )
        return None


@dataclass
class MoEConfig:
    """Mixture-of-experts routing config (reference: models/mod.rs:475-479)."""

    num_experts: int
    num_experts_per_tok: int
    moe_intermediate_size: int
    shared_expert_intermediate_size: Optional[int] = None
    num_shared_experts: int = 0
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    scoring_func: str = "softmax"  # or "sigmoid" (DeepSeek v3)
    topk_method: str = "greedy"    # or "noaux_tc" / "group_limited_greedy"
    n_group: int = 1
    topk_group: int = 1
    decoder_sparse_step: int = 1
    mlp_only_layers: List[int] = field(default_factory=list)
    first_k_dense_replace: int = 0
    # llama4: routing weight multiplies the expert INPUT (top-1 routing)
    # instead of the output (reference: llama4/mod.rs:108-109
    # set_apply_router_weight_on_input)
    apply_router_weight_on_input: bool = False
    # expert CPU offload: the LAST n experts of every bank live in pinned
    # host memory; each step DMAs only the routed offloaded experts' W4
    # tiles to HBM inside the jitted step (reference:
    # num_experts_offload_per_rank, models/mod.rs:445 + linear.rs:110-116)
    num_experts_offload: int = 0


@dataclass
class RopeScaling:
    """Rope scaling parameters (reference: models/mod.rs:600-652 YaRN math)."""

    rope_type: str = "default"   # default|linear|dynamic|yarn|llama3|longrope
    factor: float = 1.0
    original_max_position_embeddings: Optional[int] = None
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attention_factor: Optional[float] = None
    mscale: float = 1.0
    mscale_all_dim: float = 0.0
    # llama3
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    # longrope / su (Phi3/Phi4): per-dim-pair rescale factors
    short_factor: Optional[List[float]] = None
    long_factor: Optional[List[float]] = None

    @classmethod
    def from_hf(cls, rs: Optional[Dict[str, Any]]) -> Optional["RopeScaling"]:
        if not rs:
            return None
        rope_type = rs.get("rope_type") or rs.get("type") or "default"
        return cls(
            rope_type=rope_type,
            factor=float(rs.get("factor", 1.0)),
            original_max_position_embeddings=rs.get("original_max_position_embeddings"),
            beta_fast=float(rs.get("beta_fast", 32.0)),
            beta_slow=float(rs.get("beta_slow", 1.0)),
            attention_factor=rs.get("attention_factor"),
            mscale=float(rs.get("mscale", 1.0)),
            mscale_all_dim=float(rs.get("mscale_all_dim", 0.0)),
            low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            short_factor=rs.get("short_factor"),
            long_factor=rs.get("long_factor"),
        )


# hybrid GDN config keys preserved in ModelConfig.extra (reference:
# qwen3_hybrid_raw_from_extra_config / resolve_qwen3_hybrid_config,
# models/mod.rs:972-1033)
_HYBRID_EXTRA_KEYS = (
    "linear_num_value_heads", "linear_num_key_heads", "linear_key_head_dim",
    "linear_value_head_dim", "linear_conv_kernel_dim", "linear_num_heads",
    "linear_num_key_value_heads", "conv_kernel_size",
    "full_attention_interval", "layers_block_type",
)

_QWEN35_NEXT_ARCHS = (
    "Qwen3NextForCausalLM",
    "Qwen3NextForConditionalGeneration",
    "Qwen3_5ForCausalLM",
    "Qwen3_5ForConditionalGeneration",
    "Qwen3_5MoeForCausalLM",
    "Qwen3_5MoeForConditionalGeneration",
)


@dataclass
class VisionConfig:
    """Vision-tower description (reference: qwen3_vl/config.rs VisionConfig
    defaults; gemma3_vl / mistral3_vl towers map onto the same fields)."""

    depth: int = 32
    hidden_size: int = 3584
    out_hidden_size: int = 3584
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    num_position_embeddings: int = 576
    deepstack_visual_indexes: List[int] = field(default_factory=list)
    hidden_act: str = "gelu_pytorch_tanh"
    image_size: int = 768
    # Pixtral/Mistral3 2D rotary (mistral3_vl/vision.rs:15-36)
    rope_theta: float = 10000.0
    # Llama4 tower (llama4/config.rs:130-186): pixel-shuffle merge ratio,
    # adapter MLP dims, and the projector input width
    pixel_shuffle_ratio: float = 0.5
    projector_input_dim: int = 4096
    projector_output_dim: int = 4096
    vision_output_dim: int = 4096
    norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, vc: Dict[str, Any]) -> "VisionConfig":
        return cls(
            depth=int(vc.get("depth", vc.get("num_hidden_layers", 32))),
            hidden_size=int(vc.get("hidden_size", 3584)),
            out_hidden_size=int(vc.get("out_hidden_size",
                                       vc.get("hidden_size", 3584))),
            intermediate_size=int(vc.get("intermediate_size", 3420)),
            num_heads=int(vc.get("num_heads",
                                 vc.get("num_attention_heads", 16))),
            in_channels=int(vc.get("in_chans", vc.get("in_channels", 3))),
            patch_size=int(vc.get("patch_size", 14)),
            spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
            temporal_patch_size=int(vc.get("temporal_patch_size", 2)),
            num_position_embeddings=int(vc.get("num_position_embeddings", 576)),
            deepstack_visual_indexes=list(
                vc.get("deepstack_visual_indexes", [])
            ),
            hidden_act=str(vc.get("hidden_act", "gelu_pytorch_tanh")),
            image_size=int(vc.get("image_size", 768)),
            rope_theta=float(vc.get("rope_theta", 10000.0)),
            pixel_shuffle_ratio=float(vc.get("pixel_shuffle_ratio", 0.5)),
            projector_input_dim=int(vc.get("projector_input_dim", 4096)),
            projector_output_dim=int(vc.get("projector_output_dim", 4096)),
            vision_output_dim=int(vc.get("vision_output_dim", 4096)),
            norm_eps=float(vc.get("norm_eps", 1e-5)),
        )


@dataclass
class ModelConfig:
    """Architecture-agnostic model description built from HF config.json."""

    architecture: str = "LlamaForCausalLM"
    model_type: str = "llama"
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    vocab_size: int = 32000
    max_model_len: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    partial_rotary_factor: float = 1.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    qkv_bias: bool = False
    o_bias: bool = False
    mlp_bias: bool = False
    sliding_window: Optional[int] = None
    # per-layer sliding window patterns (gemma2/3-style): layer i is sliding
    # iff sliding_window_pattern and (i % pattern != pattern - 1)
    sliding_window_pattern: Optional[int] = None
    layer_types: Optional[List[str]] = None  # explicit per-layer attn types
    use_qk_norm: bool = False
    # Qwen3.5/Qwen3-Next: q_proj emits [q | gate] per head (2x width) and
    # the attention output is multiplied by sigmoid(gate)
    # (reference: attention.rs:416-423, 620-643)
    attn_output_gate: bool = False
    logit_softcapping: Optional[float] = None
    attn_logit_softcapping: Optional[float] = None
    hidden_act: str = "silu"
    eos_token_ids: List[int] = field(default_factory=list)
    bos_token_id: Optional[int] = None
    dtype: Any = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    moe: Optional[MoEConfig] = None
    kv_cache_dtype: str = KV_DTYPE_AUTO
    # gemma-style embedding scaling by sqrt(hidden)
    scale_embeddings: bool = False
    # gemma rms-norm convention: weight applied as (1 + w)
    norm_unit_offset: bool = False
    # "rmsnorm" | "layernorm" (StableLM-class models use LayerNorm+bias)
    norm_type: str = "rmsnorm"
    # Phi2-style parallel residual: x + attn(ln(x)) + mlp(ln(x)) with a
    # single input layernorm per layer (reference: phi2.rs)
    parallel_block: bool = False
    # gated (gate/up/down) vs plain (up/down) MLP; Phi2 uses fc1/fc2
    gated_mlp: bool = True
    lm_head_bias: bool = False
    # gemma2/3 sandwich norms: post_attention/post_feedforward norms are
    # applied to the sublayer OUTPUT before the residual add, with
    # pre_feedforward_layernorm before the mlp
    sandwich_norms: bool = False
    # gemma attention scale override: sm_scale = query_pre_attn_scalar^-0.5
    query_pre_attn_scalar: Optional[float] = None
    # gemma3 per-attn-type rope thetas
    rope_local_base_freq: Optional[float] = None
    # gemma4 per-layer heterogeneous KV: full_attention layers may use a
    # different head_dim / kv-head count than sliding layers (reference:
    # gemma4.rs:268-300, models/mod.rs:1124-1192
    # gemma4_per_layer_cache_config).  None = homogeneous.
    global_head_dim: Optional[int] = None
    num_global_key_value_heads: Optional[int] = None
    # rope theta of full_attention layers when it differs from rope_theta
    # (gemma4 rope_parameters.full_attention; reference gemma4.rs:879-898)
    global_rope_theta: Optional[float] = None
    # llama4 iRoPE: every no_rope_step-th layer is a NoPE global layer;
    # rope layers use chunked attention of attention_chunk_size and
    # weightless L2 qk-norm; NoPE layers apply temperature tuning
    # (reference: llama4/mod.rs:185-200, 270-280)
    no_rope_step: Optional[int] = None
    attention_chunk_size: Optional[int] = None
    qk_l2_norm: bool = False
    attn_temperature_tuning: bool = False
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    # MLA (DeepSeek V2/V3; reference: mla_attention.rs)
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_rope_head_dim: Optional[int] = None
    qk_nope_head_dim: Optional[int] = None
    v_head_dim: Optional[int] = None
    # multimodal (VL models): vision tower + special token ids
    # (reference: qwen3_vl/config.rs Qwen3VLConfig)
    vision: Optional[VisionConfig] = None
    image_token_id: Optional[int] = None
    vision_start_token_id: Optional[int] = None
    vision_end_token_id: Optional[int] = None
    extra: Dict[str, Any] = field(default_factory=dict)
    # checkpoint generation_config.json sampling defaults — requests that
    # leave temperature/top_p/top_k/repetition_penalty unset inherit the
    # model's intended values (reference: openai_server.rs:329-359,
    # pipeline.rs:1615-1700)
    generation_defaults: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.kv_cache_dtype not in _VALID_KV_DTYPES:
            raise ValueError(f"invalid kv_cache_dtype {self.kv_cache_dtype}")

    # -- derived -----------------------------------------------------------
    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    def num_kv_heads_for(self, tp_size: int) -> int:
        """KV heads per shard; replicate when heads < tp (reference:
        distributed.rs:725-765 `kv_head_shard`)."""
        if self.num_key_value_heads >= tp_size:
            assert self.num_key_value_heads % tp_size == 0
            return self.num_key_value_heads // tp_size
        return 1

    def is_sliding_layer(self, layer_idx: int) -> bool:
        if self.layer_types is not None:
            return self.layer_types[layer_idx] == "sliding_attention"
        if self.sliding_window is None:
            return False
        if self.sliding_window_pattern is None:
            return True
        p = self.sliding_window_pattern
        return (layer_idx % p) != (p - 1)

    def layer_kv_spec(self, layer_idx: int) -> "Tuple[int, int]":
        """(kv_heads, head_dim) for layer ``layer_idx`` — heterogeneous for
        gemma4-class models (reference: models/mod.rs:1124-1192)."""
        if not self.is_sliding_layer(layer_idx):
            return (
                self.num_global_key_value_heads or self.num_key_value_heads,
                self.global_head_dim or self.head_dim,
            )
        return self.num_key_value_heads, self.head_dim

    @property
    def has_hetero_kv(self) -> bool:
        base = (self.num_key_value_heads, self.head_dim)
        return any(
            self.layer_kv_spec(i) != base
            for i in range(self.num_hidden_layers)
        )

    # -- loading -----------------------------------------------------------
    @classmethod
    def from_hf(cls, cfg: Dict[str, Any], **overrides: Any) -> "ModelConfig":
        # Multimodal configs nest the text model under `text_config`
        # (reference: models/mod.rs:755-860 load_config).
        if "text_config" in cfg and "hidden_size" not in cfg:
            vision = {k: v for k, v in cfg.items() if k != "text_config"}
            inner = dict(cfg["text_config"])
            inner.setdefault("architectures", cfg.get("architectures"))
            inner["_outer_config"] = vision
            cfg = inner

        archs = cfg.get("architectures") or ["LlamaForCausalLM"]
        num_heads = int(cfg.get("num_attention_heads", 32))
        hidden = int(cfg.get("hidden_size", 4096))
        eos = cfg.get("eos_token_id")
        if eos is None:
            eos_ids: List[int] = []
        elif isinstance(eos, int):
            eos_ids = [eos]
        else:
            eos_ids = list(eos)

        moe = None
        if cfg.get("num_experts") or cfg.get("n_routed_experts") or cfg.get("num_local_experts"):
            moe = MoEConfig(
                num_experts=int(
                    cfg.get("num_experts")
                    or cfg.get("n_routed_experts")
                    or cfg.get("num_local_experts")
                ),
                num_experts_per_tok=int(cfg.get("num_experts_per_tok", 2)),
                moe_intermediate_size=int(
                    cfg.get("moe_intermediate_size", cfg.get("intermediate_size", 0))
                ),
                shared_expert_intermediate_size=cfg.get("shared_expert_intermediate_size"),
                num_shared_experts=int(cfg.get("n_shared_experts", 0) or 0),
                norm_topk_prob=bool(cfg.get("norm_topk_prob", True)),
                routed_scaling_factor=float(cfg.get("routed_scaling_factor", 1.0)),
                scoring_func=cfg.get("scoring_func", "softmax"),
                topk_method=cfg.get("topk_method", "greedy"),
                n_group=int(cfg.get("n_group", 1) or 1),
                topk_group=int(cfg.get("topk_group", 1) or 1),
                decoder_sparse_step=int(cfg.get("decoder_sparse_step", 1) or 1),
                mlp_only_layers=list(cfg.get("mlp_only_layers", []) or []),
                first_k_dense_replace=int(cfg.get("first_k_dense_replace", 0) or 0),
            )

        mc = cls(
            architecture=archs[0],
            model_type=cfg.get("model_type", "llama"),
            hidden_size=hidden,
            intermediate_size=int(cfg.get("intermediate_size", 4 * hidden)),
            num_hidden_layers=int(cfg.get("num_hidden_layers", 32)),
            num_attention_heads=num_heads,
            num_key_value_heads=int(cfg.get("num_key_value_heads", num_heads)),
            head_dim=cfg.get("head_dim"),
            vocab_size=int(cfg.get("vocab_size", 32000)),
            max_model_len=int(cfg.get("max_position_embeddings", 4096)),
            rms_norm_eps=float(cfg.get("rms_norm_eps", cfg.get("layer_norm_eps", 1e-6))),
            rope_theta=float(cfg.get("rope_theta", 10000.0)),
            rope_scaling=RopeScaling.from_hf(cfg.get("rope_scaling")),
            partial_rotary_factor=float(cfg.get("partial_rotary_factor", 1.0)),
            tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
            attention_bias=bool(cfg.get("attention_bias", cfg.get("use_bias", False))),
            qkv_bias=bool(cfg.get("attention_bias", cfg.get("use_qkv_bias", False))),
            mlp_bias=bool(cfg.get("mlp_bias", False)),
            sliding_window=cfg.get("sliding_window"),
            sliding_window_pattern=cfg.get("sliding_window_pattern"),
            layer_types=cfg.get("layer_types"),
            use_qk_norm=bool(cfg.get("use_qk_norm", False)),
            logit_softcapping=cfg.get("final_logit_softcapping"),
            attn_logit_softcapping=cfg.get("attn_logit_softcapping"),
            hidden_act=cfg.get("hidden_act", cfg.get("hidden_activation", "silu")),
            eos_token_ids=eos_ids,
            bos_token_id=cfg.get("bos_token_id"),
            quant=QuantConfig.from_hf(cfg.get("quantization_config", {})),
            moe=moe,
            rope_local_base_freq=cfg.get("rope_local_base_freq"),
            q_lora_rank=cfg.get("q_lora_rank"),
            kv_lora_rank=cfg.get("kv_lora_rank"),
            qk_rope_head_dim=cfg.get("qk_rope_head_dim"),
            qk_nope_head_dim=cfg.get("qk_nope_head_dim"),
            v_head_dim=cfg.get("v_head_dim"),
            extra={
                k: v
                for k, v in cfg.items()
                if k.startswith("_") or k.startswith("index_")
                or k in _HYBRID_EXTRA_KEYS
            },
        )
        mt = mc.model_type or ""
        if mt == "phi":
            # Phi-1.5/Phi-2: LayerNorm+bias, parallel attn/MLP block,
            # non-gated fc1/fc2 MLP, biases everywhere, partial rotary
            # (reference: phi2.rs)
            mc.norm_type = "layernorm"
            mc.parallel_block = True
            mc.gated_mlp = False
            mc.qkv_bias = True
            mc.o_bias = True
            mc.mlp_bias = True
            mc.lm_head_bias = True
            mc.partial_rotary_factor = float(
                cfg.get("partial_rotary_factor", 0.5)
            )
        if mt.startswith("stablelm"):
            # StableLM: LayerNorm + bias, partial rotary, qkv bias
            # (reference: stable_lm.rs)
            mc.norm_type = "layernorm"
            mc.partial_rotary_factor = float(
                cfg.get("partial_rotary_factor", 0.25)
            )
            mc.qkv_bias = bool(cfg.get("use_qkv_bias", False))
        if mt.startswith("gemma"):
            # gemma family conventions (reference: gemma.rs / gemma3.rs)
            mc.scale_embeddings = True
            mc.norm_unit_offset = True
            mc.tie_word_embeddings = bool(cfg.get("tie_word_embeddings", True))
            if mt != "gemma":  # gemma2/3/4: sandwich norms + qk scale
                mc.sandwich_norms = True
                mc.query_pre_attn_scalar = float(
                    cfg.get("query_pre_attn_scalar", 256)
                )
            if mt in ("gemma3", "gemma3_text") and "use_qk_norm" not in cfg:
                mc.use_qk_norm = True
        if "Llama4" in mc.architecture:
            # Llama4 iRoPE + chunked attention + interleaved MoE
            # (reference: llama4/config.rs, llama4/mod.rs:185-247)
            mc.no_rope_step = int(cfg.get("no_rope_step", 4))
            mc.attention_chunk_size = int(
                cfg.get("attention_chunk_size", 8192)
            )
            mc.qk_l2_norm = bool(cfg.get("use_qk_norm", True))
            mc.use_qk_norm = False  # weightless L2, not weighted rmsnorm
            mc.attn_temperature_tuning = bool(
                cfg.get("attn_temperature_tuning", True)
            )
            mc.floor_scale = float(cfg.get("floor_scale", 8192.0))
            mc.attn_scale = float(cfg.get("attn_scale", 0.1))
            if mc.moe is not None:
                step = int(cfg.get("interleave_moe_layer_step", 1) or 1)
                explicit = cfg.get("moe_layers")
                if explicit is not None:
                    mc.moe.mlp_only_layers = [
                        i for i in range(mc.num_hidden_layers)
                        if i not in set(explicit)
                    ]
                else:
                    mc.moe.decoder_sparse_step = step
                mc.moe.scoring_func = "sigmoid"
                mc.moe.apply_router_weight_on_input = True
                mc.moe.norm_topk_prob = False
                # llama4 shared expert uses the dense-MLP intermediate size
                mc.moe.shared_expert_intermediate_size = int(
                    cfg.get("intermediate_size", mc.intermediate_size)
                )
                mc.intermediate_size = int(
                    cfg.get("intermediate_size_mlp",
                            cfg.get("intermediate_size",
                                    mc.intermediate_size))
                )
        if "Gemma4" in mc.architecture:
            # Gemma4: per-layer heterogeneous KV (full_attention layers use
            # global_head_dim / num_global_key_value_heads), default 5:1
            # sliding:full layer pattern, per-attn-type rope parameters,
            # partial rotary (reference: gemma4.rs:268-300, 758-900,
            # models/mod.rs:1124-1192)
            if mc.layer_types is None:
                mc.layer_types = [
                    "full_attention" if (i + 1) % 6 == 0
                    else "sliding_attention"
                    for i in range(mc.num_hidden_layers)
                ]
            mc.head_dim = int(
                cfg.get("swa_head_dim", cfg.get("head_dim", 256))
            )
            mc.global_head_dim = int(
                cfg.get("global_head_dim", mc.head_dim)
            )
            mc.num_global_key_value_heads = int(
                cfg.get("num_global_key_value_heads",
                        mc.num_key_value_heads)
            )
            mc.rope_theta = float(cfg.get("rope_theta", 1_000_000.0))
            mc.partial_rotary_factor = float(
                cfg.get("partial_rotary_factor", 0.25)
            )
            mc.rope_local_base_freq = float(
                cfg.get("rope_local_base_freq", 10_000.0)
            )
            rp = cfg.get("rope_parameters") or {}
            fa = rp.get("full_attention") or {}
            sa = rp.get("sliding_attention") or {}
            if fa.get("rope_theta") is not None:
                mc.global_rope_theta = float(fa["rope_theta"])
            if fa.get("partial_rotary_factor") is not None:
                mc.partial_rotary_factor = float(fa["partial_rotary_factor"])
            if sa.get("rope_theta") is not None:
                mc.rope_local_base_freq = float(sa["rope_theta"])
        if mc.architecture == "MiniMaxM2ForCausalLM" and mc.moe is not None:
            # reference forces top-k weight renormalization on MiniMax
            # (minimax.rs:181-188)
            mc.moe.norm_topk_prob = True
        if mc.architecture in _QWEN35_NEXT_ARCHS:
            # Qwen3-Next / Qwen3.5: zero-centered (1+w) RMSNorm everywhere,
            # per-head QK-norm, gated attention output (reference:
            # attention.rs:401-423 is_qwen35_or_next; HF Qwen3NextRMSNorm)
            mc.norm_unit_offset = True
            mc.use_qk_norm = True
            mc.attn_output_gate = True
        # multimodal: the outer (un-nested) config carries the vision tower
        # and image token ids (reference: qwen3_vl/config.rs, multimodal.rs
        # get_image_config)
        outer = cfg.get("_outer_config") or cfg
        if "vision_config" in outer:
            mc.vision = VisionConfig.from_hf(outer["vision_config"])
            for key in ("image_token_id", "vision_start_token_id",
                        "vision_end_token_id"):
                if outer.get(key) is not None:
                    setattr(mc, key, int(outer[key]))
            if mc.image_token_id is None and outer.get("image_token_index"):
                mc.image_token_id = int(outer["image_token_index"])
            # Mistral3 keeps spatial_merge_size at the OUTER level
            # (mistral3_vl/config.rs Mistral3Config.spatial_merge_size)
            if "spatial_merge_size" in outer:
                mc.vision.spatial_merge_size = int(outer["spatial_merge_size"])
        for k, v in overrides.items():
            setattr(mc, k, v)
        return mc

    @classmethod
    def from_json(cls, path: str, **overrides: Any) -> "ModelConfig":
        with open(path) as f:
            mc = cls.from_hf(json.load(f), **overrides)
        gc = os.path.join(os.path.dirname(path), "generation_config.json")
        if os.path.exists(gc):
            mc.generation_defaults = load_generation_config(gc)
        return mc


def load_generation_config(path: str) -> Dict[str, Any]:
    """Sampling defaults from a checkpoint's generation_config.json
    (reference: SamplingGenerationConfig, pipeline.rs:1615-1700).  Only
    the sampling-relevant keys are kept; do_sample=False forces greedy
    like the reference."""
    with open(path) as f:
        gc = json.load(f)
    out: Dict[str, Any] = {}
    for k in ("temperature", "top_p", "top_k", "min_p",
              "repetition_penalty", "presence_penalty",
              "frequency_penalty"):
        if gc.get(k) is not None:
            out[k] = gc[k]
    if gc.get("do_sample") is False:
        out["temperature"] = 0.0
    return out


def derive_yarn_max_len(config: ModelConfig) -> int:
    """Effective max sequence length after rope scaling
    (reference: models/mod.rs:889-905)."""
    rs = config.rope_scaling
    if rs is None or rs.rope_type not in ("yarn", "linear", "dynamic", "longrope"):
        return config.max_model_len
    base = rs.original_max_position_embeddings or config.max_model_len
    return int(base * rs.factor)


# ---------------------------------------------------------------------------
# Cache / scheduler configs
# ---------------------------------------------------------------------------


@dataclass
class CacheConfig:
    """Paged-KV cache sizing (reference: src/lib.rs:128-281 get_cache_config).

    ``block_size`` tokens per page; ``num_gpu_blocks`` device pages and
    ``num_cpu_blocks`` host swap pages.
    """

    block_size: int = 16
    num_gpu_blocks: int = 1024
    num_cpu_blocks: int = 128
    kv_cache_dtype: str = KV_DTYPE_AUTO

    def __post_init__(self) -> None:
        if self.block_size & (self.block_size - 1):
            raise ValueError("block_size must be a power of two")

    @staticmethod
    def kv_bytes_per_token(config: ModelConfig, kv_cache_dtype: str) -> int:
        """Per-token KV bytes across all layers (2 = K and V; MLA stores
        the latent row once — reference lib.rs:128-281 sizes MLA caches as
        kv_lora_rank + rope_dim per token)."""
        elem = {KV_DTYPE_AUTO: 2, KV_DTYPE_FP8: 1, KV_DTYPE_INT8: 1}.get(kv_cache_dtype)
        if getattr(config, "kv_lora_rank", None):
            lat = config.kv_lora_rank + (config.qk_rope_head_dim or 0)
            e = elem if elem is not None else 1
            return config.num_hidden_layers * lat * e
        if kv_cache_dtype == KV_DTYPE_TURBO3:
            # 3-bit K + 4-bit V + two f32 scales per (token, head)
            per = (3 * config.head_dim) // 8 + config.head_dim // 2 + 8
            return config.num_hidden_layers * config.num_key_value_heads * per
        if elem is None:  # int4 — half a byte plus scale overhead
            per = config.head_dim // 2 + 4
            return 2 * config.num_hidden_layers * config.num_key_value_heads * per
        return 2 * config.num_hidden_layers * config.num_key_value_heads * config.head_dim * elem

    @classmethod
    def from_memory_budget(
        cls,
        config: ModelConfig,
        kv_bytes_budget: int,
        block_size: int = 16,
        kv_cache_dtype: str = KV_DTYPE_AUTO,
        cpu_swap_bytes: int = 0,
    ) -> "CacheConfig":
        per_block = cls.kv_bytes_per_token(config, kv_cache_dtype) * block_size
        num_gpu = max(1, kv_bytes_budget // per_block)
        num_cpu = max(0, cpu_swap_bytes // per_block)
        return cls(
            block_size=block_size,
            num_gpu_blocks=int(num_gpu),
            num_cpu_blocks=int(num_cpu),
            kv_cache_dtype=kv_cache_dtype,
        )


@dataclass
class SchedulerConfig:
    """Continuous-batching knobs (reference: scheduler/mod.rs, llm_engine.rs:95)."""

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 8192
    prefill_chunk_size: int = 8192
    max_model_len: int = 4096
    enable_prefix_caching: bool = True
    preemption_mode: str = "recompute"  # or "swap"
    # fraction of prefix-cache blocks evictable under pressure per schedule
    # (reference: scheduler/mod.rs:37 PREFIX_CACHE_EVICT_FRACTION = 10%)
    prefix_evict_fraction: float = 0.1
    # engine steps a swapped-out group must wait before swapping back in
    # (reference: scheduler/mod.rs:39 SWAP_IN_COOLING_PERIOD = 300ms —
    # ours counts scheduler passes, not wall-clock, so replicated
    # multi-host schedulers decide identically regardless of replay
    # timing; see parallel/multihost.py lockstep intake)
    swap_in_cooldown_steps: int = 3
    # decode micro-steps fused into one device dispatch (the CUDA-graph
    # multi-token replay analogue): the sampled token feeds the next
    # forward on-device, so per-step host work amortizes K-fold.  1
    # disables.  Applied only to penalty-free all-decode steps.  Requests
    # can lower it per-request (SamplingParams.decode_steps) for
    # per-token streaming cadence.
    decode_steps: int = 8
    # pipelined decode: dispatch step N+1 (fed by step N's on-device
    # sampled tokens) BEFORE fetching step N's results, so host-side
    # scheduling/detokenization overlaps device compute and the chip
    # never idles between decode dispatches.  Token delivery to streams
    # lags one dispatch.  CVT_PIPELINE=0 disables at runtime.
    pipeline_decode: bool = True
    # speculative decoding (beyond-reference; engine/spec.py): "ngram"
    # fills the decode bucket's padding rows with prompt-lookup drafts
    # and verifies them in one dispatch — up to spec_draft_len + 1
    # tokens per weight pass, bit-identical to greedy decode.  Applies
    # to single-sequence greedy penalty-free steps; None disables.
    speculative: Optional[str] = None
    spec_draft_len: int = 7
    spec_ngram: int = 3

    def __post_init__(self) -> None:
        # the step token budget is authoritative; chunks can never exceed it
        self.prefill_chunk_size = min(
            self.prefill_chunk_size, self.max_num_batched_tokens
        )


@dataclass
class ParallelConfig:
    """Device mesh layout. TP shards attention heads / MLP; DP shards requests."""

    tp_size: int = 1
    dp_size: int = 1

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size


def compute_max_num_parallel_reqs(
    kv_cache_tokens: int,
    prefill_chunk_size: int,
    hbm_free_bytes: int,
    config: "ModelConfig",
    state_slots: Optional[int] = None,
    hard_cap: int = 256,
) -> int:
    """Solve the concurrent-request capacity from KV tokens and the
    activation-workspace budget (TPU re-design of the reference's
    ``compute_max_num_parallel_reqs`` + ``compute_workspace_budget``,
    lib.rs:356-471: CUDA library pools become XLA transient activations).

    - ``kv_limit``: each admitted request needs at least one prefill
      chunk of KV headroom to make progress.
    - ``memory_limit``: the jitted step's peak transient activations are
      ~(chunk x widest-layer width) plus the decode logits buffer; what
      remains of free HBM after that bounds how many decode rows fit.
    - hybrid models are further bounded by their recurrent state slots.
    """
    chunk = max(prefill_chunk_size, 1)
    kv_limit = max(kv_cache_tokens // chunk, 1)

    dsize = 2  # bf16 activations
    widest = max(config.hidden_size * 6, 2 * config.intermediate_size)
    transient = chunk * widest * dsize
    logits = 256 * config.vocab_size * 4  # decode-bucket f32 logits
    workspace = transient + logits
    remaining = max(hbm_free_bytes - workspace, 0)
    # per-request cost beyond KV: ~64 decode rows of the widest
    # activation (scheduler bucket granularity)
    per_req = widest * dsize * 64
    memory_limit = max(remaining // max(per_req, 1), 1)

    parallel = min(kv_limit, memory_limit, hard_cap)
    if state_slots is not None:
        parallel = min(parallel, max(state_slots, 1))
    return max(parallel, 1)


def derive_yarn_parameters(factor: float) -> Tuple[float, float, float, float]:
    """Manual --yarn-scaling-factor -> (beta_fast, beta_slow,
    extrapolation_factor, attn_factor) (reference: models/mod.rs:600-617
    derive_yarn_parameters)."""
    factor = max(factor, 1.0)
    beta_fast = 32.0 if factor <= 4.0 else 32.0 * math.sqrt(factor / 4.0)
    beta_slow = 1.0
    extrapolation = 1.0 + 0.05 * math.sqrt(factor - 8.0) if factor > 8.0 else 1.0
    return beta_fast, beta_slow, extrapolation, 1.0
