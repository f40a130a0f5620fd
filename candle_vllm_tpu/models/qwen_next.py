"""Qwen3-Next / Qwen3.5-class hybrid models: GDN linear attention + full
attention interleaved by ``layer_types``.

Reference: ``/root/reference/src/openai/models/qwen3_5.rs`` (hybrid layer
dispatch at :78-119) and ``models/layers/deltanet.rs`` (GatedDeltaNet with
in_proj_qkvz/in_proj_ba weight layout, depthwise conv, A_log/dt_bias
gating, gated-RMSNorm output).

GDN layers carry recurrent + conv state in a slot pool instead of KV pages
(reference: MambaCache); full-attention layers use the paged KV cache.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from candle_vllm_tpu.models.layers import linear
from candle_vllm_tpu.models.llama import Params
from candle_vllm_tpu.models.qwen_moe import QwenMoeForCausalLM
from candle_vllm_tpu.models.registry import register
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.gdn import gdn_mixed
from candle_vllm_tpu.ops.kv_cache import allocate_kv_pages
from candle_vllm_tpu.ops.norms import rms_norm


@register("Qwen3NextForCausalLM", "Qwen3NextForConditionalGeneration")
class Qwen3NextForCausalLM(QwenMoeForCausalLM):
    """Hybrid decoder; extra config carried in ModelConfig.extra:
    linear_num_value_heads / linear_num_key_heads / linear_key_head_dim /
    linear_value_head_dim / linear_conv_kernel_dim (HF names)."""

    def __init__(self, config, mesh=None):
        super().__init__(config, mesh=mesh)
        e = config.extra
        n = config.num_hidden_layers
        hv_default = e.get("linear_num_heads", config.num_attention_heads)
        self.hv = int(e.get("linear_num_value_heads", hv_default))
        self.hk = int(
            e.get("linear_num_key_heads",
                  e.get("linear_num_key_value_heads", self.hv))
        )
        self.dk = int(e.get("linear_key_head_dim", config.head_dim))
        self.dv = int(e.get("linear_value_head_dim", self.dk))
        self.conv_w = int(
            e.get("linear_conv_kernel_dim", e.get("conv_kernel_size", 4))
        )
        self.key_dim = self.hk * self.dk
        self.value_dim = self.hv * self.dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        # layer-type resolution (reference: resolve_qwen3_hybrid_config,
        # models/mod.rs:972-1033): explicit layer_types / layers_block_type,
        # else full_attention_interval, else all-full-attention
        lt = config.layer_types or e.get("layers_block_type")
        if lt is None:
            interval = int(e.get("full_attention_interval", 0) or 0)
            if interval > 0:
                lt = [
                    "full_attention" if (i + 1) % interval == 0
                    else "linear_attention"
                    for i in range(n)
                ]
            else:
                lt = ["full_attention"] * n
        lt = ["full_attention" if t == "attention" else t for t in lt]
        if len(lt) != n:
            lt = ["full_attention"] * n
        self.gdn_layers = [
            i for i in range(n) if lt[i] == "linear_attention"
        ]

    def is_gdn(self, i: int) -> bool:
        return i in self.gdn_layers

    # -- checkpoint layout normalization ------------------------------------
    def _qkvz_perm(self):
        """HF groups in_proj_qkvz output columns per key head as
        [q_h(dk) | k_h(dk) | v_h(G*dv) | z_h(G*dv)] x num_k_heads (G =
        hv/hk); runtime wants flat [q | k | v | z] (reference:
        fix_qwen3next_projection_order, deltanet.rs:268-300)."""
        import numpy as np

        G = self.hv // self.hk
        per = 2 * self.dk + 2 * G * self.dv
        q, k, v, z = [], [], [], []
        for h in range(self.hk):
            o = h * per
            q += list(range(o, o + self.dk))
            k += list(range(o + self.dk, o + 2 * self.dk))
            v += list(range(o + 2 * self.dk, o + 2 * self.dk + G * self.dv))
            z += list(range(o + 2 * self.dk + G * self.dv, o + per))
        return np.asarray(q + k + v + z)

    def _ba_perm(self):
        """in_proj_ba ships per key head as [b_h(G) | a_h(G)]; flat [b|a]."""
        import numpy as np

        G = self.hv // self.hk
        b, a = [], []
        for h in range(self.hk):
            o = h * 2 * G
            b += list(range(o, o + G))
            a += list(range(o + G, o + 2 * G))
        return np.asarray(b + a)

    def checkpoint_fixup(self, name, arr):
        if ".linear_attn." not in name:
            return arr
        if ".in_proj_qkvz." in name:
            return arr[..., self._qkvz_perm()]
        if ".in_proj_ba." in name:
            return arr[..., self._ba_perm()]
        if ".conv1d.weight" in name and arr.ndim == 3:
            # HF depthwise conv ships [dim, 1, W]; kernel wants [dim, W]
            return arr[:, 0, :]
        return arr

    def is_moe_layer(self, i: int) -> bool:
        if self.config.moe is None:
            return False
        return super().is_moe_layer(i)

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        c = self.config
        for i in self.gdn_layers:
            a = f"model.layers.{i}.self_attn"
            for k in list(shapes):
                if k.startswith(a + "."):
                    shapes.pop(k)
            g = f"model.layers.{i}.linear_attn"
            shapes[f"{g}.in_proj_qkvz.weight"] = (
                c.hidden_size, 2 * self.key_dim + 2 * self.value_dim
            )
            shapes[f"{g}.in_proj_ba.weight"] = (c.hidden_size, 2 * self.hv)
            shapes[f"{g}.conv1d.weight"] = (self.conv_dim, self.conv_w)
            shapes[f"{g}.A_log"] = (self.hv,)
            shapes[f"{g}.dt_bias"] = (self.hv,)
            shapes[f"{g}.norm.weight"] = (self.dv,)
            shapes[f"{g}.out_proj.weight"] = (self.value_dim, c.hidden_size)
        return shapes

    # -- cache construction (engine delegates here) -------------------------
    def make_caches(
        self,
        num_pages: int,
        page_size: int,
        dtype,
        pool_size: int,
        pad_head_dim_to: int = 1,
        kv_sharding=None,
    ) -> List:
        caches: List = []
        kv_heads, kv_dim = self.kv_cache_spec()
        for i in range(self.config.num_hidden_layers):
            if self.is_gdn(i):
                caches.append(
                    {
                        "rec": jnp.zeros(
                            (pool_size, self.hv, self.dk, self.dv), jnp.float32
                        ),
                        "conv": jnp.zeros(
                            (pool_size, self.conv_dim, self.conv_w - 1),
                            jnp.float32,
                        ),
                    }
                )
            else:
                caches.append(
                    allocate_kv_pages(
                        1, num_pages, page_size, kv_heads, kv_dim,
                        dtype=dtype, sharding=kv_sharding,
                        pad_head_dim_to=pad_head_dim_to,
                    )[0]
                )
        return caches

    def _gdn_block(
        self, params: Params, g: str, x: jnp.ndarray, cache: Dict,
        step: StepInput,
    ) -> Tuple[jnp.ndarray, Dict]:
        T = x.shape[0]
        kd, vd = self.key_dim, self.value_dim
        if f"{g}.in_proj_qkvz.weight" in params:
            # fused layout (Qwen3-Next checkpoints; per-key-head grouping
            # already flattened at load by checkpoint_fixup)
            qkvz = linear(x, params, f"{g}.in_proj_qkvz")
            ba = linear(x, params, f"{g}.in_proj_ba")
            mixed_qkv = qkvz[:, : 2 * kd + vd]
            z = qkvz[:, 2 * kd + vd :].reshape(T, self.hv, self.dv)
            b = ba[:, : self.hv]
            a = ba[:, self.hv :]
        else:
            # Qwen3.5 split layout: in_proj_qkv / in_proj_z / in_proj_b /
            # in_proj_a, already flat [q|k|v] (reference: GdnProjection::
            # SplitQkvZaLegacy, deltanet.rs:153-246)
            mixed_qkv = linear(x, params, f"{g}.in_proj_qkv")
            z = linear(x, params, f"{g}.in_proj_z").reshape(
                T, self.hv, self.dv
            )
            b = linear(x, params, f"{g}.in_proj_b")
            a = linear(x, params, f"{g}.in_proj_a")
        # chunked-parallel form for prefill-size buckets (O(T/64)
        # sequential steps); tiny decode buckets keep the cheap scan
        from candle_vllm_tpu.ops.gdn import gdn_mixed_chunked

        gdn_fn = gdn_mixed_chunked if x.shape[0] >= 64 else gdn_mixed
        out, rec, conv, snapshots = gdn_fn(
            mixed_qkv, z, a, b,
            params[f"{g}.conv1d.weight"],
            params.get(f"{g}.conv1d.bias"),
            params[f"{g}.A_log"],
            params[f"{g}.dt_bias"],
            params[f"{g}.norm.weight"],
            cache["rec"], cache["conv"],
            step.state_slots, step.cu_q_lens, step.kv_lens,
            step.snap_pos,
            num_k_heads=self.hk, num_v_heads=self.hv,
            head_k_dim=self.dk, head_v_dim=self.dv,
            scale=self.dk ** -0.5,
        )
        out = linear(out.astype(x.dtype), params, f"{g}.out_proj")
        new_cache = {"rec": rec, "conv": conv}
        if snapshots is not None:
            # block-boundary state snapshots ride the step outputs; the
            # engine fetches + stores them host-side (mamba.rs analogue)
            new_cache["snap_rec"], new_cache["snap_conv"] = snapshots
        return out, new_cache

    def forward_hidden(self, params, kv_pages, step: StepInput):
        from candle_vllm_tpu.models.layers import attention_block
        from candle_vllm_tpu.ops.rope import compute_cos_sin

        c = self.config
        x = params["model.embed_tokens.weight"][step.token_ids]
        cos_sin = compute_cos_sin(step.positions, self.rope)
        new_caches: List = []
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}"
            # _norm honors the zero-centered (1+w) convention these models
            # use (config.norm_unit_offset; HF Qwen3NextRMSNorm)
            h = self._norm(params, x, f"{p}.input_layernorm")
            if self.is_gdn(i):
                attn_out, cache = self._gdn_block(
                    params, f"{p}.linear_attn", h, kv_pages[i], step
                )
            else:
                attn_out, cache = attention_block(
                    h, params, f"{p}.self_attn", self.layer_specs[i],
                    self.rope, cos_sin, kv_pages[i], step, mesh=self.mesh,
                )
            new_caches.append(cache)
            x = x + attn_out
            h = self._norm(params, x, f"{p}.post_attention_layernorm")
            x = x + self._mlp_block(params, f"{p}.mlp", h, i)
        x = self._norm(params, x, "model.norm")
        return x, new_caches


@register(
    "Qwen3_5ForCausalLM",
    "Qwen3_5ForConditionalGeneration",
    "Qwen3_5MoeForCausalLM",
    "Qwen3_5MoeForConditionalGeneration",
)
class Qwen3_5ForCausalLM(Qwen3NextForCausalLM):
    """Qwen3.5 dense/MoE hybrids (reference: qwen3_5.rs).  Same decoder as
    Qwen3-Next; checkpoints ship the GDN input projections SPLIT
    (in_proj_qkv / in_proj_z / in_proj_b / in_proj_a, already flat —
    reference: GdnProjection::SplitQkvZaLegacy, deltanet.rs:153-246), which
    ``_gdn_block`` dispatches on at forward time."""

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = super().param_shapes()
        c = self.config
        for i in self.gdn_layers:
            g = f"model.layers.{i}.linear_attn"
            shapes.pop(f"{g}.in_proj_qkvz.weight")
            shapes.pop(f"{g}.in_proj_ba.weight")
            shapes[f"{g}.in_proj_qkv.weight"] = (
                c.hidden_size, 2 * self.key_dim + self.value_dim
            )
            shapes[f"{g}.in_proj_z.weight"] = (c.hidden_size, self.value_dim)
            shapes[f"{g}.in_proj_b.weight"] = (c.hidden_size, self.hv)
            shapes[f"{g}.in_proj_a.weight"] = (c.hidden_size, self.hv)
        return shapes
