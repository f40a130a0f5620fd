"""Vision transformer tower (Qwen3-VL family; Gemma3/Mistral3 towers map
onto the same skeleton via config).

TPU re-design of the reference's ``src/openai/models/qwen3_vl/vision.rs``
(Qwen3VLVisionModel: PatchEmbed, VisionBlock, PatchMerger,
fast_pos_embed_interpolate, rot_pos_emb).  Differences:

- The encoder jit consumes ONLY statically-shaped arrays prepared on host
  by ``multimodal.processor.vision_encoder_host_inputs``: padded patch
  rows, segment ids, bilinear pos-embed taps, and rotary cos/sin.  The
  reference loops per image on the GPU (vision.rs:160-199 cu_seqlens
  windows); here block-diagonal attention is one segment-id-masked
  batched attention — no data-dependent control flow on device.
- The patch conv3d is a plain matmul: host patchify flattens each patch
  to (C, tps, ps, ps) order matching the conv kernel flatten
  (vision.rs:42-53).
- Attention runs in query chunks (``lax.map`` over row blocks) so the
  [Np, Np] score matrix never materializes at the 4096-patch bucket.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from candle_vllm_tpu.config import ModelConfig, VisionConfig

Params = Dict[str, jnp.ndarray]

_Q_CHUNK = 512  # query rows per attention block


def _layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _gelu(x: jnp.ndarray, act: str) -> jnp.ndarray:
    if act in ("gelu_pytorch_tanh", "gelu_new"):
        return jax.nn.gelu(x, approximate=True)
    if act == "silu":
        return jax.nn.silu(x)
    return jax.nn.gelu(x, approximate=False)



def _segment_attention(q, k, val, seg_ids, scale):
    """Block-diagonal (per-image) attention via segment-id masking, in
    query chunks so the [Np, Np] score matrix never materializes (shared
    by the Qwen and Pixtral towers)."""
    Np, nh, hd = q.shape
    kT = k.transpose(1, 2, 0)            # [nh, hd, Np]
    vT = val.transpose(1, 0, 2)          # [nh, Np, hd]
    n_chunks = max(Np // _Q_CHUNK, 1)
    cq = Np // n_chunks
    q_blocks = q.reshape(n_chunks, cq, nh, hd).transpose(0, 2, 1, 3)
    seg_q = seg_ids.reshape(n_chunks, cq)
    valid_k = (seg_ids > 0)[None, :]

    def block(args):
        qb, sq = args                    # [nh, cq, hd], [cq]
        logits = jnp.einsum("hqd,hdk->hqk", qb, kT) * scale
        allow = (sq[:, None] == seg_ids[None, :]) & valid_k
        logits = jnp.where(allow[None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("hqk,hkd->hqd", p, vT)

    out = jax.lax.map(block, (q_blocks, seg_q))   # [nc, nh, cq, hd]
    return out.transpose(0, 2, 1, 3).reshape(Np, nh * hd)


class VisionTower:
    """Functional ViT encoder over host-precomputed inputs.

    Weight names mirror the HF checkpoint (``model.visual.*``) so the
    flat param dict loads with zero renames; the conv3d patch kernel is
    flattened to a matmul at load (see ``Qwen3VL.checkpoint_fixup``).
    """

    def __init__(self, config: ModelConfig):
        self.config = config
        self.v: VisionConfig = config.vision
        v = self.v
        self.head_dim = v.hidden_size // v.num_heads
        self.merge_unit = v.spatial_merge_size ** 2
        self.merged_hidden = v.hidden_size * self.merge_unit
        self.patch_dim = (
            v.in_channels * v.temporal_patch_size * v.patch_size ** 2
        )

    # -- parameters --------------------------------------------------------
    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        v = self.v
        H, I = v.hidden_size, v.intermediate_size
        mh, oh = self.merged_hidden, v.out_hidden_size
        s: Dict[str, Tuple[int, ...]] = {
            "model.visual.patch_embed.proj.weight": (self.patch_dim, H),
            "model.visual.patch_embed.proj.bias": (H,),
            "model.visual.pos_embed.weight": (v.num_position_embeddings, H),
            "model.visual.merger.norm.weight": (H,),
            "model.visual.merger.norm.bias": (H,),
            "model.visual.merger.linear_fc1.weight": (mh, mh),
            "model.visual.merger.linear_fc1.bias": (mh,),
            "model.visual.merger.linear_fc2.weight": (mh, oh),
            "model.visual.merger.linear_fc2.bias": (oh,),
        }
        for i in range(v.depth):
            p = f"model.visual.blocks.{i}"
            s[f"{p}.norm1.weight"] = (H,)
            s[f"{p}.norm1.bias"] = (H,)
            s[f"{p}.norm2.weight"] = (H,)
            s[f"{p}.norm2.bias"] = (H,)
            s[f"{p}.attn.qkv.weight"] = (H, 3 * H)
            s[f"{p}.attn.qkv.bias"] = (3 * H,)
            s[f"{p}.attn.proj.weight"] = (H, H)
            s[f"{p}.attn.proj.bias"] = (H,)
            s[f"{p}.mlp.linear_fc1.weight"] = (H, I)
            s[f"{p}.mlp.linear_fc1.bias"] = (I,)
            s[f"{p}.mlp.linear_fc2.weight"] = (I, H)
            s[f"{p}.mlp.linear_fc2.bias"] = (H,)
        # deepstack mergers use post-shuffle norm (norm over merged dim,
        # vision.rs:300-316 use_postshuffle_norm=true)
        for i in range(len(v.deepstack_visual_indexes)):
            p = f"model.visual.deepstack_merger_list.{i}"
            s[f"{p}.norm.weight"] = (mh,)
            s[f"{p}.norm.bias"] = (mh,)
            s[f"{p}.linear_fc1.weight"] = (mh, mh)
            s[f"{p}.linear_fc1.bias"] = (mh,)
            s[f"{p}.linear_fc2.weight"] = (mh, oh)
            s[f"{p}.linear_fc2.bias"] = (oh,)
        return s

    # -- blocks ------------------------------------------------------------
    def _attention(self, params: Params, prefix: str, x: jnp.ndarray,
                   seg_ids: jnp.ndarray, cos: jnp.ndarray,
                   sin: jnp.ndarray) -> jnp.ndarray:
        v = self.v
        Np, H = x.shape
        hd, nh = self.head_dim, v.num_heads
        qkv = (
            jnp.dot(x, params[f"{prefix}.qkv.weight"])
            + params[f"{prefix}.qkv.bias"]
        ).reshape(Np, 3, nh, hd)
        q = qkv[:, 0].astype(jnp.float32)
        k = qkv[:, 1].astype(jnp.float32)
        val = qkv[:, 2].astype(jnp.float32)
        cosf = cos[:, None, :].astype(jnp.float32)
        sinf = sin[:, None, :].astype(jnp.float32)
        q = q * cosf + _rotate_half(q) * sinf
        k = k * cosf + _rotate_half(k) * sinf
        out = _segment_attention(q, k, val, seg_ids, hd ** -0.5).astype(
            x.dtype
        )
        return jnp.dot(out, params[f"{prefix}.proj.weight"]) + params[
            f"{prefix}.proj.bias"
        ]

    def _merger(self, params: Params, prefix: str, x: jnp.ndarray,
                postshuffle: bool) -> jnp.ndarray:
        mh = self.merged_hidden
        if postshuffle:
            y = _layer_norm(
                x.reshape(-1, mh),
                params[f"{prefix}.norm.weight"],
                params[f"{prefix}.norm.bias"],
            )
        else:
            y = _layer_norm(
                x, params[f"{prefix}.norm.weight"],
                params[f"{prefix}.norm.bias"],
            ).reshape(-1, mh)
        y = jnp.dot(y, params[f"{prefix}.linear_fc1.weight"]) + params[
            f"{prefix}.linear_fc1.bias"
        ]
        y = _gelu(y, "gelu")
        return jnp.dot(y, params[f"{prefix}.linear_fc2.weight"]) + params[
            f"{prefix}.linear_fc2.bias"
        ]

    # -- forward -----------------------------------------------------------
    def encode(
        self,
        params: Params,
        patches: jnp.ndarray,   # [Np, patch_dim] f32
        seg_ids: jnp.ndarray,   # [Np] i32 (0 = padding)
        pos_idx: jnp.ndarray,   # [4, Np] i32 bilinear taps
        pos_w: jnp.ndarray,     # [4, Np] f32
        cos: jnp.ndarray,       # [Np, head_dim] f32
        sin: jnp.ndarray,       # [Np, head_dim] f32
    ) -> jnp.ndarray:
        """Returns stacked merged embeddings [1 + n_deepstack, Np/mu,
        out_hidden]: row 0 is the final merger output, rows 1.. are the
        deepstack taps in ``deepstack_visual_indexes`` order."""
        v = self.v
        dtype = self.config.dtype
        x = jnp.dot(
            patches.astype(dtype),
            params["model.visual.patch_embed.proj.weight"],
        ) + params["model.visual.patch_embed.proj.bias"]

        pe_table = params["model.visual.pos_embed.weight"].astype(jnp.float32)
        pe = jnp.einsum(
            "tn,tnh->nh", pos_w, pe_table[pos_idx]
        )
        x = x + pe.astype(dtype)

        ds_lookup = {
            layer: i for i, layer in enumerate(v.deepstack_visual_indexes)
        }
        taps: List[jnp.ndarray] = [None] * len(ds_lookup)
        for i in range(v.depth):
            p = f"model.visual.blocks.{i}"
            h = _layer_norm(
                x, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"]
            )
            x = x + self._attention(params, f"{p}.attn", h, seg_ids, cos, sin)
            h = _layer_norm(
                x, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"]
            )
            h = jnp.dot(h, params[f"{p}.mlp.linear_fc1.weight"]) + params[
                f"{p}.mlp.linear_fc1.bias"
            ]
            h = _gelu(h, v.hidden_act)
            x = x + (
                jnp.dot(h, params[f"{p}.mlp.linear_fc2.weight"])
                + params[f"{p}.mlp.linear_fc2.bias"]
            )
            if i in ds_lookup:
                taps[ds_lookup[i]] = self._merger(
                    params, f"model.visual.deepstack_merger_list.{ds_lookup[i]}",
                    x, postshuffle=True,
                )

        main = self._merger(params, "model.visual.merger", x, postshuffle=False)
        return jnp.stack([main] + taps, axis=0)


class SiglipVisionTower:
    """SigLIP ViT + avg-pool multimodal projector (Gemma3-VL family).

    TPU re-design of the reference's ``gemma3_vl/mod.rs``
    (VisionEmbeddings, VisionTransformer, MultiModalProjector): fixed
    image size means fixed patch count — the encoder jit is a plain
    [N, P, hidden] batch with full (non-causal, non-segmented)
    attention, learned positional embeddings, and the projector's
    avg-pool + RMS-norm + linear down to ``mm_tokens_per_image`` text
    embeddings per image.  Weight names mirror the HF checkpoint
    (``vision_tower.vision_model.*`` / ``multi_modal_projector.*``).
    """

    def __init__(self, config: ModelConfig):
        self.config = config
        self.v: VisionConfig = config.vision
        v = self.v
        self.head_dim = v.hidden_size // v.num_heads
        self.side = v.image_size // v.patch_size
        self.num_patches = self.side * self.side
        self.patch_dim = v.in_channels * v.patch_size ** 2
        mm = (config.extra or {}).get("_outer_config", {}) or {}
        self.tokens_per_image = int(mm.get("mm_tokens_per_image", 256))
        pooled = int(round(self.tokens_per_image ** 0.5))
        assert pooled * pooled == self.tokens_per_image
        assert self.side % pooled == 0
        self.pool_k = self.side // pooled
        self.pooled_side = pooled

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        v = self.v
        H, I = v.hidden_size, v.intermediate_size
        vm = "vision_tower.vision_model"
        s: Dict[str, Tuple[int, ...]] = {
            f"{vm}.embeddings.patch_embedding.weight": (self.patch_dim, H),
            f"{vm}.embeddings.patch_embedding.bias": (H,),
            f"{vm}.embeddings.position_embedding.weight": (
                self.num_patches, H
            ),
            f"{vm}.post_layernorm.weight": (H,),
            f"{vm}.post_layernorm.bias": (H,),
            "multi_modal_projector.mm_input_projection_weight": (
                H, self.config.hidden_size
            ),
            "multi_modal_projector.mm_soft_emb_norm.weight": (H,),
        }
        for i in range(v.depth):
            p = f"{vm}.encoder.layers.{i}"
            for ln in ("layer_norm1", "layer_norm2"):
                s[f"{p}.{ln}.weight"] = (H,)
                s[f"{p}.{ln}.bias"] = (H,)
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                s[f"{p}.self_attn.{proj}.weight"] = (H, H)
                s[f"{p}.self_attn.{proj}.bias"] = (H,)
            s[f"{p}.mlp.fc1.weight"] = (H, I)
            s[f"{p}.mlp.fc1.bias"] = (I,)
            s[f"{p}.mlp.fc2.weight"] = (I, H)
            s[f"{p}.mlp.fc2.bias"] = (H,)
        return s

    def _attention(self, params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
        v = self.v
        N, P, H = x.shape
        nh, hd = v.num_heads, self.head_dim

        def proj(name):
            return (
                jnp.einsum(
                    "nph,hk->npk", x,
                    params[f"{p}.self_attn.{name}.weight"],
                )
                + params[f"{p}.self_attn.{name}.bias"]
            ).reshape(N, P, nh, hd)

        q = proj("q_proj").astype(jnp.float32)
        k = proj("k_proj").astype(jnp.float32)
        val = proj("v_proj").astype(jnp.float32)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, val).reshape(N, P, H)
        return (
            jnp.einsum("nph,hk->npk", out.astype(x.dtype),
                       params[f"{p}.self_attn.out_proj.weight"])
            + params[f"{p}.self_attn.out_proj.bias"]
        )

    def encode(self, params: Params, patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, patch_dim] raster order -> [1, N*tokens_per_image,
        text_hidden] (leading axis matches the deepstack convention: row 0
        only — SigLIP has no deepstack taps)."""
        v = self.v
        dtype = self.config.dtype
        vm = "vision_tower.vision_model"
        x = (
            jnp.einsum("npd,dh->nph", patches.astype(dtype),
                       params[f"{vm}.embeddings.patch_embedding.weight"])
            + params[f"{vm}.embeddings.patch_embedding.bias"]
        )
        x = x + params[f"{vm}.embeddings.position_embedding.weight"][None]
        for i in range(v.depth):
            p = f"{vm}.encoder.layers.{i}"
            h = _layer_norm(x, params[f"{p}.layer_norm1.weight"],
                            params[f"{p}.layer_norm1.bias"])
            x = x + self._attention(params, p, h)
            h = _layer_norm(x, params[f"{p}.layer_norm2.weight"],
                            params[f"{p}.layer_norm2.bias"])
            h = (
                jnp.einsum("nph,hk->npk", h, params[f"{p}.mlp.fc1.weight"])
                + params[f"{p}.mlp.fc1.bias"]
            )
            h = _gelu(h, v.hidden_act)
            x = x + (
                jnp.einsum("npk,kh->nph", h, params[f"{p}.mlp.fc2.weight"])
                + params[f"{p}.mlp.fc2.bias"]
            )
        x = _layer_norm(x, params[f"{vm}.post_layernorm.weight"],
                        params[f"{vm}.post_layernorm.bias"])

        # projector: [N, side, side, H] -> avg-pool k x k -> RMS norm ->
        # linear to text hidden (gemma3_vl/mod.rs:311-328)
        N = x.shape[0]
        side, k = self.side, self.pool_k
        g = x.reshape(N, side // k, k, side // k, k, v.hidden_size)
        pooled = g.mean(axis=(2, 4))                 # [N, ps, ps, H]
        pooled = pooled.reshape(N, self.tokens_per_image, v.hidden_size)
        from candle_vllm_tpu.ops.norms import rms_norm

        pooled = rms_norm(
            pooled, params["multi_modal_projector.mm_soft_emb_norm.weight"],
            1e-6, add_unit_offset=True,
        )
        out = jnp.einsum(
            "nth,hk->ntk", pooled,
            params["multi_modal_projector.mm_input_projection_weight"],
        )
        return out.reshape(1, N * self.tokens_per_image,
                           self.config.hidden_size)


class PixtralVisionTower:
    """Pixtral ViT encoder (Mistral3-VL family).

    TPU re-design of the reference's ``src/openai/models/mistral3_vl/
    vision.rs`` (VisionModel: patch_conv, ln_pre, 2D rotary from meshgrid
    position ids, block-diagonal per-image attention) plus the Mistral3
    multimodal projector (mod.rs:23-128: RMS norm -> 2x2 patch merger ->
    linear_1/gelu/linear_2).  Like the Qwen tower, every data-dependent
    quantity (segment ids, rotary cos/sin from (row, col) coords) is
    host-precomputed so the encoder jit is static-shaped; the per-image
    attention loop becomes one segment-masked batched attention.

    The tile processor emits patches in merge-group order, so the merger
    is a plain reshape: each consecutive ``m*m`` patch rows form one
    merged token, flattened channel-major ((c, di, dj)) to match the HF
    unfold layout the ``merging_layer`` weight expects (mod.rs:44-79).
    """

    def __init__(self, config: ModelConfig):
        self.config = config
        self.v: VisionConfig = config.vision
        v = self.v
        self.head_dim = v.hidden_size // v.num_heads
        self.merge_unit = v.spatial_merge_size ** 2
        self.patch_dim = v.in_channels * v.patch_size ** 2
        self.max_side = v.image_size // v.patch_size

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        v = self.v
        H, I = v.hidden_size, v.intermediate_size
        Ht = self.config.hidden_size
        vt = "vision_tower"
        s: Dict[str, Tuple[int, ...]] = {
            f"{vt}.patch_conv.weight": (self.patch_dim, H),
            f"{vt}.ln_pre.weight": (H,),
            "multi_modal_projector.norm.weight": (H,),
            "multi_modal_projector.patch_merger.merging_layer.weight": (
                H * self.merge_unit, H
            ),
            "multi_modal_projector.linear_1.weight": (H, Ht),
            "multi_modal_projector.linear_2.weight": (Ht, Ht),
        }
        for i in range(v.depth):
            p = f"{vt}.transformer.layers.{i}"
            s[f"{p}.attention_norm.weight"] = (H,)
            s[f"{p}.ffn_norm.weight"] = (H,)
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                s[f"{p}.attention.{proj}.weight"] = (H, H)
            s[f"{p}.feed_forward.gate_proj.weight"] = (H, I)
            s[f"{p}.feed_forward.up_proj.weight"] = (H, I)
            s[f"{p}.feed_forward.down_proj.weight"] = (I, H)
        return s

    @staticmethod
    def _rms(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
        from candle_vllm_tpu.ops.norms import rms_norm

        return rms_norm(x, w, eps)

    @staticmethod
    def _rope_half(x: jnp.ndarray, cos: jnp.ndarray,
                   sin: jnp.ndarray) -> jnp.ndarray:
        """HF rotate-half pairing: (x[i], x[i + hd/2]) rotate by angle i
        (Pixtral checkpoints are trained with apply_rotary_pos_emb over
        cat(freqs, freqs))."""
        hd = x.shape[-1]
        h = hd // 2
        c = cos[:, None, :]
        s = sin[:, None, :]
        x1, x2 = x[..., :h], x[..., h:]
        return jnp.concatenate(
            [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
        )

    def _attention(self, params: Params, prefix: str, x: jnp.ndarray,
                   seg_ids: jnp.ndarray, cos: jnp.ndarray,
                   sin: jnp.ndarray) -> jnp.ndarray:
        v = self.v
        Np, H = x.shape
        nh, hd = v.num_heads, self.head_dim
        q = jnp.dot(x, params[f"{prefix}.q_proj.weight"]).reshape(Np, nh, hd)
        k = jnp.dot(x, params[f"{prefix}.k_proj.weight"]).reshape(Np, nh, hd)
        val = jnp.dot(x, params[f"{prefix}.v_proj.weight"]).reshape(
            Np, nh, hd
        ).astype(jnp.float32)
        q = self._rope_half(q.astype(jnp.float32), cos, sin)
        k = self._rope_half(k.astype(jnp.float32), cos, sin)
        out = _segment_attention(q, k, val, seg_ids, hd ** -0.5).astype(
            x.dtype
        )
        return jnp.dot(out, params[f"{prefix}.o_proj.weight"])

    def encode(
        self,
        params: Params,
        patches: jnp.ndarray,   # [Np, patch_dim] f32, merge-group order
        seg_ids: jnp.ndarray,   # [Np] i32 (0 = padding)
        cos: jnp.ndarray,       # [Np, head_dim/2] f32
        sin: jnp.ndarray,       # [Np, head_dim/2] f32
    ) -> jnp.ndarray:
        """Returns [1, Np/merge_unit, text_hidden] (row 0 only — no
        deepstack taps, matching the Qwen embedding convention)."""
        v = self.v
        dtype = self.config.dtype
        x = jnp.dot(
            patches.astype(dtype), params["vision_tower.patch_conv.weight"]
        )
        x = self._rms(x, params["vision_tower.ln_pre.weight"])
        for i in range(v.depth):
            p = f"vision_tower.transformer.layers.{i}"
            h = self._rms(x, params[f"{p}.attention_norm.weight"])
            x = x + self._attention(
                params, f"{p}.attention", h, seg_ids, cos, sin
            )
            h = self._rms(x, params[f"{p}.ffn_norm.weight"])
            g = jnp.dot(h, params[f"{p}.feed_forward.gate_proj.weight"])
            u = jnp.dot(h, params[f"{p}.feed_forward.up_proj.weight"])
            x = x + jnp.dot(
                jax.nn.silu(g) * u,
                params[f"{p}.feed_forward.down_proj.weight"],
            )

        # projector (mod.rs:82-128): RMS norm -> patch merge (channel-major
        # (c, di, dj) flatten, matching HF unfold) -> linear_1/gelu/linear_2
        y = self._rms(
            x, params["multi_modal_projector.norm.weight"],
            eps=self.config.rms_norm_eps,
        )
        mu = self.merge_unit
        Nm = y.shape[0] // mu
        merged = y.reshape(Nm, mu, v.hidden_size).transpose(0, 2, 1).reshape(
            Nm, v.hidden_size * mu
        )
        merged = jnp.dot(
            merged,
            params["multi_modal_projector.patch_merger.merging_layer.weight"],
        )
        h1 = jnp.dot(merged, params["multi_modal_projector.linear_1.weight"])
        b1 = params.get("multi_modal_projector.linear_1.bias")
        if b1 is not None:
            h1 = h1 + b1
        h1 = _gelu(h1, "gelu")
        out = jnp.dot(h1, params["multi_modal_projector.linear_2.weight"])
        b2 = params.get("multi_modal_projector.linear_2.bias")
        if b2 is not None:
            out = out + b2
        return out.reshape(1, Nm, self.config.hidden_size)


class Llama4VisionTower:
    """Llama4 ViT encoder + pixel-shuffle adapter + projector.

    TPU re-design of the reference's ``src/openai/models/llama4/vision.rs``
    (Llama4VisionModel: unfold-conv patch embed, class token appended
    LAST, learned absolute positions, interleaved 2D rotary with zeroed
    class-token frequencies, LayerNorm/bias encoder, pixel shuffle at
    ratio r, gelu(fc2(gelu(fc1 x))) adapter) and the mod.rs:304-328
    ``multi_modal_projector.linear_1``.  Tiles are fixed-size, so the 2D
    rotary table is a trace-time constant and per-tile attention is one
    batched einsum — no masks or data-dependent shapes.
    """

    def __init__(self, config: ModelConfig):
        self.config = config
        self.v: VisionConfig = config.vision
        v = self.v
        self.head_dim = v.hidden_size // v.num_heads
        self.side = v.image_size // v.patch_size
        self.num_patches = self.side ** 2          # without class token
        self.patch_dim = v.in_channels * v.patch_size ** 2
        r = v.pixel_shuffle_ratio
        self.shuffled_dim = int(round(v.hidden_size / (r * r)))
        self.tokens_per_tile = int(round(self.num_patches * r * r))

    def param_shapes(self) -> Dict[str, Tuple[int, ...]]:
        v = self.v
        H, I = v.hidden_size, v.intermediate_size
        vm = "vision_model"
        s: Dict[str, Tuple[int, ...]] = {
            f"{vm}.patch_embedding.linear.weight": (self.patch_dim, H),
            f"{vm}.class_embedding": (H,),
            f"{vm}.positional_embedding_vlm": (self.num_patches + 1, H),
            f"{vm}.layernorm_pre.weight": (H,),
            f"{vm}.layernorm_pre.bias": (H,),
            f"{vm}.layernorm_post.weight": (H,),
            f"{vm}.layernorm_post.bias": (H,),
            f"{vm}.vision_adapter.mlp.fc1.weight": (
                self.shuffled_dim, v.projector_input_dim
            ),
            f"{vm}.vision_adapter.mlp.fc2.weight": (
                v.projector_input_dim, v.projector_output_dim
            ),
            "multi_modal_projector.linear_1.weight": (
                v.vision_output_dim, self.config.hidden_size
            ),
        }
        for i in range(v.depth):
            p = f"{vm}.model.layers.{i}"
            for n in ("input_layernorm", "post_attention_layernorm"):
                s[f"{p}.{n}.weight"] = (H,)
                s[f"{p}.{n}.bias"] = (H,)
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                s[f"{p}.self_attn.{proj}.weight"] = (H, H)
                s[f"{p}.self_attn.{proj}.bias"] = (H,)
            s[f"{p}.mlp.fc1.weight"] = (H, I)
            s[f"{p}.mlp.fc1.bias"] = (I,)
            s[f"{p}.mlp.fc2.weight"] = (I, H)
            s[f"{p}.mlp.fc2.bias"] = (H,)
        return s

    def _rope_tables(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Trace-time constant [N+1, head_dim/2] cos/sin: x-frequencies in
        the first fd/2 pair slots, y in the second, class token zeroed
        (vision.rs:74-145 Llama4VisionRotaryEmbedding)."""
        import numpy as np

        side = self.side
        fd = self.head_dim // 2
        p = np.arange(side * side, dtype=np.float64)
        fx = (p % side) + 1.0
        fy = (p // side) + 1.0
        freq = 1.0 / self.v.rope_theta ** (
            np.arange(0, fd, 2, dtype=np.float64) / fd
        )                                          # [fd/2]
        ang = np.concatenate(
            [fx[:, None] * freq[None, :], fy[:, None] * freq[None, :]],
            axis=-1,
        )                                          # [N, fd]
        ang = np.concatenate([ang, np.zeros((1, fd))], axis=0)  # class tok
        return (
            jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32),
        )

    @staticmethod
    def _rope_i(x: jnp.ndarray, cos: jnp.ndarray,
                sin: jnp.ndarray) -> jnp.ndarray:
        """Interleaved (GPT-J) pairing over [B, N, nh, hd] with [N, hd/2]
        tables (candle rope_i in vision.rs:244-245)."""
        shape = x.shape
        x2 = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
        c = cos[None, :, None, :, None]
        s = sin[None, :, None, :, None]
        r0 = x2[..., 0:1] * c - x2[..., 1:2] * s
        r1 = x2[..., 0:1] * s + x2[..., 1:2] * c
        return jnp.stack([r0[..., 0], r1[..., 0]], axis=-1).reshape(shape)

    def encode(self, params: Params,
               patches: jnp.ndarray) -> jnp.ndarray:
        """patches [B_tiles, N, patch_dim] (unfold order: feature =
        (c, di, dj) channel-major) -> [1, B*tokens_per_tile, text_hidden]."""
        v = self.v
        dtype = self.config.dtype
        vm = "vision_model"
        B = patches.shape[0]
        N = self.num_patches
        nh, hd = v.num_heads, self.head_dim
        eps = v.norm_eps

        x = jnp.dot(patches.astype(dtype),
                    params[f"{vm}.patch_embedding.linear.weight"])
        cls = jnp.broadcast_to(
            params[f"{vm}.class_embedding"].astype(dtype)[None, None, :],
            (B, 1, v.hidden_size),
        )
        x = jnp.concatenate([x, cls], axis=1)       # class token LAST
        x = x + params[f"{vm}.positional_embedding_vlm"].astype(dtype)[None]
        x = _layer_norm(x, params[f"{vm}.layernorm_pre.weight"],
                        params[f"{vm}.layernorm_pre.bias"], eps)

        cos, sin = self._rope_tables()
        scale = hd ** -0.5
        for i in range(v.depth):
            p = f"{vm}.model.layers.{i}"
            h = _layer_norm(x, params[f"{p}.input_layernorm.weight"],
                            params[f"{p}.input_layernorm.bias"], eps)

            def proj(name):
                return (
                    jnp.dot(h, params[f"{p}.self_attn.{name}.weight"])
                    + params[f"{p}.self_attn.{name}.bias"]
                ).reshape(B, N + 1, nh, hd)

            q = self._rope_i(proj("q_proj").astype(jnp.float32), cos, sin)
            k = self._rope_i(proj("k_proj").astype(jnp.float32), cos, sin)
            val = proj("v_proj").astype(jnp.float32)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            pw = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", pw, val)
            o = o.reshape(B, N + 1, nh * hd).astype(x.dtype)
            x = x + (jnp.dot(o, params[f"{p}.self_attn.o_proj.weight"])
                     + params[f"{p}.self_attn.o_proj.bias"])

            h = _layer_norm(
                x, params[f"{p}.post_attention_layernorm.weight"],
                params[f"{p}.post_attention_layernorm.bias"], eps)
            h = _gelu(jnp.dot(h, params[f"{p}.mlp.fc1.weight"])
                      + params[f"{p}.mlp.fc1.bias"], v.hidden_act)
            x = x + (jnp.dot(h, params[f"{p}.mlp.fc2.weight"])
                     + params[f"{p}.mlp.fc2.bias"])

        x = _layer_norm(x, params[f"{vm}.layernorm_post.weight"],
                        params[f"{vm}.layernorm_post.bias"], eps)
        x = x[:, :N, :]                             # drop class token

        # pixel shuffle (vision.rs:430-460): [B, s, s, C] ->
        # [B, s*r, s*r, C/r^2] via two permuted reshapes
        s_ = self.side
        r = v.pixel_shuffle_ratio
        w2 = int(round(s_ * r))
        c2 = int(round(v.hidden_size / r))
        x = x.reshape(B, s_, s_, v.hidden_size)
        x = x.reshape(B, s_, w2, c2).transpose(0, 2, 1, 3)
        x = x.reshape(B, w2, w2, self.shuffled_dim).transpose(0, 2, 1, 3)
        x = x.reshape(B, self.tokens_per_tile, self.shuffled_dim)

        h = _gelu(jnp.dot(x, params[f"{vm}.vision_adapter.mlp.fc1.weight"]),
                  "gelu")
        h = _gelu(jnp.dot(h, params[f"{vm}.vision_adapter.mlp.fc2.weight"]),
                  "gelu")
        out = jnp.dot(h, params["multi_modal_projector.linear_1.weight"])
        return out.reshape(1, B * self.tokens_per_tile,
                           self.config.hidden_size)


def merge_mm_embeds(x: jnp.ndarray, step) -> jnp.ndarray:
    """Replace image-token rows of the token embeddings with the encoded
    image rows (shared by every VL family; reference: per-model
    image_mask scatter, e.g. qwen3_vl/mod.rs:220-270)."""
    if step.mm_embeds is None:
        return x
    sel = step.mm_embeds[0][jnp.clip(step.mm_idx, 0)].astype(x.dtype)
    return jnp.where((step.mm_idx >= 0)[:, None], sel, x)
