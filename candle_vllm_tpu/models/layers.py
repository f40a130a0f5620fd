"""Shared functional layers: linear, MLP, paged attention block.

Re-designs the reference's ``src/openai/models/layers/`` (attention.rs,
mlp.rs, others.rs) as pure functions over flat HF-named param dicts.
Quantized variants plug in through ``ops.quant`` dispatch (the analogue of
the reference's ``LinearX`` zoo, models/linear.rs) — weights carry their
format in the params dict.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from candle_vllm_tpu.config import ModelConfig
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.attention import AttentionSpec, ragged_paged_attention
from candle_vllm_tpu.ops.kv_cache import write_kv
from candle_vllm_tpu.ops.norms import rms_norm
from candle_vllm_tpu.ops.rope import RopeSpec, apply_rope, compute_cos_sin

Params = Dict[str, jnp.ndarray]


def linear(x: jnp.ndarray, params: Params, prefix: str,
           norm_w: Optional[jnp.ndarray] = None, norm_eps: float = 1e-6,
           residual: Optional[jnp.ndarray] = None,
           rope_cs=None) -> jnp.ndarray:
    """y = x @ W (+ b).  Weights are stored input-major ([in, out]) so the
    matmul needs no transpose; quantized weights dispatch on the aux
    entries present under ``prefix`` (see ops/quant.py).

    ``norm_w``/``residual``/``rope_cs`` fuse an RMSNorm prologue /
    residual-add / full-width rope epilogue into the quantized decode
    kernel (XLA fusions otherwise)."""
    qweight = params.get(f"{prefix}.qweight")
    b = params.get(f"{prefix}.bias")
    if qweight is not None:
        from candle_vllm_tpu.ops.quant import quantized_matmul

        y = quantized_matmul(x, params, prefix, norm_w=norm_w,
                             norm_eps=norm_eps,
                             residual=residual if b is None else None,
                             rope_cs=rope_cs if b is None else None)
        if b is not None:
            if rope_cs is not None:
                from candle_vllm_tpu.ops.pallas.quant_matmul import (
                    _rope_full_jnp,
                )

                y = _rope_full_jnp(y + b.astype(y.dtype),
                                   rope_cs[0], rope_cs[1])
            else:
                y = y + b.astype(y.dtype)
            if residual is not None:
                y = (y.astype(jnp.float32)
                     + residual.astype(jnp.float32)).astype(y.dtype)
        return y
    if norm_w is not None:
        x = rms_norm(x, norm_w, norm_eps)
    w = params[f"{prefix}.weight"]
    y = jnp.dot(x, w)
    if b is not None:
        y = y + b.astype(y.dtype)
    if rope_cs is not None:
        from candle_vllm_tpu.ops.pallas.quant_matmul import _rope_full_jnp

        y = _rope_full_jnp(y, rope_cs[0], rope_cs[1])
    if residual is not None:
        y = (y.astype(jnp.float32)
             + residual.astype(jnp.float32)).astype(y.dtype)
    return y


def _act(name: str):
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    if name in ("gelu_new", "gelu_fast", "gelu_pytorch_tanh", "gelu_tanh"):
        return partial(jax.nn.gelu, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation {name}")


def _has_linear(params: Params, prefix: str) -> bool:
    return f"{prefix}.weight" in params or f"{prefix}.qweight" in params


def _try_fused_mlp(x: jnp.ndarray, params: Params, prefix: str,
                   norm_w: Optional[jnp.ndarray] = None,
                   norm_eps: float = 1e-6,
                   residual: Optional[jnp.ndarray] = None,
                   ) -> Optional[jnp.ndarray]:
    """Decode-path W4A16 MLP megakernel: down(silu(gate)*up) in ONE
    pallas_call with continuous weight streaming (no inter-kernel
    bubble between the gate_up and down weight streams).  Requires the
    fused tile-contiguous gate_up bank, silu, and a decode-sized batch."""
    import os

    if (
        jax.default_backend() != "tpu"
        or x.shape[0] > 8
        or os.environ.get("CVT_DISABLE_FUSED_MLP") == "1"
    ):
        return None
    gu_q = params.get(f"{prefix}.gate_up_proj.qweight")
    dn_q = params.get(f"{prefix}.down_proj.qweight")
    if gu_q is None or dn_q is None or gu_q.ndim != 3 or dn_q.ndim != 3:
        return None
    if params.get(f"{prefix}.gate_up_proj.bias") is not None:
        return None  # kernel has no gate_up bias path; use the unfused MLP
    gu_s = params[f"{prefix}.gate_up_proj.scales"]
    dn_s = params[f"{prefix}.down_proj.scales"]
    from candle_vllm_tpu.ops.quant import _is_w4

    if not (_is_w4(gu_q, gu_s) and _is_w4(dn_q, dn_s)):
        return None
    # tiny shapes (I < TO, or mismatched gu/dn tile widths) have no fused
    # layout — fall back to the per-projection kernels
    twoI = gu_s.shape[1]
    TO = twoI // gu_q.shape[0]
    H = x.shape[1]
    I = twoI // 2
    if I % TO or I // TO < 1 or dn_q.shape[0] * TO != H or dn_q.shape[1] != I:
        return None
    from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4

    b = params.get(f"{prefix}.down_proj.bias")
    y = fused_mlp_w4(x.astype(jnp.bfloat16), gu_q,
                     gu_s.astype(jnp.bfloat16), dn_q,
                     dn_s.astype(jnp.bfloat16), norm_w=norm_w,
                     norm_eps=norm_eps,
                     residual=residual if b is None else None)
    if b is not None:
        y = y + b.astype(y.dtype)
        if residual is not None:
            y = (y.astype(jnp.float32)
                 + residual.astype(jnp.float32)).astype(y.dtype)
    return y


def mlp(x: jnp.ndarray, params: Params, prefix: str, hidden_act: str,
        norm_w: Optional[jnp.ndarray] = None, norm_eps: float = 1e-6,
        residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gated MLP (reference: models/layers/mlp.rs gate/up/down; packed
    gate_up supported like the reference's MergedColumn layout).

    ``norm_w``/``residual`` fuse the pre-MLP RMSNorm / post-MLP residual
    into the decode megakernel (or the first/last projection kernels)."""
    act = _act(hidden_act)
    if _has_linear(params, f"{prefix}.gate_up_proj"):
        if hidden_act in ("silu", "swish"):
            fused = _try_fused_mlp(x, params, prefix, norm_w=norm_w,
                                   norm_eps=norm_eps, residual=residual)
            if fused is not None:
                return fused
        gu = linear(x, params, f"{prefix}.gate_up_proj",
                    norm_w=norm_w, norm_eps=norm_eps)
        inter = gu.shape[-1] // 2
        gate, up = gu[:, :inter], gu[:, inter:]
    elif not _has_linear(params, f"{prefix}.gate_proj"):
        # non-gated MLP (Phi2 fc1/fc2, mapped to up/down at load)
        if norm_w is not None:
            x = rms_norm(x, norm_w, norm_eps)
        up = linear(x, params, f"{prefix}.up_proj")
        return linear(act(up), params, f"{prefix}.down_proj",
                      residual=residual)
    else:
        if norm_w is not None:
            x = rms_norm(x, norm_w, norm_eps)
        gate = linear(x, params, f"{prefix}.gate_proj")
        up = linear(x, params, f"{prefix}.up_proj")
    return linear(act(gate) * up, params, f"{prefix}.down_proj",
                  residual=residual)


def can_fuse_layer_tail(x: jnp.ndarray, params: Params, p: str,
                        hidden_act: str) -> bool:
    """True when the decode-path layer megakernel (fused_layer.py —
    o_proj + residual + norm + MLP in one weight stream) applies to
    layer prefix ``p``: W4A16 tile banks with one shared tile width, no
    biases or extra output norms, silu MLP, decode-sized batch."""
    import os

    # OPT-IN (CVT_FUSED_LAYER=1): measured a wash on the isolated kernel
    # path (127 vs 129 tok/s) but a 40% REGRESSION inside the engine's
    # multi-step dispatch (79 vs 127 tok/s, 2026-08-19 A/B) — the
    # per-projection kernels + fused_mlp pipeline better under the
    # engine's jit program.  Kept as an experiment; see docs/PERF.md.
    if (
        jax.default_backend() != "tpu"
        or x.shape[0] > 8
        or x.dtype != jnp.bfloat16
        or hidden_act not in ("silu", "swish")
        or os.environ.get("CVT_FUSED_LAYER", "0") != "1"
    ):
        return False
    names = [f"{p}.self_attn.o_proj", f"{p}.mlp.gate_up_proj",
             f"{p}.mlp.down_proj"]
    qs = [params.get(n + ".qweight") for n in names]
    if any(q is None or q.ndim != 3 for q in qs):
        return False
    ss = [params[n + ".scales"] for n in names]
    from candle_vllm_tpu.ops.quant import _is_w4

    if not all(_is_w4(q, s) for q, s in zip(qs, ss)):
        return False
    if any(params.get(n + ".bias") is not None for n in names):
        return False
    if f"{p}.post_self_attn_layernorm.weight" in params:
        return False
    if f"{p}.post_attention_layernorm.weight" not in params:
        return False
    H = ss[0].shape[1]
    to = H // qs[0].shape[0]
    # Mosaic rejects the kernel's scale-half broadcasts below TO=512
    # (lane-offset vector.broadcast layout limitation, v5e 2026-08)
    return (
        to >= 512
        and qs[1].shape[2] * 2 == to
        and qs[2].shape[2] * 2 == to
        and qs[2].shape[0] * to == H
    )


def can_fuse_next_qkv(params: Params, p: str, p_next: str) -> bool:
    """True when the NEXT layer's input-norm + fused-qkv matmul can ride
    the same weight stream (phase 4 of fused_layer.py): a bias-free W4
    qkv bank with the same tile width."""
    q = params.get(f"{p_next}.self_attn.qkv_proj.qweight")
    if q is None or q.ndim != 3:
        return False
    if params.get(f"{p_next}.self_attn.qkv_proj.bias") is not None:
        return False
    if f"{p_next}.input_layernorm.weight" not in params:
        return False
    s = params[f"{p_next}.self_attn.qkv_proj.scales"]
    from candle_vllm_tpu.ops.quant import _is_w4

    if not _is_w4(q, s):
        return False
    o_q = params[f"{p}.self_attn.o_proj.qweight"]
    H = params[f"{p}.self_attn.o_proj.scales"].shape[1]
    to = H // o_q.shape[0]
    return q.shape[1] == H and q.shape[2] * 2 == to


def fused_layer_tail(x: jnp.ndarray, attn_raw: jnp.ndarray, params: Params,
                     p: str, eps: float, next_qkv_prefix: Optional[str] = None):
    """x + o_proj(attn_raw), post-norm, MLP, residual — one pallas_call
    (fused_layer.fused_o_mlp_w4).  With ``next_qkv_prefix``, the next
    layer's input-norm + qkv projection join the stream and the call
    returns (residual, qkv)."""
    from candle_vllm_tpu.ops.pallas.fused_layer import fused_o_mlp_w4

    extra = {}
    if next_qkv_prefix is not None:
        extra = dict(
            qkv_q=params[f"{next_qkv_prefix}.self_attn.qkv_proj.qweight"],
            qkv_s=params[f"{next_qkv_prefix}.self_attn.qkv_proj.scales"],
            norm2_w=params[f"{next_qkv_prefix}.input_layernorm.weight"],
        )
    return fused_o_mlp_w4(
        x.astype(jnp.bfloat16),
        attn_raw,
        params[f"{p}.self_attn.o_proj.qweight"],
        params[f"{p}.self_attn.o_proj.scales"],
        params[f"{p}.mlp.gate_up_proj.qweight"],
        params[f"{p}.mlp.gate_up_proj.scales"],
        params[f"{p}.mlp.down_proj.qweight"],
        params[f"{p}.mlp.down_proj.scales"],
        params[f"{p}.post_attention_layernorm.weight"],
        eps=eps,
        **extra,
    )


# ---------------------------------------------------------------------------
# Attention block
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AttnLayerSpec:
    """Static per-layer attention description."""

    attn: AttentionSpec
    use_qk_norm: bool = False
    qk_norm_eps: float = 1e-6
    norm_unit_offset: bool = False  # gemma (1 + w) convention
    # Qwen3.5/Qwen3-Next gated output: q_proj emits [q | gate] per head
    # (2x width) and y *= sigmoid(gate) before o_proj
    # (reference: attention.rs:620-643, 724-735)
    attn_output_gate: bool = False
    # llama4 iRoPE: every no_rope_step-th layer skips rope entirely
    # (reference: llama4/mod.rs:185 use_rope)
    use_rope: bool = True
    # llama4 weightless L2 qk-norm on rope layers
    # (reference: llama4/mod.rs:194 qk_l2_norm)
    qk_l2_norm: bool = False
    # llama4 NoPE-layer temperature tuning (floor_scale, attn_scale):
    # q *= 1 + attn_scale * ln(floor((pos+1)/floor_scale) + 1)
    # (reference: llama4/mod.rs:270-280)
    temp_tuning: Optional[Tuple[float, float]] = None


@functools.lru_cache(maxsize=4)
def _hadamard_np(dim: int):
    """Normalized Sylvester-Hadamard matrix (symmetric, orthogonal).
    Cached as numpy — each trace materializes its own constant (a cached
    jnp array created under one jit would leak that trace's tracer)."""
    import numpy as np

    h = np.ones((1, 1), np.float32)
    while h.shape[0] < dim:
        h = np.block([[h, h], [h, -h]])
    assert h.shape[0] == dim, f"head_dim {dim} is not a power of two"
    return h / math.sqrt(dim)


def _hadamard(dim: int):
    return jnp.asarray(_hadamard_np(dim), jnp.float32)


def paged_attention_with_write(
    q: jnp.ndarray,           # [T, H, D]
    k: jnp.ndarray,           # [T, K, D]
    v: jnp.ndarray,           # [T, K, D]
    kv_pages: jnp.ndarray,    # [P, ps, 2K, D]
    step: StepInput,
    spec: AttentionSpec,
    mesh: Optional[Mesh] = None,
    tp_axis: str = "tp",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write this step's K/V rows into their pages, then attend.

    Under a mesh, runs inside ``shard_map`` over the TP axis: each device
    holds its KV-head shard of the pages and its query-head shard — the
    TPU equivalent of the reference's per-rank PagedAttention
    (attention.rs:707-718), with zero collectives (heads are fully
    parallel; the psum happens later in o_proj's row-parallel matmul).

    int4 caches quantize in a Hadamard-rotated basis (the TurboQuant
    trick, reference README.md:267-291): k/v rows rotate before the
    4-bit quantize, q rotates to match (scores are invariant under the
    shared orthogonal rotation), and the output un-rotates.  Outliers
    spread across lanes, so the per-row absmax/7 grid loses ~2x less.
    """
    quantized = isinstance(kv_pages, tuple)
    unrotate = None
    if quantized and (spec.kv4 or spec.kv3) \
            and (q.shape[-1] & (q.shape[-1] - 1)) == 0:
        had = _hadamard(q.shape[-1])
        dt = q.dtype
        q = (q.astype(jnp.float32) @ had).astype(dt)
        k = (k.astype(jnp.float32) @ had).astype(dt)
        v = (v.astype(jnp.float32) @ had).astype(dt)
        unrotate = had  # symmetric: H^T == H
    if mesh is None or mesh.shape.get(tp_axis, 1) == 1:
        if quantized:
            pages, scales = kv_pages
            pages, scales = write_kv(pages, k, v, step.slot_mapping, scales,
                                     kv4=spec.kv4, kv3=spec.kv3,
                                     kv_shared=spec.kv_shared)
            out = ragged_paged_attention(
                q, pages, step.kv_lens, step.page_tables, step.cu_q_lens,
                spec=spec, kv_scales=scales,
                decode_only=step.decode_only,
                chunk_bq=step.chunk_bq,
            )
            if unrotate is not None:
                out = (out.astype(jnp.float32) @ unrotate).astype(out.dtype)
            return out, (pages, scales)
        kv_pages = write_kv(kv_pages, k, v, step.slot_mapping,
                            kv_shared=spec.kv_shared)
        out = ragged_paged_attention(
            q, kv_pages, step.kv_lens, step.page_tables, step.cu_q_lens,
            spec=spec, decode_only=step.decode_only,
                chunk_bq=step.chunk_bq,
        )
        return out, kv_pages

    tp = mesh.shape[tp_axis]
    K = spec.num_kv_heads
    if K < tp:
        # replicate KV heads so each shard owns (at least) one copy
        # (reference: kv_head_shard, distributed.rs:725-765)
        assert tp % K == 0, (K, tp)
        reps = tp // K
        k = jnp.repeat(k, reps, axis=1)
        v = jnp.repeat(v, reps, axis=1)
        K = tp
    assert K % tp == 0, (K, tp)
    import dataclasses

    local_spec = dataclasses.replace(
        spec,
        num_q_heads=spec.num_q_heads // tp,
        num_kv_heads=K // tp,
    )

    head = P(None, tp_axis, None)
    # turbo3 pages are plane-major [P, planes, ps, 128]: each shard holds
    # a complete local bitplane block (2bit|1bit|nibble planes of its
    # K/tp heads — the engine gates turbo3 on K*D % (1024*tp) so the
    # per-shard plane count is integral); all other layouts carry the
    # head/plane dim at position 2
    pages_spec = (
        P(None, tp_axis, None, None) if spec.kv3
        else P(None, None, tp_axis, None)
    )
    rep1 = P(None)

    if quantized:
        def local_q(q, k, v, pages, scales, kv_lens, pt, cu, slots):
            pages, scales = write_kv(pages, k, v, slots, scales,
                                     kv4=spec.kv4, kv3=spec.kv3,
                                     kv_shared=spec.kv_shared)
            out = ragged_paged_attention(
                q, pages, kv_lens, pt, cu, spec=local_spec, kv_scales=scales,
                decode_only=step.decode_only,
                chunk_bq=step.chunk_bq,
            )
            return out, pages, scales

        pages, scales = kv_pages
        out, pages, scales = jax.shard_map(
            local_q,
            mesh=mesh,
            in_specs=(head, head, head, pages_spec, P(None, tp_axis, None),
                      rep1, P(None, None), rep1, rep1),
            out_specs=(head, pages_spec, P(None, tp_axis, None)),
            check_vma=False,
        )(q, k, v, pages, scales, step.kv_lens, step.page_tables,
          step.cu_q_lens, step.slot_mapping)
        if unrotate is not None:
            out = (out.astype(jnp.float32) @ unrotate).astype(out.dtype)
        return out, (pages, scales)

    def local(q, k, v, kv_pages, kv_lens, pt, cu, slots):
        kv_pages = write_kv(kv_pages, k, v, slots, kv_shared=spec.kv_shared)
        out = ragged_paged_attention(
            q, kv_pages, kv_lens, pt, cu, spec=local_spec,
            decode_only=step.decode_only,
                chunk_bq=step.chunk_bq,
        )
        return out, kv_pages

    out, kv_pages = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(head, head, head, pages_spec, rep1, P(None, None), rep1, rep1),
        out_specs=(head, pages_spec),
        check_vma=False,
    )(q, k, v, kv_pages, step.kv_lens, step.page_tables, step.cu_q_lens,
      step.slot_mapping)
    return out, kv_pages


def attention_block(
    x: jnp.ndarray,            # [T, hidden]
    params: Params,
    prefix: str,               # e.g. "model.layers.0.self_attn"
    layer: AttnLayerSpec,
    rope: RopeSpec,
    cos_sin: Tuple[jnp.ndarray, jnp.ndarray],
    kv_pages: jnp.ndarray,
    step: StepInput,
    mesh: Optional[Mesh] = None,
    skip_o: bool = False,
    qkv: Optional[jnp.ndarray] = None,
    norm_w: Optional[jnp.ndarray] = None,
    norm_eps: float = 1e-6,
    residual: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full attention sublayer (reference: layers/attention.rs:28-754):
    qkv projections, optional per-head QK-norm, rope, paged attention,
    output projection (skipped with ``skip_o`` when the caller fuses it
    into the layer megakernel; a precomputed ``qkv`` comes from the
    previous layer's megakernel phase 4).

    ``norm_w`` fuses the input RMSNorm into the qkv kernel prologue and
    ``residual`` the residual-add into the o_proj epilogue (``x`` is the
    PRE-norm input then, and the first return value is residual + o)."""
    T = x.shape[0]
    spec = layer.attn
    H, K, D = spec.num_q_heads, spec.num_kv_heads, spec.head_dim

    q_width = H * D * (2 if layer.attn_output_gate else 1)
    rope_fused = False
    if qkv is not None or _has_linear(params, f"{prefix}.qkv_proj"):
        if qkv is None:
            rcs = None
            if (
                layer.use_rope and not rope.interleaved
                and rope.rotary_dim == D == 128
                and params.get(f"{prefix}.q_norm.weight") is None
                and not layer.attn_output_gate
                and not layer.qk_l2_norm
            ):
                # full-width rope rides the qkv kernel epilogue: q and k
                # columns rotate, v columns pass through via c=1/s=0
                # (removes the 2 apply_rope XLA fusions — 23 us/layer,
                # tools/abl_r4c.py)
                rope_fused = True
                cos, sin = cos_sin
                c2 = jnp.concatenate([cos, cos], -1)       # [T, D]
                s2 = jnp.concatenate([-sin, sin], -1)
                KD = K * D
                c_full = jnp.concatenate(
                    [jnp.tile(c2, (1, H + K)),
                     jnp.ones((T, KD), c2.dtype)], axis=1)
                s_full = jnp.concatenate(
                    [jnp.tile(s2, (1, H + K)),
                     jnp.zeros((T, KD), s2.dtype)], axis=1)
                rcs = (c_full, s_full)
            qkv = linear(x, params, f"{prefix}.qkv_proj",
                         norm_w=norm_w, norm_eps=norm_eps, rope_cs=rcs)
        q = qkv[:, :q_width]
        k = qkv[:, q_width : q_width + K * D].reshape(T, K, D)
        v = qkv[:, q_width + K * D :].reshape(T, K, D)
    else:
        if norm_w is not None:
            # separate q/k/v projections: one XLA norm beats 3 in-kernel
            # recomputes
            x = rms_norm(x, norm_w, norm_eps)
        q = linear(x, params, f"{prefix}.q_proj")
        k = linear(x, params, f"{prefix}.k_proj").reshape(T, K, D)
        v = linear(x, params, f"{prefix}.v_proj").reshape(T, K, D)
    gate = None
    if layer.attn_output_gate:
        qg = q.reshape(T, H, 2 * D)
        q, gate = qg[..., :D], qg[..., D:]
    else:
        q = q.reshape(T, H, D)

    # QK-norm is presence-driven like the reference (attention.rs:515-537
    # tries per-head then full-dim weight shapes): per-head when the weight
    # is [D], full-dim when it is [H*D] (MiniMax-M2 style)
    qn = params.get(f"{prefix}.q_norm.weight")
    kn = params.get(f"{prefix}.k_norm.weight")
    if qn is not None and kn is not None:
        if qn.shape[-1] == D:
            q = rms_norm(q, qn, layer.qk_norm_eps,
                         add_unit_offset=layer.norm_unit_offset)
            k = rms_norm(k, kn, layer.qk_norm_eps,
                         add_unit_offset=layer.norm_unit_offset)
        else:  # full-dim
            q = rms_norm(q.reshape(T, H * D), qn, layer.qk_norm_eps,
                         add_unit_offset=layer.norm_unit_offset).reshape(T, H, D)
            k = rms_norm(k.reshape(T, K * D), kn, layer.qk_norm_eps,
                         add_unit_offset=layer.norm_unit_offset).reshape(T, K, D)

    if layer.qk_l2_norm:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * jax.lax.rsqrt(
            jnp.sum(qf * qf, -1, keepdims=True) + 1e-6)).astype(q.dtype)
        k = (kf * jax.lax.rsqrt(
            jnp.sum(kf * kf, -1, keepdims=True) + 1e-6)).astype(k.dtype)

    if layer.use_rope and not rope_fused:
        cos, sin = cos_sin
        q = apply_rope(q, cos, sin, rope)
        k = apply_rope(k, cos, sin, rope)
    elif layer.temp_tuning is not None:
        floor_scale, attn_scale = layer.temp_tuning
        pos = step.positions.astype(jnp.float32)
        scale = 1.0 + attn_scale * jnp.log(
            jnp.floor((pos + 1.0) / floor_scale) + 1.0
        )
        q = (q.astype(jnp.float32) * scale[:, None, None]).astype(q.dtype)

    out, kv_pages = paged_attention_with_write(
        q, k, v, kv_pages, step, spec, mesh=mesh
    )
    if gate is not None:
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    out = out.reshape(T, H * D)
    if skip_o:
        # caller fuses o_proj into the layer megakernel (fused_layer.py)
        return out, kv_pages
    out = linear(out, params, f"{prefix}.o_proj", residual=residual)
    return out, kv_pages


def make_attn_specs(config: ModelConfig) -> "list[AttnLayerSpec]":
    """Per-layer attention specs (sliding vs global per layer, possibly
    heterogeneous KV shapes — reference: gemma per-layer KV,
    models/mod.rs:1124-1192)."""
    specs = []
    for i in range(config.num_hidden_layers):
        sliding = config.sliding_window if config.is_sliding_layer(i) else None
        K, D = config.layer_kv_spec(i)
        scale_base = config.query_pre_attn_scalar or D
        # llama4 iRoPE: every no_rope_step-th layer skips rope and uses
        # global attention; rope layers attend within chunks
        # (llama4/mod.rs:185-200)
        use_rope = True
        chunk = None
        if config.no_rope_step:
            use_rope = (i + 1) % config.no_rope_step != 0
            if use_rope and config.attention_chunk_size:
                chunk = config.attention_chunk_size
        specs.append(
            AttnLayerSpec(
                attn=AttentionSpec(
                    num_q_heads=config.num_attention_heads,
                    num_kv_heads=K,
                    head_dim=D,
                    sm_scale=scale_base ** -0.5,
                    sliding_window=sliding,
                    chunk_size=chunk,
                    logit_soft_cap=config.attn_logit_softcapping,
                    kv4=config.kv_cache_dtype == "int4",
                    kv3=config.kv_cache_dtype == "turbo3",
                ),
                use_qk_norm=config.use_qk_norm,
                qk_norm_eps=config.rms_norm_eps,
                norm_unit_offset=config.norm_unit_offset,
                attn_output_gate=config.attn_output_gate,
                use_rope=use_rope,
                qk_l2_norm=config.qk_l2_norm and use_rope,
                temp_tuning=(
                    (config.floor_scale, config.attn_scale)
                    if config.attn_temperature_tuning and not use_rope
                    else None
                ),
            )
        )
    return specs
