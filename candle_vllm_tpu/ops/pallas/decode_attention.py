"""Decode-specialized paged-attention kernel: auto-pipelined page blocks.

The unified kernel (``paged_attention.py``) hand-manages page DMAs with
scalar-core start/wait loops — measured ~8 us of sequencing overhead per
page-group step on decode.  Decode rows (q_len == 1, one sequence per
row) allow a much simpler shape: grid = (seq, page) with the KV block
chosen by a scalar-prefetch ``index_map`` reading the page table — the
page stream is then double-buffered by Mosaic's standard pipeline, with
zero manual DMA code (the approach of the reference's dedicated decode
kernels, and of the public JAX paged-attention kernels).

Support matrix: bf16 pages, int8 pages (+scale planes), shared-KV (MLA)
and int4 nibble-packed caches.  Sliding windows, soft-caps, sinks, and
chunked attention fall back to the unified kernel (they change the page
range or the score math and are rare on decode-bound models).

Dispatch: ``ragged_paged_attention(..., decode_only=True)`` — set from
``StepInput.decode_only`` (every scheduled chunk is one token, so q row
``i`` IS sequence ``i``).

Grid steps beyond a sequence's page count clamp to the padded table's
page 0 and skip compute; consecutive identical block indices elide the
DMA (the Pallas pipeline's standard block-revisit optimization), so the
padding tail of a short context costs grid-step overhead, not bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candle_vllm_tpu.ops.attention import AttentionSpec

NEG_INF = -1e30


def _kernel(kv_lens_ref, pt_ref, q_ref, kv_ref, *rest,
            ps: int, K: int, G: int, D: int, sm_scale: float,
            quantized: bool, kv4: bool, kv_shared: bool):
    if quantized:
        sc_ref, out_ref, acc_ref, m_ref, l_ref = rest
    else:
        out_ref, acc_ref, m_ref, l_ref = rest
        sc_ref = None
    s = pl.program_id(0)
    g = pl.program_id(1)
    ng = pl.num_programs(1)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    kvl = kv_lens_ref[s]
    n_pages = (kvl + ps - 1) // ps

    @pl.when((g < n_pages) & (kvl > 0))
    def _compute():
        kv_pos = g * ps + jax.lax.broadcasted_iota(jnp.int32, (G, ps), 1)
        mask = kv_pos < kvl
        for h in range(K):
            q_h = q_ref[0, :, h, :].reshape(G, D)
            if kv4:
                b = kv_ref[0, :, h, :].astype(jnp.float32)
                v_h = jnp.floor(b * 0.0625)
                k_h = (b - 16.0 * v_h - 8.0).astype(jnp.bfloat16)
                v_h = v_h.astype(jnp.bfloat16)
            elif kv_shared:
                k_h = v_h = kv_ref[0, :, h, :]
            else:
                k_h = kv_ref[0, :, 2 * h, :]
                v_h = kv_ref[0, :, 2 * h + 1, :]
            scores = jax.lax.dot_general(
                q_h.astype(jnp.bfloat16), k_h.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if quantized:
                k_plane = h if kv_shared else 2 * h
                scores = scores * sc_ref[0, k_plane, :][None, :]
            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_cur = jnp.max(jnp.where(mask, scores, NEG_INF), -1,
                            keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[h] = jnp.broadcast_to(
                alpha * l_prev + jnp.sum(p, -1, keepdims=True), (G, 128)
            )
            p_v = p
            if quantized:
                v_plane = h if kv_shared else 2 * h + 1
                p_v = p * sc_ref[0, v_plane, :][None, :]
            pv = jax.lax.dot_general(
                p_v.astype(jnp.bfloat16), v_h.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, (G, 128))

    @pl.when(g == ng - 1)
    def _flush():
        for h in range(K):
            l = l_ref[h, :, :1]
            out_ref[0, :, h, :] = (
                acc_ref[h] / jnp.where(l > 0.0, l, 1.0)
            ).astype(out_ref.dtype)


def decode_supported(spec: AttentionSpec) -> bool:
    return (
        spec.sliding_window is None
        and spec.chunk_size is None
        and spec.logit_soft_cap is None
        and not spec.has_sinks
    )


@functools.partial(
    jax.jit, static_argnames=("spec", "interpret")
)
def decode_paged_attention_pallas(
    q: jnp.ndarray,            # [S, H, D]
    kv_pages: jnp.ndarray,     # [P, ps, planes, D]
    kv_lens: jnp.ndarray,      # [S]
    page_tables: jnp.ndarray,  # [S, MAXP]
    kv_scales: jnp.ndarray | None = None,  # [P, planes, ps]
    *,
    spec: AttentionSpec,
    interpret: bool | None = None,
) -> jnp.ndarray:
    import dataclasses

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, H, D = q.shape
    P, ps, planes, Dp = kv_pages.shape
    K = spec.num_kv_heads
    G = spec.group_size
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
        out = decode_paged_attention_pallas(
            q, kv_pages, kv_lens, page_tables, kv_scales,
            spec=dataclasses.replace(spec, head_dim=Dp),
            interpret=interpret,
        )
        return out[..., :D]
    NP = page_tables.shape[1]
    quantized = kv_scales is not None
    # head-major -> [S, G, K, D] so each kv head's group is contiguous
    q4 = q.reshape(S, K, G, D).transpose(0, 2, 1, 3)

    in_specs = [
        pl.BlockSpec((1, G, K, Dp), lambda s, g, kl, pt: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ps, planes, Dp),
                     lambda s, g, kl, pt: (pt[s, g], 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [q4, kv_pages]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, kv_scales.shape[1], ps),
                         lambda s, g, kl, pt: (pt[s, g], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(kv_scales.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, NP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, K, Dp),
                               lambda s, g, kl, pt: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, G, Dp), jnp.float32),
            pltpu.VMEM((K, G, 128), jnp.float32),
            pltpu.VMEM((K, G, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ps=ps, K=K, G=G, D=Dp,
                          sm_scale=spec.sm_scale,
                          quantized=quantized, kv4=spec.kv4,
                          kv_shared=spec.kv_shared),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, G, K, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), page_tables.astype(jnp.int32), *inputs)
    return out.transpose(0, 2, 1, 3).reshape(S, K * G, Dp)
