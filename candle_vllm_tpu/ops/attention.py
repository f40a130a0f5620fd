"""Ragged paged attention over the fused KV page cache.

This is the TPU replacement for the reference's whole attention-kernel
surface (PagedAttention prefill+decode, flash-attn, FlashInfer plans —
SURVEY.md §2.6): ONE op that attends a flat ragged token batch (mixed
prefill chunks and decode rows) against paged KV, with causal masking,
GQA, sliding windows, and logit soft-capping.

Implementations:
- ``jnp``    — gather-based reference (this file): correct everywhere,
               used for CPU tests and as the numerical oracle.
- ``pallas`` — flash-style TPU kernels (ops/pallas/paged_attention.py):
               decode + prefill kernels with double-buffered page DMA.

Call semantics: sequence ``i`` owns query rows
``cu_q_lens[i] : cu_q_lens[i+1]``; its KV context is the first
``kv_lens[i]`` slots of the pages listed in ``page_tables[i]``; query row
``j`` of the chunk sits at absolute position ``kv_lens[i] - q_len_i + j``
and attends causally.  Rows past ``cu_q_lens[num_seqs]`` are padding and
produce garbage (finite) outputs that callers must ignore.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class AttentionSpec:
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    sm_scale: float
    sliding_window: Optional[int] = None
    # llama4 chunked attention: position p attends within its chunk
    # [p//C*C, p] (block-diagonal by absolute position; reference:
    # llama4/mod.rs:185-200 use_chunked_attention + chunked masks)
    chunk_size: Optional[int] = None
    logit_soft_cap: Optional[float] = None
    # int4 KV cache: pages pack K (lo nibble) and V (hi nibble) per head
    # into one byte plane (kv_cache.allocate_kv_pages_int4)
    kv4: bool = False
    # turbo3 KV cache: 3-bit K bitplanes + 4-bit V nibbles in one byte
    # row per token (kv_cache.allocate_kv_pages_turbo3; the reference's
    # maximum-compression TurboQuant tier, README.md turbo3 ~4.7x)
    kv3: bool = False
    # per-q-head attention sinks (gpt-oss style): a learned logit that
    # joins the softmax denominator (reference: PagedAttention sinks)
    has_sinks: bool = False
    # MLA latent cache: K and V are the SAME vector (the latent row), so
    # pages carry ONE plane per head ([P, ps, K, D]) — half the KV bytes
    # and page bandwidth of the generic layout, matching the reference's
    # single-copy MLA cache (cache_engine.rs:172-184 ckv+kpe tensors)
    kv_shared: bool = False

    @property
    def group_size(self) -> int:
        assert self.num_q_heads % self.num_kv_heads == 0
        return self.num_q_heads // self.num_kv_heads


def ragged_paged_attention(
    q: jnp.ndarray,            # [T, H, D]
    kv_pages: jnp.ndarray,     # [P, ps, 2K, D]
    kv_lens: jnp.ndarray,      # [S] int32
    page_tables: jnp.ndarray,  # [S, MAXP] int32
    cu_q_lens: jnp.ndarray,    # [S+1] int32
    *,
    spec: AttentionSpec,
    kv_scales: Optional[jnp.ndarray] = None,  # [P, 2K, ps] (int8 cache)
    sinks: Optional[jnp.ndarray] = None,      # [H] per-head sink logits
    impl: str = "auto",
    decode_only: bool = False,
    chunk_bq: int = 0,
) -> jnp.ndarray:
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    # NOTE: a decode-specialized kernel with Mosaic-auto-pipelined page
    # blocks (grid = (seq, page), index_map scalar prefetch) was built and
    # measured 12% SLOWER than the unified kernel on realistic decode
    # shapes (34.5 vs 30.6 us/op, 1k ctx; tools/abl_r3.py 2026-08-19) —
    # per-grid-step overhead beats the manual-DMA savings.  decode_only
    # remains in the call contract for the engine's multi-token decode
    # dispatch (llm_engine._device_step) and future specializations.
    if impl == "pallas":
        from candle_vllm_tpu.ops.pallas.paged_attention import (
            ragged_paged_attention_pallas,
        )

        return ragged_paged_attention_pallas(
            q, kv_pages, kv_lens, page_tables, cu_q_lens, spec=spec,
            kv_scales=kv_scales, sinks=sinks, decode_only=decode_only,
            **({"bq": chunk_bq} if chunk_bq else {}),
        )
    return _ragged_paged_attention_jnp(
        q, kv_pages, kv_lens, page_tables, cu_q_lens, spec=spec,
        kv_scales=kv_scales, sinks=sinks,
    )


def _ragged_paged_attention_jnp(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    kv_lens: jnp.ndarray,
    page_tables: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    *,
    spec: AttentionSpec,
    kv_scales: Optional[jnp.ndarray] = None,
    sinks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    T, H, D = q.shape
    P, ps, planes, Dp = kv_pages.shape
    if spec.kv3:
        # plane-major turbo3 pages: [P, planes, ps, 128]
        ps, planes = planes, ps
    kv4 = spec.kv4
    K = spec.num_kv_heads
    # plane dims may be padded up to Mosaic tiling minimums
    # (kv_cache.allocate_*: int8 pages to 4, f32 scales to 8)
    twoK = planes
    G = spec.group_size
    S, MAXP = page_tables.shape
    L = MAXP * ps

    token_ids = jnp.arange(T, dtype=jnp.int32)
    # which sequence owns each token row
    seq_idx = jnp.clip(
        jnp.searchsorted(cu_q_lens[1:], token_ids, side="right"), 0, S - 1
    ).astype(jnp.int32)
    # absolute position of each query token within its sequence
    q_pos = kv_lens[seq_idx] - (cu_q_lens[seq_idx + 1] - token_ids)

    # gather each token's full KV context: [T, MAXP, ps, 2K, D] -> [T, L, ...]
    pages = page_tables[seq_idx]
    if spec.kv3:
        # turbo3: bitplane-packed 3-bit K + nibble V, plane-major pages
        # [P, planes, ps, 128] -> per-token byte rows
        from candle_vllm_tpu.ops.kv_cache import unpack_turbo3_rows

        g = kv_pages[pages]               # [T, MAXP, planes, ps, 128]
        b = jnp.swapaxes(g, 2, 3).reshape(T, L, -1)
        kq, vq = unpack_turbo3_rows(b, K, D)
        sc = jnp.swapaxes(kv_scales[pages], 2, 3).reshape(
            T, L, kv_scales.shape[1]
        )[:, :, : 2 * K]
        k = kq.reshape(T, L, K, D) * sc[:, :, 0::2, None].astype(jnp.float32)
        v = vq.reshape(T, L, K, D) * sc[:, :, 1::2, None].astype(jnp.float32)
    elif kv4:
        # packed int4: K lo-nibble / V hi-nibble share one byte plane
        # (kv_cache.allocate_kv_pages_int4); planes may be pad-extended
        b = kv_pages[pages].reshape(T, L, planes, Dp)[:, :, :K, :D].astype(
            jnp.float32
        )
        vq = jnp.floor(b / 16.0)
        kq = b - 16.0 * vq - 8.0
        sc = jnp.swapaxes(kv_scales[pages], 2, 3).reshape(
            T, L, kv_scales.shape[1]
        )[:, :, : 2 * K]
        k = kq * sc[:, :, 0::2, None].astype(jnp.float32)
        v = vq * sc[:, :, 1::2, None].astype(jnp.float32)
    elif spec.kv_shared:
        # single shared plane per head: k == v == the latent row
        kv = kv_pages[pages].reshape(T, L, planes, Dp)[:, :, :K, :D]
        kv = kv.astype(jnp.float32)
        if kv_scales is not None:
            sc = jnp.swapaxes(kv_scales[pages], 2, 3).reshape(
                T, L, kv_scales.shape[1]
            )[:, :, :K]
            kv = kv * sc[..., None].astype(jnp.float32)
        k = v = kv
    else:
        kv = kv_pages[pages].reshape(T, L, planes, Dp)[:, :, : 2 * K, :D]
        kv = kv.astype(jnp.float32)
        if kv_scales is not None:
            # [T, MAXP, 2K', ps] -> [T, L, 2K] per-(token,head) scales
            sc = jnp.swapaxes(kv_scales[pages], 2, 3).reshape(
                T, L, kv_scales.shape[1]
            )[:, :, : 2 * K]
            kv = kv * sc[..., None].astype(jnp.float32)
        k = kv[:, :, 0::2, :]  # interleaved per head
        v = kv[:, :, 1::2, :]

    qf = q.astype(jnp.float32).reshape(T, K, G, D)
    scores = jnp.einsum("tkgd,tlkd->tkgl", qf, k) * spec.sm_scale

    if spec.logit_soft_cap is not None:
        cap = spec.logit_soft_cap
        scores = cap * jnp.tanh(scores / cap)

    kv_pos = jnp.arange(L, dtype=jnp.int32)[None, :]          # [1, L]
    mask = kv_pos <= q_pos[:, None]                            # causal
    mask &= kv_pos < kv_lens[seq_idx][:, None]                 # context bound
    if spec.sliding_window is not None:
        mask &= kv_pos > q_pos[:, None] - spec.sliding_window
    if spec.chunk_size is not None:
        mask &= kv_pos >= (q_pos[:, None] // spec.chunk_size) * spec.chunk_size
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    if sinks is not None:
        # the sink logit joins the max and the denominator but contributes
        # no value vector
        s = sinks.astype(jnp.float32).reshape(1, K, G, 1)
        m = jnp.maximum(m, s)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        denom = denom + jnp.exp(s - m)
    out = jnp.einsum("tkgl,tlkd->tkgd", p, v) / jnp.maximum(denom, 1e-9)
    return out.reshape(T, H, D).astype(q.dtype)
