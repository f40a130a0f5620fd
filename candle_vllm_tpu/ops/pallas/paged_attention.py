"""Unified ragged paged-attention Pallas TPU kernel.

One kernel serves every attention call in the framework — prefill chunks,
decode rows, and mixed batches — replacing the reference's entire native
attention surface (PagedAttention prefill+decode kernels, flash-attn,
FlashInfer plans; see ``/root/reference/src/openai/models/layers/attention.rs``
call sites and SURVEY.md §2.6).

Design (TPU-first, not a CUDA translation):

- The grid runs over *flat* query blocks of ``BQ`` rows of the ragged token
  batch ``q[T, H, D]``.  A block may span several sequences; the kernel walks
  the overlapped sequence range (host-precomputed per block, passed as scalar
  prefetch) and flash-accumulates each sequence's paged KV into shared
  per-block softmax state.  Rows outside the current sequence are masked, so
  their state is untouched — online softmax is order-independent.
- KV pages stay in HBM (``pl.ANY``) and are DMA'd page-by-page into a
  double-buffered VMEM scratch, overlapping the next page's fetch with the
  current page's MXU work.  One page = ``[page_size, 2*K, D]`` contiguous
  bytes — the ideal DMA shape.
- Per KV head, scores are a single ``[BQ*G, D] x [D, ps]`` MXU matmul
  (G = query group size), so GQA costs the same page bandwidth as MQA.
- Causal masking, context-length bounds, sliding windows, and logit
  soft-capping are fused into the score mask; sliding windows also tighten
  the page range so out-of-window pages are never fetched.

The decode case (q_len == 1 per sequence) needs no separate kernel: a block
of BQ decode rows covers BQ sequences whose pages are each fetched exactly
once — the same bytes a dedicated decode kernel would move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candle_vllm_tpu.ops.attention import AttentionSpec

NEG_INF = -1e30


def _kernel(
    # scalar prefetch (SMEM)
    kv_lens_ref,     # [S]
    pt_ref,          # [S, MAXP] page tables
    cu_ref,          # [S+1] cumulative q lens
    slo_ref,         # [NB] first seq overlapping each q block
    shi_ref,         # [NB] last seq overlapping each q block
    tused_ref,       # [1] number of real (non-padding) q rows
    # inputs
    q_ref,           # [BQ, H, D] VMEM block
    kv_pages_ref,    # [P, ps, 2K, D] HBM
    *rest,           # [kv_scales_ref] [sinks_ref] + outputs + scratch
    spec: AttentionSpec,
    bq: int,
    quantized: bool = False,
    kv4: bool = False,
    pg: int = 1,
):
    rest = list(rest)
    kv_scales_ref = rest.pop(0) if quantized else None
    sinks_ref = rest.pop(0) if spec.has_sinks else None
    if quantized:
        out_ref, kv_buf, acc_ref, m_ref, l_ref, sems, sc_buf, sc_sems = rest
    else:
        out_ref, kv_buf, acc_ref, m_ref, l_ref, sems = rest
        sc_buf = sc_sems = None
    b = pl.program_id(0)
    K = spec.num_kv_heads
    G = spec.group_size
    D = spec.head_dim
    ps = kv_buf.shape[3] if spec.kv3 else kv_buf.shape[2]
    BQG = bq * G
    PW = pg * ps  # kv positions per grouped step

    row0 = b * bq
    t_used = tused_ref[0]

    # init flash state for this block
    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def get_dma(slot, j, page_id):
        return pltpu.make_async_copy(
            kv_pages_ref.at[page_id], kv_buf.at[slot, j], sems.at[slot, j]
        )

    def get_scale_dma(slot, j, page_id):
        return pltpu.make_async_copy(
            kv_scales_ref.at[page_id], sc_buf.at[slot, j],
            sc_sems.at[slot, j],
        )

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bq, PW), 0) + row0
    kv_iota = jax.lax.broadcasted_iota(jnp.int32, (bq, PW), 1)

    @pl.when(row0 < t_used)
    def _process():
        s_lo = slo_ref[b]
        s_hi = shi_ref[b]

        def seq_body(s, _):
            cu_s = cu_ref[s]
            cu_e = cu_ref[s + 1]
            kvl = kv_lens_ref[s]
            # position offset: q row r of this sequence sits at kv position
            # kvl - cu_e + r
            pos_off = kvl - cu_e

            # page range this block needs from this sequence
            hi_pos = pos_off + jnp.minimum(cu_e, row0 + bq) - 1
            pg_hi = jnp.minimum(pl.cdiv(kvl, ps), hi_pos // ps + 1)
            if spec.sliding_window is not None:
                lo_pos = pos_off + jnp.maximum(cu_s, row0)
                kv_min = jnp.maximum(lo_pos - spec.sliding_window + 1, 0)
                pg_lo = kv_min // ps
            elif spec.chunk_size is not None:
                # chunked attention: nothing before the first row's chunk
                # start is ever needed (llama4/mod.rs chunked masks)
                lo_pos = pos_off + jnp.maximum(cu_s, row0)
                kv_min = (lo_pos // spec.chunk_size) * spec.chunk_size
                pg_lo = kv_min // ps
            else:
                pg_lo = jnp.int32(0)
            pg_lo = jnp.minimum(pg_lo, pg_hi)  # empty range when no pages
            # grouped page steps: each compute step consumes ``pg`` pages
            # so per-head dots are [BQG, D] x [D, pg*ps] — pg x fewer MXU
            # issues on long-context decode (the measured decode floor)
            g_lo = pg_lo // pg
            g_hi = (pg_hi + pg - 1) // pg

            import os

            # branch-free DMA scheduling is the default (A/B'd on TPU
            # 2026-08-19: 22.3 vs 25.1 us/op on 1k-ctx decode, never
            # worse); CVT_ATTN_V2=0 restores the predicated path
            attn_v2 = os.environ.get("CVT_ATTN_V2", "1") == "1"

            if attn_v2:
                # Branch-free DMA scheduling: out-of-range sub-pages clamp
                # to a valid page id and fetch real (finite) data — the
                # score masks already exclude their positions, and pages
                # are zero-initialized so no NaN can enter 0*NaN.  The
                # conditional start/wait/zero-fill branches cost ~8 scalar
                # predicates per group step and dominated decode attention
                # (measured ~8us/group of scalar-core overhead).
                def start_group(slot, g):
                    for j in range(pg):
                        page = jnp.clip(g * pg + j, pg_lo, pg_hi - 1)
                        pid = pt_ref[s, page]
                        get_dma(slot, j, pid).start()
                        if quantized:
                            get_scale_dma(slot, j, pid).start()

                def wait_group(slot, g):
                    for j in range(pg):
                        page = jnp.clip(g * pg + j, pg_lo, pg_hi - 1)
                        pid = pt_ref[s, page]
                        get_dma(slot, j, pid).wait()
                        if quantized:
                            get_scale_dma(slot, j, pid).wait()
            else:
                def start_group(slot, g):
                    for j in range(pg):
                        page = g * pg + j

                        @pl.when((page >= pg_lo) & (page < pg_hi))
                        def _start(j=j, page=page):
                            get_dma(slot, j, pt_ref[s, page]).start()
                            if quantized:
                                get_scale_dma(slot, j, pt_ref[s, page]).start()

                def wait_group(slot, g):
                    for j in range(pg):
                        page = g * pg + j
                        valid = (page >= pg_lo) & (page < pg_hi)

                        @pl.when(valid)
                        def _wait(j=j, page=page):
                            get_dma(slot, j, pt_ref[s, page]).wait()
                            if quantized:
                                get_scale_dma(slot, j, pt_ref[s, page]).wait()

                        @pl.when(jnp.logical_not(valid))
                        def _zero(j=j):
                            # skipped sub-pages must not hold NaN garbage:
                            # masked probabilities are 0 but 0 * NaN = NaN
                            # in the p @ V dot
                            kv_buf[slot, j] = jnp.zeros_like(kv_buf[slot, j])
                            if quantized:
                                sc_buf[slot, j] = jnp.zeros_like(sc_buf[slot, j])

            @pl.when(g_lo < g_hi)
            def _prologue():
                start_group(g_lo % 2, g_lo)

            def page_body(g, _):
                slot = g % 2

                @pl.when(g + 1 < g_hi)
                def _prefetch():
                    start_group((g + 1) % 2, g + 1)

                wait_group(slot, g)

                # mask for (row, kv) pairs: row belongs to s, causal,
                # within context, within window; lanes of skipped or
                # garbage sub-pages are excluded by the bounds masks
                kv_pos = g * PW + kv_iota              # [BQ, PW]
                q_pos = pos_off + row_iota             # [BQ, ps] (pos of row)
                mask = (row_iota >= cu_s) & (row_iota < cu_e)
                mask &= kv_pos <= q_pos
                mask &= kv_pos < kvl
                if spec.sliding_window is not None:
                    mask &= kv_pos > q_pos - spec.sliding_window
                if spec.chunk_size is not None:
                    mask &= kv_pos >= (q_pos // spec.chunk_size) * spec.chunk_size
                mask &= kv_pos >= pg_lo * ps
                mask3 = jnp.broadcast_to(
                    mask[:, None, :], (bq, G, PW)
                ).reshape(BQG, PW)

                def _kv3_head(h):
                    # turbo3 plane-major pages: head h's 3-bit K codes
                    # live in ONE (plane, bitfield) pair of the 2-bit and
                    # 1-bit planes, its V nibbles in one nibble plane —
                    # all indices static in the unrolled head loop
                    # (kv_cache.allocate_kv_pages_turbo3 layout)
                    kd = K * D
                    nb2, nb1 = kd // 512, kd // 1024
                    off = h * D

                    def plane(p):
                        return kv_buf[slot][:, p].reshape(PW, D)

                    def unsigned(b):
                        bf = b.astype(jnp.float32)
                        return jnp.where(bf < 0.0, bf + 256.0, bf)

                    t2, p2 = off // (kd // 4), (off % (kd // 4)) // D
                    b2 = unsigned(plane(p2))
                    x2 = jnp.floor(b2 / float(4 ** t2))
                    low2 = x2 - 4.0 * jnp.floor(x2 / 4.0)
                    t1 = off // (kd // 8)
                    p1 = nb2 + (off % (kd // 8)) // D
                    b1 = unsigned(plane(p1))
                    x1 = jnp.floor(b1 / float(2 ** t1))
                    bit = x1 - 2.0 * jnp.floor(x1 / 2.0)
                    k_h = low2 + 4.0 * bit - 4.0
                    if off < kd // 2:
                        bv = plane(nb2 + nb1 + off // D).astype(jnp.float32)
                        v_h = bv - 16.0 * jnp.floor(bv / 16.0) - 8.0
                    else:
                        bv = plane(
                            nb2 + nb1 + (off - kd // 2) // D
                        ).astype(jnp.float32)
                        v_h = jnp.floor(bv / 16.0)
                    return k_h, v_h

                def _head_kv(h):
                    """This page group's (K, V) planes for head h, plus the
                    per-token dequant scales (None for bf16 caches)."""
                    if spec.kv3:
                        k_h, v_h = _kv3_head(h)
                    elif kv4:
                        # packed nibbles: K lo / V hi share one byte plane
                        # (kv_cache.allocate_kv_pages_int4); exact f32
                        # unpack — floor(b/16) == b >> 4 for int8
                        b = kv_buf[slot, :, :, h, :].reshape(
                            PW, D
                        ).astype(jnp.float32)
                        v_h = jnp.floor(b * 0.0625)
                        k_h = b - 16.0 * v_h - 8.0
                    elif spec.kv_shared:
                        # MLA latent cache: k == v == the single head
                        # plane (half the page bytes of the 2K layout)
                        k_h = v_h = kv_buf[slot, :, :, h, :].reshape(PW, D)
                    else:
                        k_h = kv_buf[slot, :, :, 2 * h, :].reshape(PW, D)
                        v_h = kv_buf[slot, :, :, 2 * h + 1, :].reshape(PW, D)
                    ks_h = vs_h = None
                    if quantized:
                        k_plane = h if spec.kv_shared else 2 * h
                        v_plane = h if spec.kv_shared else 2 * h + 1
                        ks_h = sc_buf[slot, :, k_plane, :].reshape(PW)
                        vs_h = sc_buf[slot, :, v_plane, :].reshape(PW)
                    return k_h, v_h, ks_h, vs_h

                # decode-sized blocks only: at prefill widths (bq=64,
                # K*BQG rows in the thousands) the Kx off-diagonal MXU
                # waste is real (TTFT 115 -> 123 ms measured); at bq<=8
                # the batched dots measured 130.4 -> 132.9 tok/s.  All KV
                # tiers batch: quantized scales fold into the score /
                # probability rows per head block (VERDICT r3 weak #5).
                hbv = int(os.environ.get("CVT_ATTN_HB", "1") or "0")
                hb = hbv >= 1 and bq <= 8
                if hb and hbv == 2:
                    # ---- masked-big variant (CVT_ATTN_HB=2): keep the
                    # whole [K*BQG, K*PW] score matrix and mask the
                    # off-diagonal blocks to -inf instead of extracting
                    # diagonal blocks and rebuilding a block-diagonal P.
                    # exp(-inf)=0 keeps each row's softmax sum within its
                    # own head block, so P @ V_all is exact — and the two
                    # concat passes (score extract + zero-padded P build)
                    # disappear from the VPU path.
                    heads = [_head_kv(h) for h in range(K)]
                    q_all = jnp.concatenate([
                        q_ref[:, h * G:(h + 1) * G, :].reshape(BQG, D)
                        for h in range(K)
                    ], axis=0)                          # [K*BQG, D]
                    k_all = jnp.concatenate(
                        [k_h for k_h, _, _, _ in heads], axis=0
                    )                                   # [K*PW, D]
                    v_all = jnp.concatenate(
                        [v_h for _, v_h, _, _ in heads], axis=0
                    )
                    big = jax.lax.dot_general(
                        q_all.astype(jnp.bfloat16),
                        k_all.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * spec.sm_scale                   # [K*BQG, K*PW]
                    if quantized:
                        ks_all = jnp.concatenate(
                            [ks_h for _, _, ks_h, _ in heads]
                        )                               # [K*PW]
                        big = big * ks_all[None, :]
                    if spec.logit_soft_cap is not None:
                        cap = spec.logit_soft_cap
                        big = cap * jnp.tanh(big / cap)
                    rblk = jax.lax.broadcasted_iota(
                        jnp.int32, (K * BQG, K * PW), 0
                    ) // BQG
                    cblk = jax.lax.broadcasted_iota(
                        jnp.int32, (K * BQG, K * PW), 1
                    ) // PW
                    mask_big = (rblk == cblk) & jnp.tile(mask3, (K, K))
                    m_prev = m_ref[...][:, :, :1].reshape(K * BQG, 1)
                    l_prev = l_ref[...][:, :, :1].reshape(K * BQG, 1)
                    m_cur = jnp.max(
                        jnp.where(mask_big, big, NEG_INF), axis=-1,
                        keepdims=True,
                    )
                    m_new = jnp.maximum(m_prev, m_cur)
                    p_big = jnp.where(mask_big, jnp.exp(big - m_new), 0.0)
                    alpha = jnp.exp(m_prev - m_new)
                    l_new = alpha * l_prev + jnp.sum(p_big, -1, keepdims=True)
                    if quantized:
                        vs_all = jnp.concatenate(
                            [vs_h for _, _, _, vs_h in heads]
                        )
                        p_big = p_big * vs_all[None, :]
                    pv = jax.lax.dot_general(
                        p_big.astype(jnp.bfloat16),
                        v_all.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [K*BQG, D]
                    acc_ref[...] = (
                        acc_ref[...] * alpha.reshape(K, BQG, 1)
                        + pv.reshape(K, BQG, D)
                    )
                    m_ref[...] = jnp.broadcast_to(
                        m_new.reshape(K, BQG, 1), (K, BQG, 128)
                    )
                    l_ref[...] = jnp.broadcast_to(
                        l_new.reshape(K, BQG, 1), (K, BQG, 128)
                    )
                    return 0
                if hb:
                    # ---- head-batched phase: replace the K-head loop's
                    # 2K small dependent dots with TWO block-diagonal
                    # dots + one vectorized softmax.  The off-diagonal
                    # MXU work is wasted (Kx) but tiny in absolute terms;
                    # what it buys is the removal of K serial
                    # dot->VPU->dot latency chains per page step.
                    heads = [_head_kv(h) for h in range(K)]
                    q_all = jnp.concatenate([
                        q_ref[:, h * G:(h + 1) * G, :].reshape(BQG, D)
                        for h in range(K)
                    ], axis=0)                          # [K*BQG, D]
                    k_all = jnp.concatenate(
                        [k_h for k_h, _, _, _ in heads], axis=0
                    )                                   # [K*PW, D]
                    v_all = jnp.concatenate(
                        [v_h for _, v_h, _, _ in heads], axis=0
                    )
                    big = jax.lax.dot_general(
                        q_all.astype(jnp.bfloat16),
                        k_all.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * spec.sm_scale                   # [K*BQG, K*PW]
                    scores = jnp.concatenate([
                        big[h * BQG:(h + 1) * BQG, h * PW:(h + 1) * PW]
                        for h in range(K)
                    ], axis=0)                          # [K*BQG, PW]
                    if quantized:
                        scores = scores * jnp.concatenate([
                            jnp.broadcast_to(ks_h[None, :], (BQG, PW))
                            for _, _, ks_h, _ in heads
                        ], axis=0)
                    if spec.logit_soft_cap is not None:
                        cap = spec.logit_soft_cap
                        scores = cap * jnp.tanh(scores / cap)
                    mask_all = jnp.concatenate([mask3] * K, axis=0)
                    m_prev = m_ref[...][:, :, :1].reshape(K * BQG, 1)
                    l_prev = l_ref[...][:, :, :1].reshape(K * BQG, 1)
                    m_cur = jnp.max(
                        jnp.where(mask_all, scores, NEG_INF), axis=-1,
                        keepdims=True,
                    )
                    m_new = jnp.maximum(m_prev, m_cur)
                    p_ij = jnp.where(mask_all, jnp.exp(scores - m_new), 0.0)
                    alpha = jnp.exp(m_prev - m_new)
                    l_new = alpha * l_prev + jnp.sum(p_ij, -1, keepdims=True)
                    p_v = p_ij
                    if quantized:
                        # fold the V scales into the probabilities
                        p_v = p_ij * jnp.concatenate([
                            jnp.broadcast_to(vs_h[None, :], (BQG, PW))
                            for _, _, _, vs_h in heads
                        ], axis=0)
                    # block-diagonal P assembled by concatenation (Mosaic
                    # has no scatter lowering for value updates)
                    rows_p = []
                    for h in range(K):
                        parts = []
                        if h:
                            parts.append(
                                jnp.zeros((BQG, h * PW), jnp.float32)
                            )
                        parts.append(p_v[h * BQG:(h + 1) * BQG])
                        if K - 1 - h:
                            parts.append(
                                jnp.zeros((BQG, (K - 1 - h) * PW),
                                          jnp.float32)
                            )
                        rows_p.append(jnp.concatenate(parts, axis=1))
                    p_big = jnp.concatenate(rows_p, axis=0)
                    pv = jax.lax.dot_general(
                        p_big.astype(jnp.bfloat16),
                        v_all.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [K*BQG, D]
                    acc_ref[...] = (
                        acc_ref[...] * alpha.reshape(K, BQG, 1)
                        + pv.reshape(K, BQG, D)
                    )
                    m_ref[...] = jnp.broadcast_to(
                        m_new.reshape(K, BQG, 1), (K, BQG, 128)
                    )
                    l_ref[...] = jnp.broadcast_to(
                        l_new.reshape(K, BQG, 1), (K, BQG, 128)
                    )
                    return 0

                for h in range(K):
                    q_h = q_ref[:, h * G : (h + 1) * G, :].reshape(BQG, D)
                    k_h, v_h, ks_h, vs_h = _head_kv(h)
                    # bf16 operands + f32 accumulation: full MXU rate
                    # (f32xf32 dots run at 1/8 throughput and dominated
                    # the decode attention cost — measured 30us/layer)
                    scores = jax.lax.dot_general(
                        q_h.astype(jnp.bfloat16),
                        k_h.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * spec.sm_scale                  # [BQG, ps]
                    if quantized:
                        # int8 cache: fold the per-(token,head) K scale
                        # into the score columns (fused dequant); shared
                        # (MLA) caches have one scale plane per head
                        scores = scores * ks_h[None, :]
                    if spec.logit_soft_cap is not None:
                        cap = spec.logit_soft_cap
                        scores = cap * jnp.tanh(scores / cap)

                    m_prev = m_ref[h, :, :1]           # [BQG, 1]
                    l_prev = l_ref[h, :, :1]
                    m_cur = jnp.max(
                        jnp.where(mask3, scores, NEG_INF), axis=-1, keepdims=True
                    )
                    m_new = jnp.maximum(m_prev, m_cur)
                    # exp of masked entries must be exactly 0 so rows of other
                    # sequences (or fully-masked rows) stay untouched
                    p_ij = jnp.where(mask3, jnp.exp(scores - m_new), 0.0)
                    alpha = jnp.exp(m_prev - m_new)    # [BQG, 1]
                    l_new = alpha * l_prev + jnp.sum(p_ij, axis=-1, keepdims=True)
                    p_v = p_ij
                    if quantized:
                        # fold the V scale into the probabilities
                        p_v = p_ij * vs_h[None, :]
                    pv = jax.lax.dot_general(
                        p_v.astype(jnp.bfloat16),
                        v_h.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                   # [BQG, D]
                    acc_ref[h] = acc_ref[h] * alpha + pv
                    m_ref[h] = jnp.broadcast_to(m_new, (BQG, 128))
                    l_ref[h] = jnp.broadcast_to(l_new, (BQG, 128))
                return 0

            jax.lax.fori_loop(g_lo, g_hi, page_body, 0)
            return 0

        jax.lax.fori_loop(s_lo, s_hi + 1, seq_body, 0)

    # finalize: out = acc / l (0 for rows that saw no valid kv)
    for h in range(K):
        m = m_ref[h, :, :1]
        l = l_ref[h, :, :1]
        acc = acc_ref[h]
        if sinks_ref is not None:
            # per-head sink logit joins the denominator (no value vector);
            # rows pre-expanded to [K, BQG, 128] by the wrapper
            s_b = sinks_ref[h, :, :1]
            m2 = jnp.maximum(m, s_b)
            alpha = jnp.exp(m - m2)
            l = l * alpha + jnp.exp(s_b - m2)
            acc = acc * alpha
        out = acc / jnp.where(l > 0.0, l, 1.0)
        out_ref[:, h * G : (h + 1) * G, :] = out.reshape(bq, G, D).astype(
            out_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("spec", "bq", "interpret", "vmem_limit_bytes",
                     "decode_only"),
)
def ragged_paged_attention_pallas(
    q: jnp.ndarray,            # [T, H, D]
    kv_pages: jnp.ndarray,     # [P, ps, 2K, D]
    kv_lens: jnp.ndarray,      # [S] int32
    page_tables: jnp.ndarray,  # [S, MAXP] int32
    cu_q_lens: jnp.ndarray,    # [S+1] int32
    kv_scales: jnp.ndarray | None = None,  # [P, 2K, ps] f32 (int8 cache)
    sinks: jnp.ndarray | None = None,      # [H] per-q-head sink logits
    *,
    spec: AttentionSpec,
    bq: int = 64,
    interpret: bool | None = None,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
    decode_only: bool = False,
) -> jnp.ndarray:
    import dataclasses

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (sinks is not None) != spec.has_sinks:
        spec = dataclasses.replace(spec, has_sinks=sinks is not None)
    T, H, D = q.shape
    _, ps, twoK, Dp = kv_pages.shape  # twoK = plane dim (may be padded)
    if spec.kv3:
        # plane-major turbo3 pages [P, planes, ps, 128]
        ps, twoK = twoK, ps
    K = spec.num_kv_heads
    assert H == spec.num_q_heads
    if Dp != D:
        # lane-padded cache: pad q; zero k/q pad lanes don't affect scores,
        # zero v pad lanes are sliced off the output
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
        spec_p = dataclasses.replace(spec, head_dim=Dp)
        out = ragged_paged_attention_pallas(
            q, kv_pages, kv_lens, page_tables, cu_q_lens, kv_scales, sinks,
            spec=spec_p, bq=bq, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes, decode_only=decode_only,
        )
        return out[..., :D]
    quantized = kv_scales is not None
    # int4 cache: K/V nibbles share one byte plane -> pages carry K (not
    # 2K) head planes (kv_cache.allocate_kv_pages_int4)
    kv4 = spec.kv4
    G = spec.group_size
    S = kv_lens.shape[0]

    MAXP = page_tables.shape[1]
    bq = min(bq, max(8, T))
    # Decode-size batches (T <= 8) usually carry ONE real row padded to
    # the bucket: shrinking the query block shrinks every hb matrix
    # ([K*bq*G, ...] scores/probabilities) by the same factor while the
    # page DMAs are unchanged — blocks past t_used skip.  bq*G >= 8 keeps
    # the f32 sublane tiling minimum.
    import os

    # decode-only batches of ANY width get the same shrink: with bq=8 a
    # block's 8 rows span 8 DIFFERENT sequences, and each sequence's
    # page loop runs the hb matrices over all 8 (7 masked) — O(bq) VPU
    # waste per (seq, page-group) step that dominates aggregate decode
    # (r5: 16-way aggregate collapsed 460 -> 257 tok/s before this)
    # bq=2 default (r5 A/B): single-request 119-120 vs 118 (wash) and
    # aggregate decode +23-32% (8-way turbo3 674 vs 549; 16-way 821 —
    # the O(bq) masked rows per (seq, page-group) step dominate there).
    # bq*G must be a MULTIPLE of 8 (f32 sublane tiling): odd GQA ratios
    # (qwen2-0.5b G=7 -> BQG=14) hit a Mosaic vreg assert otherwise
    # (caught by the r5 server drive), so round bq up until it divides.
    if decode_only or T <= 8:
        bq_want = int(os.environ.get("CVT_ATTN_BQ", "2"))
        b = max(bq_want, -(-8 // G))
        while (b * G) % 8 and b < 8:
            b += 1
        bq = min(bq, b)
    T_pad = pl.cdiv(T, bq) * bq
    if T_pad != T:
        q = jnp.pad(q, ((0, T_pad - T), (0, 0), (0, 0)))
    NB = T_pad // bq

    # pages per grouped compute step; smaller groups pipeline the page
    # DMAs better under the head-batched decode path (r4 sweep on the
    # full 8B decode step: pg=1 134.96 / pg=2 134.97 / pg=4 132.83 /
    # pg=8 127.39 tok/s); CVT_ATTN_PG overrides for tuning sweeps
    import os

    pg_want = int(os.environ.get("CVT_ATTN_PG", "2"))
    pg = pg_want
    while pg > 1 and MAXP < pg:
        pg //= 2
    cu = cu_q_lens.astype(jnp.int32)
    t_used = cu[S]
    starts = jnp.arange(NB, dtype=jnp.int32) * bq
    ends = jnp.clip(starts + bq - 1, 0, jnp.maximum(t_used - 1, 0))
    slo = jnp.clip(
        jnp.searchsorted(cu[1:], starts, side="right"), 0, S - 1
    ).astype(jnp.int32)
    shi = jnp.clip(
        jnp.searchsorted(cu[1:], ends, side="right"), 0, S - 1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (bq, H, D),
                lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if quantized else [])
          + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if spec.has_sinks else []),
        out_specs=pl.BlockSpec(
            (bq, H, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, pg, twoK, ps, D) if spec.kv3 else (2, pg, ps, twoK, D),
                kv_pages.dtype,
            ),
            pltpu.VMEM((K, bq * G, D), jnp.float32),
            pltpu.VMEM((K, bq * G, 128), jnp.float32),
            pltpu.VMEM((K, bq * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, pg)),
        ] + (
            [pltpu.VMEM((2, pg, kv_scales.shape[1], ps), jnp.float32),
             pltpu.SemaphoreType.DMA((2, pg))]
            if quantized else []
        ),
    )

    inputs = [
        kv_lens.astype(jnp.int32),
        page_tables.astype(jnp.int32),
        cu,
        slo,
        shi,
        t_used.reshape(1),
        q,
        kv_pages,
    ]
    if quantized:
        inputs.append(kv_scales.astype(jnp.float32))
    if spec.has_sinks:
        G_ = spec.group_size
        inputs.append(
            jnp.broadcast_to(
                sinks.astype(jnp.float32).reshape(K, 1, G_, 1),
                (K, bq, G_, 128),
            ).reshape(K, bq * G_, 128)
        )
    out = pl.pallas_call(
        functools.partial(_kernel, spec=spec, bq=bq, quantized=quantized,
                          kv4=kv4, pg=pg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:T]
