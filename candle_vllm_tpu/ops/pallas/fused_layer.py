"""Decode-path layer megakernel: o_proj + residual + RMSNorm + MLP in
ONE pallas_call with a continuous weight stream.

Round-3 finding (docs/PERF.md): every decode matmul runs 15-40% above
its bytes/886 GB/s roofline, and the overshoot is *worse for smaller
tensors* — fixed per-launch cost plus a weight-stream bubble at every
kernel boundary.  This kernel owns the whole post-attention half of a
decoder layer (reference: one DecoderLayer iteration,
llama.rs forward + attention.rs o_proj):

    x2  = x + attn_raw @ Wo            (o_proj + residual)
    h   = rms_norm(x2) * w_norm        (post_attention_layernorm)
    act = silu(h @ Wg) * (h @ Wu)      (gate_up)
    out = x2 + act @ Wd                (down + residual)

All four weight banks stream from HBM (``pl.ANY``) through manually
double-buffered VMEM tiles — the stream never stalls at an op boundary
(the fused_mlp.py pattern, extended across the o-proj and the norm).

Decode-only (T <= 8); prefill keeps the per-projection MXU-bound path.
W4A16 tile-contiguous layout throughout (quant_matmul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candle_vllm_tpu.ops.pallas.fused_mlp import _w4_tile_matmul

GROUP = 128


def _kernel(
    # scalars (SMEM): phase boundaries
    bounds_ref,      # [3] = [n_o, n_o + n_gu, n_o + n_gu + n_dn]
    # VMEM inputs
    x_ref,           # [T, H] bf16 residual stream
    attn_ref,        # [T, HA] bf16 raw attention output (pre-o_proj)
    nw_ref,          # [1, H] f32 post-attention norm weight
    o_s_ref,         # [n_o, HA/g, TO] bf16 per-tile o scales
    gu_s_ref,        # [2*n_gu, H/g, TO] bf16
    dn_s_ref,        # [n_dn, CH/g, TO] bf16
    *rest,
    TO: int,
    CH: int,
    n_chunks: int,
    T: int,
    eps: float,
    has_qkv: bool,
):
    rest = list(rest)
    if has_qkv:
        n2w_ref = rest.pop(0)   # [1, H] next layer's input-norm weight
        q_s_ref = rest.pop(0)   # [n_q, H/g, TO] bf16 next-qkv scales
    o_q_ref = rest.pop(0)       # [n_o, HA, TO/2] int8 (HBM)
    gu_q_ref = rest.pop(0)      # [2*I/TO, H, TO/2] int8 (HBM)
    dn_q_ref = rest.pop(0)      # [H/TO, I, TO/2] int8 (HBM)
    if has_qkv:
        q_q_ref = rest.pop(0)   # [n_q, H, TO/2] int8 (HBM)
    out_ref = rest.pop(0)       # [T, H] new residual
    if has_qkv:
        qkv_ref = rest.pop(0)   # [T, n_q*TO] next layer's qkv
    x2_ref = rest.pop(0)        # [T, H] bf16 scratch (x + o_out)
    h_ref = rest.pop(0)         # [T, I] f32 scratch (mlp intermediate)
    acc_ref = rest.pop(0)       # [T, TO] f32 scratch (down accumulator)
    obuf = rest.pop(0)          # [2, HA, TO/2] int8
    gbuf = rest.pop(0)
    ubuf = rest.pop(0)
    dbuf = rest.pop(0)          # [2, CH, TO/2] int8
    if has_qkv:
        qbuf = rest.pop(0)      # [2, H, TO/2] int8
    osem, gsem, usem, dsem = rest[:4]
    qsem = rest[4] if has_qkv else None

    i = pl.program_id(0)
    n_o = bounds_ref[0]
    n_gu_end = bounds_ref[1]
    n_dn_end = bounds_ref[2]
    n_total = pl.num_programs(0)

    def o_dma(slot, step):
        return pltpu.make_async_copy(
            o_q_ref.at[step], obuf.at[slot], osem.at[slot]
        )

    def gu_dma(slot, step):
        ngu = n_gu_end - n_o
        g = pltpu.make_async_copy(
            gu_q_ref.at[step], gbuf.at[slot], gsem.at[slot]
        )
        u = pltpu.make_async_copy(
            gu_q_ref.at[step + ngu], ubuf.at[slot], usem.at[slot]
        )
        return g, u

    def dn_dma(slot, step):
        tile = step // n_chunks
        chunk = step % n_chunks
        return pltpu.make_async_copy(
            dn_q_ref.at[tile, pl.ds(chunk * CH, CH)],
            dbuf.at[slot],
            dsem.at[slot],
        )

    def qkv_dma(slot, step):
        return pltpu.make_async_copy(
            q_q_ref.at[step], qbuf.at[slot], qsem.at[slot]
        )

    def start(step):
        slot = step % 2

        @pl.when(step < n_o)
        def _o():
            o_dma(slot, step).start()

        @pl.when((step >= n_o) & (step < n_gu_end))
        def _g():
            g, u = gu_dma(slot, step - n_o)
            g.start()
            u.start()

        if has_qkv:
            @pl.when((step >= n_gu_end) & (step < n_dn_end))
            def _d():
                dn_dma(slot, step - n_gu_end).start()

            @pl.when(step >= n_dn_end)
            def _q():
                qkv_dma(slot, step - n_dn_end).start()
        else:
            @pl.when(step >= n_gu_end)
            def _d():
                dn_dma(slot, step - n_gu_end).start()

    @pl.when(i == 0)
    def _warm():
        start(0)

    @pl.when(i + 1 < n_total)
    def _prefetch():
        start(i + 1)

    slot = i % 2

    # ---- phase 1: o_proj column tiles + residual add ---------------------
    @pl.when(i < n_o)
    def _o_phase():
        o_dma(slot, i).wait()
        a = attn_ref[...]
        zero = jnp.zeros((T, TO), jnp.float32)
        so = o_s_ref[i].astype(jnp.float32)
        TOH = TO // 2
        y = _w4_tile_matmul(a, obuf[slot], so[:, :TOH], so[:, TOH:], zero)
        cols = pl.ds(i * TO, TO)
        x2_ref[:, cols] = (
            x_ref[:, cols].astype(jnp.float32) + y
        ).astype(x2_ref.dtype)

    # ---- phase 2: gate_up on the normed x2 -------------------------------
    @pl.when((i >= n_o) & (i < n_gu_end))
    def _gate_up():
        j = i - n_o
        # the RMS-norm of x2 is recomputed per gate_up step ([T, H] f32,
        # ~0.1 us on the VPU) — cheaper than a phase barrier + scratch
        g, u = gu_dma(slot, j)
        g.wait()
        u.wait()
        xf = x2_ref[...].astype(jnp.float32)
        scale = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=1, keepdims=True) + eps
        )
        hrow = (xf * scale * nw_ref[...]).astype(jnp.bfloat16)
        zero = jnp.zeros((T, TO), jnp.float32)
        TOH = TO // 2
        sg = gu_s_ref[j].astype(jnp.float32)
        gate = _w4_tile_matmul(hrow, gbuf[slot], sg[:, :TOH], sg[:, TOH:],
                               zero)
        ngu = n_gu_end - n_o
        su = gu_s_ref[j + ngu].astype(jnp.float32)
        up = _w4_tile_matmul(hrow, ubuf[slot], su[:, :TOH], su[:, TOH:],
                             zero)
        act = jax.nn.silu(gate) * up
        h_ref[:, pl.ds(j * TO, TO)] = act

    # ---- phase 3: down column tiles + residual add ------------------------
    @pl.when((i >= n_gu_end) & (i < n_dn_end))
    def _down():
        j = i - n_gu_end
        tile = j // n_chunks
        chunk = j % n_chunks

        @pl.when(chunk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dn_dma(slot, j).wait()
        xh = h_ref[:, pl.ds(chunk * CH, CH)].astype(jnp.bfloat16)
        sd = dn_s_ref[j].astype(jnp.float32)
        TOH = TO // 2
        acc_ref[...] = _w4_tile_matmul(xh, dbuf[slot], sd[:, :TOH],
                                       sd[:, TOH:], acc_ref[...])

        @pl.when(chunk == n_chunks - 1)
        def _flush():
            cols = pl.ds(tile * TO, TO)
            out_ref[:, cols] = (
                x2_ref[:, cols].astype(jnp.float32) + acc_ref[...]
            ).astype(out_ref.dtype)

    # ---- phase 4 (optional): next layer's input-norm + qkv ---------------
    if has_qkv:
        @pl.when(i >= n_dn_end)
        def _qkv():
            j = i - n_dn_end
            qkv_dma(slot, j).wait()
            xf = out_ref[...].astype(jnp.float32)
            scale = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=1, keepdims=True) + eps
            )
            hrow = (xf * scale * n2w_ref[...]).astype(jnp.bfloat16)
            zero = jnp.zeros((T, TO), jnp.float32)
            sq = q_s_ref[j].astype(jnp.float32)
            TOH = TO // 2
            y = _w4_tile_matmul(hrow, qbuf[slot], sq[:, :TOH], sq[:, TOH:],
                                zero)
            qkv_ref[:, pl.ds(j * TO, TO)] = y.astype(qkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_o_mlp_w4(
    x: jnp.ndarray,       # [T, H] residual stream (bf16)
    attn_raw: jnp.ndarray,  # [T, HA] pre-o_proj attention output
    o_q: jnp.ndarray,     # [H/TO, HA, TO/2] int8
    o_s: jnp.ndarray,     # [HA/g, H]
    gu_q: jnp.ndarray,    # [2I/TO, H, TO/2] int8
    gu_s: jnp.ndarray,    # [H/g, 2I]
    dn_q: jnp.ndarray,    # [H/TO, I, TO/2] int8
    dn_s: jnp.ndarray,    # [I/g, H]
    norm_w: jnp.ndarray,  # [H]
    qkv_q: jnp.ndarray | None = None,   # [Oq/TO, H, TO/2] next-layer qkv
    qkv_s: jnp.ndarray | None = None,   # [H/g, Oq]
    norm2_w: jnp.ndarray | None = None,  # [H] next input_layernorm
    *,
    eps: float = 1e-6,
    interpret: bool | None = None,
):
    """Returns the new residual, or (residual, next_qkv) when the
    next-layer qkv bank is passed (its input-norm fuses in too — the
    weight stream then covers o + gate_up + down + qkv back to back)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_qkv = qkv_q is not None
    T, H = x.shape
    HA = attn_raw.shape[1]
    twoI = gu_s.shape[1]
    I = twoI // 2
    n_o = o_q.shape[0]
    TO = H // n_o
    n_gu = I // TO
    TOH = TO // 2
    n_dn_tiles = dn_q.shape[0]
    assert dn_q.shape[1] == I and n_dn_tiles * TO == H
    assert gu_q.shape[0] == 2 * n_gu
    n_q = qkv_q.shape[0] if has_qkv else 0
    if has_qkv:
        assert qkv_q.shape[1] == H and qkv_q.shape[2] == TOH

    CH = I
    for c in range(min(I, 4096), GROUP - 1, -GROUP):
        if I % c == 0 and ((c // GROUP) % 8 == 0 or c == I):
            CH = c
            break
    n_chunks = I // CH
    n_dn_end = n_o + n_gu + n_dn_tiles * n_chunks
    n_total = n_dn_end + n_q

    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        attn_raw = jnp.pad(attn_raw, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)
    attn_raw = attn_raw.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((Tp, H), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Tp, HA), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # norm weight
        pl.BlockSpec(memory_space=pltpu.VMEM),   # o scales
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gu scales
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dn scales
    ]
    if has_qkv:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # next norm weight
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv scales
        ]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),       # o_q HBM
        pl.BlockSpec(memory_space=pl.ANY),       # gu_q HBM
        pl.BlockSpec(memory_space=pl.ANY),       # dn_q HBM
    ]
    if has_qkv:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # qkv_q HBM

    out_specs = pl.BlockSpec((Tp, H), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Tp, H), x.dtype)
    if has_qkv:
        out_specs = (out_specs,
                     pl.BlockSpec((Tp, n_q * TO), lambda i, *_: (0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((Tp, n_q * TO), x.dtype))

    scratch = [
        pltpu.VMEM((Tp, H), jnp.bfloat16),
        pltpu.VMEM((Tp, I), jnp.float32),
        pltpu.VMEM((Tp, TO), jnp.float32),
        pltpu.VMEM((2, HA, TOH), jnp.int8),
        pltpu.VMEM((2, H, TOH), jnp.int8),
        pltpu.VMEM((2, H, TOH), jnp.int8),
        pltpu.VMEM((2, CH, TOH), jnp.int8),
    ]
    if has_qkv:
        scratch.append(pltpu.VMEM((2, H, TOH), jnp.int8))
    scratch += [pltpu.SemaphoreType.DMA((2,)) for _ in range(4)]
    if has_qkv:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    inputs = [
        jnp.asarray([n_o, n_o + n_gu, n_dn_end], jnp.int32),
        x,
        attn_raw,
        norm_w.astype(jnp.float32).reshape(1, H),
        # [HA/g, H] -> [n_o, HA/g, TO]
        o_s.astype(jnp.bfloat16).reshape(o_s.shape[0], n_o, TO)
        .transpose(1, 0, 2),
        gu_s.astype(jnp.bfloat16)
        .reshape(gu_s.shape[0], 2 * n_gu, TO)
        .transpose(1, 0, 2),
        dn_s.astype(jnp.bfloat16)
        .reshape(n_chunks, CH // GROUP, n_dn_tiles, TO)
        .transpose(2, 0, 1, 3)
        .reshape(n_dn_tiles * n_chunks, CH // GROUP, TO),
    ]
    if has_qkv:
        inputs += [
            norm2_w.astype(jnp.float32).reshape(1, H),
            qkv_s.astype(jnp.bfloat16)
            .reshape(qkv_s.shape[0], n_q, TO).transpose(1, 0, 2),
        ]
    inputs += [o_q, gu_q, dn_q]
    if has_qkv:
        inputs.append(qkv_q)

    out = pl.pallas_call(
        functools.partial(_kernel, TO=TO, CH=CH, n_chunks=n_chunks, T=Tp,
                          eps=eps, has_qkv=has_qkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if has_qkv:
        return out[0][:T], out[1][:T]
    return out[:T]
