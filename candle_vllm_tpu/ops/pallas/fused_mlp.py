"""Fused W4A16 decode MLP megakernel: down(silu(gate) * up) in ONE
pallas_call with continuous weight streaming.

Decode is weight-bandwidth-bound; the per-projection kernels
(``quant_matmul.py``) leave a pipeline bubble at every kernel boundary —
the down-proj weight stream cannot start until the gate_up call retires.
This kernel owns the whole MLP: weights stay in HBM (``pl.ANY``) and are
manually double-buffered tile-by-tile across BOTH projections, so the
weight stream never stalls (the analogue of the reference stacking
back-to-back Marlin launches on separate CUDA streams).

Layout (the standard tile-contiguous W4A16 pack, see quant_matmul.py):
  gu_q [2*I/TO, H, TO/2] int8  — gate tiles 0..I/TO-1, then up tiles
  gu_s [H/g, 2*I] bf16
  dn_q [H/TO, I, TO/2] int8
  dn_s [I/g, H] bf16

Grid: ``I/TO`` paired gate+up steps (each DMAs one gate and one up tile,
computing an h tile), then ``H/TO * n_chunks`` down steps (each DMAs one
[CH, TO/2] chunk of a down tile).  All DMAs are issued 2 steps ahead.

Decode-only: T <= 8 (the caller falls back to the per-projection kernels
for prefill).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def _w4_tile_matmul(x, p, s_lo, s_hi, acc):
    """acc += x @ dequant(p) for one [TI, TO/2]-packed tile.

    x [T, TI] bf16; p [TI, TOH] int8; s_lo/s_hi [TI/g, TOH] f32 (split
    halves: Mosaic cannot sublane-broadcast a row sliced at a lane
    offset < 512 — see quant_matmul.py); acc [T, TO] f32.
    Group-split form: scales hit the [T, TO] partial products; the low
    nibble is recovered as plo = x@b - 16*(x@hi) (see quant_matmul.py).
    k-way accumulator rotation + a single rowsum-correction dot break the
    serial VPU-add chain (quant_matmul._nacc; measured ~1.7x on TPU)."""
    import os

    from candle_vllm_tpu.ops.pallas.quant_matmul import _nacc

    TI, TOH = p.shape
    T = x.shape[0]
    ng = TI // GROUP
    NACC = _nacc(ng)
    if os.environ.get("CVT_W4A8") == "1":
        # W4A8: s8xs8->s32 MXU dots at 2x pass rate (see quant_matmul.py)
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12
        xq = jnp.round(xf / sx).astype(jnp.int8)
        hi8 = jnp.floor(p.astype(jnp.float32) * 0.0625).astype(jnp.int8)
        rs_all = jnp.sum(
            xq.astype(jnp.float32).reshape(T, ng, GROUP), axis=2
        )
        corr = 8.0 * jnp.dot(rs_all, s_lo,
                             preferred_element_type=jnp.float32)
        los = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        his = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        for gi in range(ng):
            sl = slice(gi * GROUP, (gi + 1) * GROUP)
            xb = xq[:, sl]
            ppf = jax.lax.dot_general(
                xb, p[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            phi = jax.lax.dot_general(
                xb, hi8[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            kk = gi % NACC
            los[kk] = los[kk] + (ppf - 16.0 * phi) * s_lo[gi][None, :]
            his[kk] = his[kk] + phi * s_hi[gi][None, :]
        acc_lo = acc[:, :TOH] + (sum(los) - corr) * sx
        acc_hi = acc[:, TOH:] + sum(his) * sx
        return jnp.concatenate([acc_lo, acc_hi], axis=1)
    if os.environ.get("CVT_HI_SHIFT") == "1":
        # A/B: integer shift unpack (i8->i32 asr 4) instead of the f32
        # floor route — fewer VPU f32 ops per streamed byte
        hi = jax.lax.shift_right_arithmetic(
            p.astype(jnp.int32), 4
        ).astype(jnp.bfloat16)
        pf = p.astype(jnp.float32).astype(jnp.bfloat16)
    else:
        pf32 = p.astype(jnp.float32)
        hi = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
    rs_all = jnp.sum(x.astype(jnp.float32).reshape(T, ng, GROUP), axis=2)
    corr = 8.0 * jnp.dot(rs_all, s_lo,
                         preferred_element_type=jnp.float32)
    los = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
    his = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
    if os.environ.get("CVT_QM_CONCAT") == "1":
        # A/B: one [T,128]x[128,2TOH] dot per group instead of two TOH
        # dots — halves MXU issue count at the cost of one VPU concat
        w2 = jnp.concatenate([pf, hi], axis=1)        # [TI, 2*TOH]
        for gi in range(ng):
            sl = slice(gi * GROUP, (gi + 1) * GROUP)
            r = jnp.dot(x[:, sl], w2[sl],
                        preferred_element_type=jnp.float32)
            ppf, phi = r[:, :TOH], r[:, TOH:]
            k = gi % NACC
            los[k] = los[k] + (ppf - 16.0 * phi) * s_lo[gi][None, :]
            his[k] = his[k] + phi * s_hi[gi][None, :]
    else:
        for gi in range(ng):
            sl = slice(gi * GROUP, (gi + 1) * GROUP)
            xb = x[:, sl]
            ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
            phi = jnp.dot(xb, hi[sl], preferred_element_type=jnp.float32)
            k = gi % NACC
            los[k] = los[k] + (ppf - 16.0 * phi) * s_lo[gi][None, :]
            his[k] = his[k] + phi * s_hi[gi][None, :]
    acc_lo = acc[:, :TOH] + sum(los) - corr
    acc_hi = acc[:, TOH:] + sum(his)
    return jnp.concatenate([acc_lo, acc_hi], axis=1)


def _kernel(
    # scalars (SMEM)
    n_gu_ref,        # [1] number of paired gate/up steps (I/TO)
    # VMEM inputs
    x_ref,           # [T, H] bf16
    gu_slo_ref,      # [2*n_gu, H/g, TOH] bf16 (per-tile lo planes)
    gu_shi_ref,      # [2*n_gu, H/g, TOH] bf16 (per-tile hi planes)
    dn_slo_ref,      # [n_dn_tiles*n_chunks, CH/g, TOH] bf16 (per-step)
    dn_shi_ref,      # [n_dn_tiles*n_chunks, CH/g, TOH] bf16
    *rest,
    # (nw_ref [1, H] if has_norm) (res_ref [T, H] if has_res)
    # HBM: gu_q [2*I/TO, H, TO/2] int8, dn_q [H/TO, I, TO/2] int8
    # outputs/scratch: out_ref [T, H], h_ref [T, I] f32,
    #   acc_ref [T, TO] f32, (xn_ref [T, H] bf16 if has_norm),
    #   gbuf/ubuf [2, H, TO/2] int8, dbuf [2, CH, TO/2] int8, 3 dma sems
    TO: int,
    CH: int,
    n_chunks: int,
    T: int,
    has_norm: bool = False,
    has_res: bool = False,
    norm_eps: float = 1e-6,
):
    nw_ref = res_ref = xn_ref = None
    rest = list(rest)
    if has_norm:
        nw_ref = rest.pop(0)
    if has_res:
        res_ref = rest.pop(0)
    gu_q_ref, dn_q_ref, out_ref, h_ref, acc_ref = rest[:5]
    rest = rest[5:]
    if has_norm:
        xn_ref = rest.pop(0)
    gbuf, ubuf, dbuf, gsem, usem, dsem = rest
    i = pl.program_id(0)
    n_gu = n_gu_ref[0]
    n_total = pl.num_programs(0)
    TOH = TO // 2
    H = x_ref.shape[1]
    I = h_ref.shape[1]

    def gu_dma(slot, step):
        g = pltpu.make_async_copy(
            gu_q_ref.at[step], gbuf.at[slot], gsem.at[slot]
        )
        u = pltpu.make_async_copy(
            gu_q_ref.at[step + n_gu], ubuf.at[slot], usem.at[slot]
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

    def start(step):
        slot = step % 2

        @pl.when(step < n_gu)
        def _g():
            g, u = gu_dma(slot, step)
            g.start()
            u.start()

        @pl.when(step >= n_gu)
        def _d():
            dn_dma(slot, step - n_gu).start()

    # prologue + distance-1 prefetch: with 2 buffers, step i may only
    # refill slot (i+1)%2 — the one its compute is NOT reading
    @pl.when(i == 0)
    def _warm():
        start(0)

    if has_norm:
        # fused RMSNorm prologue (once, overlapped with the first DMA):
        # removes the XLA post-attention-norm fusion before the MLP
        @pl.when(i == 0)
        def _normalize():
            xf = x_ref[...].astype(jnp.float32)
            rr = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=1, keepdims=True) + norm_eps
            )
            xn_ref[...] = (
                xf * rr * nw_ref[...].astype(jnp.float32)
            ).astype(xn_ref.dtype)

    @pl.when(i + 1 < n_total)
    def _prefetch():
        start(i + 1)

    slot = i % 2

    @pl.when(i < n_gu)
    def _gate_up():
        g, u = gu_dma(slot, i)
        g.wait()
        u.wait()
        x = xn_ref[...] if has_norm else x_ref[...]
        zero = jnp.zeros((T, TO), jnp.float32)
        gate = _w4_tile_matmul(
            x, gbuf[slot], gu_slo_ref[i].astype(jnp.float32),
            gu_shi_ref[i].astype(jnp.float32), zero)
        up = _w4_tile_matmul(
            x, ubuf[slot], gu_slo_ref[i + n_gu].astype(jnp.float32),
            gu_shi_ref[i + n_gu].astype(jnp.float32), zero)
        h = jax.nn.silu(gate) * up
        h_ref[:, pl.ds(i * TO, TO)] = h

    @pl.when(i >= n_gu)
    def _down():
        j = i - n_gu
        tile = j // n_chunks
        chunk = j % n_chunks

        @pl.when(chunk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dn_dma(slot, j).wait()
        xh = h_ref[:, pl.ds(chunk * CH, CH)].astype(jnp.bfloat16)
        # dn_s ships one [CH/g, TO] plane per down grid step so this is a
        # single leading dynamic index (Mosaic lowers it as a VMEM slice)
        acc_ref[...] = _w4_tile_matmul(
            xh, dbuf[slot], dn_slo_ref[j].astype(jnp.float32),
            dn_shi_ref[j].astype(jnp.float32), acc_ref[...])

        @pl.when(chunk == n_chunks - 1)
        def _flush():
            r = acc_ref[...]
            if res_ref is not None:
                # fused residual epilogue (x + mlp_out per column tile)
                r = r + res_ref[:, pl.ds(tile * TO, TO)].astype(jnp.float32)
            out_ref[:, pl.ds(tile * TO, TO)] = r.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "norm_eps"))
def fused_mlp_w4(
    x: jnp.ndarray,       # [T, H] bf16 (T <= 8)
    gu_q: jnp.ndarray,    # [2*I/TO, H, TO/2] int8
    gu_s: jnp.ndarray,    # [H/g, 2I]
    dn_q: jnp.ndarray,    # [H/TO, I, TO/2] int8
    dn_s: jnp.ndarray,    # [I/g, H]
    *,
    interpret: bool | None = None,
    norm_w: jnp.ndarray | None = None,   # [H] fused RMSNorm prologue
    norm_eps: float = 1e-6,
    residual: jnp.ndarray | None = None,  # [T, H] fused epilogue add
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, H = x.shape
    twoI = gu_s.shape[1]
    I = twoI // 2
    n_gu_tiles = gu_q.shape[0]
    TO = twoI // n_gu_tiles
    n_gu = I // TO
    TOH = TO // 2
    n_dn_tiles = dn_q.shape[0]
    assert dn_q.shape[1] == I and n_dn_tiles * TO == H

    # down inner chunk: largest divisor of I that is <= 4096 and a
    # multiple of 8*GROUP (scales sublane alignment)
    CH = I
    for c in range(min(I, 4096), GROUP - 1, -GROUP):
        if I % c == 0 and ((c // GROUP) % 8 == 0 or c == I):
            CH = c
            break
    n_chunks = I // CH
    n_total = n_gu + n_dn_tiles * n_chunks

    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)
    has_norm = norm_w is not None
    has_res = residual is not None

    in_specs = [
        pl.BlockSpec((Tp, H), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gu_s lo
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gu_s hi
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dn_s lo
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dn_s hi
    ]
    extra_inputs = []
    if has_norm:
        in_specs.append(pl.BlockSpec(
            (1, H), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ))
        extra_inputs.append(norm_w.astype(jnp.bfloat16).reshape(1, H))
    if has_res:
        in_specs.append(pl.BlockSpec(
            (Tp, H), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ))
        extra_inputs.append(residual)
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),       # gu_q HBM
        pl.BlockSpec(memory_space=pl.ANY),       # dn_q HBM
    ]
    scratch_shapes = [
        pltpu.VMEM((Tp, I), jnp.float32),
        pltpu.VMEM((Tp, TO), jnp.float32),
    ]
    if has_norm:
        scratch_shapes.append(pltpu.VMEM((Tp, H), jnp.bfloat16))
    scratch_shapes += [
        pltpu.VMEM((2, H, TOH), jnp.int8),
        pltpu.VMEM((2, H, TOH), jnp.int8),
        pltpu.VMEM((2, CH, TOH), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tp, H), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, TO=TO, CH=CH, n_chunks=n_chunks, T=Tp,
                          has_norm=has_norm, has_res=has_res,
                          norm_eps=norm_eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # wide tiles (CVT_TILE_OUT=2048) double-buffer 4MB gate/up
            # blocks past the 17M default scoped-vmem limit
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([n_gu], jnp.int32),
        x,
        # [H/g, 2I] -> 2 x [2*n_gu, H/g, TOH] per-tile lo/hi planes
        *(gu_s.astype(jnp.bfloat16)
          .reshape(gu_s.shape[0], 2 * n_gu, 2, TOH)
          .transpose(2, 1, 0, 3)),
        # [I/g, H] -> 2 x [n_dn_tiles * n_chunks, CH/g, TOH] per-step
        *(dn_s.astype(jnp.bfloat16)
          .reshape(n_chunks, CH // GROUP, n_dn_tiles, 2, TOH)
          .transpose(3, 2, 0, 1, 4)
          .reshape(2, n_dn_tiles * n_chunks, CH // GROUP, TOH)),
        *extra_inputs,
        gu_q,
        dn_q,
    )
    return out[:T]
