"""Fused dequant + matmul Pallas kernel (W4A16 / W8A16).

The TPU replacement for the reference's Marlin/GPTQ/AWQ CUDA kernels
(``/root/reference/src/backend/gptq.rs``, attention-rs marlin_4bit_*):
weights stream from HBM in their packed form (half or quarter the bf16
bytes — decode is weight-bandwidth-bound, so packed bytes ARE the
speedup), unpack + scale on the VPU, and feed the MXU tile by tile.

Speed-of-light notes (v5e, 819 GB/s nominal HBM):
- Weights live TILE-CONTIGUOUS in HBM: ``[OUT/TO, IN, TO/2]`` so each
  grid step's weight block is ONE contiguous DMA (the Marlin-repack
  analogue).  Measured vs the flat ``[IN, OUT/2]`` layout whose blocks
  are 128-byte strided bursts: 916 GB/s vs 451 GB/s at 4096x14336, T=8
  (tools/bench_quant_matmul.py; read-ceiling probe 886 GB/s).
- The nibble unpack is pure f32 VPU math on the int8 byte value b:
  hi = floor(b * 0.0625) == b >> 4 exactly for int8, and the low nibble
  is never materialized — its partial product is recovered on the tiny
  [T, TO] tile as plo = x@b - 16*(x@hi).  The earlier int32
  shift_right_arithmetic unpack capped the kernel at ~500 GB/s; the
  f32 form runs at the HBM read ceiling.  (v5e has no int8 vector
  shifts and no bf16 ALU; i32 widening costs 4x register pressure.)
- Scales are NOT applied elementwise to the weight tile.  The matmul is
  split per quantization group and the scale applied to the [T, TO]
  partial product (T*TO ops per group instead of G*TO), with the +8
  bias of the low nibble removed by the group's activation row-sum:
  x @ ((n-8)*s) = s*(x @ n) - 8*s*sum(x).
- Large T (prefill) is MXU-bound, not weight-bound: the fused kernel
  pays 2 dots per group plus per-T-tile re-unpack, so above
  ``PREFILL_T_THRESHOLD`` we dequantize to bf16 with XLA ops and run a
  single plain dot (XLA fuses the unpack into the dot's LHS stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this many query rows the dequant-to-bf16 + plain-dot path wins
# (the fused kernel's 2x MXU work and per-tile unpack dominate once the
# matmul stops being weight-bandwidth-bound).
PREFILL_T_THRESHOLD = 64


def _nacc(ng: int) -> int:
    """Independent accumulator count for the per-group dot loop.

    The group loop's single running accumulator builds a serial
    VPU-add/MXU-dot dependency chain that caps the weight stream well
    below the HBM ceiling (measured 646 GB/s at ng=32 / 536 at ng=56);
    rotating over k independent accumulators breaks the chain (1093 /
    873 GB/s — tools/abl_r3.py, 2026-08-19).  The sweet spot keeps the
    per-accumulator chain ~7-8 deep."""
    import os

    forced = int(os.environ.get("CVT_QM_NACC", "0"))
    return min(forced or (8 if ng > 32 else 4), ng)


def _kernel(x_ref, qw_ref, s_ref, *rest, w4: bool, group: int,
            has_zoff: bool, TI: int, has_norm: bool = False,
            has_res: bool = False, has_rope: bool = False,
            norm_eps: float = 1e-6):
    # w4 scales (and zoffs) arrive as SEPARATE lo/hi half-tile blocks:
    # Mosaic cannot sublane-broadcast a row sliced at a lane offset
    # < 512 (vector.broadcast "Invalid input layout" for narrow tiles),
    # so each half starts at lane offset 0 instead of slicing [TOH:].
    sh_ref = None
    if w4:
        sh_ref, *rest = rest
    z_lo_ref = z_hi_ref = None
    if has_zoff and w4:
        z_lo_ref, z_hi_ref, *rest = rest
    elif has_zoff:
        _, *rest = rest  # int8+zoff: handled by dequant path
    nw_ref = res_ref = xn_ref = None
    rc_ref = rs_ref = prm_ref = None
    if has_norm:
        nw_ref, *rest = rest
    if has_rope:
        rc_ref, rs_ref, prm_ref, *rest = rest
    if has_res:
        res_ref, *rest = rest
    if has_norm:
        out_ref, acc_ref, xn_ref = rest
    else:
        out_ref, acc_ref = rest
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if has_norm:
        # fused RMSNorm prologue: normalize the resident activations ONCE
        # (first grid step) into a VMEM scratch; every later (o, i) step
        # reads the normalized rows.  Removes the XLA norm fusion (and
        # its ~6-9 us launch + activation round-trip) per projection —
        # the glue between pallas calls measured ~46 us/layer of the
        # decode step (tools/abl_r4c.py).
        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _normalize():
            xf = x_ref[...].astype(jnp.float32)
            rr = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=1, keepdims=True) + norm_eps
            )
            xn_ref[...] = (
                xf * rr * nw_ref[...].astype(jnp.float32)
            ).astype(xn_ref.dtype)

        x_src = xn_ref
    else:
        x_src = x_ref

    p = qw_ref[0]                  # [TI, TO/2] (w4) | [TI, TO] (int8)
    x = x_src[:, pl.ds(i * TI, TI)]   # resident activations, aligned slice
    T = x.shape[0]
    ng = TI // group
    NACC = _nacc(ng)
    s32 = s_ref[...].astype(jnp.float32)   # [TI/g, TOH] (w4) | [TI/g, TO]
    shi32 = sh_ref[...].astype(jnp.float32) if sh_ref is not None else None
    acc = acc_ref[...]
    import os

    if w4 and z_lo_ref is None and os.environ.get("CVT_W4A8") == "1":
        # W4A8 experiment: activations quantize to int8 per ROW and the
        # group dots run s8xs8->s32 on the MXU at 2x the bf16 pass rate —
        # the packed byte's SIGNED value is exactly lo_biased + 16*hi, so
        # the byte itself is the int8 operand (no unpack for the first
        # dot).  Row scale folds into the f32 partial scaling.
        TOH = p.shape[1]
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12
        xq = jnp.round(xf / sx).astype(jnp.int8)
        hi8 = jnp.floor(p.astype(jnp.float32) * 0.0625).astype(jnp.int8)
        rs_all = jnp.sum(
            xq.astype(jnp.float32).reshape(T, ng, group), axis=2
        )
        corr = 8.0 * jnp.dot(rs_all, s32,
                             preferred_element_type=jnp.float32)
        los = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        his = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        for gi in range(ng):
            sl = slice(gi * group, (gi + 1) * group)
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
            los[kk] = los[kk] + (ppf - 16.0 * phi) * s32[gi][None, :]
            his[kk] = his[kk] + phi * shi32[gi][None, :]
        acc_ref[:, :TOH] = acc[:, :TOH] + (sum(los) - corr) * sx
        acc_ref[:, TOH:] = acc[:, TOH:] + sum(his) * sx

        @pl.when(i == ni - 1)
        def _flush_a8():
            r = acc_ref[...]
            if res_ref is not None:
                r = r + res_ref[...].astype(jnp.float32)
            out_ref[...] = r.astype(out_ref.dtype)

        return
    if w4:
        # f32 unpack: hi = floor(b/16) == b >> 4 exactly for int8.
        # (int32-shift and direct int8->bf16 variants measured identical
        # throughput — the kernel is not VPU-unpack-bound.)
        if os.environ.get("CVT_HI_SHIFT") == "1":
            hi = jax.lax.shift_right_arithmetic(
                p.astype(jnp.int32), 4
            ).astype(jnp.bfloat16)
            pf = p.astype(jnp.float32).astype(jnp.bfloat16)
        else:
            pf32 = p.astype(jnp.float32)
            hi = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
            pf = pf32.astype(jnp.bfloat16)
        TOH = pf.shape[1]
        # group row-sums vectorized once; the -8*rs*s bias correction
        # (and the zoff term) collapse into one tiny [T, ng] @ [ng, TO]
        # dot instead of ng serial FMAs
        rs_all = jnp.sum(x.astype(jnp.float32).reshape(T, ng, group), axis=2)
        corr = 8.0 * jnp.dot(rs_all, s32,
                             preferred_element_type=jnp.float32)
        los = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        his = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        if os.environ.get("CVT_QM_CONCAT") == "1":
            w2 = jnp.concatenate([pf, hi], axis=1)    # [TI, 2*TOH]
            for gi in range(ng):
                sl = slice(gi * group, (gi + 1) * group)
                r = jnp.dot(x[:, sl], w2[sl],
                            preferred_element_type=jnp.float32)
                ppf, phi = r[:, :TOH], r[:, TOH:]
                k = gi % NACC
                los[k] = los[k] + (ppf - 16.0 * phi) * s32[gi][None, :]
                his[k] = his[k] + phi * shi32[gi][None, :]
        else:
            for gi in range(ng):
                sl = slice(gi * group, (gi + 1) * group)
                xb = x[:, sl]
                ppf = jnp.dot(xb, pf[sl],
                              preferred_element_type=jnp.float32)
                phi = jnp.dot(xb, hi[sl],
                              preferred_element_type=jnp.float32)
                k = gi % NACC
                los[k] = los[k] + (ppf - 16.0 * phi) * s32[gi][None, :]
                his[k] = his[k] + phi * shi32[gi][None, :]
        tot_lo = sum(los) - corr
        tot_hi = sum(his)
        if z_lo_ref is not None:
            # asymmetric (GPTQ/AWQ): w = (n-8)*s - zoff; the -rs*z term is
            # again a single small matmul over the group dim
            tot_lo = tot_lo - jnp.dot(
                rs_all, z_lo_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)
            tot_hi = tot_hi - jnp.dot(
                rs_all, z_hi_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        acc_ref[:, :TOH] = acc[:, :TOH] + tot_lo
        acc_ref[:, TOH:] = acc[:, TOH:] + tot_hi
    else:
        n = p.astype(jnp.float32).astype(jnp.bfloat16)   # signed, no bias
        TO = n.shape[1]
        accs = [jnp.zeros((T, TO), jnp.float32) for _ in range(NACC)]
        for gi in range(ng):
            sl = slice(gi * group, (gi + 1) * group)
            partial = jnp.dot(x[:, sl], n[sl],
                              preferred_element_type=jnp.float32)
            k = gi % NACC
            accs[k] = accs[k] + partial * s32[gi][None, :]
        acc_ref[...] = acc + sum(accs)

    @pl.when(i == ni - 1)
    def _flush():
        # fused epilogues: rope rotation (qkv projections — removes the
        # per-layer XLA apply_rope fusions, measured 23 us/layer of the
        # decode step, tools/abl_r4c.py) and the residual add, landing
        # here instead of in separate XLA fusions after the kernel
        r = acc_ref[...]
        if rc_ref is not None:
            # rotate-half as one tiny MXU dot with the block-diagonal
            # swap matrix P (prm_ref): rope(y) = y*c + (y@P)*s, where
            # c=1 / s=0 columns (v rows, past-rotary dims) pass through
            sw = jax.lax.dot_general(
                r, prm_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            r = (r * rc_ref[...].astype(jnp.float32)
                 + sw * rs_ref[...].astype(jnp.float32))
        if res_ref is not None:
            r = r + res_ref[...].astype(jnp.float32)
        out_ref[...] = r.astype(out_ref.dtype)


def _prefill_kernel(x_ref, qw_ref, s_ref, *rest, w4: bool, group: int):
    """Prefill (large T): dequantize each weight tile ONCE into a VMEM
    bf16 scratch (at the first T step of its column tile), then run a
    single [TT, IN] x [IN, TO] dot per T tile.  The MXU sees full-size
    dots and the VPU dequant amortizes over T/TT steps — measured 5-16%
    MFU for the XLA dequant+dot path (it materializes the dequantized
    weights in HBM) vs MXU-bound here."""
    if len(rest) == 3:
        z_ref, out_ref, w_ref = rest
    else:
        out_ref, w_ref = rest
        z_ref = None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _dequant():
        IN = qw_ref.shape[1]
        # chunked so the f32 temporaries stay bounded (a full-depth
        # dequant of a [14336, 1024] tile needs ~150MB of f32 scratch)
        CH = min(IN, 2048)
        for c in range(IN // CH):
            rows = pl.ds(c * CH, CH)
            p = qw_ref[0, rows]             # [CH, TOH] | [CH, TO]
            s = s_ref[c * CH // group : (c + 1) * CH // group].astype(
                jnp.float32
            )
            G = CH // group
            pf32 = p.astype(jnp.float32)
            if w4:
                hi = jnp.floor(pf32 * 0.0625)
                lo = pf32 - 16.0 * hi - 8.0
                w = jnp.concatenate([lo, hi], axis=1)   # [CH, TO]
            else:
                w = pf32
            TO = w.shape[1]
            sf = jnp.broadcast_to(
                s[:, None, :], (G, group, TO)
            ).reshape(CH, TO)
            w = w * sf
            if z_ref is not None:
                z = z_ref[
                    c * CH // group : (c + 1) * CH // group
                ].astype(jnp.float32)
                w = w - jnp.broadcast_to(
                    z[:, None, :], (G, group, TO)
                ).reshape(CH, TO)
            w_ref[rows] = w.astype(jnp.bfloat16)

    out_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _quant_matmul_prefill(x, qweight, scales, zoffs, *, w4, interpret):
    """Large-T dispatch: grid (out_tile, t_tile), weight tiles resident."""
    T, IN = x.shape
    OUT = scales.shape[1]
    n_tiles = qweight.shape[0]
    TO = OUT // n_tiles
    TOH = TO // 2 if w4 else TO
    group = IN // scales.shape[0]
    # Wide tiles at deep IN (TO=2048, IN=14336) overflow scoped VMEM: the
    # bf16 dequant scratch is [IN, TO] and the qweight blocks double-buffer
    # on top.  Split the contraction in half and add — tile-contiguous
    # packing slices cleanly on the IN axis, groups stay intact, and
    # prefill is MXU-bound so the second x pass is free.
    if IN * TO * 2 > 32 * 1024 * 1024 and scales.shape[0] % 2 == 0:
        h = IN // 2
        gr = scales.shape[0] // 2
        a = _quant_matmul_prefill(
            x[:, :h].astype(jnp.float32), qweight[:, :h], scales[:gr],
            zoffs[:gr] if zoffs is not None else None,
            w4=w4, interpret=interpret)
        b = _quant_matmul_prefill(
            x[:, h:].astype(jnp.float32), qweight[:, h:], scales[gr:],
            zoffs[gr:] if zoffs is not None else None,
            w4=w4, interpret=interpret)
        return (a + b).astype(x.dtype)
    # TT sized against the VMEM budget: the bf16 dequant scratch [IN, TO]
    # plus double-buffered qweight blocks are fixed costs; the x/out
    # blocks scale with TT (wide tiles — TO=2048 at IN=14336 — otherwise
    # OOM the 128M scoped vmem: 58.7M scratch + 29.4M qweight buffers)
    fixed = IN * TO * 2 + 2 * IN * TOH
    budget = 104 * 1024 * 1024
    TT = 256 if IN > 8192 else 512
    while TT > 128 and fixed + 2 * TT * (IN + TO) * 2 > budget:
        TT //= 2
    Tp = pl.cdiv(T, TT) * TT
    out_dtype = x.dtype
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)
    grid = (n_tiles, Tp // TT)
    scale_spec = pl.BlockSpec(
        (IN // group, TO), lambda o, t: (0, o), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((TT, IN), lambda o, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, IN, TOH), lambda o, t: (o, 0, 0),
                     memory_space=pltpu.VMEM),
        scale_spec,
    ]
    inputs = [x, qweight, scales.astype(jnp.bfloat16)]
    if zoffs is not None:
        in_specs.append(scale_spec)
        inputs.append(zoffs.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_prefill_kernel, w4=w4, group=group),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TT, TO), lambda o, t: (t, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((IN, TO), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:T]


def dequant_w4_jnp(qweight: jnp.ndarray, scales: jnp.ndarray,
                   zoffs: jnp.ndarray | None = None) -> jnp.ndarray:
    """Tiled-packed w4 -> [IN, OUT] f32 via XLA ops (oracle + prefill)."""
    n_tiles, n_in, half = qweight.shape
    pu = jax.lax.bitcast_convert_type(qweight, jnp.uint8)
    p32 = qweight.astype(jnp.int32)
    lo = (pu & 0xF).astype(jnp.int32) - 8
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    # [tiles, in, 2, half] -> [in, tiles, 2*half]
    q = jnp.stack([lo, hi], axis=2).transpose(1, 0, 2, 3).reshape(
        n_in, n_tiles * 2 * half
    )
    g = n_in // scales.shape[0]
    w = q.astype(jnp.float32).reshape(n_in // g, g, -1)
    w = w * scales.astype(jnp.float32)[:, None, :]
    w = w.reshape(n_in, -1)
    if zoffs is not None:
        w = w - jnp.repeat(zoffs.astype(jnp.float32), g, axis=0)
    return w


def dequant_int8_jnp(qweight: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Tiled int8 [tiles, IN, TO] -> [IN, OUT] f32 via XLA ops."""
    n_tiles, n_in, TO = qweight.shape
    q = qweight.transpose(1, 0, 2).reshape(n_in, n_tiles * TO)
    g = n_in // scales.shape[0]
    w = q.astype(jnp.float32).reshape(n_in // g, g, -1)
    w = w * scales.astype(jnp.float32)[:, None, :]
    return w.reshape(n_in, -1)


@functools.lru_cache(maxsize=8)
def _rope_swap_matrix_np(TO: int):
    """Block-diagonal rotate-half swap: one 128-wide swap block per head
    column group (head_dim == rotary_dim == 128 gate at the caller)."""
    import numpy as np

    P = np.zeros((TO, TO), np.float32)
    for b in range(0, TO, 128):
        for j in range(64):
            P[b + 64 + j, b + j] = 1.0
            P[b + j, b + 64 + j] = 1.0
    return P


def _rope_full_jnp(out, c_full, s_full):
    """XLA twin of the kernel rope epilogue (prefill / fallback)."""
    T, OUT = out.shape
    z = out.astype(jnp.float32).reshape(T, OUT // 128, 128)
    sw = jnp.concatenate([z[..., 64:], z[..., :64]], axis=-1)
    r = (z * c_full.astype(jnp.float32).reshape(T, OUT // 128, 128)
         + sw * s_full.astype(jnp.float32).reshape(T, OUT // 128, 128))
    return r.reshape(T, OUT).astype(out.dtype)


@functools.partial(
    jax.jit, static_argnames=("w4", "interpret", "norm_eps")
)
def quant_matmul_pallas(
    x: jnp.ndarray,        # [T, IN] bf16/f32
    qweight: jnp.ndarray,  # [OUT/TO, IN, TO/2] int8 (w4) | [OUT/TO, IN, TO]
    scales: jnp.ndarray,   # [IN/g, OUT]
    zoffs: jnp.ndarray | None = None,  # [IN/g, OUT] (GPTQ/AWQ zero*scale)
    *,
    w4: bool = True,
    interpret: bool | None = None,
    norm_w: jnp.ndarray | None = None,   # [IN] fused RMSNorm prologue
    norm_eps: float = 1e-6,
    residual: jnp.ndarray | None = None,  # [T, OUT] fused epilogue add
    rope_cs: tuple | None = None,  # (c_full, s_full) [T, OUT] epilogue rope
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, IN = x.shape
    OUT = scales.shape[1]
    n_tiles = qweight.shape[0]
    TO = OUT // n_tiles
    group = IN // scales.shape[0]

    if T > PREFILL_T_THRESHOLD:
        # prefill: MXU-bound — the per-launch glue the decode fusion
        # removes is amortized over T here, so norm/residual stay XLA ops
        if norm_w is not None:
            from candle_vllm_tpu.ops.norms import rms_norm

            x = rms_norm(x, norm_w, norm_eps)
        out = _quant_matmul_prefill(
            x, qweight, scales, zoffs, w4=w4, interpret=interpret
        )
        if rope_cs is not None:
            out = _rope_full_jnp(out, rope_cs[0], rope_cs[1])
        if residual is not None:
            out = (out.astype(jnp.float32)
                   + residual.astype(jnp.float32)).astype(out.dtype)
        return out

    # deepest contiguous input pass that fits VMEM; fewer grid steps
    # pipeline better (measured 916 GB/s at TI=4096, TO=512).  The scales
    # block is [TI/group, TO]: Mosaic needs its sublane dim divisible by 8
    # unless it spans the whole array, hence TI % (8*group) == 0 or TI == IN.
    import os

    ti_cap = int(os.environ.get("CVT_TI_CAP", "7168"))
    TI = IN  # single input pass (scales block spans the whole array)
    for t in range(min(IN, ti_cap), group - 1, -group):
        if IN % t == 0 and ((t // group) % 8 == 0 or t == IN):
            TI = t
            break
    import os as _os

    rope_post = res_post = None
    if rope_cs is not None and (
        TO % 128
        or (w4 and zoffs is None and _os.environ.get("CVT_W4A8") == "1")
    ):
        # shapes/paths the kernel epilogue can't rotate: rope (and the
        # residual, which must follow it) move after the kernel
        rope_post, rope_cs = rope_cs, None
        res_post, residual = residual, None

    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, Tp - T), (0, 0)))
        if rope_cs is not None:
            rope_cs = tuple(
                jnp.pad(r, ((0, Tp - T), (0, 0))) for r in rope_cs
            )
    out_dtype = x.dtype
    x = x.astype(jnp.bfloat16)

    TOH = TO // 2 if w4 else TO
    grid = (n_tiles, IN // TI)
    has_zoff = zoffs is not None
    has_norm = norm_w is not None
    has_res = residual is not None
    has_rope = rope_cs is not None
    scale_spec = pl.BlockSpec(
        (TI // group, TOH), lambda o, i: (i, o), memory_space=pltpu.VMEM
    )

    def split_lohi(s):
        # per-tile [lo(TOH) | hi(TOH)] columns -> two [IN/g, n_tiles*TOH]
        # arrays, so the kernel's scale-row broadcasts start at lane
        # offset 0 (Mosaic rejects offset-TOH broadcasts for TOH < 512)
        r = s.reshape(s.shape[0], n_tiles, 2, TOH)
        return (r[:, :, 0].reshape(s.shape[0], -1),
                r[:, :, 1].reshape(s.shape[0], -1))

    in_specs = [
        pl.BlockSpec((Tp, IN), lambda o, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TI, TOH), lambda o, i: (o, i, 0),
                     memory_space=pltpu.VMEM),
        scale_spec,
    ]
    sb = scales.astype(jnp.bfloat16)
    if w4:
        s_lo, s_hi = split_lohi(sb)
        inputs = [x, qweight, s_lo, s_hi]
        in_specs.append(scale_spec)
    else:
        inputs = [x, qweight, sb]
        in_specs[2] = pl.BlockSpec(
            (TI // group, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM
        )
    if has_zoff:
        if w4:
            z_lo, z_hi = split_lohi(zoffs.astype(jnp.bfloat16))
            inputs += [z_lo, z_hi]
            in_specs += [scale_spec, scale_spec]
        else:
            inputs.append(zoffs.astype(jnp.bfloat16))
            in_specs.append(in_specs[2])
    if has_norm:
        inputs.append(norm_w.astype(jnp.bfloat16).reshape(1, IN))
        in_specs.append(pl.BlockSpec(
            (1, IN), lambda o, i: (0, 0), memory_space=pltpu.VMEM
        ))
    if has_rope:
        out_block = pl.BlockSpec(
            (Tp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM
        )
        inputs += [
            rope_cs[0].astype(jnp.float32),
            rope_cs[1].astype(jnp.float32),
            jnp.asarray(_rope_swap_matrix_np(TO)),
        ]
        in_specs += [out_block, out_block, pl.BlockSpec(
            (TO, TO), lambda o, i: (0, 0), memory_space=pltpu.VMEM
        )]
    if has_res:
        inputs.append(residual)
        in_specs.append(pl.BlockSpec(
            (Tp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM
        ))
    scratch_shapes = [pltpu.VMEM((Tp, TO), jnp.float32)]
    if has_norm:
        scratch_shapes.append(pltpu.VMEM((Tp, IN), jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_kernel, w4=w4, group=group, has_zoff=has_zoff,
                          TI=TI, has_norm=has_norm, has_res=has_res,
                          has_rope=has_rope, norm_eps=norm_eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Tp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # wide tiles (CVT_TILE_OUT=2048: 8MB qweight blocks, double
            # buffered) exceed the 17M default scoped-vmem limit
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    out = out[:T]
    if rope_post is not None:
        out = _rope_full_jnp(out, rope_post[0][:T], rope_post[1][:T])
        if res_post is not None:
            out = (out.astype(jnp.float32)
                   + res_post[:T].astype(jnp.float32)).astype(out.dtype)
    return out
