"""Fused dequant + matmul Pallas kernel (W4A16 / W8A16).

The TPU replacement for the reference's Marlin/GPTQ/AWQ CUDA kernels
(``/root/reference/src/backend/gptq.rs``, attention-rs marlin_4bit_*):
weights stream from HBM in their packed form (half or quarter the bf16
bytes — decode is weight-bandwidth-bound, so packed bytes ARE the
speedup), unpack + scale on the VPU, and feed the MXU tile by tile.

Speed-of-light notes (v5e):
- 4-bit nibbles are stored **biased** (see ops/quant.py pack_int4) so the
  unpack is pure float arithmetic on the uint8 byte value: one convert +
  mul + floor + fma per byte (~2 VPU ops/element) — Mosaic has no int8
  vector shifts, and i32 widening costs 4x register pressure.
- Scales are NOT applied elementwise to the weight tile.  The matmul is
  split per quantization group and the scale applied to the [T, TO]
  partial product (T·TO ops per group instead of G·TO), with the +8 bias
  removed by one small correction matmul against host-precomputed
  per-group activation sums: x @ ((n-8)*s) = Σ_g s_g*(x_g @ n_g) -
  8*(xgs @ s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candle_vllm_tpu.ops.quant import QTILE_OUT


def _kernel(x_ref, qw_ref, s_ref, *rest, w4: bool, group: int,
            has_zoff: bool):
    if has_zoff:
        z_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
        z_ref = None
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qw_ref[...]                       # [TI, TO/2] int8 (w4) | [TI, TO]
    s = s_ref[...]                        # [TI/group, TO] bf16
    x = x_ref[...]
    acc = acc_ref[...]
    if w4:
        # 4 VPU ops/byte: widen, arithmetic shift (signed hi nibble), and
        # two i32->bf16 converts.  The low nibble is NEVER materialized:
        # with pf = byte value = lo + 16*hi, the low partial product is
        # recovered on the tiny [T, TO] tile as plo = x@pf - 16*(x@hi).
        # (v5e has no bf16 vector ALU and no int8 vector shifts.)
        p32 = p.astype(jnp.int32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
        pf = p32.astype(jnp.bfloat16)
        TI, TOH = pf.shape
        acc_lo = acc[:, :TOH]
        acc_hi = acc[:, TOH:]
        for gi in range(TI // group):
            sl = slice(gi * group, (gi + 1) * group)
            xb = x[:, sl]
            ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
            phi = jnp.dot(xb, hi[sl], preferred_element_type=jnp.float32)
            plo = ppf - 16.0 * phi
            rs = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
            s32 = s[gi, :][None, :].astype(jnp.float32)
            acc_lo = acc_lo + (plo - 8.0 * rs) * s32[:, :TOH]
            acc_hi = acc_hi + phi * s32[:, TOH:]
            if z_ref is not None:
                # asymmetric (GPTQ/AWQ): w = (n-8)*s - zoff
                z32 = z_ref[gi, :][None, :].astype(jnp.float32)
                acc_lo = acc_lo - rs * z32[:, :TOH]
                acc_hi = acc_hi - rs * z32[:, TOH:]
        acc_ref[:, :TOH] = acc_lo
        acc_ref[:, TOH:] = acc_hi
    else:
        n = p.astype(jnp.bfloat16)              # signed, no bias
        TI, TO = n.shape
        for gi in range(TI // group):
            xb = x[:, gi * group : (gi + 1) * group]
            partial = jnp.dot(
                xb,
                n[gi * group : (gi + 1) * group, :],
                preferred_element_type=jnp.float32,
            )
            acc = acc + partial * s[gi, :][None, :].astype(jnp.float32)
        acc_ref[...] = acc

    @pl.when(i == ni - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w4", "interpret"))
def quant_matmul_pallas(
    x: jnp.ndarray,        # [T, IN] bf16/f32
    qweight: jnp.ndarray,  # [IN, OUT/2] int8 (w4) | [IN, OUT] int8
    scales: jnp.ndarray,   # [IN/g, OUT]
    zoffs: jnp.ndarray | None = None,  # [IN/g, OUT] (GPTQ/AWQ zero*scale)
    *,
    w4: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, IN = x.shape
    OUT = scales.shape[1]
    group = IN // scales.shape[0]
    TO = QTILE_OUT
    assert OUT % TO == 0, (OUT, TO)
    # deepest input pass that fits VMEM: fewer grid steps pipeline better
    # (measured: TI=4096 445 GB/s vs TI=1024 334 GB/s at 4096x14336 w4)
    ti_cap = 8192 if T <= 16 else (4096 if T <= 64 else 1024)
    TI = group
    for t in range(min(IN, ti_cap), group - 1, -group):
        if IN % t == 0:
            TI = t
            break
    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    out_dtype = x.dtype
    x = x.astype(jnp.bfloat16)

    TOH = TO // 2 if w4 else TO
    grid = (OUT // TO, IN // TI)
    has_zoff = zoffs is not None
    scale_spec = pl.BlockSpec(
        (TI // group, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((Tp, TI), lambda o, i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((TI, TOH), lambda o, i: (i, o), memory_space=pltpu.VMEM),
        scale_spec,
    ]
    inputs = [x, qweight, scales.astype(jnp.bfloat16)]
    if has_zoff:
        in_specs.append(scale_spec)
        inputs.append(zoffs.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_kernel, w4=w4, group=group, has_zoff=has_zoff),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Tp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((Tp, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out[:T]
