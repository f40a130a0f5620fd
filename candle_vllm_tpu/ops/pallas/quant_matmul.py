"""Fused dequant + matmul Pallas kernel (W4A16 / W8A16).

The TPU replacement for the reference's Marlin/GPTQ/AWQ CUDA kernels
(``/root/reference/src/backend/gptq.rs``, attention-rs marlin_4bit_*):
weights stream from HBM in their packed form (half or quarter the bf16
bytes — decode is weight-bandwidth-bound, so packed bytes ARE the
speedup), unpack + scale on the VPU, and feed the MXU tile by tile.

Layout contract with ops/quant.py: 4-bit tiles use per-tile concat-halves
packing (low nibbles = first half of the out-tile's columns), so
unpacking is two int8 shifts and one lane-contiguous concat — no
interleave relayouts on the critical path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candle_vllm_tpu.ops.quant import QTILE_OUT


def _kernel(x_ref, qw_ref, s_ref, out_ref, acc_ref, *, w4: bool, group: int):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qw_ref[...]                       # [TI, TO/2] int8 (w4) | [TI, TO]
    if w4:
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4)
        )
        hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
        q = jnp.concatenate([lo, hi], axis=1)   # [TI, TO]
    else:
        q = p
    TI, TO = q.shape
    s = s_ref[...]                        # [TI/group, TO] bf16
    w = (
        q.astype(jnp.bfloat16).reshape(TI // group, group, TO) * s[:, None, :]
    ).reshape(TI, TO)
    acc_ref[...] += jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(i == ni - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w4", "interpret"))
def quant_matmul_pallas(
    x: jnp.ndarray,        # [T, IN] bf16/f32
    qweight: jnp.ndarray,  # [IN, OUT/2] int8 (w4) | [IN, OUT] int8
    scales: jnp.ndarray,   # [IN/g, OUT]
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
    TI = next(t for t in (1024, 512, 256, 128, group) if IN % t == 0 and t % group == 0) \
        if IN % group == 0 else group
    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    TOH = TO // 2 if w4 else TO
    grid = (OUT // TO, IN // TI)
    out = pl.pallas_call(
        functools.partial(_kernel, w4=w4, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tp, TI), lambda o, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TOH), lambda o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TI // group, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (Tp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((Tp, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qweight, scales.astype(jnp.bfloat16))
    return out[:T]
