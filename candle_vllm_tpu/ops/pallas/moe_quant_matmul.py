"""Grouped W4A16 expert matmul: stream ONLY the selected experts.

The reference runs MoE expert FFNs quantized end-to-end
(``moe_gemm_gguf`` / ``FusedMoeISQ``, moe.rs:483+); our bf16
``lax.ragged_dot`` banks cost 4x the HBM bytes and, on decode, stream
every expert's weights even though at most T*k are routed.  This kernel
is the TPU-native quantized grouped GEMM for the DECODE path:

- rows (token, expert) pairs sorted by expert id sit resident in VMEM
  (R <= 256);
- the grid walks (out_tile, selected_expert); the weight block index_map
  reads the selected expert id from scalar prefetch, so only routed
  experts' W4 tiles are ever DMA'd — each exactly once;
- each step runs the standard fused-dequant group dots
  (quant_matmul.py math) over all R rows and masks rows outside the
  expert's [start, end) range before accumulating.

Prefill (large R) falls back to expert-chunked dequant + masked dots in
``ops/quant.moe_quant_ffn`` — MXU-bound there, so the 4x HBM saving of
W4 banks is what matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def _kernel(
    # scalar prefetch
    ids_ref,        # [NS] selected expert ids (ascending; padded dups)
    start_ref,      # [NS] first row of each selected expert
    end_ref,        # [NS] one-past-last row
    # VMEM
    x_ref,          # [R, IN] bf16 (sorted by expert)
    slo_ref,        # [1, 1, IN/g, TOH] bf16 — lo-nibble column scales
    shi_ref,        # [1, 1, IN/g, TOH] bf16 — hi-nibble column scales
    qw_ref,         # [1, 1, IN, TO/2] int8 — selected expert's weight tile
    out_ref,        # [R, TO]
    acc_ref,        # [R, TO] f32
    *,
    group: int,
):
    # scales arrive as SEPARATE lo/hi half-tile blocks: Mosaic cannot
    # sublane-broadcast a row sliced at a lane offset < 512 (see
    # quant_matmul.py _kernel — same fix)
    e = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(e == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo = start_ref[e]
    hi = end_ref[e]

    @pl.when(lo < hi)
    def _compute():
        p = qw_ref[0, 0]              # [IN, TOH]
        slo32 = slo_ref[0, 0].astype(jnp.float32)
        shi32 = shi_ref[0, 0].astype(jnp.float32)
        x = x_ref[...]
        R = x.shape[0]
        IN = x.shape[1]
        ng = IN // group
        TOH = p.shape[1]
        from candle_vllm_tpu.ops.pallas.quant_matmul import _nacc

        NACC = _nacc(ng)
        pf32 = p.astype(jnp.float32)
        hi_n = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
        rs_all = jnp.sum(
            x.astype(jnp.float32).reshape(R, ng, group), axis=2
        )
        corr = 8.0 * jnp.dot(rs_all, slo32,
                             preferred_element_type=jnp.float32)
        los = [jnp.zeros((R, TOH), jnp.float32) for _ in range(NACC)]
        his = [jnp.zeros((R, TOH), jnp.float32) for _ in range(NACC)]
        for gi in range(ng):
            sl = slice(gi * group, (gi + 1) * group)
            xb = x[:, sl]
            ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
            phi = jnp.dot(xb, hi_n[sl], preferred_element_type=jnp.float32)
            kk = gi % NACC
            los[kk] = los[kk] + (ppf - 16.0 * phi) * slo32[gi][None, :]
            his[kk] = his[kk] + phi * shi32[gi][None, :]
        y = jnp.concatenate([sum(los) - corr, sum(his)], axis=1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        mask = (rows >= lo) & (rows < hi)
        acc_ref[...] = acc_ref[...] + jnp.where(mask, y, 0.0)

    @pl.when(e == ns - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def moe_quant_matmul_pallas(
    x_sorted: jnp.ndarray,      # [R, IN] bf16, rows sorted by expert id
    qweight: jnp.ndarray,       # [E, n_tiles, IN, TO/2] int8 per-expert W4
    scales: jnp.ndarray,        # [E, IN/g, OUT]
    group_sizes: jnp.ndarray,   # [E] i32 rows per expert
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, IN = x_sorted.shape
    E, n_tiles, _, TOH = qweight.shape
    OUT = scales.shape[2]
    TO = OUT // n_tiles
    assert TOH * 2 == TO
    group = IN // scales.shape[1]

    # selected experts, ascending (matches the sorted row order); padding
    # entries replicate expert 0 with an empty [0, 0) range
    NS = min(E, R)
    (sel,) = jnp.nonzero(group_sizes > 0, size=NS, fill_value=0)
    sel = sel.astype(jnp.int32)
    csum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )
    start = csum[sel]
    end = csum[sel + 1]
    # padded entries (fill_value 0) may duplicate a REAL expert 0 entry;
    # zero their ranges so they accumulate nothing
    valid = jnp.arange(NS) < jnp.sum(group_sizes > 0)
    start = jnp.where(valid, start, 0)
    end = jnp.where(valid, end, 0)

    Rp = max(8, R)
    if Rp != R:
        x_sorted = jnp.pad(x_sorted, ((0, Rp - R), (0, 0)))
    x_sorted = x_sorted.astype(jnp.bfloat16)

    # per-(expert, tile) scale planes, split into lo/hi nibble halves:
    # [E, IN/g, OUT] -> 2 x [E, n_tiles, IN/g, TOH]
    s_tiles = (
        scales.astype(jnp.bfloat16)
        .reshape(E, IN // group, n_tiles, 2, TOH)
        .transpose(0, 2, 1, 3, 4)
    )
    s_lo = s_tiles[:, :, :, 0]
    s_hi = s_tiles[:, :, :, 1]

    s_spec = pl.BlockSpec((1, 1, IN // group, TOH),
                          lambda t, e, ids, st, en: (ids[e], t, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, NS),
        in_specs=[
            pl.BlockSpec((Rp, IN), lambda t, e, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
            s_spec,
            pl.BlockSpec((1, 1, IN, TOH),
                         lambda t, e, ids, st, en: (ids[e], t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rp, TO), lambda t, e, *_: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Rp, TO), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, OUT), x_sorted.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sel, start, end,
        x_sorted,
        s_lo,
        s_hi,
        qweight,
    )
    return out[:R]
