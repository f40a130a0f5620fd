"""Micro-bench for the fused W4A16 kernel: isolates HBM bandwidth of the
weight stream (the decode bottleneck; VERDICT r1 weak #1).

Timing per verify-skill rules: traced-bound fori_loop with a data
dependency between iterations, host fetch, difference two loop lengths.

Run ON TPU (single process):  python tools/bench_quant_matmul.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# experimental tiled-contiguous kernel
# ---------------------------------------------------------------------------


def _tiled_kernel(x_ref, qw_ref, s_ref, out_ref, acc_ref, *, group, TI, TO,
                  unpack: str):
    o = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qw_ref[0]                 # [TI, TOH] int8 (tile-contiguous in HBM)
    s = s_ref[...]                # [TI/group, TO]
    x = x_ref[:, pl.ds(i * TI, TI)]   # full-resident x, 128-aligned slice
    acc = acc_ref[...]
    TOH = TO // 2

    if unpack == "i32":
        p32 = p.astype(jnp.int32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.bfloat16)
        pf = p32.astype(jnp.bfloat16)
    elif unpack == "f32":
        pf32 = p.astype(jnp.float32)
        hi32 = jnp.floor(pf32 * 0.0625)
        hi = hi32.astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
    elif unpack == "read":   # read-ceiling probe: no unpack, 1 dummy dot
        pf = p[:, :TOH].astype(jnp.bfloat16)
        hi = None
    else:
        raise ValueError(unpack)

    acc_lo = acc[:, :TOH]
    acc_hi = acc[:, TOH:]
    for gi in range(TI // group):
        sl = slice(gi * group, (gi + 1) * group)
        xb = x[:, sl]
        if unpack == "read":
            acc_lo = acc_lo + jnp.dot(xb, pf[sl],
                                      preferred_element_type=jnp.float32)
            continue
        ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
        phi = jnp.dot(xb, hi[sl], preferred_element_type=jnp.float32)
        plo = ppf - 16.0 * phi
        rs = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
        s32 = s[gi, :][None, :].astype(jnp.float32)
        acc_lo = acc_lo + (plo - 8.0 * rs) * s32[:, :TOH]
        acc_hi = acc_hi + phi * s32[:, TOH:]
    acc_ref[:, :TOH] = acc_lo
    if unpack != "read":
        acc_ref[:, TOH:] = acc_hi

    @pl.when(i == ni - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TI", "TO", "group", "unpack"))
def tiled_quant_matmul(x, qw3, scales, *, TI, TO, group, unpack):
    T, IN = x.shape
    n_tiles = qw3.shape[0]
    OUT = n_tiles * TO
    TOH = TO // 2
    Tp = max(8, T)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)
    grid = (n_tiles, IN // TI)
    out = pl.pallas_call(
        functools.partial(_tiled_kernel, group=group, TI=TI, TO=TO,
                          unpack=unpack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tp, IN), lambda o, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, TOH), lambda o, i: (o, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI // group, TO), lambda o, i: (i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tp, TO), lambda o, i: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Tp, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x, qw3, scales.astype(jnp.bfloat16))
    return out[:T]


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------


def time_fn(fn, x0, n_lo=4, n_hi=260):
    """Returns seconds per call, via traced-bound loop differencing."""

    @jax.jit
    def loop(x, n):
        def body(k, x):
            out = fn(x)
            # data dependency, not constant-foldable
            return x * (1.0 + out[0, 0].astype(jnp.float32) * 1e-24).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    r = loop(x0, jnp.int32(n_lo))
    np.asarray(r)  # warm compile + settle
    t0 = time.time()
    np.asarray(loop(x0, jnp.int32(n_lo)))
    d_lo = time.time() - t0
    t0 = time.time()
    np.asarray(loop(x0, jnp.int32(n_hi)))
    d_hi = time.time() - t0
    return (d_hi - d_lo) / (n_hi - n_lo)


def main():
    from candle_vllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
    from candle_vllm_tpu.ops.quant import pack_int4

    print("backend:", jax.default_backend(), flush=True)
    T = 8
    IN, OUT = 4096, 14336
    group = 128
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(IN, OUT)).astype(np.int8)
    scales = rng.uniform(0.01, 0.02, size=(IN // group, OUT)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(T, IN)), jnp.bfloat16)

    bytes_w = IN * OUT // 2

    results = {}

    # baseline: current flat kernel
    packed = jnp.asarray(pack_int4(q))          # [IN, OUT/2], tile 256
    s_j = jnp.asarray(scales)

    def base(x):
        return quant_matmul_pallas(x, packed, s_j, w4=True)

    dt = time_fn(base, x0)
    results["current_flat_TO256"] = bytes_w / dt / 1e9
    print(f"current flat kernel: {bytes_w/dt/1e9:.1f} GB/s", flush=True)

    for TO, TI, unpack in [
        (256, 8192, "i32"),
        (512, 4096, "i32"),
        (512, 8192, "i32"),
        (1024, 2048, "i32"),
        (512, 4096, "f32"),
        (512, 4096, "read"),
    ]:
        if IN % TI:
            continue
        TOH = TO // 2
        pk = pack_int4(q, tile_out=TO)          # [IN, OUT/2] with TO tiling
        # tile-contiguous: [OUT/TO, IN, TOH]
        qw3 = np.ascontiguousarray(
            pk.reshape(IN, OUT // TO, TOH).transpose(1, 0, 2)
        )
        qw3j = jnp.asarray(qw3)

        def f(x, qw3j=qw3j, TI=TI, TO=TO, unpack=unpack):
            return tiled_quant_matmul(x, qw3j, s_j, TI=TI, TO=TO,
                                      group=group, unpack=unpack)

        try:
            dt = time_fn(f, x0)
        except Exception as e:  # noqa
            print(f"tiled TO={TO} TI={TI} {unpack}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        gbs = bytes_w / dt / 1e9
        results[f"tiled_TO{TO}_TI{TI}_{unpack}"] = gbs
        print(f"tiled TO={TO} TI={TI} unpack={unpack}: {gbs:.1f} GB/s",
              flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
