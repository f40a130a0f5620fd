"""Round-4 kernel ablations (VERDICT r3 next #2 levers a/c).

Run on the real TPU (one process, no env overrides):

1. scan-over-layers: does `lax.scan` over stacked layer weights beat the
   unrolled per-layer call chain?  Hypothesis to kill: per-XLA-op launch
   overhead dominates.  Counter-hypothesis: scan's per-iteration
   dynamic-slice of the stacked weights is an HBM->HBM copy that DOUBLES
   weight traffic for a memory-bound decode step.
2. int8 MXU dot rate: does a Mosaic s8xs8->s32 `dot_general` beat the
   bf16 dot at the decode shapes?  If not, W4A8 (lever c) is dead on this
   toolchain no matter how the kernel is written.

Timing via traced-loop differencing (axon tunnel rules,
.claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n_lo=2, n_hi=22):
    """Per-iteration seconds of fn's inner loop via loop differencing."""
    f = jax.jit(fn)
    np.asarray(f(*args, jnp.int32(n_lo)))
    t0 = time.time()
    np.asarray(f(*args, jnp.int32(n_lo)))
    d_lo = time.time() - t0
    t0 = time.time()
    np.asarray(f(*args, jnp.int32(n_hi)))
    d_hi = time.time() - t0
    return (d_hi - d_lo) / (n_hi - n_lo)


def bench_scan_vs_unrolled():
    """32-layer MLP chain: unrolled calls vs lax.scan over stacked W4."""
    from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4
    from candle_vllm_tpu.ops.quant import quantize_w4a16

    H, I, L, T = 4096, 14336, 8, 8  # 8 layers is enough to amortize
    rng = np.random.default_rng(0)
    layers = []
    for _ in range(L):
        gu_q, gu_s = quantize_w4a16(
            (rng.standard_normal((H, 2 * I)) * 0.02).astype(np.float32))
        dn_q, dn_s = quantize_w4a16(
            (rng.standard_normal((I, H)) * 0.02).astype(np.float32))
        layers.append((jnp.asarray(gu_q), jnp.asarray(gu_s, jnp.bfloat16),
                       jnp.asarray(dn_q), jnp.asarray(dn_s, jnp.bfloat16)))
    x0 = jnp.asarray(rng.standard_normal((T, H)) * 0.1, jnp.bfloat16)

    def unrolled(layers, x0, n):
        def body(i, x):
            for gu_q, gu_s, dn_q, dn_s in layers:
                x = (x + fused_mlp_w4(x, gu_q, gu_s, dn_q, dn_s)
                     ).astype(jnp.bfloat16) * 0.5
            return x
        return jax.lax.fori_loop(0, n, body, x0)

    stacked = tuple(jnp.stack([l[i] for l in layers]) for i in range(4))

    def scanned(stacked, x0, n):
        def body(i, x):
            def layer(x, w):
                gu_q, gu_s, dn_q, dn_s = w
                return (x + fused_mlp_w4(x, gu_q, gu_s, dn_q, dn_s)
                        ).astype(jnp.bfloat16) * 0.5, None
            x, _ = jax.lax.scan(layer, x, stacked)
            return x
        return jax.lax.fori_loop(0, n, body, x0)

    bytes_per = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                    for l in layers for a in l)
    du = timed(unrolled, layers, x0)
    ds = timed(scanned, stacked, x0)
    print(f"scan-over-layers: unrolled {du*1e3:.2f} ms/chain "
          f"({bytes_per/du/1e9:.0f} GB/s) vs scan {ds*1e3:.2f} ms/chain "
          f"({bytes_per/ds/1e9:.0f} GB/s)", flush=True)


def bench_int8_dot():
    """Raw MXU rate: s8xs8->s32 vs bf16xbf16->f32 at the decode shape."""
    TI, TO, T, REP = 2048, 1024, 8, 32

    def mk(dtype, acc):
        def kern(x_ref, w_ref, o_ref):
            a = jnp.zeros((x_ref.shape[0], TO), acc)
            x = x_ref[...]
            for _ in range(REP):
                # chain: each dot's LHS depends on the previous result so
                # Mosaic cannot CSE the REP identical dots into one
                y = jax.lax.dot_general(
                    x, w_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
                a = a + y
                bump = (y[:, :1] > (1 << 30)).astype(x.dtype)  # always 0
                x = x + jnp.broadcast_to(bump, x.shape)
            o_ref[...] = a.astype(o_ref.dtype)

        @jax.jit
        def run(x, w, n):
            def body(i, o):
                # data dependency on o: XLA must not hoist the call
                bump = (o[:, :1] > 1e30).astype(x.dtype)  # always 0
                xd = x + jnp.broadcast_to(bump, x.shape)
                y = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((T, TO), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024,
                    ),
                )(xd, w)
                return o * 0.5 + y.astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((T, TO), jnp.float32))
        return run

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((T, TI)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((TI, TO)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (T, TI)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (TI, TO)), jnp.int8)

    run_b = mk(jnp.bfloat16, jnp.float32)
    run_i = mk(jnp.int8, jnp.int32)
    # longer loops: per-iteration cost ~REP*dot; tunnel noise ~20%
    db = min(timed(lambda x, w, n: run_b(x, w, n), xb, wb, n_lo=4, n_hi=404)
             for _ in range(3))
    try:
        di = min(timed(lambda x, w, n: run_i(x, w, n), xi, wi,
                       n_lo=4, n_hi=404) for _ in range(3))
        print(f"int8-dot: bf16 {db*1e6:.1f} us/{REP}dots vs s8 "
              f"{di*1e6:.1f} us/{REP}dots (ratio s8/bf16 = {di/db:.2f})",
              flush=True)
    except Exception as e:
        print(f"int8-dot: s8 dot FAILED to compile: {str(e)[:150]}",
              flush=True)
        print(f"int8-dot: bf16 {db*1e6:.1f} us/{REP}dots", flush=True)


if __name__ == "__main__":
    import sys as _sys
    assert jax.default_backend() == "tpu", "run on the real TPU"
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "scan"):
        bench_scan_vs_unrolled()
    if which in ("all", "int8"):
        bench_int8_dot()
    print("abl_r4 done", flush=True)
