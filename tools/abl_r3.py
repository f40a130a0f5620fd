"""Round-3 kernel ablations on the real TPU chip.

Diagnoses the W4A16 decode-matmul shortfall (measured ~550-650 GB/s of
the 886 GB/s read ceiling in the full step; docs/PERF.md) and A/Bs the
queued attention kernels (CVT_ATTN_V2 branch-free DMA, CVT_DECODE_V3
decode-specialized kernel).

Usage (ON TPU, one process, nohup + poll the log):
    python tools/abl_r3.py qm      # quant-matmul variants
    python tools/abl_r3.py attn    # attention variants
    python tools/abl_r3.py mlp     # fused vs unfused decode MLP

Timing per verify-skill rules: traced-bound fori_loop with a data
dependency between iterations, host fetch, difference two loop lengths.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_fn(fn, x0, n_lo=8, n_hi=264):
    """Seconds per call via traced-bound loop differencing."""

    @jax.jit
    def loop(x, n):
        def body(k, x):
            out = fn(x)
            return x * (1.0 + out[0, 0].astype(jnp.float32) * 1e-24).astype(
                x.dtype
            )

        return jax.lax.fori_loop(0, n, body, x)

    np.asarray(loop(x0, jnp.int32(n_lo)))  # compile + settle
    t0 = time.time()
    np.asarray(loop(x0, jnp.int32(n_lo)))
    d_lo = time.time() - t0
    t0 = time.time()
    np.asarray(loop(x0, jnp.int32(n_hi)))
    d_hi = time.time() - t0
    return (d_hi - d_lo) / (n_hi - n_lo)


# ---------------------------------------------------------------------------
# quant-matmul variants (decode T=8, tile-contiguous [OUT/TO, IN, TO/2])
# ---------------------------------------------------------------------------


def _variant_kernel(x_ref, qw_ref, s_ref, out_ref, acc_ref, *, group, TI,
                    variant: str):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qw_ref[0]                     # [TI, TOH]
    x = x_ref[:, pl.ds(i * TI, TI)]   # [T, TI]
    T = x.shape[0]
    TOH = p.shape[1]
    ng = TI // group
    s32 = s_ref[...].astype(jnp.float32)   # [ng, TO]
    acc = acc_ref[...]
    acc_lo = acc[:, :TOH]
    acc_hi = acc[:, TOH:]

    if variant == "read":
        # ceiling probe: one dot per tile, no unpack/scale
        pf = p.astype(jnp.bfloat16)
        acc_lo = acc_lo + jnp.dot(x, pf, preferred_element_type=jnp.float32)

    elif variant == "dot2_big":
        # 2 full-depth dots, NO per-group scaling (diagnostic: cost of the
        # 2nd dot + unpack alone, without the group machinery)
        pf32 = p.astype(jnp.float32)
        hi = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
        acc_lo = acc_lo + jnp.dot(x, pf, preferred_element_type=jnp.float32)
        acc_hi = acc_hi + jnp.dot(x, hi, preferred_element_type=jnp.float32)

    elif variant == "base":
        # current production structure: per-group dots + serial acc chain
        pf32 = p.astype(jnp.float32)
        hi = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
        for gi in range(ng):
            sl = slice(gi * group, (gi + 1) * group)
            xb = x[:, sl]
            ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
            phi = jnp.dot(xb, hi[sl], preferred_element_type=jnp.float32)
            plo = ppf - 16.0 * phi
            rs = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
            sg = s32[gi][None, :]
            acc_lo = acc_lo + (plo - 8.0 * rs) * sg[:, :TOH]
            acc_hi = acc_hi + phi * sg[:, TOH:]

    elif variant.startswith("kway"):
        # k independent accumulators break the serial VPU-add chain;
        # row-sums vectorized once; -8*rs*s collapsed into rs @ s_lo
        NACC = int(variant[4:])
        pf32 = p.astype(jnp.float32)
        hi = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16)
        pf = pf32.astype(jnp.bfloat16)
        rs_all = jnp.sum(
            x.astype(jnp.float32).reshape(T, ng, group), axis=2
        )                                       # [T, ng]
        corr = jnp.dot(rs_all, s32[:, :TOH],
                       preferred_element_type=jnp.float32)
        los = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        his = [jnp.zeros((T, TOH), jnp.float32) for _ in range(NACC)]
        for gi in range(ng):
            sl = slice(gi * group, (gi + 1) * group)
            xb = x[:, sl]
            ppf = jnp.dot(xb, pf[sl], preferred_element_type=jnp.float32)
            phi = jnp.dot(xb, hi[sl], preferred_element_type=jnp.float32)
            sg = s32[gi][None, :]
            k = gi % NACC
            los[k] = los[k] + (ppf - 16.0 * phi) * sg[:, :TOH]
            his[k] = his[k] + phi * sg[:, TOH:]
        acc_lo = acc_lo + sum(los) - 8.0 * corr
        acc_hi = acc_hi + sum(his)

    elif variant == "fold3":
        # fold scales into the weight tile (bf16), 3 full-depth dots
        pf32 = p.astype(jnp.float32)
        hi = jnp.floor(pf32 * 0.0625)
        slo_b = jnp.broadcast_to(
            s32[:, None, :TOH], (ng, group, TOH)
        ).reshape(TI, TOH)
        shi_b = jnp.broadcast_to(
            s32[:, None, TOH:], (ng, group, TOH)
        ).reshape(TI, TOH)
        w_lo = (pf32 * slo_b).astype(jnp.bfloat16)
        w_hl = (hi * slo_b).astype(jnp.bfloat16)
        w_hi = (hi * shi_b).astype(jnp.bfloat16)
        rs_all = jnp.sum(
            x.astype(jnp.float32).reshape(T, ng, group), axis=2
        )
        corr = jnp.dot(rs_all, s32[:, :TOH],
                       preferred_element_type=jnp.float32)
        d1 = jnp.dot(x, w_lo, preferred_element_type=jnp.float32)
        d2 = jnp.dot(x, w_hl, preferred_element_type=jnp.float32)
        d3 = jnp.dot(x, w_hi, preferred_element_type=jnp.float32)
        acc_lo = acc_lo + d1 - 16.0 * d2 - 8.0 * corr
        acc_hi = acc_hi + d3

    elif variant == "batched":
        # batched dot_general over the group dim (one MXU issue stream,
        # parallel scale-reduce afterwards) — may not lower in Mosaic
        pf32 = p.astype(jnp.float32)
        hi3 = jnp.floor(pf32 * 0.0625).astype(jnp.bfloat16).reshape(
            ng, group, TOH
        )
        pf3 = pf32.astype(jnp.bfloat16).reshape(ng, group, TOH)
        x3 = x.reshape(T, ng, group).transpose(1, 0, 2)   # [ng, T, group]
        ppf = jax.lax.dot_general(
            x3, pf3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # [ng, T, TOH]
        phi = jax.lax.dot_general(
            x3, hi3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        rs_all = jnp.sum(
            x.astype(jnp.float32).reshape(T, ng, group), axis=2
        )
        corr = jnp.dot(rs_all, s32[:, :TOH],
                       preferred_element_type=jnp.float32)
        plo = ppf - 16.0 * phi
        acc_lo = acc_lo + jnp.sum(
            plo * s32[:, None, :TOH], axis=0
        ) - 8.0 * corr
        acc_hi = acc_hi + jnp.sum(phi * s32[:, None, TOH:], axis=0)
    else:
        raise ValueError(variant)

    acc_ref[:, :TOH] = acc_lo
    acc_ref[:, TOH:] = acc_hi

    @pl.when(i == ni - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TI", "group", "variant"))
def variant_matmul(x, qw3, scales, *, TI, group, variant):
    T, IN = x.shape
    n_tiles, _, TOH = qw3.shape
    TO = TOH * 2
    OUT = n_tiles * TO
    Tp = max(8, T)
    x = x.astype(jnp.bfloat16)
    grid = (n_tiles, IN // TI)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_variant_kernel, group=group, TI=TI,
                          variant=variant),
        interpret=interpret,
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


def pick_ti(IN, group, cap=7168):
    for t in range(min(IN, cap), group - 1, -group):
        if IN % t == 0 and ((t // group) % 8 == 0 or t == IN):
            return t
    return IN


def run_qm():
    from candle_vllm_tpu.ops.quant import pack_int4, tile_packed_w4

    group = 128
    T = 8
    rng = np.random.default_rng(0)
    shapes = {
        "gate_up(4096x28672)": (4096, 28672),
        "down(14336x4096)": (14336, 4096),
    }
    variants = ["read", "dot2_big", "base", "kway4", "kway8", "fold3",
                "batched"]
    results = {}
    for si, (sname, (IN, OUT)) in enumerate(shapes.items()):
        TO = 1024
        TI = pick_ti(IN, group)
        q = rng.integers(-8, 8, size=(IN, OUT)).astype(np.int8)
        s = rng.uniform(0.01, 0.02, size=(IN // group, OUT)).astype(
            np.float32
        )
        qw3 = jnp.asarray(tile_packed_w4(pack_int4(q, TO), TO))
        s_j = jnp.asarray(s)
        x0 = jnp.asarray(rng.normal(size=(T, IN)), jnp.bfloat16)
        bytes_w = IN * OUT // 2

        if si > 0:
            # second shape: only base + the two fastest non-diagnostic
            # variants from the first shape (keeps the session short)
            ranked = sorted(
                ((g, v.split(":")[1]) for v, g in results.items()
                 if v.split(":")[1] not in ("read", "dot2_big", "base")),
                reverse=True,
            )
            variants = ["base"] + [v for _, v in ranked[:2]]
        for v in variants:
            def f(x, v=v):
                return variant_matmul(x, qw3, s_j, TI=TI, group=group,
                                      variant=v)

            try:
                dt = time_fn(f, x0)
            except Exception as e:  # noqa: BLE001
                print(f"{sname} {v}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            gbs = bytes_w / dt / 1e9
            results[f"{sname}:{v}"] = round(gbs, 1)
            print(f"{sname} {v}: {dt*1e6:.1f} us  {gbs:.1f} GB/s",
                  flush=True)
    print("RESULTS", results, flush=True)


# ---------------------------------------------------------------------------
# attention variants
# ---------------------------------------------------------------------------


def run_attn():
    import os

    from candle_vllm_tpu.ops.attention import AttentionSpec
    from candle_vllm_tpu.ops.pallas import paged_attention as pa

    S, H, K, D, ps = 8, 32, 8, 128, 128
    CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    MAXP = 32
    P = MAXP + 2
    spec = AttentionSpec(num_q_heads=H, num_kv_heads=K, head_dim=D,
                         sm_scale=D ** -0.5)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(S, H, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(P, ps, 2 * K, D)) * 0.3, jnp.bfloat16)
    kv_lens = jnp.zeros(S, jnp.int32).at[0].set(CTX)
    # engine-realistic tables: padding rows are ZEROS (build_step_input),
    # so out-of-range grid steps revisit block 0 and elide their DMA
    npages = (CTX + ps - 1) // ps
    pt_np = np.zeros((S, MAXP), np.int32)
    pt_np[0, :npages] = np.arange(1, npages + 1)
    pt = jnp.asarray(pt_np)
    cu = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.ones(S, jnp.int32).cumsum()]).astype(jnp.int32)
    page_bytes = (CTX // ps) * ps * 2 * K * D * 2  # bytes actually needed

    def mk_v1():
        pa.ragged_paged_attention_pallas.clear_cache()
        return lambda q_: pa.ragged_paged_attention_pallas(
            q_, kv, kv_lens, pt, cu, spec=spec)

    results = {}
    ref = None
    for name, setup in [
        ("unified_v1", lambda: (os.environ.__setitem__("CVT_ATTN_V2", "0"),
                                mk_v1())[1]),
        ("unified_v2", lambda: (os.environ.__setitem__("CVT_ATTN_V2", "1"),
                                mk_v1())[1]),
    ]:
        f = setup()

        def wrapped(x, f=f):
            out = f(x)
            return out.reshape(S, H * D)

        try:
            out = np.asarray(f(q), np.float32)
            if ref is None:
                ref = out
            rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            x0 = q
            dt = time_fn(
                lambda x, f=f: f(x).reshape(S, H * D), x0,
                n_lo=8, n_hi=520,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        gbs = page_bytes / dt / 1e9
        results[name] = round(dt * 1e6, 2)
        print(f"{name}: {dt*1e6:.2f} us  ({gbs:.1f} GB/s of KV)  "
              f"maxrel={rel:.2e}", flush=True)
    print("RESULTS", results, flush=True)


# ---------------------------------------------------------------------------
# fused vs unfused decode MLP
# ---------------------------------------------------------------------------


def run_mlp():
    from candle_vllm_tpu.ops.pallas.fused_mlp import fused_mlp_w4
    from candle_vllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
    from candle_vllm_tpu.ops.quant import pack_int4, tile_packed_w4

    H, I = 4096, 14336
    T, group, TO = 8, 128, 1024
    rng = np.random.default_rng(0)
    gu = rng.integers(-8, 8, size=(H, 2 * I)).astype(np.int8)
    dn = rng.integers(-8, 8, size=(I, H)).astype(np.int8)
    gu_s = rng.uniform(0.01, 0.02, size=(H // group, 2 * I)).astype(np.float32)
    dn_s = rng.uniform(0.01, 0.02, size=(I // group, H)).astype(np.float32)
    gu_q = jnp.asarray(tile_packed_w4(pack_int4(gu, TO), TO))
    dn_q = jnp.asarray(tile_packed_w4(pack_int4(dn, TO), TO))
    gu_sj = jnp.asarray(gu_s, jnp.bfloat16)
    dn_sj = jnp.asarray(dn_s, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(T, H)), jnp.bfloat16)
    bytes_w = (H * 2 * I + I * H) // 2

    def fused(x):
        return fused_mlp_w4(x, gu_q, gu_sj, dn_q, dn_sj)

    def unfused(x):
        gu_o = quant_matmul_pallas(x, gu_q, gu_sj, w4=True)
        g, u = gu_o[:, :I], gu_o[:, I:]
        h = (jax.nn.silu(g.astype(jnp.float32)) * u).astype(jnp.bfloat16)
        return quant_matmul_pallas(h, dn_q, dn_sj, w4=True)

    for name, f in [("fused", fused), ("unfused", unfused)]:
        dt = time_fn(f, x0, n_lo=8, n_hi=136)
        print(f"mlp {name}: {dt*1e6:.1f} us  {bytes_w/dt/1e9:.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "qm"
    print("backend:", jax.default_backend(), flush=True)
    {"qm": run_qm, "attn": run_attn, "mlp": run_mlp}[which]()
