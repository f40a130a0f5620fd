"""Gated DeltaNet (GDN) linear attention — Qwen3-Next/Qwen3.5 hybrid layers.

Replaces the reference's ``attention_rs::gdn`` CUDA kernels
(``/root/reference/src/openai/models/layers/deltanet.rs`` call sites:
fused_gdn_gating, l2_norm_last_dim, causal_conv1d_update_slots,
gated_delta_rule_recurrence_varlen) with a jittable ``lax.scan`` over the
ragged token batch: at scan step j every scheduled sequence processes its
j-th chunk token in parallel, carrying per-sequence recurrent state in a
slot pool — decode batches finish in one step, prefill chunks scan their
length.  (A chunked-parallel prefill kernel is the planned optimization;
this form is exact.)

Recurrent state per (slot, v-head): S [Dk, Dv] with
  S_t   = exp(g_t) * S_{t-1}
  Δ_t   = β_t (v_t - k_t·S_t)
  S_t  += k_t ⊗ Δ_t
  o_t   = (scale * q_t)·S_t
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gdn_gating(
    a_log: jnp.ndarray,   # [Hv]
    dt_bias: jnp.ndarray, # [Hv]
    a: jnp.ndarray,       # [T, Hv]
    b: jnp.ndarray,       # [T, Hv]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(g, beta): g = -exp(A_log)*softplus(a + dt_bias); beta = sigmoid(b)
    (reference: gdn::fused_gdn_gating)."""
    g = -jnp.exp(a_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    )
    return g, jax.nn.sigmoid(b.astype(jnp.float32))


def l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def gdn_mixed_chunked(
    mixed_qkv: jnp.ndarray,
    z: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    conv_w: jnp.ndarray,
    conv_b: Optional[jnp.ndarray],
    a_log: jnp.ndarray,
    dt_bias: jnp.ndarray,
    norm_w: jnp.ndarray,
    rec_state: jnp.ndarray,
    conv_state: jnp.ndarray,
    state_slots: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    kv_lens: jnp.ndarray,
    snap_pos: Optional[jnp.ndarray] = None,
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
    scale: float,
    chunk: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[Tuple]]:
    """Chunked-parallel GDN prefill: same contract as ``gdn_mixed`` with
    O(T/chunk) sequential steps instead of O(T).

    Within a chunk the recurrence
        S_t = a_t S_{t-1} + k_t [beta_t (v_t - k_t . a_t S_{t-1})]^T
    unrolls to the WY-style closed form  S_t = b_t S_0 +
    sum_{s<=t} (b_t/b_s) k_s m_s^T  with cumulative decay b and the
    pseudo-deltas M solving the unit lower-triangular system
        (I + L) M = beta (V - b (K S_0)),
        L[t,s] = beta_t e^{G_t-G_s} (k_t . k_s)   (s < t)
    — one batched [C, C] triangular solve + three batched matmuls per
    chunk per head, all MXU work (the TPU analogue of the reference's
    attention-rs chunked deltanet kernels).  Exactness is tested against
    the sequential ``gdn_mixed`` oracle.
    """
    T = mixed_qkv.shape[0]
    S = state_slots.shape[0]
    Hk, Hv, Dk, Dv = num_k_heads, num_v_heads, head_k_dim, head_v_dim
    G_rep = Hv // Hk
    key_dim = Hk * Dk
    W = conv_w.shape[1]
    C = min(chunk, T)
    n_chunks = -(-T // C)

    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
    starts = kv_lens - q_lens
    rec = rec_state[state_slots].astype(jnp.float32)
    conv = conv_state[state_slots].astype(jnp.float32)
    fresh = (starts == 0)
    rec = jnp.where(fresh[:, None, None, None], 0.0, rec)
    conv = jnp.where(fresh[:, None, None], 0.0, conv)

    g_all, beta_all = gdn_gating(a_log, dt_bias, a, b)   # [T, Hv] f32
    mixed = mixed_qkv.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    out0 = jnp.zeros((T, Hv, Dv), jnp.float32)
    snap = snap_pos is not None
    s_rec0 = jnp.zeros((S, Hv, Dk, Dv), jnp.float32) if snap else None
    s_conv0 = (
        jnp.zeros((S, conv.shape[1], W - 1), jnp.float32) if snap else None
    )
    eye = jnp.eye(C, dtype=jnp.float32)

    def chunk_step(carry, c):
        if snap:
            rec, conv, out, s_rec, s_conv = carry
        else:
            rec, conv, out = carry
        rec0 = rec  # chunk-entry state (S_0 of the closed form)
        offs = c * C + jnp.arange(C, dtype=jnp.int32)       # [C]
        idx = jnp.clip(cu_q_lens[:-1, None] + offs[None, :], 0, T - 1)
        active = offs[None, :] < q_lens[:, None]            # [S, C]

        x = mixed[idx]                                      # [S, C, conv_dim]
        # vectorized causal depthwise conv with carried state
        padded = jnp.concatenate(
            [jnp.swapaxes(conv, 1, 2), x], axis=1
        )                                                   # [S, C+W-1, cd]
        y = sum(
            padded[:, w : w + C, :] * conv_w[:, w][None, None, :]
            for w in range(W)
        )
        if conv_b is not None:
            y = y + conv_b.astype(jnp.float32)[None, None, :]
        y = jax.nn.silu(y)
        # new conv state: the W-1 inputs ending at each seq's last active
        # row of this chunk
        endpos = jnp.clip(q_lens - c * C, 0, C)             # [S]
        tap = endpos[:, None] + jnp.arange(W - 1)[None, :]  # [S, W-1]
        gathered = jnp.take_along_axis(
            padded, tap[:, :, None], axis=1
        )                                                   # [S, W-1, cd]
        new_conv = jnp.swapaxes(gathered, 1, 2)
        conv = jnp.where((endpos > 0)[:, None, None], new_conv, conv)

        q = l2norm(y[:, :, :key_dim].reshape(S, C, Hk, Dk))
        k = l2norm(y[:, :, key_dim : 2 * key_dim].reshape(S, C, Hk, Dk))
        v = y[:, :, 2 * key_dim :].reshape(S, C, Hv, Dv)
        q = jnp.repeat(q, G_rep, axis=2).transpose(0, 2, 1, 3)  # [S,Hv,C,Dk]
        k = jnp.repeat(k, G_rep, axis=2).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)                             # [S,Hv,C,Dv]

        g_log = jnp.where(active, 1.0, 0.0)[:, None, :] * jnp.swapaxes(
            g_all[idx], 1, 2
        )                                                   # [S, Hv, C]
        beta = jnp.where(active, 1.0, 0.0)[:, None, :] * jnp.swapaxes(
            beta_all[idx], 1, 2
        )
        Gc = jnp.cumsum(g_log, axis=-1)                     # [S, Hv, C]
        bexp = jnp.exp(Gc)

        # decay ratios e^{G_t - G_s}; strictly-lower for L, inclusive for D
        diff = Gc[..., :, None] - Gc[..., None, :]          # [S,Hv,C,C]
        tril_s = jnp.tril(jnp.ones((C, C), bool), k=-1)
        tril_i = jnp.tril(jnp.ones((C, C), bool))
        decay = jnp.where(tril_i, jnp.exp(diff), 0.0)

        hi = jax.lax.Precision.HIGHEST
        kk = jnp.einsum("xhtd,xhud->xhtu", k, k, precision=hi)
        L = jnp.where(tril_s, beta[..., :, None] * decay * kk, 0.0)

        kS0 = jnp.einsum("xhtd,xhdv->xhtv", k, rec0, precision=hi)
        R = beta[..., None] * (v - bexp[..., None] * kS0)
        # (I + L)^{-1} exactly via the nilpotent series: for strictly
        # lower-triangular N = -L, inv = prod_j (I + N^(2^j)) — log2(C)
        # batched [C, C] matmuls (XLA's triangular_solve runs an
        # unblocked scalar loop on TPU: measured ~300 ms for this step)
        N = -L
        P = eye + N
        Nk = N
        steps = max((C - 1).bit_length() - 1, 0)
        for _ in range(steps):
            Nk = jnp.einsum("xhtu,xhuv->xhtv", Nk, Nk, precision=hi)
            P = P + jnp.einsum("xhtu,xhuv->xhtv", P, Nk, precision=hi)
        M = jnp.einsum("xhtu,xhuv->xhtv", P, R, precision=hi)

        qs = q * scale
        qS0 = jnp.einsum("xhtd,xhdv->xhtv", qs, rec0, precision=hi)
        qk = jnp.einsum("xhtd,xhud->xhtu", qs, k, precision=hi)
        O = bexp[..., None] * qS0 + jnp.einsum(
            "xhtu,xhuv->xhtv", decay * qk, M, precision=hi
        )                                                   # [S,Hv,C,Dv]

        bC = bexp[..., -1]                                  # [S, Hv]
        # ratio e^{G_C - G_s} in log space — bexp itself underflows f32
        # for strong decay over a 64-token chunk (G_C < -87)
        kw = jnp.exp(Gc[..., -1:] - Gc)[..., None] * k
        rec_new = bC[..., None, None] * rec0 + jnp.einsum(
            "xhtd,xhtv->xhdv", kw, M, precision=hi
        )
        any_active = active.any(axis=1)
        rec = jnp.where(any_active[:, None, None, None], rec_new, rec)

        # scatter outputs (inactive rows drop out of range)
        idx_w = jnp.where(active, idx, T)
        out = out.at[idx_w.reshape(-1)].set(
            O.transpose(0, 2, 1, 3).reshape(S * C, Hv, Dv), mode="drop"
        )

        if snap:
            # snapshot at in-chunk offset: S_p = b_p S_0 + sum_{s<=p}
            # (b_p/b_s) k_s m_s^T, evaluated per sequence when snap_pos
            # falls inside this chunk
            p_off = snap_pos - c * C                        # [S]
            hit = (p_off >= 0) & (p_off < C) & any_active
            p_c = jnp.clip(p_off, 0, C - 1)
            b_p = jnp.take_along_axis(
                bexp, p_c[:, None, None], axis=2
            )[..., 0]                                       # [S, Hv]
            g_p = jnp.take_along_axis(Gc, p_c[:, None, None], axis=2)
            sel = offs[None, :] <= jnp.clip(snap_pos, 0, T)[:, None]
            # e^{G_p - G_s} in log space (same underflow hazard as above)
            wgt = jnp.where(
                sel[:, None, :], jnp.exp(g_p - Gc), 0.0
            )                                               # [S, Hv, C]
            S_p = b_p[..., None, None] * rec0 + jnp.einsum(
                "xhtd,xhtv->xhdv", wgt[..., None] * k, M,
                precision=jax.lax.Precision.HIGHEST,
            )
            s_rec = jnp.where(hit[:, None, None, None], S_p, s_rec)
            # conv snapshot: inputs ending at the snapshot position
            tap_s = (p_c + 1)[:, None] + jnp.arange(W - 1)[None, :]
            g_s = jnp.take_along_axis(padded, tap_s[:, :, None], axis=1)
            s_conv = jnp.where(
                hit[:, None, None], jnp.swapaxes(g_s, 1, 2), s_conv
            )
            return (rec, conv, out, s_rec, s_conv), None
        return (rec, conv, out), None

    init = (rec, conv, out0) + ((s_rec0, s_conv0) if snap else ())
    carry, _ = jax.lax.scan(
        chunk_step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    if snap:
        rec, conv, out, snap_rec, snap_conv = carry
        snapshots = (snap_rec, snap_conv)
    else:
        rec, conv, out = carry
        snapshots = None

    var = jnp.mean(jnp.square(out), axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + 1e-6) * norm_w.astype(jnp.float32)
    out = out * jax.nn.silu(zf)
    out = out.reshape(T, Hv * Dv)

    rec_state = rec_state.at[state_slots].set(rec.astype(rec_state.dtype))
    conv_state = conv_state.at[state_slots].set(conv.astype(conv_state.dtype))
    return out, rec_state, conv_state, snapshots


def gdn_mixed(
    mixed_qkv: jnp.ndarray,    # [T, conv_dim] pre-conv (q|k|v concat)
    z: jnp.ndarray,            # [T, Hv, Dv] output gate
    a: jnp.ndarray,            # [T, Hv]
    b: jnp.ndarray,            # [T, Hv]
    conv_w: jnp.ndarray,       # [conv_dim, W] depthwise kernel
    conv_b: Optional[jnp.ndarray],
    a_log: jnp.ndarray,
    dt_bias: jnp.ndarray,
    norm_w: jnp.ndarray,       # [Dv] gated-RMSNorm weight (per head)
    rec_state: jnp.ndarray,    # [POOL, Hv, Dk, Dv] f32
    conv_state: jnp.ndarray,   # [POOL, conv_dim, W-1] f32
    state_slots: jnp.ndarray,  # [S] i32 pool slot per sequence
    cu_q_lens: jnp.ndarray,    # [S+1]
    kv_lens: jnp.ndarray,      # [S] (post-step length; start = kvl - qlen)
    snap_pos: Optional[jnp.ndarray] = None,  # [S] i32 in-chunk snapshot
                                             # offset; -1 = no snapshot
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
    scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[Tuple]]:
    """Returns (out [T, Hv*Dv], rec_state, conv_state, snapshots).

    ``snap_pos[s] = j`` captures sequence s's recurrent state right after
    scan step j into the returned ``snapshots = (snap_rec [S, ...],
    snap_conv [S, ...])`` — the TPU form of the reference's mamba
    block-boundary snapshot capture (scheduler/mamba.rs:15-291): the
    engine stores them host-side keyed by the prefix block hash so later
    identical prompts can restore state instead of re-prefilling."""
    T = mixed_qkv.shape[0]
    S = state_slots.shape[0]
    Hk, Hv, Dk, Dv = num_k_heads, num_v_heads, head_k_dim, head_v_dim
    G = Hv // Hk
    key_dim = Hk * Dk
    W = conv_w.shape[1]

    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]            # [S]
    starts = kv_lens - q_lens                           # chunk start offsets
    # gather per-seq state once; scatter back once at the end
    rec = rec_state[state_slots].astype(jnp.float32)    # [S, Hv, Dk, Dv]
    conv = conv_state[state_slots].astype(jnp.float32)  # [S, conv_dim, W-1]
    fresh = (starts == 0)
    rec = jnp.where(fresh[:, None, None, None], 0.0, rec)
    conv = jnp.where(fresh[:, None, None], 0.0, conv)

    g_all, beta_all = gdn_gating(a_log, dt_bias, a, b)  # [T, Hv] f32
    mixed = mixed_qkv.astype(jnp.float32)
    z = z.astype(jnp.float32)

    out0 = jnp.zeros((T, Hv, Dv), jnp.float32)
    snap = snap_pos is not None
    snap_rec0 = jnp.zeros((S, Hv, Dk, Dv), jnp.float32) if snap else None
    snap_conv0 = (
        jnp.zeros((S, conv.shape[1], W - 1), jnp.float32) if snap else None
    )

    def step(carry, j):
        if snap:
            rec, conv, out, s_rec, s_conv = carry
        else:
            rec, conv, out = carry
        idx = jnp.clip(cu_q_lens[:-1] + j, 0, T - 1)    # [S]
        active = j < q_lens                              # [S]
        x = mixed[idx]                                   # [S, conv_dim]

        # depthwise causal conv with state (reference:
        # causal_conv1d_update_slots), SiLU activated
        acc = x * conv_w[:, -1][None, :]
        for w in range(W - 1):
            acc = acc + conv[:, :, w] * conv_w[:, w][None, :]
        if conv_b is not None:
            acc = acc + conv_b.astype(jnp.float32)[None, :]
        y = jax.nn.silu(acc)
        new_conv = jnp.concatenate([conv[:, :, 1:], x[:, :, None]], axis=2)
        conv = jnp.where(active[:, None, None], new_conv, conv)

        q = l2norm(y[:, :key_dim].reshape(S, Hk, Dk))
        k = l2norm(y[:, key_dim : 2 * key_dim].reshape(S, Hk, Dk))
        v = y[:, 2 * key_dim :].reshape(S, Hv, Dv)
        # GQA: broadcast k/q heads to v heads
        q = jnp.repeat(q, G, axis=1)                     # [S, Hv, Dk]
        k = jnp.repeat(k, G, axis=1)

        g = jnp.exp(g_all[idx])                          # [S, Hv]
        beta = beta_all[idx]

        # keep the recurrence in true f32 — the default TPU matmul
        # precision is bf16 and drift compounds over the scan
        hi = jax.lax.Precision.HIGHEST
        rec_d = rec * g[:, :, None, None]
        v_pred = jnp.einsum("shk,shkv->shv", k, rec_d, precision=hi)
        delta = (v - v_pred) * beta[:, :, None]
        rec_new = rec_d + jnp.einsum("shk,shv->shkv", k, delta, precision=hi)
        o = jnp.einsum("shk,shkv->shv", q * scale, rec_new, precision=hi)

        rec = jnp.where(active[:, None, None, None], rec_new, rec)
        # inactive/padding rows scatter out of range (dropped) — a padding
        # sequence's clipped index can collide with a real row
        idx_write = jnp.where(active, idx, T)
        out = out.at[idx_write].set(o, mode="drop")
        if snap:
            hit = (j == snap_pos) & active                  # [S]
            s_rec = jnp.where(hit[:, None, None, None], rec, s_rec)
            s_conv = jnp.where(hit[:, None, None], conv, s_conv)
            return (rec, conv, out, s_rec, s_conv), None
        return (rec, conv, out), None

    if snap:
        (rec, conv, out, snap_rec, snap_conv), _ = jax.lax.scan(
            step, (rec, conv, out0, snap_rec0, snap_conv0),
            jnp.arange(T, dtype=jnp.int32),
        )
        snapshots = (snap_rec, snap_conv)
    else:
        (rec, conv, out), _ = jax.lax.scan(
            step, (rec, conv, out0), jnp.arange(T, dtype=jnp.int32)
        )
        snapshots = None

    # gated RMSNorm (per-head weights; reference: gdn_norm_weight) + gate
    var = jnp.mean(jnp.square(out), axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + 1e-6) * norm_w.astype(jnp.float32)
    out = out * jax.nn.silu(z)
    out = out.reshape(T, Hv * Dv)

    rec_state = rec_state.at[state_slots].set(rec.astype(rec_state.dtype))
    conv_state = conv_state.at[state_slots].set(conv.astype(conv_state.dtype))
    return out, rec_state, conv_state, snapshots
