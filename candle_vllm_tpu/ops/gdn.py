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

        rec_d = rec * g[:, :, None, None]
        v_pred = jnp.einsum("shk,shkv->shv", k, rec_d)
        delta = (v - v_pred) * beta[:, :, None]
        rec_new = rec_d + jnp.einsum("shk,shv->shkv", k, delta)
        o = jnp.einsum("shk,shkv->shv", q * scale, rec_new)

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
