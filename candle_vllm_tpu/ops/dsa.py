"""DSA (DeepSeek Sparse Attention) lightning indexer — V3.2/GLM5 class.

TPU re-design of the reference's prefill-side sparse attention
(``/root/reference/src/openai/models/layers/indexer.rs`` DsaIndexer +
attention-rs ``dsa_lightning_indexer_prefill`` / ``mla_sparse_paged_
prefill``): a tiny per-head scorer picks the ``index_topk`` most relevant
context tokens for every query position, and the main MLA attention runs
only over those — prefill cost drops from O(T²) to O(T·topk).

The TPU formulation avoids the reference's CUDA kernels entirely:
- scores are one [T, Hn, Dh] x [T, Dh] einsum with a ReLU and a
  learned per-(query, head) weight combine (the "lightning" index
  I(t,s) = Σ_h w_t,h · ReLU(q_t,h · k_s));
- ``jax.lax.top_k`` over the causally-masked in-batch score matrix
  yields static-shape [T, topk] indices;
- the sparse attention gathers the selected latent K rows and runs a
  dense [T, H, topk] attention — static shapes, MXU-friendly, no
  scatter masks.

In-batch scope: queries index keys of the SAME ragged batch (segment
mask from cu_q_lens), i.e. whole-prompt prefill steps.  Chunk-crossing
sparse reads from paged KV need a dedicated kernel (future work); the
engine keeps dense attention when chunked prefill or prefix caching can
split a prompt.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

Params = Dict[str, jnp.ndarray]


def lightning_index(
    x: jnp.ndarray,          # [T, hidden] layer input
    q_resid: jnp.ndarray,    # [T, q_lora_rank] (post q_a_layernorm)
    params: Params,
    prefix: str,             # ".../self_attn.indexer"
    cu_q_lens: jnp.ndarray,  # [S+1]
    kv_lens: jnp.ndarray,    # [S]
    *,
    n_heads: int,
    head_dim: int,
    rope_dim: int,
    topk: int,
    cos: jnp.ndarray,        # [T, rope_dim*?] rope tables for positions
    sin: jnp.ndarray,
    rope_spec,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (indices [T, topk] i32 into the batch rows, valid [T, topk]
    bool).  Invalid slots (fewer than topk causally-visible keys) carry
    index 0 and valid=False."""
    from candle_vllm_tpu.ops.norms import layer_norm
    from candle_vllm_tpu.ops.rope import apply_rope

    T = x.shape[0]
    S = kv_lens.shape[0]

    q = jnp.dot(q_resid, params[f"{prefix}.wq_b.weight"]).reshape(
        T, n_heads, head_dim
    )
    k = jnp.dot(x, params[f"{prefix}.wk.weight"])          # [T, head_dim]
    k = layer_norm(
        k, params[f"{prefix}.k_norm.weight"],
        params.get(f"{prefix}.k_norm.bias"), 1e-6,
    )
    # rope on the leading rope_dim lanes (indexer.rs:98-123)
    q_r = apply_rope(q[..., :rope_dim], cos, sin, rope_spec)
    k_r = apply_rope(k[:, None, :rope_dim], cos, sin, rope_spec)
    q = jnp.concatenate([q_r, q[..., rope_dim:]], axis=-1)
    k = jnp.concatenate([k_r[:, 0], k[:, rope_dim:]], axis=-1)

    w = jnp.dot(x, params[f"{prefix}.weights_proj.weight"])  # [T, Hn]
    score_scale = (head_dim ** -0.5) * (n_heads ** -0.5)

    # I(t, s) = sum_h w[t,h] * relu(q[t,h] . k[s]) * scale
    qk = jnp.einsum(
        "thd,sd->ths", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = jnp.einsum(
        "th,ths->ts", w.astype(jnp.float32), jax.nn.relu(qk)
    ) * score_scale                                          # [T, T]

    # causal + same-sequence mask over the ragged batch
    token_ids = jnp.arange(T, dtype=jnp.int32)
    seq_idx = jnp.clip(
        jnp.searchsorted(cu_q_lens[1:], token_ids, side="right"), 0, S - 1
    ).astype(jnp.int32)
    t_used = cu_q_lens[S]
    same = seq_idx[:, None] == seq_idx[None, :]
    causal = token_ids[None, :] <= token_ids[:, None]
    real = (token_ids < t_used)[None, :]
    allow = same & causal & real
    scores = jnp.where(allow, scores, NEG_INF)

    k = min(topk, T)  # batches shorter than index_topk: take all rows
    top_scores, indices = jax.lax.top_k(scores, k)           # [T, k]
    valid = top_scores > NEG_INF / 2
    if k < topk:
        indices = jnp.pad(indices, ((0, 0), (0, topk - k)))
        valid = jnp.pad(valid, ((0, 0), (0, topk - k)))
    return indices.astype(jnp.int32), valid


def sparse_latent_attention(
    q_lat: jnp.ndarray,    # [T, H, Dl] latent-absorbed queries
    k_lat: jnp.ndarray,    # [T, Dl] latent keys (k == v in MLA)
    indices: jnp.ndarray,  # [T, topk]
    valid: jnp.ndarray,    # [T, topk]
    sm_scale: float,
) -> jnp.ndarray:
    """Dense attention over each query's selected keys: the TPU analogue
    of ``mla_sparse_paged_prefill`` — [T, topk, Dl] gathered keys feed a
    [T, H, topk] score matrix; invalid slots mask to -inf."""
    k_sel = k_lat[indices].astype(jnp.float32)               # [T, topk, Dl]
    scores = jnp.einsum(
        "thd,tkd->thk", q_lat.astype(jnp.float32), k_sel
    ) * sm_scale
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thk,tkd->thd", p, k_sel)               # [T, H, Dl]
    return out.astype(q_lat.dtype)
