"""Batched on-device sampling.

Replaces the reference's GPU sampler + argsort kernels
(``/root/reference/src/openai/logits_processor.rs``, attention-rs sampler):
frequency/presence/repetition penalties over a last-n window, temperature,
top-k / top-p / min-p filtering, and gumbel-max sampling — all as one
jitted, fully-vectorized function so the whole batch samples in a single
device launch per step.

Greedy rows (temperature ~ 0) take the argmax of the penalized logits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.sampling_params import SamplingParams

_TEMP_EPS = 1e-5
PENALTY_WINDOW = 64  # reference: SamplingParams.repeat_last_n default
# penalty-history window sizes are bucketed so larger repeat_last_n values
# (reference honors arbitrary repeat_last_n) keep the compiled-shape set
# closed instead of recompiling per history length
_WINDOW_BUCKETS = (64, 256, 1024, 4096)


@dataclass
class SamplingTensors:
    """Host-assembled per-row sampling parameters for one step."""

    temperature: jnp.ndarray   # [B] f32
    top_k: jnp.ndarray         # [B] i32  (V = disabled)
    top_p: jnp.ndarray         # [B] f32
    min_p: jnp.ndarray         # [B] f32
    presence: jnp.ndarray      # [B] f32
    frequency: jnp.ndarray     # [B] f32
    repetition: jnp.ndarray    # [B] f32
    last_tokens: jnp.ndarray   # [B, W] i32, -1 padded
    greedy: jnp.ndarray        # [B] bool
    seeds: jnp.ndarray         # [B] i32 per-request seed (-1 = unseeded)
    seed_pos: jnp.ndarray      # [B] i32 token index (seeded determinism)
    seed_sub: jnp.ndarray      # [B] i32 sibling index (n-best divergence)

    @classmethod
    def build(
        cls,
        params: List[SamplingParams],
        token_histories: List[List[int]],
        vocab_size: int,
        pad_to: Optional[int] = None,
        positions: Optional[List[int]] = None,
        sub_indices: Optional[List[int]] = None,
    ) -> "SamplingTensors":
        n = len(params)
        B = pad_to or n
        seeds = np.full(B, -1, np.int32)
        seed_pos = np.zeros(B, np.int32)
        seed_sub = np.zeros(B, np.int32)
        for i, p in enumerate(params):
            if p.seed is not None:
                seeds[i] = p.seed
                seed_pos[i] = positions[i] if positions else 0
                seed_sub[i] = sub_indices[i] if sub_indices else 0
        temperature = np.ones(B, np.float32)
        top_k = np.full(B, vocab_size, np.int32)
        top_p = np.ones(B, np.float32)
        min_p = np.zeros(B, np.float32)
        presence = np.zeros(B, np.float32)
        frequency = np.zeros(B, np.float32)
        repetition = np.ones(B, np.float32)
        # bucketed window: wide enough for the largest requested
        # repeat_last_n actually backed by history
        needed = PENALTY_WINDOW
        for i, p in enumerate(params):
            if p.has_penalties:
                needed = max(needed, min(p.repeat_last_n, len(token_histories[i])))
        W = next(w for w in _WINDOW_BUCKETS if w >= min(needed, _WINDOW_BUCKETS[-1]))
        last_tokens = np.full((B, W), -1, np.int32)
        greedy = np.zeros(B, bool)
        for i, p in enumerate(params):
            greedy[i] = p.is_greedy
            temperature[i] = max(p.temperature, _TEMP_EPS)
            top_k[i] = p.top_k if p.top_k > 0 else vocab_size
            top_p[i] = p.top_p
            min_p[i] = p.min_p
            presence[i] = p.presence_penalty
            frequency[i] = p.frequency_penalty
            repetition[i] = p.repetition_penalty
            window = min(p.repeat_last_n, W)
            hist = token_histories[i][-window:] if window > 0 else []
            if hist:
                last_tokens[i, -len(hist):] = hist
        # numpy leaves on purpose: jit transfers them at dispatch in one
        # batch; eager jnp.asarray here costs ~12 device_puts per engine
        # step (measured ~2.5 ms/step of pure host overhead)
        return cls(
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            presence=presence,
            frequency=frequency,
            repetition=repetition,
            last_tokens=last_tokens,
            greedy=greedy,
            seeds=seeds,
            seed_pos=seed_pos,
            seed_sub=seed_sub,
        )


jax.tree_util.register_pytree_node(
    SamplingTensors,
    lambda t: (
        (t.temperature, t.top_k, t.top_p, t.min_p, t.presence, t.frequency,
         t.repetition, t.last_tokens, t.greedy, t.seeds, t.seed_pos,
         t.seed_sub),
        None,
    ),
    lambda _, c: SamplingTensors(*c),
)


def apply_penalties(logits: jnp.ndarray, t: SamplingTensors) -> jnp.ndarray:
    """Window-limited penalties (reference: apply_batch_repeat_penalty,
    logits_processor.rs:347)."""
    B, V = logits.shape
    valid = (t.last_tokens >= 0).astype(jnp.float32)            # [B, W]
    tok = jnp.maximum(t.last_tokens, 0)
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], tok.shape)
    counts = jnp.zeros((B, V), jnp.float32).at[rows, tok].add(valid)
    seen = counts > 0

    logits = logits.astype(jnp.float32)
    # repetition: divide positive logits, multiply negative ones
    rep = t.repetition[:, None]
    rep_logits = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, rep_logits, logits)
    # frequency + presence
    logits = logits - t.frequency[:, None] * counts
    logits = logits - t.presence[:, None] * seen.astype(jnp.float32)
    return logits


def sample(
    logits: jnp.ndarray,     # [B, V]
    t: SamplingTensors,
    key: jax.Array,
    *,
    greedy_only: bool = False,
    penalties: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (token_ids [B] i32, logprobs [B] f32).

    ``greedy_only`` / ``penalties`` are host-known per step and prune the
    full-vocab sort / penalty scatter from the compiled step when no row
    needs them (the common greedy-decode hot path)."""
    B, V = logits.shape
    if penalties:
        logits = apply_penalties(logits, t)
    else:
        logits = logits.astype(jnp.float32)
    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if greedy_only:
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        logprobs = jnp.take_along_axis(
            logp_all, greedy_tokens[:, None], axis=-1
        )[:, 0]
        return greedy_tokens, logprobs

    scaled = logits / t.temperature[:, None]

    # ---- top-k / top-p / min-p via one descending sort ----
    sorted_logits = -jnp.sort(-scaled, axis=-1)                 # [B, V] desc
    # top-k threshold: the k-th largest logit
    k_idx = jnp.clip(t.top_k - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_logits, k_idx[:, None], axis=-1)
    keep = scaled >= kth
    # top-p: keep the smallest prefix of sorted probs with cumsum >= top_p
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    # count of sorted entries to keep (always >= 1)
    n_keep = jnp.sum(cumsum - sorted_probs < t.top_p[:, None], axis=-1)
    p_threshold = jnp.take_along_axis(
        sorted_logits, jnp.clip(n_keep - 1, 0, V - 1)[:, None], axis=-1
    )
    keep &= scaled >= p_threshold
    # min-p: drop probs below min_p * max_prob
    probs = jax.nn.softmax(scaled, axis=-1)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)
    keep &= probs >= t.min_p[:, None] * max_prob

    filtered = jnp.where(keep, scaled, -jnp.inf)
    gumbel = jax.random.gumbel(key, (B, V), dtype=jnp.float32)
    # per-request seeded rows: deterministic noise from (seed, position)
    # (reference: SamplingParams.seed)
    def seeded_row(seed, pos, sub):
        k = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), pos), sub
        )
        return jax.random.gumbel(k, (V,), dtype=jnp.float32)

    seeded = jax.vmap(seeded_row)(
        jnp.maximum(t.seeds, 0).astype(jnp.uint32), t.seed_pos, t.seed_sub
    )
    gumbel = jnp.where((t.seeds >= 0)[:, None], seeded, gumbel)
    sampled = jnp.argmax(filtered + gumbel, axis=-1).astype(jnp.int32)

    tokens = jnp.where(t.greedy, greedy_tokens, sampled)
    logp_all = jax.nn.log_softmax(jnp.where(t.greedy[:, None], logits, filtered), axis=-1)
    logprobs = jnp.take_along_axis(logp_all, tokens[:, None], axis=-1)[:, 0]
    return tokens, logprobs
