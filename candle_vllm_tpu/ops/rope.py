"""Rotary position embeddings with scaling variants.

Re-designs the reference's rope layer
(``/root/reference/src/openai/models/layers/rotary_emb.rs``): default +
linear / dynamic-NTK / YaRN / llama3 / longrope scaling, partial rotary
dims, and both half-rotated (HF llama) and interleaved (GPT-J / GLM)
layouts.

TPU-first: cos/sin are computed on the fly from positions inside the jitted
step (cheap VPU transcendentals XLA fuses into the surrounding elementwise
ops) instead of a precomputed [max_len, dim] table gathered per token — the
gather would be an HBM round-trip per layer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

from candle_vllm_tpu.config import ModelConfig, RopeScaling


@dataclass(frozen=True)
class RopeSpec:
    """Static rope parameters resolved from the model config."""

    rotary_dim: int
    inv_freq: Tuple[float, ...]       # length rotary_dim // 2
    attention_scale: float = 1.0      # YaRN mscale applied to cos/sin
    interleaved: bool = False
    # longrope/su (Phi3/Phi4): positions >= long_switch use these
    # frequencies instead (reference: Phi4RotaryEmbedding, phi4.rs:46-250)
    inv_freq_long: Optional[Tuple[float, ...]] = None
    long_switch: int = 0

    def as_array(self) -> jnp.ndarray:
        return jnp.asarray(self.inv_freq, dtype=jnp.float32)


def _base_inv_freq(rotary_dim: int, theta: float) -> "list[float]":
    return [theta ** (-2.0 * i / rotary_dim) for i in range(rotary_dim // 2)]


def _yarn_find_correction_dim(num_rot: float, dim: int, base: float, max_pos: int) -> float:
    return (dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (2 * math.log(base))


def _yarn_inv_freq(
    rotary_dim: int, theta: float, rs: RopeScaling, max_pos: int
) -> "list[float]":
    """YaRN per-dim frequency interpolation (reference: YarnRotaryEmbedding,
    rotary_emb.rs:353; formulas from the YaRN paper)."""
    base_freqs = _base_inv_freq(rotary_dim, theta)
    low = _yarn_find_correction_dim(rs.beta_fast, rotary_dim, theta, max_pos)
    high = _yarn_find_correction_dim(rs.beta_slow, rotary_dim, theta, max_pos)
    low = max(math.floor(low), 0)
    high = min(math.ceil(high), rotary_dim // 2 - 1)
    out = []
    for i, f in enumerate(base_freqs):
        if high == low:
            ramp = 1.0 if i < low else 0.0
        else:
            ramp = min(max((i - low) / (high - low), 0.0), 1.0)
        extrapolation = f
        interpolation = f / rs.factor
        out.append(interpolation * ramp + extrapolation * (1.0 - ramp))
    return out


def _llama3_inv_freq(rotary_dim: int, theta: float, rs: RopeScaling, max_pos: int) -> "list[float]":
    base_freqs = _base_inv_freq(rotary_dim, theta)
    old_len = rs.original_max_position_embeddings or max_pos
    low_wavelen = old_len / rs.low_freq_factor
    high_wavelen = old_len / rs.high_freq_factor
    out = []
    for f in base_freqs:
        wavelen = 2 * math.pi / f
        if wavelen < high_wavelen:
            out.append(f)
        elif wavelen > low_wavelen:
            out.append(f / rs.factor)
        else:
            smooth = (old_len / wavelen - rs.low_freq_factor) / (
                rs.high_freq_factor - rs.low_freq_factor
            )
            out.append((1 - smooth) * f / rs.factor + smooth * f)
    return out


def make_rope_spec(config: ModelConfig, theta_override: Optional[float] = None,
                   interleaved: bool = False,
                   rotary_dim_override: Optional[int] = None) -> RopeSpec:
    theta = theta_override if theta_override is not None else config.rope_theta
    rotary_dim = (rotary_dim_override if rotary_dim_override is not None
                  else config.rotary_dim)
    rs = config.rope_scaling
    scale = 1.0
    inv_long: Optional[list] = None
    long_switch = 0
    if rs is None or rs.rope_type == "default":
        inv = _base_inv_freq(rotary_dim, theta)
    elif rs.rope_type == "linear":
        inv = [f / rs.factor for f in _base_inv_freq(rotary_dim, theta)]
    elif rs.rope_type == "dynamic":
        # dynamic NTK: stretch theta (evaluated at max length)
        adj = theta * (rs.factor ** (rotary_dim / (rotary_dim - 2)))
        inv = _base_inv_freq(rotary_dim, adj)
    elif rs.rope_type == "yarn":
        max_pos = rs.original_max_position_embeddings or config.max_model_len
        inv = _yarn_inv_freq(rotary_dim, theta, rs, max_pos)
        if rs.attention_factor is not None:
            scale = rs.attention_factor
        elif rs.factor > 1.0:
            mscale = 0.1 * math.log(rs.factor) + 1.0
            if rs.mscale_all_dim:
                num = 0.1 * rs.mscale * math.log(rs.factor) + 1.0
                den = 0.1 * rs.mscale_all_dim * math.log(rs.factor) + 1.0
                mscale = num / den
            scale = mscale
    elif rs.rope_type == "llama3":
        inv = _llama3_inv_freq(rotary_dim, theta, rs, config.max_model_len)
    elif rs.rope_type in ("longrope", "su"):
        # Phi3/Phi4 SuScaled rope: per-dim-pair rescale factors, short for
        # positions within the original window and long beyond, with a
        # sqrt(1 + ln(s)/ln(orig)) attention magnitude correction
        # (reference: Phi4RotaryEmbedding, phi4.rs:77-250)
        base = _base_inv_freq(rotary_dim, theta)
        orig = rs.original_max_position_embeddings or config.max_model_len
        short = rs.short_factor or [1.0] * len(base)
        long = rs.long_factor or short
        inv = [f / s for f, s in zip(base, short)]
        inv_long = [f / l for f, l in zip(base, long)]
        long_switch = orig
        s = config.max_model_len / max(orig, 1)
        if rs.attention_factor is not None:
            scale = rs.attention_factor
        elif s > 1.0:
            scale = math.sqrt(1.0 + math.log(s) / math.log(orig))
    else:  # unknown scaling types: fall back to default freqs
        inv = _base_inv_freq(rotary_dim, theta)
    return RopeSpec(
        rotary_dim=rotary_dim,
        inv_freq=tuple(inv),
        attention_scale=scale,
        interleaved=interleaved,
        inv_freq_long=tuple(inv_long) if inv_long is not None else None,
        long_switch=long_switch,
    )


def compute_cos_sin(positions: jnp.ndarray, spec: RopeSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [T] -> cos, sin each [T, rotary_dim // 2] (float32)."""
    inv_freq = spec.as_array()  # [R/2]
    pos = positions.astype(jnp.float32)[:, None]
    if spec.inv_freq_long is not None:
        # longrope: positions past the original window use long factors
        long = jnp.asarray(spec.inv_freq_long, jnp.float32)
        inv_freq = jnp.where(pos >= spec.long_switch, long[None, :],
                             inv_freq[None, :])
        angles = pos * inv_freq
    else:
        angles = pos * inv_freq[None, :]
    return jnp.cos(angles) * spec.attention_scale, jnp.sin(angles) * spec.attention_scale


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, spec: RopeSpec
) -> jnp.ndarray:
    """Rotate the leading ``rotary_dim`` of each head.

    x: [T, num_heads, head_dim]; cos/sin: [T, rotary_dim // 2].
    """
    orig_dtype = x.dtype
    r = spec.rotary_dim
    rot, rest = x[..., :r].astype(jnp.float32), x[..., r:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    if spec.interleaved:
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        rotated = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    else:
        half = r // 2
        x1, x2 = rot[..., :half], rot[..., half:]
        rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    rotated = rotated.astype(orig_dtype)
    if rest.shape[-1] == 0:
        return rotated
    return jnp.concatenate([rotated, rest], axis=-1)
