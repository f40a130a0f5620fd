"""Normalization ops.

RMSNorm is left to XLA (it fuses the reduction + scale into neighbors; a
Pallas kernel would add nothing — SURVEY.md: "let XLA fuse").  Matches the
reference's ``NormX``/``rms_norm`` semantics
(``/root/reference/src/openai/models/layers/others.rs``) including the
Gemma ``(1 + weight)`` convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
             add_unit_offset: bool = False) -> jnp.ndarray:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jnp.reciprocal(jnp.sqrt(var + eps))
    w = weight.astype(jnp.float32)
    if add_unit_offset:
        w = 1.0 + w
    return (x * w).astype(orig_dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = x * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
