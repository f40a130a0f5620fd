"""Weight quantization: formats, quantize/pack helpers, jnp reference.

Replaces the reference's quantized linear zoo
(``/root/reference/src/openai/models/linear.rs`` LinearX: GPTQ / AWQ /
Marlin / GGUF / FP8) with TPU-native formats:

- ``w4a16``: 4-bit weights, per-(group, col) bf16 scales (+ optional
  scaled zero-points for asymmetric checkpoints).  Nibbles are packed two
  per int8 byte in a *per-tile concat-halves* layout: within each
  ``QTILE_OUT``-wide column tile, byte column ``j`` holds output column
  ``j`` in its low nibble and column ``j + QTILE_OUT/2`` in its high
  nibble — so the kernel unpacks with two shifts and a lane-contiguous
  concat, no interleave relayout.
- ``int8``: 8-bit weights, per-(group, col) scales.
- ``fp8``: blockwise-scaled float8_e4m3 weights (weight_block_size from
  HF compressed-tensors / modelopt configs).

Param-dict convention (consumed by models/layers.py ``linear``):
  {prefix}.qweight   packed weights
  {prefix}.scales    bf16 [in/g, out]   (w4a16/int8)  | f32 [bi, bo] (fp8)
  {prefix}.qzeros    bf16 [in/g, out]   optional, already scaled (z*s)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

QTILE_OUT = 256          # kernel out-tile width the packing is aligned to
DEFAULT_GROUP = 128

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def pack_int4(q: np.ndarray, tile_out: int = QTILE_OUT) -> np.ndarray:
    """[in, out] int4 values (as int8 in [-8, 7]) -> [in, out/2] packed
    int8 in per-tile concat-halves layout."""
    n_in, n_out = q.shape
    assert n_out % tile_out == 0, (n_out, tile_out)
    half = tile_out // 2
    t = q.reshape(n_in, n_out // tile_out, 2, half)
    lo = t[:, :, 0, :].astype(np.int8) & 0xF
    hi = t[:, :, 1, :].astype(np.int8) & 0xF
    packed = (lo | (hi << 4)).astype(np.int8)
    return np.ascontiguousarray(packed.reshape(n_in, n_out // 2))


def unpack_int4(packed: np.ndarray, tile_out: int = QTILE_OUT) -> np.ndarray:
    """Inverse of pack_int4 (host-side, for tests)."""
    n_in, half_out = packed.shape
    n_out = half_out * 2
    half = tile_out // 2
    p = packed.reshape(n_in, n_out // tile_out, half)
    lo = ((p.astype(np.int8) << 4).astype(np.int8) >> 4).astype(np.int8)
    hi = (p.astype(np.int8) >> 4).astype(np.int8)
    t = np.stack([lo, hi], axis=2)  # [in, tiles, 2, half]
    return t.reshape(n_in, n_out)


# ---------------------------------------------------------------------------
# quantization (ISQ at load; reference: linear.rs from_linear_x)
# ---------------------------------------------------------------------------


def quantize_w4a16(
    w: np.ndarray, group_size: int = DEFAULT_GROUP
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-(group,col) int4. w: [in, out] float. Returns
    (packed [in, out/2] int8, scales [in/g, out] float32)."""
    n_in, n_out = w.shape
    assert n_in % group_size == 0, (n_in, group_size)
    wg = w.astype(np.float32).reshape(n_in // group_size, group_size, n_out)
    scale = np.abs(wg).max(axis=1) / 7.0  # [in/g, out]
    scale = np.maximum(scale, 1e-8)
    q = np.rint(wg / scale[:, None, :]).clip(-8, 7).astype(np.int8)
    return pack_int4(q.reshape(n_in, n_out)), scale


def quantize_int8(
    w: np.ndarray, group_size: int = DEFAULT_GROUP
) -> Tuple[np.ndarray, np.ndarray]:
    n_in, n_out = w.shape
    wg = w.astype(np.float32).reshape(n_in // group_size, group_size, n_out)
    scale = np.abs(wg).max(axis=1) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.rint(wg / scale[:, None, :]).clip(-127, 127).astype(np.int8)
    return np.ascontiguousarray(q.reshape(n_in, n_out)), scale


def quantize_params(
    params: Params,
    method: str = "w4a16",
    group_size: int = DEFAULT_GROUP,
    keep_regex: str = r"(embed_tokens|norm|\.bias$|lm_head)",
) -> Params:
    """In-situ quantization of a loaded bf16 param dict (reference ISQ,
    linear.rs:from_linear_x).  Embeddings / norms / lm_head stay bf16."""
    import re

    keep = re.compile(keep_regex)
    out: Params = {}
    for name, arr in params.items():
        if (
            not name.endswith(".weight")
            or keep.search(name)
            or arr.ndim != 2
            or arr.shape[0] % group_size
            or arr.shape[1] % QTILE_OUT
        ):
            out[name] = arr
            continue
        w = np.asarray(jax.device_get(arr), np.float32)
        prefix = name[: -len(".weight")]
        if method == "w4a16":
            qw, s = quantize_w4a16(w, group_size)
        elif method == "int8":
            qw, s = quantize_int8(w, group_size)
        else:
            raise ValueError(f"unknown quant method {method}")
        out[f"{prefix}.qweight"] = jnp.asarray(qw)
        out[f"{prefix}.scales"] = jnp.asarray(s, jnp.bfloat16)
    return out


# ---------------------------------------------------------------------------
# matmul dispatch
# ---------------------------------------------------------------------------


def dequantize(params: Params, prefix: str) -> jnp.ndarray:
    """jnp reference dequant -> [in, out] f32 (CPU oracle path)."""
    qw = params[f"{prefix}.qweight"]
    s = params[f"{prefix}.scales"].astype(jnp.float32)
    n_in = qw.shape[0]
    g = n_in // s.shape[0]
    if qw.shape[1] * 2 == s.shape[1]:  # w4a16 packed
        half = QTILE_OUT // 2
        n_out = s.shape[1]
        p = qw.reshape(n_in, n_out // QTILE_OUT, half)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4)
        )
        hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
        q = jnp.stack([lo, hi], axis=2).reshape(n_in, n_out)
    else:  # int8
        q = qw
        n_out = q.shape[1]
    w = q.astype(jnp.float32).reshape(n_in // g, g, n_out)
    w = w * s[:, None, :]
    w = w.reshape(n_in, n_out)
    z = params.get(f"{prefix}.qzeros")
    if z is not None:
        w = w - jnp.repeat(z.astype(jnp.float32), g, axis=0)
    return w


def quantized_matmul(x: jnp.ndarray, params: Params, prefix: str) -> jnp.ndarray:
    """x @ dequant(W): Pallas fused kernel on TPU, jnp dequant elsewhere."""
    if jax.default_backend() == "tpu":
        from candle_vllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

        qw = params[f"{prefix}.qweight"]
        s = params[f"{prefix}.scales"]
        is_w4 = qw.shape[1] * 2 == s.shape[1]
        return quant_matmul_pallas(x, qw, s, w4=is_w4)
    w = dequantize(params, prefix)
    return jnp.dot(x, w.astype(x.dtype))
