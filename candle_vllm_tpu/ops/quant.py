"""Weight quantization: formats, quantize/pack helpers, jnp reference.

Replaces the reference's quantized linear zoo
(``/root/reference/src/openai/models/linear.rs`` LinearX: GPTQ / AWQ /
Marlin / GGUF / FP8) with TPU-native formats:

- ``w4a16``: 4-bit weights, per-(group, col) bf16 scales (+ optional
  scaled zero-points for asymmetric checkpoints).  Nibbles are packed two
  per int8 byte in a *per-tile concat-halves* layout: within each
  ``TO``-wide column tile, byte column ``j`` holds output column ``j`` in
  its low nibble and column ``j + TO/2`` in its high nibble — so the
  kernel unpacks with pure float math and a lane-contiguous concat, no
  interleave relayout.  On-device the packed bytes are stored
  TILE-CONTIGUOUS: ``[OUT/TO, IN, TO/2]`` so each kernel grid step reads
  one contiguous HBM block (916 vs 451 GB/s measured — the Marlin-repack
  analogue; see ops/pallas/quant_matmul.py).
- ``int8``: 8-bit weights, per-(group, col) scales, same tiled layout
  ``[OUT/TO, IN, TO]``.
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

QTILE_OUT = 256          # minimum out-tile width (packing alignment gate)
DEFAULT_GROUP = 128


def pick_tile_out(n_out: int) -> int:
    """Kernel out-tile width for a tensor: widest tile dividing OUT.
    TO=1024 measured fastest on the full 8B decode step (130.7 vs 122.3
    tok/s at TO=512; /tmp tile A/B 2026-08-17); CVT_TILE_OUT overrides
    for tuning sweeps."""
    import os

    want = int(os.environ.get("CVT_TILE_OUT", "1024"))
    while want > 256 and n_out % want:
        want //= 2
    return want if n_out % want == 0 else 256


def pad_vocab_out(n_out: int) -> int:
    """lm_head column padding to a TILE_OUT-divisible width.

    An unpadded 128256 vocab forces 256-wide kernel out-tiles — ~500
    serial grid steps whose fixed per-step cost adds ~15% to the lm_head
    stream (measured 705 us vs the 592 us byte roofline, prof_r3 r4).
    Padding to the preferred tile costs <=2.5% extra zero-scale columns;
    ``LlamaModel.forward`` slices logits back to vocab_size."""
    import os

    to = pick_tile_out(n_out)
    want = int(os.environ.get("CVT_TILE_OUT", "1024"))
    if to >= want:
        return n_out
    # 8*want granularity keeps the tile count divisible under TP<=8
    # (tiles are the column-shard unit, parallel/sharding.py)
    padded = -(-n_out // (8 * want)) * (8 * want)
    if (padded - n_out) / n_out > 0.025:
        return n_out
    return padded


Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def pack_int4(q: np.ndarray, tile_out: int = QTILE_OUT) -> np.ndarray:
    """[in, out] int4 values (as int8 in [-8, 7]) -> [in, out/2] packed
    int8 in per-tile concat-halves layout.

    Nibble convention (chosen so the kernel unpacks with ONE int8->bf16
    convert plus two float ops — Mosaic has no int8 vector shifts):
    the HIGH nibble holds its value in signed two's complement, the LOW
    nibble biased by +8 (unsigned [0,15]).  Interpreting the byte b as a
    signed float: hi = floor(b/16) recovers the signed high value and
    lo = b - 16*hi the biased low value; the -8 bias folds into the
    matmul via the group's activation row-sum."""
    n_in, n_out = q.shape
    assert n_out % tile_out == 0, (n_out, tile_out)
    half = tile_out // 2
    t = q.reshape(n_in, n_out // tile_out, 2, half)
    lo = (t[:, :, 0, :].astype(np.int16) + 8).astype(np.uint8)   # [0,15]
    hi = (t[:, :, 1, :].astype(np.int8) & 0xF).astype(np.uint8)  # signed bits
    packed = (lo | (hi << 4)).astype(np.uint8).view(np.int8)
    return np.ascontiguousarray(packed.reshape(n_in, n_out // 2))


def unpack_int4(packed: np.ndarray, tile_out: int = QTILE_OUT) -> np.ndarray:
    """Inverse of pack_int4 / tile_packed_w4 (host-side, for tests);
    accepts flat [in, out/2] or tiled [out/TO, in, TO/2]; returns signed
    q as [in, out]."""
    if packed.ndim == 3:
        n_tiles, n_in, half = packed.shape
        p = packed.transpose(1, 0, 2)  # [in, tiles, half]
    else:
        n_in, half_out = packed.shape
        n_out = half_out * 2
        half = tile_out // 2
        p = packed.reshape(n_in, n_out // tile_out, half)
    lo = (p.view(np.uint8) & 0xF).astype(np.int8) - 8
    hi = (p.astype(np.int8) >> 4).astype(np.int8)  # arithmetic: signed
    t = np.stack([lo, hi], axis=2)  # [in, tiles, 2, half]
    return t.reshape(n_in, -1)


def tile_packed_w4(flat: np.ndarray, tile_out: int) -> np.ndarray:
    """Flat-packed [in, out/2] -> tile-contiguous [out/TO, in, TO/2]
    (the on-device layout; one contiguous DMA per kernel grid step)."""
    n_in, half_out = flat.shape
    half = tile_out // 2
    return np.ascontiguousarray(
        flat.reshape(n_in, half_out // half, half).transpose(1, 0, 2)
    )


def tile_int8(q: np.ndarray, tile_out: int) -> np.ndarray:
    """[in, out] int8 -> tile-contiguous [out/TO, in, TO]."""
    n_in, n_out = q.shape
    return np.ascontiguousarray(
        q.reshape(n_in, n_out // tile_out, tile_out).transpose(1, 0, 2)
    )


# ---------------------------------------------------------------------------
# quantization (ISQ at load; reference: linear.rs from_linear_x)
# ---------------------------------------------------------------------------


def quantize_w4a16(
    w: np.ndarray, group_size: int = DEFAULT_GROUP,
    tile_out: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-(group,col) int4. w: [in, out] float. Returns
    (packed [out/TO, in, TO/2] int8 tile-contiguous, scales [in/g, out]
    float32).  ``tile_out`` narrows the out-tile (TP-sharded banks want
    n_tiles % tp == 0; tiles are contiguous OUT spans)."""
    n_in, n_out = w.shape
    assert n_in % group_size == 0, (n_in, group_size)
    wg = w.astype(np.float32).reshape(n_in // group_size, group_size, n_out)
    scale = np.abs(wg).max(axis=1) / 7.0  # [in/g, out]
    scale = np.maximum(scale, 1e-8)
    q = np.rint(wg / scale[:, None, :]).clip(-8, 7).astype(np.int8)
    to = tile_out if tile_out and n_out % tile_out == 0 else pick_tile_out(n_out)
    return tile_packed_w4(pack_int4(q.reshape(n_in, n_out), to), to), scale


def quantize_int8(
    w: np.ndarray, group_size: int = DEFAULT_GROUP
) -> Tuple[np.ndarray, np.ndarray]:
    n_in, n_out = w.shape
    wg = w.astype(np.float32).reshape(n_in // group_size, group_size, n_out)
    scale = np.abs(wg).max(axis=1) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.rint(wg / scale[:, None, :]).clip(-127, 127).astype(np.int8)
    return tile_int8(q.reshape(n_in, n_out), pick_tile_out(n_out)), scale


def merge_fused_projections(params: Params) -> Params:
    """Concatenate q/k/v -> qkv_proj and gate/up -> gate_up_proj so each
    becomes ONE fused dequant+matmul launch (reference packs qkv the same
    way, attention.rs:193-357).  Only valid single-shard: merged tensors
    cannot be column-sharded evenly across TP."""
    out = dict(params)
    prefixes = {
        n[: -len(".q_proj.weight")]
        for n in params
        if n.endswith(".q_proj.weight")
    }
    for p in prefixes:
        names = [f"{p}.{t}_proj.weight" for t in ("q", "k", "v")]
        if all(n in out for n in names) and not any(
            f"{p}.{t}_proj.bias" in out for t in ("q", "k", "v")
        ):
            out[f"{p}.qkv_proj.weight"] = jnp.concatenate(
                [out.pop(n) for n in names], axis=1
            )
    mlp_prefixes = {
        n[: -len(".gate_proj.weight")]
        for n in params
        if n.endswith(".gate_proj.weight") and n.count("experts") == 0
    }
    for p in mlp_prefixes:
        names = [f"{p}.gate_proj.weight", f"{p}.up_proj.weight"]
        if all(n in out for n in names):
            out[f"{p}.gate_up_proj.weight"] = jnp.concatenate(
                [out.pop(n) for n in names], axis=1
            )
    return out


def quantize_params(
    params: Params,
    method: str = "w4a16",
    group_size: int = DEFAULT_GROUP,
    keep_regex: str = r"(embed_tokens|norm|\.bias$|\.visual\.)",
    lm_head_method: Optional[str] = None,
    merge_fused: bool = False,
    moe_fuse_gate_up: bool = True,
) -> Params:
    """In-situ quantization of a loaded bf16 param dict (reference ISQ,
    linear.rs:from_linear_x).  Embeddings / norms stay bf16; the lm_head
    (streamed every decode step) defaults to int8 — the reference's GGUF
    models similarly keep output.weight at a higher bit width (q6k)."""
    import os
    import re

    if lm_head_method is None:
        lm_head_method = os.environ.get("CVT_LM_HEAD", "w4a16")
    if merge_fused:
        params = merge_fused_projections(params)
    # 3D expert banks quantize separately (2D tensor loop below skips them)
    if any(".experts." in n for n in params):
        params = quantize_moe_banks(params, fuse_gate_up=moe_fuse_gate_up)
    keep = re.compile(keep_regex)
    out: Params = {}
    for name, arr in params.items():
        tensor_method = method
        if "lm_head" in name:
            if lm_head_method is None:
                out[name] = arr
                continue
            tensor_method = lm_head_method
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
        if "lm_head" in name:
            padded = pad_vocab_out(w.shape[1])
            if padded != w.shape[1]:
                w = np.pad(w, ((0, 0), (0, padded - w.shape[1])))
        prefix = name[: -len(".weight")]
        if tensor_method == "w4a16":
            qw, s = quantize_w4a16(w, group_size)
        elif tensor_method == "int8":
            qw, s = quantize_int8(w, group_size)
        else:
            raise ValueError(f"unknown quant method {tensor_method}")
        out[f"{prefix}.qweight"] = jnp.asarray(qw)
        out[f"{prefix}.scales"] = jnp.asarray(s, jnp.bfloat16)
    return out


def quantize_tensor_np(
    name: str,
    w: np.ndarray,
    method: str = "w4a16",
    group_size: int = DEFAULT_GROUP,
    keep_regex: str = r"(embed_tokens|norm|\.bias$|\.visual\.)",
    lm_head_method: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Streaming per-tensor quantization (host-side numpy) — lets an 8B+
    model quantize at load without ever materializing the bf16 weights on
    device.  Returns {suffix: array} to merge under the tensor's prefix,
    or {} when the tensor should stay unquantized."""
    import os
    import re

    if lm_head_method is None:
        lm_head_method = os.environ.get("CVT_LM_HEAD", "w4a16")
    tensor_method = method
    if "lm_head" in name:
        if lm_head_method is None:
            return {}
        tensor_method = lm_head_method
    if (
        not name.endswith(".weight")
        or re.search(keep_regex, name)
        or w.ndim != 2
        or w.shape[0] % group_size
        or w.shape[1] % QTILE_OUT
    ):
        return {}
    w = w.astype(np.float32)
    if "lm_head" in name:
        padded = pad_vocab_out(w.shape[1])
        if padded != w.shape[1]:
            w = np.pad(w, ((0, 0), (0, padded - w.shape[1])))
    if tensor_method == "w4a16":
        qw, s = quantize_w4a16(w, group_size)
    elif tensor_method == "int8":
        qw, s = quantize_int8(w, group_size)
    else:
        raise ValueError(f"unknown quant method {tensor_method}")
    return {"qweight": qw, "scales": s.astype(np.float32)}


def random_quantized_params(model, method: str, key) -> Params:
    """Random quantized weights built directly on device (benches and
    --dummy-model --isq; a full-precision detour would blow HBM/host RAM
    on 8B+ models).  Merges qkv / gate_up into single fused tensors."""
    c = model.config
    shapes = dict(model.param_shapes())
    merged: Dict[str, tuple] = {}
    skip = set()
    for name, shape in shapes.items():
        if name.endswith(".q_proj.weight") and not any(
            f"{name[: -len('.q_proj.weight')]}.{t}_proj.bias" in shapes
            for t in ("q", "k", "v")
        ):
            p = name[: -len(".q_proj.weight")]
            kd = shapes[f"{p}.k_proj.weight"][1]
            merged[f"{p}.qkv_proj.weight"] = (shape[0], shape[1] + 2 * kd)
            skip |= {f"{p}.{t}_proj.weight" for t in ("q", "k", "v")}
        elif name.endswith(".gate_proj.weight") and "experts" not in name:
            p = name[: -len(".gate_proj.weight")]
            merged[f"{p}.gate_up_proj.weight"] = (shape[0], shape[1] * 2)
            skip |= {f"{p}.gate_proj.weight", f"{p}.up_proj.weight"}
    shapes = {n: s for n, s in shapes.items() if n not in skip}
    shapes.update(merged)

    def init(key):
        params: Params = {}
        for idx, (name, shape) in enumerate(shapes.items()):
            k = jax.random.fold_in(key, idx)
            if name.endswith("norm.weight"):
                params[name] = jnp.ones(shape, c.dtype)
            elif name.endswith(".bias"):
                params[name] = jnp.zeros(shape, c.dtype)
            elif (
                len(shape) == 2
                and "embed_tokens" not in name
                and shape[0] % DEFAULT_GROUP == 0
                and shape[1] % QTILE_OUT == 0
            ):
                prefix = name[: -len(".weight")]
                # lm_head defaults to w4a16 on padded-vocab tiles (it is
                # streamed every decode step: w4 measured +4.0 tok/s over
                # int8 at 1024-wide tiles, r4b E13; marginal quality KL
                # 0.0093 vs 0.0081 passes the tools/quant_quality.py
                # gate) — CVT_LM_HEAD=int8 restores the higher-bit head
                import os

                lm_w4 = os.environ.get("CVT_LM_HEAD", "w4a16") == "w4a16"
                is_lm_head = "lm_head" in name and not lm_w4
                n_out = shape[1]
                if "lm_head" in name:
                    n_out = pad_vocab_out(n_out)
                to = pick_tile_out(n_out)
                cols = to if is_lm_head else to // 2  # int8 | w4 packed
                params[f"{prefix}.qweight"] = jax.random.randint(
                    k, (n_out // to, shape[0], cols), -128, 128, jnp.int8
                )
                params[f"{prefix}.scales"] = jnp.full(
                    (shape[0] // DEFAULT_GROUP, n_out),
                    0.4 / (shape[0] ** 0.5),
                    jnp.bfloat16,
                )
            else:
                std = 0.4 / (shape[0] ** 0.5)
                params[name] = (
                    jax.random.normal(k, shape, jnp.float32) * std
                ).astype(c.dtype)
        return params

    return jax.jit(init)(key)


# ---------------------------------------------------------------------------
# checkpoint conversion (reference: convert_marlin.py / gptq_repack,
# backend/gptq.rs — GPTQ/AWQ int32-packed checkpoints -> our layout)
# ---------------------------------------------------------------------------


def _unpack_gptq_qweight(qweight: np.ndarray) -> np.ndarray:
    """GPTQ packs 8 sequential 4-bit rows per int32 along IN.
    [in/8, out] i32 -> [in, out] uint8 in [0,15]."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    w = (qweight[:, None, :].view(np.uint32) >> shifts[None, :, None]) & 0xF
    return w.reshape(-1, qweight.shape[1]).astype(np.uint8)


def _unpack_awq_qweight(qweight: np.ndarray) -> np.ndarray:
    """AWQ packs 8 4-bit cols per int32 along OUT; packed position k of a
    word carries logical column [0,2,4,6,1,3,5,7][k].
    [in, out/8] i32 -> [in, out] uint8."""
    order = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    shifts = (np.arange(8, dtype=np.uint32) * 4)
    w = (qweight[:, :, None].view(np.uint32) >> shifts[None, None, :]) & 0xF
    cols = np.empty((qweight.shape[0], qweight.shape[1] * 8), np.uint8)
    for k in range(8):
        cols[:, order[k]::8] = w[:, :, k].astype(np.uint8)
    return cols


def _unpack_int32_zeros(qzeros: np.ndarray, awq: bool) -> np.ndarray:
    """[groups, out/8] i32 -> [groups, out] uint8 zero points."""
    if awq:
        return _unpack_awq_qweight(qzeros)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    z = (qzeros[:, :, None].view(np.uint32) >> shifts[None, None, :]) & 0xF
    return z.reshape(qzeros.shape[0], -1).astype(np.uint8)


def convert_gptq_tensor(
    qweight: np.ndarray,   # [in/8, out] int32
    qzeros: np.ndarray,    # [in/g, out/8] int32
    scales: np.ndarray,    # [in/g, out] f16
    awq: bool = False,
    gptq_zero_plus_one: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (packed qweight [out/TO, in, TO/2] int8 tile-contiguous,
    scales f32, zoffs f32) in our layout: w = (nibble - 8) * s - zoff."""
    if awq:
        q = _unpack_awq_qweight(qweight)
    else:
        q = _unpack_gptq_qweight(qweight)
    z = _unpack_int32_zeros(qzeros, awq).astype(np.int16)
    if gptq_zero_plus_one and not awq:
        # classic GPTQ stores z-1
        z = z + 1
    s = scales.astype(np.float32)
    signed = q.astype(np.int16) - 8  # our nibble convention
    to = pick_tile_out(q.shape[1])
    packed = tile_packed_w4(
        pack_int4(signed.astype(np.int8).clip(-8, 7), to), to
    )
    zoff = (z.astype(np.float32) - 8.0) * s
    return packed, s, zoff


# ---------------------------------------------------------------------------
# FP8 / FP4 checkpoint formats (reference: linear.rs LnFp8 920+, LnMxfp4
# 1678, LnNvfp4 1760).  TPU-native design: these formats are *checkpoint*
# encodings; at load we decode them exactly and re-encode into the two
# kernel formats the MXU path actually runs (int8 or int4 + per-group
# scales) — the analogue of the reference's in-situ Marlin repack
# (backend/gptq.rs gptq_repack/awq_repack), which likewise rewrites
# checkpoint bits into the kernel's native layout at load.
# ---------------------------------------------------------------------------


def fp8_e4m3_to_float(bits: np.ndarray) -> np.ndarray:
    """Decode float8_e4m3fn raw bits (uint8) -> float32 (exact)."""
    u = bits.astype(np.uint16)
    s = (u >> 7) & 1
    e = ((u >> 3) & 0xF).astype(np.int32)
    m = (u & 7).astype(np.float32)
    mag = np.where(
        e > 0,
        np.ldexp(1.0 + m / 8.0, e - 7),
        np.ldexp(m / 8.0, -6),
    ).astype(np.float32)
    mag = np.where((e == 15) & (m == 7), np.float32(np.nan), mag)
    return np.where(s == 1, -mag, mag).astype(np.float32)


def fp4_e2m1_to_float(nibbles: np.ndarray) -> np.ndarray:
    """Decode e2m1 nibbles (uint8 in [0,15]) -> float32.
    Values: ±{0, .5, 1, 1.5, 2, 3, 4, 6}."""
    n = nibbles.astype(np.uint8)
    s = (n >> 3) & 1
    e = ((n >> 1) & 3).astype(np.int32)
    m = (n & 1).astype(np.float32)
    mag = np.where(e == 0, 0.5 * m, np.ldexp(1.0 + 0.5 * m, e - 1))
    return np.where(s == 1, -mag, mag).astype(np.float32)


def e8m0_to_float(bits: np.ndarray) -> np.ndarray:
    """Decode e8m0 block-scale bits (uint8) -> 2^(u-127)."""
    return np.ldexp(np.float32(1.0), bits.astype(np.int32) - 127)


def unpack_fp4_bytes(packed: np.ndarray) -> np.ndarray:
    """[..., n/2] uint8 -> [..., n] e2m1 nibbles, LOW nibble first."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return np.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def dequant_fp8_blockwise(
    w_bits: np.ndarray,      # [out, in] uint8 (e4m3 raw bits)
    scale_inv: np.ndarray,   # [ceil(out/bn), ceil(in/bk)] float
    block: Tuple[int, int] = (128, 128),
) -> np.ndarray:
    """Blockwise-FP8 weight (DeepSeek-V3 / compressed-tensors
    ``weight_scale_inv`` convention) -> float32 [out, in].

    Also accepts the other compressed-tensors scale strategies: scalar
    (per-tensor) and [out] / [out, 1] (per-channel) — standard FP8
    checkpoints ship those shapes (reference normalizes the same
    strategies, linear.rs LnFp8)."""
    bn, bk = block
    n, k = w_bits.shape
    w = fp8_e4m3_to_float(w_bits)
    s = np.asarray(scale_inv, np.float32)
    if s.size == 1:                      # per-tensor scalar
        return w * float(s.reshape(-1)[0])
    if s.ndim == 1 and s.shape[0] == n:  # per-channel [out]
        return w * s[:, None]
    if s.ndim == 2 and s.shape == (n, 1):  # per-channel [out, 1]
        return w * s
    srows = np.repeat(s, bn, axis=0)[:n]
    out = np.repeat(srows, bk, axis=1)[:, :k]
    return w * out


def dequant_nvfp4(
    packed: np.ndarray,       # [out, in/2] uint8 (two e2m1, low first)
    block_scales: np.ndarray, # [out, in/16] uint8 e4m3 bits (or float)
    global_scale: float = 1.0,
) -> np.ndarray:
    """NVFP4: e2m1 values, fp8-e4m3 scale per 16-elem block along IN,
    one global f32 scale -> float32 [out, in]."""
    w = fp4_e2m1_to_float(unpack_fp4_bytes(packed))
    if block_scales.dtype == np.uint8:
        bs = fp8_e4m3_to_float(block_scales)
    else:
        bs = block_scales.astype(np.float32)
    s = np.repeat(bs, 16, axis=1)[:, : w.shape[1]]
    return w * s * np.float32(global_scale)


def dequant_mxfp4(
    blocks: np.ndarray,   # [out, in/32, 16] or [out, in/2] uint8
    scales: np.ndarray,   # [out, in/32] uint8 e8m0 bits
) -> np.ndarray:
    """MXFP4: e2m1 values in 32-element blocks along IN with a shared
    e8m0 scale -> float32 [out, in]."""
    if blocks.ndim == 3:
        blocks = blocks.reshape(blocks.shape[0], -1)
    w = fp4_e2m1_to_float(unpack_fp4_bytes(blocks))
    s = np.repeat(e8m0_to_float(scales), 32, axis=1)[:, : w.shape[1]]
    return w * s


# ---------------------------------------------------------------------------
# MoE expert banks (reference: FusedMoeISQ / moe_gemm_gguf, moe.rs:483+ —
# experts stay quantized in HBM and only the routed experts stream)
# ---------------------------------------------------------------------------


def quantize_expert_bank(
    bank: np.ndarray, group_size: int = DEFAULT_GROUP,
    tile_out: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """[E, in, out] float -> (qweight [E, n_tiles, in, TO/2] int8
    tile-contiguous per expert, scales [E, in/g, out] f32)."""
    qws, ss = [], []
    for e in range(bank.shape[0]):
        qw, s = quantize_w4a16(
            np.asarray(bank[e], np.float32), group_size, tile_out=tile_out
        )
        qws.append(qw)
        ss.append(s)
    return np.stack(qws), np.stack(ss)


def quantize_moe_banks(params: Params, fuse_gate_up: bool = True) -> Params:
    """Quantize 3D expert banks in a loaded param dict to W4.  Gate/up
    merge into one gate_up bank by default; under TP pass
    ``fuse_gate_up=False`` — separate banks column-shard scale-aligned
    (the reference's MergedParallelColumnLinear per-chunk split,
    distributed.rs:252-535, achieved here by not merging at all).  Banks
    whose dims don't meet the packing gates stay bf16."""
    out = dict(params)
    prefixes = {
        n[: -len(".experts.gate_proj")]
        for n in params
        if n.endswith(".experts.gate_proj")
    } | {
        n[: -len(".experts.gate_up_proj")]
        for n in params
        if n.endswith(".experts.gate_up_proj")
    }
    for p in sorted(prefixes):
        gu = out.get(f"{p}.experts.gate_up_proj")
        g = out.get(f"{p}.experts.gate_proj")
        u = out.get(f"{p}.experts.up_proj")
        if gu is None:
            if g is None or u is None:
                continue
            gu = jnp.concatenate([g, u], axis=2)
        elif not fuse_gate_up:
            # checkpoint ships fused (llama4): split for TP sharding
            inter = gu.shape[2] // 2
            g, u = gu[..., :inter], gu[..., inter:]
        dn = out.get(f"{p}.experts.down_proj")
        if dn is None:
            continue
        if (
            gu.shape[1] % DEFAULT_GROUP or gu.shape[2] % (2 * QTILE_OUT)
            or dn.shape[1] % DEFAULT_GROUP or dn.shape[2] % QTILE_OUT
        ):
            continue
        dn_np = np.asarray(jax.device_get(dn), np.float32)
        if fuse_gate_up:
            gu_np = np.asarray(jax.device_get(gu), np.float32)
            qw, s = quantize_expert_bank(gu_np)
            out[f"{p}.experts.gate_up_proj.qweight"] = jnp.asarray(qw)
            out[f"{p}.experts.gate_up_proj.scales"] = jnp.asarray(
                s, jnp.bfloat16
            )
        else:
            # narrow 256-wide tiles so n_tiles % tp == 0 for common
            # intermediate sizes (tiles are the TP shard unit)
            for t, bank in (("gate_proj", g), ("up_proj", u)):
                qw, s = quantize_expert_bank(
                    np.asarray(jax.device_get(bank), np.float32),
                    tile_out=256,
                )
                out[f"{p}.experts.{t}.qweight"] = jnp.asarray(qw)
                out[f"{p}.experts.{t}.scales"] = jnp.asarray(s, jnp.bfloat16)
        qw, s = quantize_expert_bank(
            dn_np, tile_out=256 if not fuse_gate_up else None
        )
        out[f"{p}.experts.down_proj.qweight"] = jnp.asarray(qw)
        out[f"{p}.experts.down_proj.scales"] = jnp.asarray(s, jnp.bfloat16)
        for n in (f"{p}.experts.gate_proj", f"{p}.experts.up_proj",
                  f"{p}.experts.down_proj", f"{p}.experts.gate_up_proj"):
            out.pop(n, None)
    return out


def offload_expert_banks(
    params: Params, n_offload: int, mesh=None
) -> Params:
    """Move the LAST ``n_offload`` experts of every quantized expert bank
    into pinned host memory (keys gain an ``_offload`` suffix).  The MoE
    forward DMAs only the routed offloaded experts' W4 tiles to HBM
    inside the jitted step — the TPU-native analogue of the reference's
    ``num_experts_offload_per_rank`` on-demand expert reload
    (models/mod.rs:445, linear.rs:110-116).  Serves MoE checkpoints whose
    expert bytes exceed HBM.

    Under a ``mesh`` with tp>1 each host bank is placed with the SAME
    tp PartitionSpec as its resident twin (reference: per-rank offload —
    each rank hosts only its shard), so the per-expert host->HBM DMA
    moves 1/tp of the tiles per device.  Banks whose sharded dim does not
    divide tp stay replicated on host (mirroring ShardingPlan.apply's
    all-or-none per-layer gate, which models/moe.py re-derives).

    Requires separate (unfused) quantized banks — quantize with
    ``moe_fuse_gate_up=False``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.sharding import SingleDeviceSharding

    if n_offload <= 0:
        return params
    tp = mesh.shape.get("tp", 1) if mesh is not None else 1

    # all-or-none per layer (same gate as ShardingPlan.apply and
    # models/moe.py): one non-divisible bank drops the whole layer's
    # host banks to replicated
    layer_ok: Dict[str, bool] = {}
    if mesh is not None and tp > 1:
        from candle_vllm_tpu.parallel.sharding import param_spec

        for name, arr in params.items():
            if not (".experts." in name
                    and name.endswith((".qweight", ".scales"))):
                continue
            layer = name.split(".experts.")[0]
            spec = param_spec(name)
            ok = all(
                arr.shape[d] % tp == 0
                for d, axes in enumerate(spec)
                if axes is not None
            )
            layer_ok[layer] = layer_ok.get(layer, True) and ok

    def host_sharding(name, arr):
        if mesh is None:
            return SingleDeviceSharding(
                jax.devices()[0], memory_kind="pinned_host"
            )
        spec = P()
        if tp > 1 and layer_ok.get(name.split(".experts.")[0], False):
            from candle_vllm_tpu.parallel.sharding import param_spec

            spec = param_spec(name)
        return NamedSharding(mesh, spec, memory_kind="pinned_host")

    out = dict(params)
    for name in list(params):
        if not (".experts." in name
                and name.endswith((".qweight", ".scales"))):
            continue
        if ".gate_up_proj." in name:
            raise ValueError(
                "expert offload needs separate gate/up banks; quantize "
                "with moe_fuse_gate_up=False"
            )
        arr = out.pop(name)
        E = arr.shape[0]
        assert n_offload < E, (
            f"num_experts_offload={n_offload} must be < num_experts={E}"
        )
        out[name] = arr[: E - n_offload]
        out[name + "_offload"] = jax.device_put(
            arr[E - n_offload:], host_sharding(name, arr)
        )
    return out


# rows at/below this run the selected-expert Pallas kernel; above it the
# expert-chunked dequant path wins (prefill is MXU-bound)
MOE_KERNEL_MAX_ROWS = 256


def grouped_quant_matmul(
    x_sorted: jnp.ndarray,     # [R, IN] rows sorted by expert
    qweight: jnp.ndarray,      # [E, n_tiles, IN, TO/2] int8
    scales: jnp.ndarray,       # [E, IN/g, OUT]
    group_sizes: jnp.ndarray,  # [E] i32
) -> jnp.ndarray:
    """Grouped GEMM over per-expert W4 banks (ragged_dot's quantized
    twin).  Decode-sized batches stream only the routed experts via the
    Pallas kernel; larger batches dequant expert CHUNKS transiently and
    reuse ragged_dot (full-R masked dots per chunk — fine where the MXU
    dominates)."""
    R, IN = x_sorted.shape
    E = qweight.shape[0]
    OUT = scales.shape[2]
    if R <= MOE_KERNEL_MAX_ROWS:
        from candle_vllm_tpu.ops.pallas.moe_quant_matmul import (
            moe_quant_matmul_pallas,
        )

        return moe_quant_matmul_pallas(
            x_sorted.astype(jnp.bfloat16), qweight, scales, group_sizes
        )
    from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp

    EC = max(1, min(16, E))
    csum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )
    xs_pad = jnp.pad(x_sorted, ((0, R), (0, 0)))
    out = jnp.zeros((R, OUT), jnp.float32)
    dequant_e = jax.vmap(lambda q, s: dequant_w4_jnp(q, s))
    for e0 in range(0, E, EC):
        ec = min(EC, E - e0)
        w_chunk = dequant_e(
            qweight[e0: e0 + ec], scales[e0: e0 + ec]
        ).astype(x_sorted.dtype)                      # [ec, IN, OUT]
        # +1 dummy expert absorbs the tail rows beyond this chunk
        w_chunk = jnp.concatenate(
            [w_chunk, jnp.zeros((1, IN, OUT), x_sorted.dtype)], axis=0
        )
        start = csum[e0]
        cnt = csum[e0 + ec] - start
        xs_c = jax.lax.dynamic_slice(xs_pad, (start, 0), (R, IN))
        gs_c = jnp.concatenate(
            [group_sizes[e0: e0 + ec].astype(jnp.int32),
             (R - cnt).astype(jnp.int32)[None]]
        )
        y_c = jax.lax.ragged_dot(xs_c, w_chunk, gs_c)  # [R, OUT]
        rows = start + jnp.arange(R, dtype=jnp.int32)
        keep = jnp.arange(R, dtype=jnp.int32) < cnt
        out = out.at[jnp.where(keep, rows, jnp.int32(1 << 30))].add(
            jnp.where(keep[:, None], y_c.astype(jnp.float32), 0.0),
            mode="drop",
        )
    return out.astype(x_sorted.dtype)


# ---------------------------------------------------------------------------
# matmul dispatch
# ---------------------------------------------------------------------------


def _is_w4(qw: jnp.ndarray, scales: jnp.ndarray) -> bool:
    """Tiled qweight [tiles, in, c]: w4 iff tiles*c*2 == OUT."""
    return qw.shape[0] * qw.shape[2] * 2 == scales.shape[1]


def dequantize(params: Params, prefix: str) -> jnp.ndarray:
    """jnp reference dequant -> [in, out] f32 (CPU oracle path)."""
    from candle_vllm_tpu.ops.pallas.quant_matmul import (
        dequant_int8_jnp, dequant_w4_jnp,
    )

    qw = params[f"{prefix}.qweight"]
    s = params[f"{prefix}.scales"]
    z = params.get(f"{prefix}.qzeros")
    if _is_w4(qw, s):
        return dequant_w4_jnp(qw, s, z)
    w = dequant_int8_jnp(qw, s)
    if z is not None:
        g = qw.shape[1] // s.shape[0]
        w = w - jnp.repeat(z.astype(jnp.float32), g, axis=0)
    return w


def quantized_matmul(
    x: jnp.ndarray, params: Params, prefix: str,
    norm_w: Optional[jnp.ndarray] = None, norm_eps: float = 1e-6,
    residual: Optional[jnp.ndarray] = None,
    rope_cs: Optional[tuple] = None,
) -> jnp.ndarray:
    """x @ dequant(W): Pallas fused kernel on TPU, jnp dequant elsewhere.

    ``norm_w``/``residual``/``rope_cs`` fuse the RMSNorm prologue /
    residual-add epilogue / full-width rope rotation INTO the decode
    kernel — the inter-op XLA glue (one fusion launch + activation
    round-trip each, apply_rope alone 23 us/layer) measured ~46 us/layer
    of the decode step (tools/abl_r4c.py)."""
    if jax.default_backend() == "tpu":
        from candle_vllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

        qw = params[f"{prefix}.qweight"]
        s = params[f"{prefix}.scales"]
        return quant_matmul_pallas(
            x, qw, s, params.get(f"{prefix}.qzeros"), w4=_is_w4(qw, s),
            norm_w=norm_w, norm_eps=norm_eps, residual=residual,
            rope_cs=rope_cs,
        )
    if norm_w is not None:
        from candle_vllm_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_w, norm_eps)
    w = dequantize(params, prefix)
    y = jnp.dot(x, w.astype(x.dtype))
    if rope_cs is not None:
        from candle_vllm_tpu.ops.pallas.quant_matmul import _rope_full_jnp

        y = _rope_full_jnp(y, rope_cs[0], rope_cs[1])
    if residual is not None:
        y = (y.astype(jnp.float32)
             + residual.astype(jnp.float32)).astype(y.dtype)
    return y
