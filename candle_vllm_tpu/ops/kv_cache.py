"""Paged KV cache device ops: slot writes, block copy (COW), host swap.

Replaces the reference's native cache kernels
(``concat_and_cache`` in attention-rs, ``copy_blocks_*`` / ``swap_blocks``
in ``/root/reference/src/backend/cache.rs:14-258``) with XLA scatters —
which compile to in-place dynamic-update ops when the cache buffer is
donated to the jitted step.

Layout: one fused page array per layer,

    kv_pages[layer] : [num_pages, page_size, 2 * num_kv_heads, head_dim]

with K and V *interleaved per head* along the combined dim:
``[..., 2*h, :]`` is K of head h and ``[..., 2*h+1, :]`` is V of head h.
Fusing K and V into one array halves the number of page DMAs in the
attention kernel; interleaving (rather than concatenating all K then all
V) keeps the combined dim shardable across tensor-parallel devices — a
contiguous slice of it is a set of whole (K,V) head pairs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

# Padding rows use a slot far past the cache end; scatter mode="drop"
# discards them without branching.
INVALID_SLOT = jnp.iinfo(jnp.int32).max // 2


def allocate_kv_pages(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    sharding=None,
    pad_head_dim_to: int = 1,
    pad_planes_to: int = 1,
    kv_shared: bool = False,
) -> List[jnp.ndarray]:
    """``pad_head_dim_to=128`` pads the lane dim up to the TPU tile width —
    required by the Pallas attention kernel's page DMA (Mosaic cannot slice
    sub-tile lane extents); ``pad_planes_to`` similarly pads the K/V plane
    dim up to the dtype's second-minor tiling minimum (4 for int8 pages,
    8 for f32 scales — Mosaic rejects smaller DMA extents).  Write/attend
    ops pad/slice transparently.  ``kv_shared`` (MLA latent cache) stores
    ONE plane per head — k == v — halving bytes vs the generic layout."""
    head_dim = -(-head_dim // pad_head_dim_to) * pad_head_dim_to
    per_head = 1 if kv_shared else 2
    planes = -(-per_head * num_kv_heads // pad_planes_to) * pad_planes_to
    shape = (num_pages, page_size, planes, head_dim)
    out = []
    for _ in range(num_layers):
        arr = jnp.zeros(shape, dtype=dtype)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        out.append(arr)
    return out


def allocate_kv_pages_int4(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    sharding=None,
    pad_head_dim_to: int = 1,
    pad_planes_to: int = 1,
) -> List[jnp.ndarray]:
    """4-bit KV pages: K and V of head h share one byte plane
    ``[P, ps, K, D]`` int8 — K in the low nibble, V in the high nibble
    (TurboQuant-class compression, reference cache_engine.rs:401-518
    allocate_turboquant_layers; 4x the bf16 capacity).  Packing K with V
    (instead of adjacent lanes) keeps the lane dim at the full tile width
    so page DMAs stay dense, and lets ``write_kv`` store both nibbles in
    one scatter with no read-modify-write."""
    head_dim = -(-head_dim // pad_head_dim_to) * pad_head_dim_to
    planes = -(-num_kv_heads // pad_planes_to) * pad_planes_to
    shape = (num_pages, page_size, planes, head_dim)
    out = []
    for _ in range(num_layers):
        arr = jnp.zeros(shape, dtype=jnp.int8)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        out.append(arr)
    return out


def turbo3_bytes(num_kv_heads: int, head_dim: int) -> int:
    """Packed bytes per (token, layer) for the turbo3 tier: 3-bit K
    (a 2-bit plane + a 1-bit plane) + 4-bit V nibbles."""
    kd = num_kv_heads * head_dim
    return kd // 4 + kd // 8 + kd // 2


def allocate_kv_pages_turbo3(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    sharding=None,
) -> List[jnp.ndarray]:
    """3-bit K + 4-bit V pages (the reference's maximum-compression
    TurboQuant tier, README.md:274 turbo3 ~4.7x; cache_engine.rs:401-518).

    TPU-native layout: ONE byte row per (token, layer) holding three
    128-lane-aligned segments —
      [0,        KD/4):   K low-2-bit plane, 4 strided codes per byte
                          (byte j bitfield t = code of value t*KD/4 + j)
      [KD/4,     3KD/8):  K bit-2 plane, 8 strided bits per byte
      [3KD/8, 3KD/8+KD/2): V nibbles in the w4 convention (lo biased +8,
                          hi signed; value v < KD/2 in lo of byte v)
    packed PLANE-MAJOR as pages [P, BYTES/128, ps, 128]: the page DMA's
    copy shape is then [planes, ps, 128] whose tiled (sublane, lane) dims
    are (ps, 128) — Mosaic's int8 tiling rejects a 7-wide second-minor
    dim, but a third-minor plane count is unconstrained.  ``write_kv``
    stores one token as ``planes`` disjoint 128-lane rows (no shared
    bytes, hence no read-modify-write).  Scales reuse the int8/int4
    per-(token, head) planes.  Requires K*D % 1024 == 0 and D % 128 == 0
    (the engine falls back to int4 otherwise; K*D % 1024 == 0 keeps
    every segment a whole number of planes).  Measured capacity:
    ~4.3x bf16 including f32 scales (vs int4's ~3.76x)."""
    kd = num_kv_heads * head_dim
    # the 1-bit plane is KD/8 bytes and must itself be a 128-lane multiple
    assert kd % 1024 == 0 and head_dim % 128 == 0, (
        "turbo3 needs K*D % 1024 == 0 and head_dim % 128 == 0"
    )
    nbytes = turbo3_bytes(num_kv_heads, head_dim)
    shape = (num_pages, nbytes // 128, page_size, 128)
    out = []
    for _ in range(num_layers):
        arr = jnp.zeros(shape, dtype=jnp.int8)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        out.append(arr)
    return out


def pack_turbo3_rows(
    k: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize + pack K (3-bit) / V (4-bit) token rows.

    k, v: [T, K, D] -> (packed [T, BYTES] int8, scales [T, 2K] f32).
    K grid: code = clip(round(k/s), -4, 3) + 4 with s = absmax/3.5;
    V grid: the int4 absmax/7 grid."""
    T, K, D = k.shape
    kd = K * D
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), -1) / 3.5, 1e-8)   # [T, K]
    sv = jnp.maximum(jnp.max(jnp.abs(vf), -1) / 7.0, 1e-8)
    code = (
        jnp.clip(jnp.round(kf / sk[..., None]), -4, 3) + 4
    ).astype(jnp.int32).reshape(T, kd)                        # [0, 7]
    qv = jnp.clip(jnp.round(vf / sv[..., None]), -8, 7).astype(
        jnp.int32
    ).reshape(T, kd)
    low2 = code % 4
    bit = code // 4
    q4 = kd // 4
    b2 = (
        low2[:, :q4] + 4 * low2[:, q4: 2 * q4]
        + 16 * low2[:, 2 * q4: 3 * q4] + 64 * low2[:, 3 * q4:]
    )
    e8 = kd // 8
    b1 = sum(
        bit[:, t * e8: (t + 1) * e8] * (1 << t) for t in range(8)
    )
    half = kd // 2
    bv = qv[:, half:] * 16 + (qv[:, :half] + 8)
    packed = jnp.concatenate([b2, b1, bv], axis=1)
    # full-byte values in [0, 255] -> int8 bit pattern
    packed = jnp.where(packed > 127, packed - 256, packed).astype(jnp.int8)
    scales = jnp.stack([sk, sv], axis=2).reshape(T, 2 * K)
    return packed, scales


def unpack_turbo3_rows(
    packed: jnp.ndarray, num_kv_heads: int, head_dim: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_turbo3_rows on the INTEGER grids (scales applied
    by the caller): packed [..., BYTES] int8 -> (k_codes-4 [..., K*D],
    v_codes [..., K*D]) as f32 — shared by the jnp oracle and tests;
    the Pallas kernel inlines the same float math."""
    kd = num_kv_heads * head_dim
    q4, e8, half = kd // 4, kd // 8, kd // 2
    bf = packed.astype(jnp.float32)
    bf = jnp.where(bf < 0, bf + 256.0, bf)       # unsigned byte value
    b2 = bf[..., :q4]
    b1 = bf[..., q4: q4 + e8]
    bv = packed.astype(jnp.float32)[..., q4 + e8:]  # signed-hi nibble math
    e0 = b2 - 4.0 * jnp.floor(b2 / 4.0)
    e1 = jnp.floor(b2 / 4.0) - 4.0 * jnp.floor(b2 / 16.0)
    e2 = jnp.floor(b2 / 16.0) - 4.0 * jnp.floor(b2 / 64.0)
    e3 = jnp.floor(b2 / 64.0)
    low2 = jnp.concatenate([e0, e1, e2, e3], axis=-1)
    bits = [
        jnp.floor(b1 / (1 << t)) - 2.0 * jnp.floor(b1 / (1 << (t + 1)))
        for t in range(8)
    ]
    bit = jnp.concatenate(bits, axis=-1)
    kq = low2 + 4.0 * bit - 4.0
    v_hi = jnp.floor(bv / 16.0)
    v_lo = bv - 16.0 * v_hi - 8.0
    vq = jnp.concatenate([v_lo, v_hi], axis=-1)
    return kq, vq


def allocate_kv_scales(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    sharding=None,
    pad_planes_to: int = 1,
    kv_shared: bool = False,
) -> List[jnp.ndarray]:
    """Per-(token, head) dequant scales for a quantized KV cache.
    Layout [P, 2K, page_size] — scale rows are lane vectors the attention
    kernel broadcasts across score columns.  ``pad_planes_to=8`` meets the
    f32 second-minor tiling minimum for whole-plane DMA slices."""
    per_head = 1 if kv_shared else 2
    planes = -(-per_head * num_kv_heads // pad_planes_to) * pad_planes_to
    out = []
    for _ in range(num_layers):
        arr = jnp.ones((num_pages, planes, page_size), jnp.float32)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        out.append(arr)
    return out


def write_kv(
    kv_pages: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    kv_scales: Optional[jnp.ndarray] = None,
    kv4: bool = False,
    kv3: bool = False,
    kv_shared: bool = False,
) -> jnp.ndarray:
    """Scatter new K/V rows into their pages.

    kv_pages: [P, ps, 2K, D]; k, v: [T, K, D]; slot_mapping: [T] with
    slot = page_id * page_size + offset (INVALID_SLOT for padding).

    With a quantized cache (int8 pages + ``kv_scales`` [P, ps, 2K]),
    rows are scaled per (token, head) to absmax/127 — the TPU analogue of
    the reference's TurboQuant KV compression (cache_engine.rs:401-518).
    Returns (pages, scales) in that case.
    """
    page_size = kv_pages.shape[1]
    T, K, D = k.shape
    Dp = kv_pages.shape[3]
    page_idx = slot_mapping // page_size
    offset = slot_mapping % page_size
    if kv_shared:
        # MLA latent cache: one plane per head holds the shared k==v row
        # (pages [P, ps, K, D]); v is ignored by contract
        assert not kv4, "kv_shared + int4 packing not supported"
        if kv_scales is not None:
            kf = k.astype(jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(kf), -1) / 127.0, 1e-8)
            q8 = jnp.clip(jnp.round(kf / scale[..., None]), -127, 127
                          ).astype(jnp.int8)
            if Dp != D:
                q8 = jnp.pad(q8, ((0, 0), (0, 0), (0, Dp - D)))
            pages = kv_pages.at[page_idx, offset, :K].set(q8, mode="drop")
            scales = kv_scales.at[page_idx, :K, offset].set(
                scale.astype(kv_scales.dtype), mode="drop"
            )
            return pages, scales
        kc = k.astype(kv_pages.dtype)
        if Dp != D:
            kc = jnp.pad(kc, ((0, 0), (0, 0), (0, Dp - D)))
        return kv_pages.at[page_idx, offset, :K].set(kc, mode="drop")
    if kv3:
        # turbo3: 3-bit K bitplanes + 4-bit V nibbles packed into
        # plane-major byte rows (allocate_kv_pages_turbo3 layout:
        # [P, planes, ps, 128] — page_size lives at dim 2)
        assert kv_scales is not None, "turbo3 cache requires scale planes"
        page_size = kv_pages.shape[2]
        page_idx = slot_mapping // page_size
        offset = slot_mapping % page_size
        packed, scale = pack_turbo3_rows(k, v)
        planes, lanes = kv_pages.shape[1], kv_pages.shape[3]
        rows = packed.reshape(T, planes, lanes)
        planes_idx = jnp.arange(planes, dtype=jnp.int32)[None, :]
        pages = kv_pages.at[
            page_idx[:, None], planes_idx, offset[:, None]
        ].set(rows, mode="drop")
        scales = kv_scales.at[page_idx, : 2 * K, offset].set(
            scale.astype(kv_scales.dtype), mode="drop"
        )
        return pages, scales
    if kv4:
        # int4 cache: K lo-nibble / V hi-nibble share one byte plane
        # (see allocate_kv_pages_int4); scales per (token, head) absmax/7
        assert kv_scales is not None, "int4 cache requires scale planes"
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(kf), -1) / 7.0, 1e-8)  # [T, K]
        sv = jnp.maximum(jnp.max(jnp.abs(vf), -1) / 7.0, 1e-8)
        qk = jnp.clip(jnp.round(kf / sk[..., None]), -7, 7)
        qv = jnp.clip(jnp.round(vf / sv[..., None]), -7, 7)
        b = (qv * 16.0 + qk + 8.0).astype(jnp.int8)             # [T, K, D]
        if Dp != D:
            b = jnp.pad(b, ((0, 0), (0, 0), (0, Dp - D)))
        pages = kv_pages.at[page_idx, offset, :K].set(b, mode="drop")
        scale = jnp.stack([sk, sv], axis=2).reshape(T, 2 * K)
        scales = kv_scales.at[page_idx, : 2 * K, offset].set(
            scale.astype(kv_scales.dtype), mode="drop"
        )
        return pages, scales
    # interleave per head: [T, K, 2, D] -> [T, 2K, D] = k0,v0,k1,v1,...
    kv = jnp.stack([k, v], axis=2).reshape(T, 2 * K, D)
    if kv_scales is not None:
        # kv_scales layout: [P, 2K, page_size] (lane-aligned for the
        # attention kernel's per-head scale rows)
        absmax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1)  # [T, 2K]
        scale = jnp.maximum(absmax / 127.0, 1e-8)
        q = jnp.clip(
            jnp.round(kv.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        if Dp != D:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
        pages = kv_pages.at[page_idx, offset, : 2 * K].set(q, mode="drop")
        scales = kv_scales.at[page_idx, : 2 * K, offset].set(
            scale.astype(kv_scales.dtype), mode="drop"
        )
        return pages, scales
    kv = kv.astype(kv_pages.dtype)
    if Dp != D:  # lane-padded cache (see allocate_kv_pages)
        kv = jnp.pad(kv, ((0, 0), (0, 0), (0, Dp - D)))
    if kv_pages.shape[2] != 2 * K:  # plane-padded cache
        return kv_pages.at[page_idx, offset, : 2 * K].set(kv, mode="drop")
    return kv_pages.at[page_idx, offset].set(kv, mode="drop")


def copy_blocks(kv_pages: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """COW block copies. src/dst: [N] int32 page ids (disjoint pairs).
    Padding pairs use src == dst == an out-of-range id (dropped)."""
    return kv_pages.at[dst].set(kv_pages[src], mode="drop")


def gather_blocks(kv_pages: jnp.ndarray, block_ids: jnp.ndarray) -> jnp.ndarray:
    """Pull pages to host order for swap-out. Returns [N, ps, 2K, D]."""
    return kv_pages[block_ids]


def scatter_blocks(
    kv_pages: jnp.ndarray, block_ids: jnp.ndarray, data: jnp.ndarray
) -> jnp.ndarray:
    """Write swapped-in pages back. data: [N, ps, 2K, D]."""
    return kv_pages.at[block_ids].set(data.astype(kv_pages.dtype), mode="drop")


def make_slot_mapping(
    block_ids_per_token: jnp.ndarray, positions: jnp.ndarray, page_size: int
) -> jnp.ndarray:
    return block_ids_per_token * page_size + positions % page_size


class HostSwapSpace:
    """Host-memory swap tier (reference: CacheEngine CPU cache,
    cache_engine.rs:48-112).  Pages live as numpy arrays on host; swap ops
    are explicit device_get / device_put of gathered page stacks.

    Shape-agnostic: host buffers are allocated lazily from the device page
    structure on first swap, so quantized caches (per-layer ``(pages,
    scales)`` tuples — the scale planes swap alongside their pages,
    reference cache_engine.rs:401-518 quantized swap) and per-layer
    heterogeneous KV shapes (Gemma4-class) are supported uniformly."""

    def __init__(self, num_pages: int):
        import numpy as np

        self._np = np
        self.num_pages = num_pages
        self.pages: Optional[list] = None

    def _ensure(self, kv_pages: list) -> None:
        if self.pages is not None:
            return
        np = self._np

        def host_mirror(arr):
            return np.zeros((self.num_pages,) + tuple(arr.shape[1:]),
                            dtype=jnp.dtype(arr.dtype))

        self.pages = [
            tuple(host_mirror(e) for e in entry)
            if isinstance(entry, tuple) else host_mirror(entry)
            for entry in kv_pages
        ]

    def swap_out(self, kv_pages: list, mapping: "dict[int, int]") -> None:
        if not mapping:
            return
        self._ensure(kv_pages)
        src = jnp.asarray(sorted(mapping.keys()), dtype=jnp.int32)
        dst = [mapping[int(s)] for s in src]
        for layer, entry in enumerate(kv_pages):
            if isinstance(entry, tuple):
                for i, part in enumerate(entry):
                    self.pages[layer][i][dst] = jax.device_get(
                        gather_blocks(part, src)
                    )
            else:
                self.pages[layer][dst] = jax.device_get(
                    gather_blocks(entry, src)
                )

    def swap_in(self, kv_pages: list, mapping: "dict[int, int]") -> list:
        if not mapping:
            return kv_pages
        self._ensure(kv_pages)
        src = sorted(mapping.keys())
        dst = jnp.asarray([mapping[s] for s in src], dtype=jnp.int32)
        out = []
        for layer, entry in enumerate(kv_pages):
            if isinstance(entry, tuple):
                out.append(tuple(
                    scatter_blocks(part, dst,
                                   jnp.asarray(self.pages[layer][i][src]))
                    for i, part in enumerate(entry)
                ))
            else:
                out.append(
                    scatter_blocks(entry, dst,
                                   jnp.asarray(self.pages[layer][src]))
                )
        return out
