"""GGUF checkpoint loading: reader, K-quant dequantization, name mapping.

Replaces the reference's GGUF path (``/root/reference/src/backend/gguf.rs``
multi-shard Content reader + ``quantized_var_builder.rs``): a from-scratch
GGUF v2/v3 parser (no gguf lib in this environment), numpy dequantizers
for the common ggml types (F32/F16/Q8_0/Q4_K/Q6_K), llama.cpp->HF tensor
name mapping, and streaming conversion into the engine's param dict —
optionally re-quantized straight into the native W4A16 format so Q4_K
checkpoints stay ~4-bit end-to-end.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Any, BinaryIO, Dict, Iterator, List, Optional, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF"

# ggml tensor types
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_Q2_K = 10
GGML_Q3_K = 11
GGML_Q4_K = 12
GGML_Q5_K = 13
GGML_Q6_K = 14

_VALUE_READERS = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype == 8:  # string
        return _read_str(f)
    if vtype == 9:  # array
        (etype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    fmt, size = _VALUE_READERS[vtype]
    return struct.unpack(fmt, f.read(size))[0]


def _shard_paths(path: str) -> List[str]:
    """Multi-shard discovery: ``model-00001-of-00003.gguf`` expands to all
    sibling shards (reference: src/backend/gguf.rs:48-80 Content::from
    multi-file reader)."""
    import re as _re

    m = _re.search(r"-(\d{5})-of-(\d{5})\.gguf$", path)
    if not m:
        return [path]
    total = int(m.group(2))
    return [
        path[: m.start()] + f"-{i + 1:05d}-of-{total:05d}.gguf"
        for i in range(total)
    ]


class GGUFFile:
    """Parsed header(s): metadata dict + tensor table (lazy data reads).
    Accepts single files or any shard of a ``-NNNNN-of-NNNNN`` set."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: Dict[str, Any] = {}
        # name -> (dims, ttype, absolute offset, shard path)
        self.tensors: Dict[str, Tuple[List[int], int, int, str]] = {}
        for shard in _shard_paths(path):
            self._read_header(shard)

    def _read_header(self, path: str) -> None:
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            assert magic == GGUF_MAGIC, f"not a GGUF file: {path}"
            assert version in (2, 3), f"unsupported GGUF version {version}"
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            metadata: Dict[str, Any] = {}
            for _ in range(n_kv):
                key = _read_str(f)
                (vtype,) = struct.unpack("<I", f.read(4))
                metadata[key] = _read_value(f, vtype)
            # first shard's metadata wins on conflicts
            for k, v in metadata.items():
                self.metadata.setdefault(k, v)
            infos = []
            for _ in range(n_tensors):
                name = _read_str(f)
                (nd,) = struct.unpack("<I", f.read(4))
                dims = list(struct.unpack(f"<{nd}Q", f.read(8 * nd)))
                ttype, offset = struct.unpack("<IQ", f.read(12))
                infos.append((name, dims, ttype, offset))
            align = int(metadata.get("general.alignment", 32))
            base = f.tell()
            base = (base + align - 1) // align * align
            for name, dims, ttype, offset in infos:
                self.tensors[name] = (dims, ttype, base + offset, path)

    def read_raw(self, name: str) -> Tuple[List[int], int, bytes]:
        """(dims ggml-order, ggml_type, raw block bytes) — the native
        bits, for format-preserving conversion (convert_q4k_tensor)."""
        dims, ttype, offset, shard = self.tensors[name]
        n = int(np.prod(dims))
        per = {
            GGML_F32: (1, 4), GGML_F16: (1, 2),
            GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
            GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24), GGML_Q8_0: (32, 34),
            GGML_Q2_K: (256, 84), GGML_Q3_K: (256, 110),
            GGML_Q4_K: (256, 144), GGML_Q5_K: (256, 176),
            GGML_Q6_K: (256, 210),
        }[ttype]
        with open(shard, "rb") as f:
            f.seek(offset)
            return self.tensors[name][0], ttype, f.read(n // per[0] * per[1])

    def read_tensor(self, name: str) -> np.ndarray:
        """Dequantized tensor, numpy shape = reversed ggml dims
        ([out, in] for llama.cpp weights — HF order)."""
        dims, ttype, offset, shard = self.tensors[name]
        n = int(np.prod(dims))
        with open(shard, "rb") as f:
            f.seek(offset)
            if ttype == GGML_F32:
                data = np.frombuffer(f.read(4 * n), np.float32)
            elif ttype == GGML_F16:
                data = np.frombuffer(f.read(2 * n), np.float16).astype(np.float32)
            elif ttype == GGML_Q4_0:
                data = _dequant_q4_0(f.read(n // 32 * 18), n)
            elif ttype == GGML_Q4_1:
                data = _dequant_q4_1(f.read(n // 32 * 20), n)
            elif ttype == GGML_Q5_0:
                data = _dequant_q5_0(f.read(n // 32 * 22), n)
            elif ttype == GGML_Q5_1:
                data = _dequant_q5_1(f.read(n // 32 * 24), n)
            elif ttype == GGML_Q8_0:
                data = _dequant_q8_0(f.read(n // 32 * 34), n)
            elif ttype == GGML_Q2_K:
                data = _dequant_q2_k(f.read(n // 256 * 84), n)
            elif ttype == GGML_Q3_K:
                data = _dequant_q3_k(f.read(n // 256 * 110), n)
            elif ttype == GGML_Q4_K:
                data = _dequant_q4_k(f.read(n // 256 * 144), n)
            elif ttype == GGML_Q5_K:
                data = _dequant_q5_k(f.read(n // 256 * 176), n)
            elif ttype == GGML_Q6_K:
                data = _dequant_q6_k(f.read(n // 256 * 210), n)
            else:
                raise NotImplementedError(f"ggml type {ttype} for {name}")
        return data.reshape(list(reversed(dims)))


# ---------------------------------------------------------------------------
# dequantizers (formulas from the public ggml spec)
# ---------------------------------------------------------------------------


def _dequant_q8_0(buf: bytes, n: int) -> np.ndarray:
    nb = n // 32
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 34)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)  # [nb, 1]
    qs = raw[:, 2:].copy().view(np.int8).astype(np.float32)
    return (qs * d).reshape(-1)


def _split_nibbles(qs: np.ndarray) -> np.ndarray:
    """[B, 16] bytes -> [B, 32] 4-bit values in llama.cpp block order
    (low nibbles of all 16 bytes, then high nibbles)."""
    lo = qs & 0xF
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=1)


def _dequant_q4_0(buf: bytes, n: int) -> np.ndarray:
    """blocks of 32: f16 d + 16 nibble bytes; w = (q - 8) * d."""
    nb = n // 32
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 18)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)  # [nb, 1]
    q = _split_nibbles(raw[:, 2:]).astype(np.float32)
    return ((q - 8.0) * d).reshape(-1)


def _dequant_q4_1(buf: bytes, n: int) -> np.ndarray:
    """blocks of 32: f16 d, f16 m + 16 nibble bytes; w = q*d + m."""
    nb = n // 32
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 20)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    m = raw[:, 2:4].copy().view(np.float16).astype(np.float32)
    q = _split_nibbles(raw[:, 4:]).astype(np.float32)
    return (q * d + m).reshape(-1)


def _unpack_qh(raw: np.ndarray) -> np.ndarray:
    """4 bytes of high bits -> [B, 32] in nibble order (bit i of the u32
    is the 5th bit of value i)."""
    qh = raw.copy().view(np.uint32).astype(np.uint32)  # [B, 1]
    bits = (qh >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    return bits.astype(np.float32)


def _dequant_q5_0(buf: bytes, n: int) -> np.ndarray:
    """blocks of 32: f16 d + u32 qh + 16 nibble bytes; w = (q - 16)*d."""
    nb = n // 32
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 22)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    hi = _unpack_qh(raw[:, 2:6])
    q = _split_nibbles(raw[:, 6:]).astype(np.float32) + 16.0 * hi
    return ((q - 16.0) * d).reshape(-1)


def _dequant_q5_1(buf: bytes, n: int) -> np.ndarray:
    """blocks of 32: f16 d, f16 m, u32 qh + 16 nibble bytes; w = q*d+m."""
    nb = n // 32
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 24)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    m = raw[:, 2:4].copy().view(np.float16).astype(np.float32)
    hi = _unpack_qh(raw[:, 4:8])
    q = _split_nibbles(raw[:, 8:]).astype(np.float32) + 16.0 * hi
    return (q * d + m).reshape(-1)


def _dequant_q2_k(buf: bytes, n: int) -> np.ndarray:
    """block_q2_K: scales[16] (4-bit sc | 4-bit min), qs[64], d, dmin."""
    nb = n // 256
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 84)
    sc = raw[:, :16]
    qs = raw[:, 16:80]
    d = raw[:, 80:82].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = raw[:, 82:84].copy().view(np.float16).astype(np.float32)[:, 0]
    out = np.empty((nb, 256), np.float32)
    is_ = 0
    y = 0
    for half in range(2):            # 128-element halves
        q = qs[:, half * 32 : half * 32 + 32]
        for shift in (0, 2, 4, 6):
            for sub in range(2):     # two 16-element groups
                s = sc[:, is_]
                dl = d * (s & 0xF)
                ml = dmin * (s >> 4)
                qq = (q[:, sub * 16 : sub * 16 + 16] >> shift) & 3
                out[:, y : y + 16] = dl[:, None] * qq - ml[:, None]
                is_ += 1
                y += 16
    return out.reshape(-1)


def _dequant_q3_k(buf: bytes, n: int) -> np.ndarray:
    """block_q3_K: hmask[32], qs[64], scales[12] (16 x 6-bit), d."""
    nb = n // 256
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 110)
    hm = raw[:, :32]
    qs = raw[:, 32:96]
    aux = raw[:, 96:108].copy().view(np.uint32)       # [nb, 3]
    d = raw[:, 108:110].copy().view(np.float16).astype(np.float32)[:, 0]
    km1, km2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
    a0, a1, tmp = aux[:, 0], aux[:, 1], aux[:, 2]
    out_aux = np.stack(
        [
            (a0 & km2) | (((tmp >> np.uint32(0)) & km1) << np.uint32(4)),
            (a1 & km2) | (((tmp >> np.uint32(2)) & km1) << np.uint32(4)),
            ((a0 >> np.uint32(4)) & km2)
            | (((tmp >> np.uint32(4)) & km1) << np.uint32(4)),
            ((a1 >> np.uint32(4)) & km2)
            | (((tmp >> np.uint32(6)) & km1) << np.uint32(4)),
        ],
        axis=1,
    )
    scales = out_aux.view(np.int8).astype(np.float32) - 32  # [nb, 16]
    out = np.empty((nb, 256), np.float32)
    is_ = 0
    y = 0
    m = 1
    for half in range(2):
        q = qs[:, half * 32 : half * 32 + 32]
        for shift in (0, 2, 4, 6):
            for sub in range(2):
                dl = d * scales[:, is_]
                sl = slice(sub * 16, sub * 16 + 16)
                qq = ((q[:, sl] >> shift) & 3).astype(np.int8)
                hbit = (hm[:, sl] & m) != 0
                qq = qq - np.where(hbit, 0, 4).astype(np.int8)
                out[:, y : y + 16] = dl[:, None] * qq
                is_ += 1
                y += 16
            m <<= 1
    return out.reshape(-1)


def _dequant_q5_k(buf: bytes, n: int) -> np.ndarray:
    """block_q5_K: d, dmin, scales[12] (q4k packing), qh[32], qs[128]."""
    nb = n // 256
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 176)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = raw[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    scales, mins = _unpack_q4k_scales(raw[:, 4:16])
    qh = raw[:, 16:48]
    qs = raw[:, 48:176]
    out = np.empty((nb, 256), np.float32)
    for c in range(4):               # 64-element chunks
        b = qs[:, c * 32 : (c + 1) * 32]
        u1, u2 = 1 << (2 * c), 2 << (2 * c)
        lo = (b & 0xF).astype(np.float32) + np.where(
            (qh & u1) != 0, 16.0, 0.0
        )
        hi = (b >> 4).astype(np.float32) + np.where(
            (qh & u2) != 0, 16.0, 0.0
        )
        d1 = d * scales[:, 2 * c]
        m1 = dmin * mins[:, 2 * c]
        d2 = d * scales[:, 2 * c + 1]
        m2 = dmin * mins[:, 2 * c + 1]
        out[:, c * 64 : c * 64 + 32] = lo * d1[:, None] - m1[:, None]
        out[:, c * 64 + 32 : c * 64 + 64] = hi * d2[:, None] - m2[:, None]
    return out.reshape(-1)


def _unpack_q4k_scales(sc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """sc: [nb, 12] uint8 -> (scales [nb, 8], mins [nb, 8]) 6-bit values."""
    scales = np.empty((sc.shape[0], 8), np.float32)
    mins = np.empty((sc.shape[0], 8), np.float32)
    for j in range(8):
        if j < 4:
            scales[:, j] = sc[:, j] & 63
            mins[:, j] = sc[:, j + 4] & 63
        else:
            scales[:, j] = (sc[:, j + 4] & 0xF) | ((sc[:, j - 4] >> 6) << 4)
            mins[:, j] = (sc[:, j + 4] >> 4) | ((sc[:, j] >> 6) << 4)
    return scales, mins


def _dequant_q4_k(buf: bytes, n: int) -> np.ndarray:
    nb = n // 256
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 144)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = raw[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    scales, mins = _unpack_q4k_scales(raw[:, 4:16])
    qs = raw[:, 16:144]  # [nb, 128]
    out = np.empty((nb, 256), np.float32)
    # 4 chunks of 64 elements; chunk c uses bytes [c*32:(c+1)*32]:
    # lo nibbles -> elems c*64..+32 (sub-block 2c), hi -> +32..64 (2c+1)
    for c in range(4):
        b = qs[:, c * 32 : (c + 1) * 32]
        lo = (b & 0xF).astype(np.float32)
        hi = (b >> 4).astype(np.float32)
        sc_lo = d * scales[:, 2 * c]
        m_lo = dmin * mins[:, 2 * c]
        sc_hi = d * scales[:, 2 * c + 1]
        m_hi = dmin * mins[:, 2 * c + 1]
        out[:, c * 64 : c * 64 + 32] = lo * sc_lo[:, None] - m_lo[:, None]
        out[:, c * 64 + 32 : c * 64 + 64] = hi * sc_hi[:, None] - m_hi[:, None]
    return out.reshape(-1)


def _dequant_q6_k(buf: bytes, n: int) -> np.ndarray:
    nb = n // 256
    raw = np.frombuffer(buf, np.uint8).reshape(nb, 210)
    ql = raw[:, :128]
    qh = raw[:, 128:192]
    sc = raw[:, 192:208].copy().view(np.int8).astype(np.float32)  # [nb, 16]
    d = raw[:, 208:210].copy().view(np.float16).astype(np.float32)[:, 0]
    out = np.empty((nb, 256), np.float32)
    for half in range(2):  # two independent 128-element halves
        lo = ql[:, half * 64 : half * 64 + 64]
        hi = qh[:, half * 32 : half * 32 + 32]
        base = half * 128
        for l32 in range(2):  # ql columns 0..31 / 32..63
            b = lo[:, l32 * 32 : (l32 + 1) * 32]
            h = hi
            q1 = ((b & 0xF) | (((h >> (l32 * 2)) & 3) << 4)).astype(np.int16) - 32
            q3 = ((b >> 4) | (((h >> (l32 * 2 + 4)) & 3) << 4)).astype(np.int16) - 32
            e1 = base + l32 * 32
            e3 = base + 64 + l32 * 32
            s1 = d[:, None] * sc[:, e1 // 16 : e1 // 16 + 2].repeat(16, 1)[:, :32]
            s3 = d[:, None] * sc[:, e3 // 16 : e3 // 16 + 2].repeat(16, 1)[:, :32]
            out[:, e1 : e1 + 32] = q1 * s1
            out[:, e3 : e3 + 32] = q3 * s3
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# K-quant ENCODERS (f32 -> ggml block bytes).  Used by converter tooling
# and the quantization quality gate (tools/quant_quality.py) to bound the
# gguf->w4a16 re-quantization chain: the reference executes Q4K blocks
# natively (QLinear over ggml types, src/openai/models/linear.rs:417)
# while this repo re-quantizes them into the fused W4A16 kernel layout,
# so the double-quantization error must be measured, not assumed.  The
# fits are plain minmax/absmax; ggml's rmse search would only tighten
# them, so a gate that passes here is conservative.
# ---------------------------------------------------------------------------


def encode_q4_k(x: np.ndarray) -> bytes:
    """f32 [n] (n % 256 == 0) -> Q4_K blocks (144 bytes / 256 elems):
    per 32-elem sub-block an unsigned 4-bit grid  d*ls*q - dmin*lm  with
    6-bit sub-scales ls/lm against per-block f16 d/dmin (the exact
    layout _dequant_q4_k / _unpack_q4k_scales read back)."""
    n = x.size
    assert n % 256 == 0, "q4_k needs 256-element super-blocks"
    xb = np.asarray(x, np.float32).reshape(-1, 8, 32)
    nb = xb.shape[0]
    m = np.maximum(-xb.min(-1), 0.0)            # [nb, 8] sub-block offsets
    s = np.maximum(xb.max(-1) + m, 0.0) / 15.0  # [nb, 8] sub-block scales
    # quantize q against the f16-rounded super-scales the decoder will use
    d = (s.max(-1) / 63.0).astype(np.float16).astype(np.float32)    # [nb]
    dmin = (m.max(-1) / 63.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        ls = np.where(d[:, None] > 0, np.rint(s / d[:, None]), 0)
        lm = np.where(dmin[:, None] > 0, np.rint(m / dmin[:, None]), 0)
    ls = np.clip(ls, 0, 63).astype(np.uint8)
    lm = np.clip(lm, 0, 63).astype(np.uint8)
    eff_s = d[:, None] * ls                     # [nb, 8] dequant scale
    eff_m = dmin[:, None] * lm
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.rint((xb + eff_m[..., None]) / eff_s[..., None])
    q = np.where(eff_s[..., None] > 0, q, 0)
    q = np.clip(q, 0, 15).astype(np.uint8)
    sc = np.empty((nb, 12), np.uint8)
    sc[:, 0:4] = (ls[:, 0:4] & 63) | ((ls[:, 4:8] >> 4) << 6)
    sc[:, 4:8] = (lm[:, 0:4] & 63) | ((lm[:, 4:8] >> 4) << 6)
    sc[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    qq = q.reshape(nb, 4, 64)
    qs = (qq[:, :, :32] | (qq[:, :, 32:] << 4)).reshape(nb, 128)
    out = np.empty((nb, 144), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:16] = sc
    out[:, 16:144] = qs
    return out.tobytes()


def encode_q6_k(x: np.ndarray) -> bytes:
    """f32 [n] (n % 256 == 0) -> Q6_K blocks (210 bytes / 256 elems):
    per 16-elem group a signed 6-bit grid  d*sc*q  with int8 group
    scales against a per-block f16 d (layout of _dequant_q6_k)."""
    n = x.size
    assert n % 256 == 0, "q6_k needs 256-element super-blocks"
    xb = np.asarray(x, np.float32).reshape(-1, 16, 16)
    nb = xb.shape[0]
    s = np.abs(xb).max(-1) / 31.0               # [nb, 16] group scales
    d = (s.max(-1) / 127.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        sc = np.where(d[:, None] > 0, np.rint(s / d[:, None]), 0)
    sc = np.clip(sc, 0, 127).astype(np.int8)
    eff = d[:, None] * sc                       # [nb, 16]
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.rint(xb / eff[..., None])
    q = np.where(eff[..., None] > 0, q, 0)
    q = (np.clip(q, -32, 31) + 32).astype(np.uint8)     # [nb, 16, 16]
    q = q.reshape(nb, 2, 4, 32)                 # [nb, half, quarter, l]
    ql = np.empty((nb, 2, 2, 32), np.uint8)
    ql[:, :, 0] = (q[:, :, 0] & 0xF) | ((q[:, :, 2] & 0xF) << 4)
    ql[:, :, 1] = (q[:, :, 1] & 0xF) | ((q[:, :, 3] & 0xF) << 4)
    qh = (
        (q[:, :, 0] >> 4)
        | ((q[:, :, 1] >> 4) << 2)
        | ((q[:, :, 2] >> 4) << 4)
        | ((q[:, :, 3] >> 4) << 6)
    )                                           # [nb, 2, 32]
    out = np.empty((nb, 210), np.uint8)
    out[:, 0:128] = ql.reshape(nb, 128)
    out[:, 128:192] = qh.reshape(nb, 64)
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = d.astype(np.float16)[:, None].view(np.uint8)
    return out.tobytes()


def convert_q4k_tensor(
    raw: bytes, n_out: int, n_in: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Q4_K block bytes ([out, in] row-major, blocks along IN) -> the
    fused-kernel NATIVE asymmetric layout, losslessly:

        (qweight [out/TO, in, TO/2] int8 tile-contiguous,
         scales  [in/32, out] f32,
         zoffs   [in/32, out] f32)   with  w = (nibble-8)*s - zoff.

    A Q4_K sub-block is w = d*ls*q - dmin*lm with q in [0,15] per 32
    input elements — exactly a group-32 asymmetric grid, so s = d*ls,
    zoff = dmin*lm - 8*s maps every stored value onto the kernel's
    (nibble-8)*s - zoff form with NO re-quantization.  This is the TPU
    analogue of the reference executing ggml blocks natively (QLinear,
    src/openai/models/linear.rs:417; attention-rs qmatmul): serving
    quality == checkpoint quality, vs the measured-lossy dequant->
    w4a16 chain (tools/quant_quality.py gguf_q4k_requant row).  Costs
    4x the scale rows of group-128 w4a16 (+0.094 B/elem vs native Q4K's
    0.5625 B/elem stream)."""
    from candle_vllm_tpu.ops.quant import (
        pack_int4, pick_tile_out, tile_packed_w4,
    )

    assert n_in % 256 == 0
    nsb = n_in // 256
    blk = np.frombuffer(raw, np.uint8).reshape(n_out, nsb, 144)
    d = blk[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blk[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    ls, lm = _unpack_q4k_scales(blk[:, :, 4:16].reshape(-1, 12))
    ls = ls.reshape(n_out, nsb, 8)
    lm = lm.reshape(n_out, nsb, 8)
    qs = blk[:, :, 16:144]                       # [out, nsb, 128]
    q = np.empty((n_out, nsb, 256), np.uint8)
    for c in range(4):  # chunk c: lo nibbles -> elems c*64.., hi -> +32
        b = qs[:, :, c * 32 : (c + 1) * 32]
        q[:, :, c * 64 : c * 64 + 32] = b & 0xF
        q[:, :, c * 64 + 32 : c * 64 + 64] = b >> 4
    s = (d[..., None] * ls).reshape(n_out, n_in // 32)    # [out, in/32]
    m = (dmin[..., None] * lm).reshape(n_out, n_in // 32)
    signed = (
        q.reshape(n_out, n_in).astype(np.int16) - 8
    ).astype(np.int8).T                                   # [in, out]
    to = pick_tile_out(n_out)
    packed = tile_packed_w4(pack_int4(np.ascontiguousarray(signed), to), to)
    scales = np.ascontiguousarray(s.T)                    # [in/32, out]
    zoffs = np.ascontiguousarray((m - 8.0 * s).T)
    return packed, scales, zoffs


def write_gguf(path: str, metadata: Dict[str, Any], tensors) -> None:
    """Minimal GGUF v3 writer (converter + quality-gate tooling; the
    byte layout GGUFFile parses back — reference writes via the gguf
    crate in its convert tooling).

    ``metadata``: {key: int | float | str} — typed u32/f32/string by the
    Python value.  ``tensors``: iterable of ``(name, hf_shape,
    ggml_type, data_bytes)``; dims are written ggml-order (reversed HF
    shape) and data 32-byte aligned."""
    import struct

    def w_str(s: str) -> bytes:
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    tensors = list(tensors)
    out = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors), len(metadata))
    for key, val in metadata.items():
        if isinstance(val, bool):
            out += w_str(key) + struct.pack("<IB", 7, int(val))
        elif isinstance(val, int):
            out += w_str(key) + struct.pack("<II", 4, val)
        elif isinstance(val, float):
            out += w_str(key) + struct.pack("<If", 6, val)
        else:
            out += w_str(key) + struct.pack("<I", 8) + w_str(str(val))
    offset = 0
    infos = b""
    aligned = []
    for name, hf_shape, ttype, data in tensors:
        dims = list(reversed(hf_shape))
        infos += w_str(name)
        infos += struct.pack("<I", len(dims))
        infos += struct.pack(f"<{len(dims)}Q", *dims)
        infos += struct.pack("<IQ", ttype, offset)
        offset += (len(data) + 31) // 32 * 32
        aligned.append(data + b"\0" * ((-len(data)) % 32))
    out += infos
    out += b"\0" * ((-len(out)) % 32)
    out += b"".join(aligned)
    with open(path, "wb") as f:
        f.write(out)


def hf_to_gguf_name(hf_name: str) -> Optional[str]:
    """Inverse of map_gguf_name for the dense-llama tensor families
    (converter direction); None for names with no GGUF counterpart."""
    rev_top = {v: k for k, v in _NAME_MAP.items()}
    if hf_name in rev_top:
        return rev_top[hf_name]
    m = re.match(r"model\.layers\.(\d+)\.(.+)", hf_name)
    if m:
        rev_blk = {v: k for k, v in _BLK_MAP.items()}
        base = rev_blk.get(m.group(2))
        return f"blk.{m.group(1)}.{base}" if base else None
    return None


def write_gguf_from_params(
    path: str,
    config,
    params: Dict[str, Any],
    ggml_type: int = GGML_Q4_K,
) -> None:
    """Encode a dense-llama param dict (flat HF names, [in, out] device
    layout) into a synthetic GGUF checkpoint: every 2D projection whose
    input dim fits 256-element super-blocks is K-quant encoded at
    ``ggml_type``; embeddings and norms stay f32.  Used by the quality
    gate to measure the full gguf -> load_gguf -> w4a16 serving chain
    against the same model's f32 baseline."""
    enc = {GGML_Q4_K: encode_q4_k, GGML_Q6_K: encode_q6_k}[ggml_type]
    tensors = []
    for name, p in params.items():
        gname = hf_to_gguf_name(name)
        if gname is None:
            raise ValueError(f"no GGUF name for {name}")
        arr = np.asarray(p, np.float32)
        if arr.ndim == 2 and "embed_tokens" not in name:
            arr = np.ascontiguousarray(arr.T)  # [in,out] -> HF [out,in]
        if (
            arr.ndim == 2
            and "embed_tokens" not in name
            and arr.shape[1] % 256 == 0
        ):
            tensors.append((gname, arr.shape, ggml_type,
                            enc(arr.reshape(-1))))
        else:
            tensors.append((gname, arr.shape, GGML_F32, arr.tobytes()))
    head_dim = config.head_dim or (
        config.hidden_size // config.num_attention_heads
    )
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": config.hidden_size,
        "llama.feed_forward_length": config.intermediate_size,
        "llama.block_count": config.num_hidden_layers,
        "llama.attention.head_count": config.num_attention_heads,
        "llama.attention.head_count_kv": config.num_key_value_heads,
        "llama.attention.key_length": head_dim,
        "llama.attention.layer_norm_rms_epsilon": float(config.rms_norm_eps),
        "llama.context_length": config.max_model_len,
        "llama.vocab_size": config.vocab_size,
        "llama.rope.freq_base": float(config.rope_theta),
    }
    write_gguf(path, meta, tensors)


# ---------------------------------------------------------------------------
# name mapping + loading
# ---------------------------------------------------------------------------

_NAME_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK_MAP = {
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_output.weight": "self_attn.o_proj.weight",
    "attn_q.bias": "self_attn.q_proj.bias",
    "attn_k.bias": "self_attn.k_proj.bias",
    "attn_v.bias": "self_attn.v_proj.bias",
    "attn_norm.weight": "input_layernorm.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
    "attn_q_norm.weight": "self_attn.q_norm.weight",
    "attn_k_norm.weight": "self_attn.k_norm.weight",
    # --- MLA (deepseek2/glm4 MoE-lite; ref quantized_deepseek.rs) -------
    "attn_q_a.weight": "self_attn.q_a_proj.weight",
    "attn_q_b.weight": "self_attn.q_b_proj.weight",
    "attn_kv_a_mqa.weight": "self_attn.kv_a_proj_with_mqa.weight",
    "attn_kv_b.weight": "self_attn.kv_b_proj.weight",
    "attn_q_a_norm.weight": "self_attn.q_a_layernorm.weight",
    "attn_kv_a_norm.weight": "self_attn.kv_a_layernorm.weight",
    # --- MoE expert banks + router (ref quantized_qwen3_moe.rs) ---------
    # 3D banks keep bare names (models/moe.py param convention)
    "ffn_gate_exps.weight": "mlp.experts.gate_proj",
    "ffn_up_exps.weight": "mlp.experts.up_proj",
    "ffn_down_exps.weight": "mlp.experts.down_proj",
    "ffn_gate_inp.weight": "mlp.gate.weight",
    "exp_probs_b.bias": "mlp.gate.e_score_correction_bias",
    "ffn_gate_inp.e_score_correction_bias":
        "mlp.gate.e_score_correction_bias",
    # shared experts (qwen2moe shexp gate; deepseek shared expert)
    "ffn_gate_shexp.weight": "mlp.shared_expert.gate_proj.weight",
    "ffn_up_shexp.weight": "mlp.shared_expert.up_proj.weight",
    "ffn_down_shexp.weight": "mlp.shared_expert.down_proj.weight",
    "ffn_gate_inp_shexp.weight": "mlp.shared_expert_gate.weight",
}

# llama.cpp reuses generic suffixes with different meanings per arch:
# gemma2/3 'ffn_norm' is the PRE-feedforward norm of the sandwich, glm4
# carries extra output norms (ref: glm4.rs:103-140).
_SANDWICH_OVERRIDES = {
    "ffn_norm.weight": "pre_feedforward_layernorm.weight",
    "post_attention_norm.weight": "post_attention_layernorm.weight",
    "post_ffw_norm.weight": "post_feedforward_layernorm.weight",
}
_ARCH_BLK_OVERRIDES = {
    "gemma2": _SANDWICH_OVERRIDES,
    "gemma3": _SANDWICH_OVERRIDES,
    "glm4": {
        "post_attention_norm.weight": "post_self_attn_layernorm.weight",
        "post_ffw_norm.weight": "post_mlp_layernorm.weight",
    },
}

# GDN (linear-attention) layers of qwen3next/qwen3.5 hybrids — llama.cpp
# stores the split projections under ssm_*/attn_* names in the SAME blk.N
# namespace the full-attention layers use, so mapping needs the layer kind
# (ref: quantized_qwen3_5.rs:140-330).
_GDN_BLK_MAP = {
    "attn_qkv.weight": "linear_attn.in_proj_qkv.weight",
    "attn_gate.weight": "linear_attn.in_proj_z.weight",
    "ssm_beta.weight": "linear_attn.in_proj_b.weight",
    "ssm_alpha.weight": "linear_attn.in_proj_a.weight",
    "ssm_out.weight": "linear_attn.out_proj.weight",
    "ssm_conv1d.weight": "linear_attn.conv1d.weight",
    "ssm_conv1d.bias": "linear_attn.conv1d.bias",
    "ssm_a": "linear_attn.A_log",
    "ssm_dt.bias": "linear_attn.dt_bias",
    "ssm_norm.weight": "linear_attn.norm.weight",
    "attn_norm.weight": "input_layernorm.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    # GDN replaces only the attention sublayer; the MLP (dense or MoE)
    # keeps its standard names
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
    "ffn_gate_exps.weight": "mlp.experts.gate_proj",
    "ffn_up_exps.weight": "mlp.experts.up_proj",
    "ffn_down_exps.weight": "mlp.experts.down_proj",
    "ffn_gate_inp.weight": "mlp.gate.weight",
    "ffn_gate_shexp.weight": "mlp.shared_expert.gate_proj.weight",
    "ffn_up_shexp.weight": "mlp.shared_expert.up_proj.weight",
    "ffn_down_shexp.weight": "mlp.shared_expert.down_proj.weight",
    "ffn_gate_inp_shexp.weight": "mlp.shared_expert_gate.weight",
}

# tensors that carry no model weight (safe to skip silently)
_IGNORABLE = {
    "rope_freqs.weight",
    "attn_rot_embd.weight",
}


def map_gguf_name(
    name: str,
    arch: str = "llama",
    gdn_layers: Optional[set] = None,
) -> Optional[str]:
    if name in _NAME_MAP:
        return _NAME_MAP[name]
    if name.startswith("blk."):
        _, idx, rest = name.split(".", 2)
        if gdn_layers and int(idx) in gdn_layers:
            mapped = _GDN_BLK_MAP.get(rest)
        else:
            mapped = _ARCH_BLK_OVERRIDES.get(arch, {}).get(rest) or \
                _BLK_MAP.get(rest)
        if mapped:
            return f"model.layers.{idx}.{mapped}"
    return None


_ARCHMAP = {
    "llama": "LlamaForCausalLM", "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM", "gemma2": "Gemma2ForCausalLM",
    "gemma3": "Gemma3ForCausalLM", "glm4": "Glm4ForCausalLM",
    "qwen2moe": "Qwen2MoeForCausalLM", "qwen3moe": "Qwen3MoeForCausalLM",
    "glm4moe": "Glm4MoeForCausalLM", "deepseek2": "DeepseekV2ForCausalLM",
    # qwen3next GGUFs ship the SPLIT GDN projections (attn_qkv/attn_gate/
    # ssm_beta/ssm_alpha) — the Qwen3_5 model class consumes exactly that
    # layout (same decoder; ref quantized_qwen3_5.rs)
    "qwen3next": "Qwen3_5ForCausalLM", "qwen3_5": "Qwen3_5ForCausalLM",
    "qwen3_5moe": "Qwen3_5MoeForCausalLM",
}


def gguf_gdn_layers(md: Dict[str, Any], arch: str, n_layers: int) -> set:
    """Indices of linear-attention (GDN) layers from GGUF metadata
    (reference: quantized_qwen3_5.rs:555-600 parse_gguf_hybrid_config)."""
    lt = md.get(f"{arch}.layer_types")
    if lt:
        return {i for i, t in enumerate(lt) if t == "linear_attention"}
    interval = int(md.get(f"{arch}.full_attention_interval", 0) or 0)
    if interval > 0:
        return {i for i in range(n_layers) if (i + 1) % interval != 0}
    return set()


def gguf_model_config(g: GGUFFile):
    """Build a ModelConfig from GGUF metadata (reference: gguf.rs header →
    config, pipeline.rs GGUF arch dispatch, quantized_deepseek.rs /
    quantized_qwen3_moe.rs / quantized_qwen3_5.rs metadata keys)."""
    from candle_vllm_tpu.config import ModelConfig

    md = g.metadata
    arch = md.get("general.architecture", "llama")

    def get(key, default=None):
        return md.get(f"{arch}.{key}", default)

    heads = int(get("attention.head_count", 32))
    n_layers = int(get("block_count", 32))
    cfg = dict(
        architectures=[_ARCHMAP.get(arch, "LlamaForCausalLM")],
        model_type=arch,
        hidden_size=int(get("embedding_length", 4096)),
        intermediate_size=int(get("feed_forward_length", 11008)),
        num_hidden_layers=n_layers,
        num_attention_heads=heads,
        num_key_value_heads=int(get("attention.head_count_kv", heads)),
        rope_theta=float(get("rope.freq_base", 10000.0)),
        rms_norm_eps=float(get("attention.layer_norm_rms_epsilon", 1e-5)),
        max_position_embeddings=int(get("context_length", 4096)),
        vocab_size=int(get("vocab_size", 0))
        or len(md.get("tokenizer.ggml.tokens", []) or [32000]),
        eos_token_id=md.get("tokenizer.ggml.eos_token_id"),
        bos_token_id=md.get("tokenizer.ggml.bos_token_id"),
    )
    if get("attention.key_length"):
        # explicit head dim (MLA arches: qk_nope + qk_rope)
        cfg["head_dim"] = int(get("attention.key_length"))
    # --- MoE (expert_count etc.; ref quantized_qwen3_moe.rs) -------------
    if get("expert_count"):
        cfg["num_experts"] = int(get("expert_count"))
        cfg["num_experts_per_tok"] = int(get("expert_used_count", 2))
        cfg["moe_intermediate_size"] = int(
            get("expert_feed_forward_length", cfg["intermediate_size"])
        )
        if get("expert_shared_feed_forward_length"):
            cfg["shared_expert_intermediate_size"] = int(
                get("expert_shared_feed_forward_length")
            )
        if get("expert_weights_scale"):
            cfg["routed_scaling_factor"] = float(get("expert_weights_scale"))
        if get("expert_weights_norm") is not None:
            cfg["norm_topk_prob"] = bool(get("expert_weights_norm"))
        elif arch in ("qwen3moe", "qwen3_5moe", "glm4moe"):
            cfg["norm_topk_prob"] = True   # HF config default per family
        elif arch == "qwen2moe":
            cfg["norm_topk_prob"] = False
        if int(get("expert_gating_func", 1) or 1) == 2:
            cfg["scoring_func"] = "sigmoid"
        if get("leading_dense_block_count"):
            cfg["first_k_dense_replace"] = int(get("leading_dense_block_count"))
        if get("expert_shared_count"):
            cfg["n_shared_experts"] = int(get("expert_shared_count"))
    # --- MLA (deepseek2-class; ref quantized_deepseek.rs) ----------------
    if get("attention.kv_lora_rank"):
        rope_dim = int(get("rope.dimension_count", 64))
        key_len = int(get("attention.key_length", 192))
        cfg["kv_lora_rank"] = int(get("attention.kv_lora_rank"))
        if get("attention.q_lora_rank"):
            cfg["q_lora_rank"] = int(get("attention.q_lora_rank"))
        key_mla = get("attention.key_length_mla")
        cfg["qk_rope_head_dim"] = rope_dim
        cfg["qk_nope_head_dim"] = (int(key_mla) if key_mla else key_len) - rope_dim
        cfg["v_head_dim"] = int(
            get("attention.value_length_mla")
            or get("attention.value_length", 128)
        )
        cfg.pop("head_dim", None)
    # --- GDN hybrids (qwen3next/qwen3.5; ref parse_gguf_hybrid_config) ---
    if get("ssm.group_count"):
        n_k = int(get("ssm.group_count"))
        n_v = int(get("ssm.time_step_rank", n_k))
        dk = int(get("ssm.state_size", 128))
        inner = int(get("ssm.inner_size", 0) or 0)
        cfg["linear_num_key_heads"] = n_k
        cfg["linear_num_value_heads"] = n_v
        cfg["linear_key_head_dim"] = dk
        cfg["linear_value_head_dim"] = (
            inner // n_v if n_v and inner and inner % n_v == 0 else dk
        )
        cfg["linear_conv_kernel_dim"] = int(get("ssm.conv_kernel", 4))
        if get("full_attention_interval"):
            cfg["full_attention_interval"] = int(get("full_attention_interval"))
        lt = get("layer_types")
        if lt:
            cfg["layer_types"] = [
                "full_attention" if t == "attention" else t for t in lt
            ]
    return ModelConfig.from_hf(cfg)


def load_gguf(
    path: str,
    dtype=None,
    quantize: Optional[str] = "w4a16",
    mmproj: Optional[str] = "auto",
    fuse_moe_gate_up: bool = True,
):
    """Returns (ModelConfig, params dict).  Tensors stream one at a time:
    dequantized to f32 then (by default) re-quantized into the native
    W4A16/int8 layout so Q4_K checkpoints stay ~4-bit in HBM.

    ``fuse_moe_gate_up=False`` re-quantizes gate/up expert banks
    SEPARATELY on narrow 256-wide tiles — required for TP (a fused
    [gate|up] OUT dim cannot column-shard scale-aligned; the separate
    banks take models/moe.py's shard_map path) and for expert CPU
    offload.  The server sets this automatically for tp>1 / offload.

    ``mmproj="auto"`` discovers an ``mmproj*.gguf`` vision tower next to
    the model file and merges it (reference: pipeline.rs:259-330)."""
    import jax.numpy as jnp

    from candle_vllm_tpu.ops.quant import quantize_tensor_np

    if dtype is None:
        dtype = jnp.bfloat16
    g = GGUFFile(path)
    config = gguf_model_config(g)
    mm_path = find_mmproj(path) if mmproj == "auto" else mmproj
    mm_params: Dict[str, Any] = {}
    if mm_path:
        from candle_vllm_tpu.config import VisionConfig

        vc, mm_params = load_gguf_mmproj(mm_path, dtype=dtype)
        config.vision = VisionConfig(**vc)
        if config.architecture.startswith(("Qwen", "Llama")):
            config.architecture = "Qwen3VLForConditionalGeneration"
        toks = g.metadata.get("tokenizer.ggml.tokens") or []
        for marker in ("<|image_pad|>", "<image>"):
            if marker in toks:
                config.image_token_id = toks.index(marker)
                break
    arch = g.metadata.get("general.architecture", "llama")
    gdn_layers = gguf_gdn_layers(
        g.metadata, arch, config.num_hidden_layers
    )
    params: Dict[str, Any] = {}
    unmapped: List[str] = []
    pending_banks: Dict[str, np.ndarray] = {}
    for gname in g.tensors:
        name = map_gguf_name(gname, arch, gdn_layers)
        if name is None:
            base = gname.split(".", 2)[-1] if gname.startswith("blk.") else gname
            if base not in _IGNORABLE and gname not in _IGNORABLE:
                unmapped.append(gname)
            continue
        if (
            quantize == "w4a16"
            and os.environ.get("CVT_GGUF_EXACT", "1") != "0"
            and name.endswith(".weight")
            and name != "lm_head.weight"      # pad_vocab_out path owns it
            and "embed_tokens" not in name
            and ".linear_attn." not in name   # f32 fixups required
            and ".experts." not in name       # bank grouped-GEMM layout
            and ".conv1d." not in name
        ):
            dims, ttype, _, _ = g.tensors[gname]
            if (
                ttype == GGML_Q4_K
                and len(dims) == 2
                and dims[0] % 256 == 0        # ggml dim0 = input (blocks)
                and dims[1] % 256 == 0        # out: kernel tile gate
            ):
                # NATIVE-format execution: map Q4_K blocks losslessly
                # onto the kernel's asymmetric group-32 layout — no
                # dequant->requant chain (CVT_GGUF_EXACT=0 restores it)
                _, _, rawb = g.read_raw(gname)
                qw, s, z = convert_q4k_tensor(rawb, dims[1], dims[0])
                prefix = name[: -len(".weight")]
                params[f"{prefix}.qweight"] = jnp.asarray(qw)
                params[f"{prefix}.scales"] = jnp.asarray(s, jnp.bfloat16)
                params[f"{prefix}.qzeros"] = jnp.asarray(z, jnp.bfloat16)
                continue
        arr = g.read_tensor(gname)  # [out, in] f32
        arr = _gguf_tensor_fixup(name, arr, config)
        if arr.ndim == 2 and "embed_tokens" not in name \
                and ".conv1d." not in name:
            arr = np.ascontiguousarray(arr.T)  # input-major
        if arr.ndim == 3 and ".experts." in name:
            # expert banks: [E, out, in] -> [E, in, out] (models/moe.py)
            arr = np.ascontiguousarray(arr.transpose(0, 2, 1))
            if quantize:
                # re-quantize to per-expert W4 banks host-side so the
                # bf16 bank never reaches HBM (reference keeps GGUF MoE
                # experts quantized end-to-end, FusedMoeISQ)
                pending_banks[name] = arr
                continue
        if quantize and name.endswith(".weight"):
            q = quantize_tensor_np(name, arr, quantize)
            if q:
                prefix = name[: -len(".weight")]
                params[f"{prefix}.qweight"] = jnp.asarray(q["qweight"])
                params[f"{prefix}.scales"] = jnp.asarray(q["scales"], jnp.bfloat16)
                continue
        params[name] = jnp.asarray(arr, dtype)
    if pending_banks:
        from candle_vllm_tpu.ops.quant import (
            DEFAULT_GROUP, QTILE_OUT, quantize_expert_bank,
        )

        prefixes = {n.rsplit(".experts.", 1)[0] for n in pending_banks}
        for p in sorted(prefixes):
            g_b = pending_banks.pop(f"{p}.experts.gate_proj", None)
            u_b = pending_banks.pop(f"{p}.experts.up_proj", None)
            gu = pending_banks.pop(f"{p}.experts.gate_up_proj", None)
            dn = pending_banks.pop(f"{p}.experts.down_proj", None)
            if not fuse_moe_gate_up and gu is not None and g_b is None:
                half = gu.shape[2] // 2
                g_b, u_b = gu[..., :half], gu[..., half:]
                gu = None
            if not fuse_moe_gate_up:
                # separate 256-wide-tile banks: TP-shardable scale-aligned
                # (parallel/sharding.py expert rules) and offload-capable
                quantizable = (
                    g_b is not None and u_b is not None and dn is not None
                    and not (g_b.shape[1] % DEFAULT_GROUP)
                    and not (g_b.shape[2] % 256)
                    and not (dn.shape[1] % DEFAULT_GROUP)
                    and not (dn.shape[2] % 256)
                )
                if quantizable:
                    for t, bank in (("gate_proj", g_b), ("up_proj", u_b),
                                    ("down_proj", dn)):
                        qw, s = quantize_expert_bank(bank, tile_out=256)
                        params[f"{p}.experts.{t}.qweight"] = jnp.asarray(qw)
                        params[f"{p}.experts.{t}.scales"] = jnp.asarray(
                            s, jnp.bfloat16
                        )
                    continue
            if gu is None and g_b is not None and u_b is not None:
                gu = np.concatenate([g_b, u_b], axis=2)
            quantizable = (
                fuse_moe_gate_up
                and gu is not None and dn is not None
                and not (gu.shape[1] % DEFAULT_GROUP)
                and not (gu.shape[2] % (2 * QTILE_OUT))
                and not (dn.shape[1] % DEFAULT_GROUP)
                and not (dn.shape[2] % QTILE_OUT)
            )
            if quantizable:
                qw, s = quantize_expert_bank(gu)
                params[f"{p}.experts.gate_up_proj.qweight"] = jnp.asarray(qw)
                params[f"{p}.experts.gate_up_proj.scales"] = jnp.asarray(
                    s, jnp.bfloat16
                )
                qw, s = quantize_expert_bank(dn)
                params[f"{p}.experts.down_proj.qweight"] = jnp.asarray(qw)
                params[f"{p}.experts.down_proj.scales"] = jnp.asarray(
                    s, jnp.bfloat16
                )
            else:  # odd dims: keep bf16 banks
                for nm, a in ((f"{p}.experts.gate_proj", g_b),
                              (f"{p}.experts.up_proj", u_b),
                              (f"{p}.experts.gate_up_proj", gu
                               if g_b is None else None),
                              (f"{p}.experts.down_proj", dn)):
                    if a is not None:
                        params[nm] = jnp.asarray(a, dtype)
    if unmapped:
        # silent drops turn a MoE/MLA checkpoint into a broken dense model
        # (reference errors the same way: unknown GGUF arch/tensor)
        raise ValueError(
            f"GGUF arch {arch!r}: {len(unmapped)} unmapped tensors "
            f"(first 8: {sorted(unmapped)[:8]}); refusing to load a "
            "partial model"
        )
    if "lm_head.weight" not in params and not any(
        k.startswith("lm_head.") for k in params
    ):
        config.tie_word_embeddings = True
    params.update(mm_params)
    return config, params


def _untile_rows(a: np.ndarray, n_k: int, n_v: int, hd: int) -> np.ndarray:
    """Undo llama.cpp's per-k-group v-head tiling along the leading dim:
    rows [n_v_per_k, n_k, hd, ...] -> canonical [n_k, n_v_per_k, hd, ...]
    (reference: quantized_qwen3_5.rs:25-49 undo_tiled_v_heads_first_dim)."""
    if n_k == n_v:
        return a
    per = n_v // n_k
    shape = a.shape
    return np.ascontiguousarray(
        a.reshape(per, n_k, hd, *shape[1:]).swapaxes(0, 1).reshape(shape)
    )


def _gguf_tensor_fixup(name: str, arr: np.ndarray, config) -> np.ndarray:
    """GDN tensor normalization: v-head untiling, conv squeeze, A -> log
    (reference: quantized_qwen3_5.rs:140-330)."""
    if ".linear_attn." not in name:
        return arr
    e = config.extra or {}
    n_k = int(e.get("linear_num_key_heads", 0) or 0)
    n_v = int(e.get("linear_num_value_heads", n_k) or n_k)
    dk = int(e.get("linear_key_head_dim", 128) or 128)
    dv = int(e.get("linear_value_head_dim", dk) or dk)
    key_dim, value_dim = n_k * dk, n_v * dv
    suffix = name.rsplit(".linear_attn.", 1)[1]
    if suffix in ("in_proj_qkv.weight", "conv1d.weight", "conv1d.bias"):
        if suffix == "conv1d.weight" and arr.ndim == 3:
            arr = arr.reshape(arr.shape[0], -1)  # [conv_dim, 1, W]
        qk = arr[: 2 * key_dim]
        v = _untile_rows(arr[2 * key_dim :], n_k, n_v, dv)
        return np.ascontiguousarray(np.concatenate([qk, v], axis=0))
    if suffix == "in_proj_z.weight":
        return _untile_rows(arr, n_k, n_v, dv)
    if suffix in ("in_proj_b.weight", "in_proj_a.weight"):
        return _untile_rows(arr, n_k, n_v, 1)
    if suffix == "A_log":
        # GGUF stores a = -exp(A_log); recover A_log = log(-a)
        return _untile_rows(
            np.log(-arr.astype(np.float32)), n_k, n_v, 1
        )
    if suffix == "dt_bias":
        return _untile_rows(arr, n_k, n_v, 1)
    if suffix == "out_proj.weight":
        # untile along the INPUT dim ([out, in] here; transposed later)
        per = n_v // n_k if n_k and n_v > n_k else 1
        if per == 1:
            return arr
        o = arr.shape[0]
        return np.ascontiguousarray(
            arr.reshape(o, per, n_k, dv).swapaxes(1, 2).reshape(o, -1)
        )
    return arr


# ---------------------------------------------------------------------------
# mmproj vision towers (reference: pipeline.rs:259-330 mmproj discovery,
# utils.rs:245-470 build_vision_config_from_gguf / tensor mapping)
# ---------------------------------------------------------------------------


def find_mmproj(model_path: str) -> Optional[str]:
    """Discover an ``mmproj*.gguf`` next to the model file; an exact
    ``mmproj-<mainname>`` match outranks generic ones (reference:
    pipeline.rs:264-330 mmproj_rank / find_local_mmproj_file)."""
    d = os.path.dirname(os.path.abspath(model_path))
    main = os.path.basename(model_path).lower()
    cands = [
        f for f in os.listdir(d)
        if f.lower().startswith("mmproj") and f.lower().endswith(".gguf")
    ]
    if not cands:
        return None
    cands.sort(key=lambda f: (0 if f.lower() == f"mmproj-{main}" else 1, f))
    return os.path.join(d, cands[0])


_MMPROJ_SUFFIX = {
    "attn_qkv.weight": "attn.qkv.weight",
    "attn_qkv.bias": "attn.qkv.bias",
    "attn_out.weight": "attn.proj.weight",
    "attn_out.bias": "attn.proj.bias",
    "ffn_up.weight": "mlp.linear_fc1.weight",
    "ffn_up.bias": "mlp.linear_fc1.bias",
    "ffn_down.weight": "mlp.linear_fc2.weight",
    "ffn_down.bias": "mlp.linear_fc2.bias",
    "ln1.weight": "norm1.weight",
    "ln1.bias": "norm1.bias",
    "ln2.weight": "norm2.weight",
    "ln2.bias": "norm2.bias",
}

_MMPROJ_TOP = {
    "v.post_ln.weight": "model.visual.merger.norm.weight",
    "v.post_ln.bias": "model.visual.merger.norm.bias",
    "mm.0.weight": "model.visual.merger.linear_fc1.weight",
    "mm.0.bias": "model.visual.merger.linear_fc1.bias",
    "mm.2.weight": "model.visual.merger.linear_fc2.weight",
    "mm.2.bias": "model.visual.merger.linear_fc2.bias",
    "v.position_embd.weight": "model.visual.pos_embed.weight",
    "v.patch_embd.bias": "model.visual.patch_embed.proj.bias",
}

_MMPROJ_DS = {
    "norm.weight": "norm.weight",
    "norm.bias": "norm.bias",
    "fc1.weight": "linear_fc1.weight",
    "fc1.bias": "linear_fc1.bias",
    "fc2.weight": "linear_fc2.weight",
    "fc2.bias": "linear_fc2.bias",
}


def map_mmproj_name(gname: str) -> Optional[str]:
    """clip/llama.cpp tensor names -> our Qwen3-VL tower names
    (reference: utils.rs map_gguf_vision_tensor_name)."""
    if gname.startswith("v.blk."):
        idx, _, suffix = gname[len("v.blk."):].partition(".")
        mapped = _MMPROJ_SUFFIX.get(suffix)
        if mapped is None:
            return None
        return f"model.visual.blocks.{idx}.{mapped}"
    if gname.startswith("v.ds_merger."):
        idx, _, suffix = gname[len("v.ds_merger."):].partition(".")
        mapped = _MMPROJ_DS.get(suffix)
        if mapped is None:
            return None
        return f"model.visual.deepstack_merger_list.{idx}.{mapped}"
    return _MMPROJ_TOP.get(gname)


def gguf_vision_config(g: GGUFFile) -> Dict[str, Any]:
    """clip.* metadata -> VisionConfig kwargs (reference:
    utils.rs:245-274 build_vision_config_from_gguf)."""
    md = g.metadata

    def get(key, default=None):
        v = md.get(f"clip.vision.{key}")
        return default if v is None else v

    patch = int(get("patch_size", 14))
    image = int(get("image_size", 768))
    ds = md.get("clip.vision.is_deepstack_layers") or []
    return dict(
        depth=int(get("block_count", 32)),
        hidden_size=int(get("embedding_length", 1152)),
        out_hidden_size=int(get("projection_dim", 2048)),
        intermediate_size=int(get("feed_forward_length", 4304)),
        num_heads=int(get("attention.head_count", 16)),
        in_channels=3,
        patch_size=patch,
        spatial_merge_size=int(get("spatial_merge_size", 2)),
        temporal_patch_size=2,
        num_position_embeddings=(image // patch) ** 2,
        deepstack_visual_indexes=[i for i, b in enumerate(ds) if b],
        hidden_act="gelu" if md.get("clip.use_gelu", True) else "silu",
        image_size=image,
    )


def load_gguf_mmproj(path: str, dtype=None) -> Tuple[Dict[str, Any], Dict]:
    """Load an mmproj GGUF into (vision_config_kwargs, tower params in
    our HF-style names).  The split temporal conv planes
    ``v.patch_embd.weight``/``.1`` stack on the temporal axis and flatten
    to the tower's matmul layout [C*tps*ps*ps, H]."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    g = GGUFFile(path)
    vc = gguf_vision_config(g)
    params: Dict[str, Any] = {}
    w1 = w2 = None
    for gname in g.tensors:
        arr = g.read_tensor(gname)
        if gname == "v.patch_embd.weight":
            w1 = arr
            continue
        if gname == "v.patch_embd.weight.1":
            w2 = arr
            continue
        name = map_mmproj_name(gname)
        if name is None:
            continue
        if arr.ndim == 2 and "pos_embed" not in name:
            arr = np.ascontiguousarray(arr.T)  # input-major (not tables)
        params[name] = jnp.asarray(arr, dtype)
    if w1 is not None:
        planes = [w1] if w2 is None else [w1, w2]
        vc["temporal_patch_size"] = len(planes)
        conv = np.stack(planes, axis=2)  # [H, C, tps, ps, ps]
        params["model.visual.patch_embed.proj.weight"] = jnp.asarray(
            np.ascontiguousarray(conv.reshape(conv.shape[0], -1).T), dtype
        )
    return vc, params
