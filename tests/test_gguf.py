"""GGUF: container parsing, K-quant dequantizers vs scalar ggml-spec
oracles, name mapping, end-to-end load into an engine."""

import struct

import numpy as np
import pytest

from candle_vllm_tpu.models import gguf


# ---------------------------------------------------------------------------
# synthetic GGUF writer (tests the parser against a real byte stream)
# ---------------------------------------------------------------------------


def _w_str(s):
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_kv(key, vtype, raw):
    return _w_str(key) + struct.pack("<I", vtype) + raw


def write_gguf(path, metadata, tensors):
    """tensors: list of (name, dims(ggml order), ggml_type, data_bytes)."""
    out = struct.pack("<IIQQ", gguf.GGUF_MAGIC, 3, len(tensors), len(metadata))
    for key, (vtype, raw) in metadata.items():
        out += _w_kv(key, vtype, raw)
    offset = 0
    infos = b""
    aligned = []
    for name, dims, ttype, data in tensors:
        infos += _w_str(name)
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


def pack_q8_0(x):
    x = x.reshape(-1, 32)
    d = np.abs(x).max(1) / 127.0
    d = np.maximum(d, 1e-8)
    q = np.clip(np.rint(x / d[:, None]), -127, 127).astype(np.int8)
    blocks = b""
    for i in range(x.shape[0]):
        blocks += np.float16(d[i]).tobytes() + q[i].tobytes()
    return blocks


# ---------------------------------------------------------------------------
# scalar oracles (written independently from the ggml spec)
# ---------------------------------------------------------------------------


def scalar_dequant_q4_k(raw):
    nb = len(raw) // 144
    out = np.zeros(nb * 256, np.float32)
    for b in range(nb):
        blk = raw[b * 144 : (b + 1) * 144]
        d = np.frombuffer(blk[:2], np.float16)[0].astype(np.float32)
        dmin = np.frombuffer(blk[2:4], np.float16)[0].astype(np.float32)
        sc = np.frombuffer(blk[4:16], np.uint8)
        qs = np.frombuffer(blk[16:], np.uint8)
        y = 0
        q = 0
        for j in range(0, 256, 64):
            js = j // 32
            if js < 4:
                s1, m1 = sc[js] & 63, sc[js + 4] & 63
            else:
                s1 = (sc[js + 4] & 0xF) | ((sc[js - 4] >> 6) << 4)
                m1 = (sc[js + 4] >> 4) | ((sc[js] >> 6) << 4)
            js += 1
            if js < 4:
                s2, m2 = sc[js] & 63, sc[js + 4] & 63
            else:
                s2 = (sc[js + 4] & 0xF) | ((sc[js - 4] >> 6) << 4)
                m2 = (sc[js + 4] >> 4) | ((sc[js] >> 6) << 4)
            for l in range(32):
                out[b * 256 + j + l] = d * s1 * (qs[q + l] & 0xF) - dmin * m1
                out[b * 256 + j + 32 + l] = d * s2 * (qs[q + l] >> 4) - dmin * m2
            q += 32
    return out


def scalar_dequant_q6_k(raw):
    nb = len(raw) // 210
    out = np.zeros(nb * 256, np.float32)
    for b in range(nb):
        blk = raw[b * 210 : (b + 1) * 210]
        ql = np.frombuffer(blk[:128], np.uint8)
        qh = np.frombuffer(blk[128:192], np.uint8)
        sc = np.frombuffer(blk[192:208], np.int8)
        d = np.frombuffer(blk[208:210], np.float16)[0].astype(np.float32)
        for half in range(2):
            base = half * 128
            qlh = ql[half * 64 :]
            qhh = qh[half * 32 :]
            for l in range(32):
                is_ = l // 16
                lo_l, lo_h = int(qlh[l]), int(qlh[l + 32])
                h = int(qhh[l])
                q1 = ((lo_l & 0xF) | (((h >> 0) & 3) << 4)) - 32
                q2 = ((lo_h & 0xF) | (((h >> 2) & 3) << 4)) - 32
                q3 = ((lo_l >> 4) | (((h >> 4) & 3) << 4)) - 32
                q4 = ((lo_h >> 4) | (((h >> 6) & 3) << 4)) - 32
                off = half * 8
                out[b * 256 + base + l] = d * sc[off + is_] * q1
                out[b * 256 + base + l + 32] = d * sc[off + is_ + 2] * q2
                out[b * 256 + base + l + 64] = d * sc[off + is_ + 4] * q3
                out[b * 256 + base + l + 96] = d * sc[off + is_ + 6] * q4
    return out


def test_q8_0_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(96).astype(np.float32)
    buf = pack_q8_0(x)
    got = gguf._dequant_q8_0(buf, 96)
    np.testing.assert_allclose(got, x, atol=0.02)


def test_q4_k_matches_scalar_oracle():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=2 * 144, dtype=np.uint8)
    # keep d/dmin sane (random f16 bits can be inf/nan)
    raw[:2] = np.frombuffer(np.float16(0.02).tobytes(), np.uint8)
    raw[2:4] = np.frombuffer(np.float16(0.01).tobytes(), np.uint8)
    raw[144:146] = raw[:2]
    raw[146:148] = raw[2:4]
    got = gguf._dequant_q4_k(raw.tobytes(), 512)
    ref = scalar_dequant_q4_k(raw.tobytes())
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_q6_k_matches_scalar_oracle():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, size=210, dtype=np.uint8)
    raw[208:210] = np.frombuffer(np.float16(0.05).tobytes(), np.uint8)
    got = gguf._dequant_q6_k(raw.tobytes(), 256)
    ref = scalar_dequant_q6_k(raw.tobytes())
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_encode_q4_k_roundtrip():
    """encode_q4_k -> dequant recovers the input within the 4-bit grid
    (sub-block step = range/15, plus 6-bit scale quantization)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(4 * 256).astype(np.float32)
    raw = gguf.encode_q4_k(x)
    assert len(raw) == 4 * 144
    dec = gguf._dequant_q4_k(raw, x.size)
    # scalar spec oracle agrees with the vectorized decode on our bytes
    np.testing.assert_allclose(dec, scalar_dequant_q4_k(raw), rtol=1e-5,
                               atol=1e-6)
    err = np.abs(dec - x)
    step = (x.reshape(-1, 32).max(1) - np.minimum(
        x.reshape(-1, 32).min(1), 0)) / 15.0
    assert err.max() <= step.repeat(32).max() * 0.75 + 1e-3
    assert err.mean() < 0.12
    cos = float(np.dot(dec, x) / (np.linalg.norm(dec) * np.linalg.norm(x)))
    assert cos > 0.995


def test_encode_q6_k_roundtrip():
    rng = np.random.default_rng(8)
    x = rng.standard_normal(3 * 256).astype(np.float32)
    raw = gguf.encode_q6_k(x)
    assert len(raw) == 3 * 210
    dec = gguf._dequant_q6_k(raw, x.size)
    np.testing.assert_allclose(dec, scalar_dequant_q6_k(raw), rtol=1e-5,
                               atol=1e-6)
    err = np.abs(dec - x)
    assert err.mean() < 0.04
    cos = float(np.dot(dec, x) / (np.linalg.norm(dec) * np.linalg.norm(x)))
    assert cos > 0.999


def test_encode_q4_k_grid_exact():
    """Values already ON the 4-bit grid round-trip exactly (no drift in
    the scale packing): build x from known ls/lm/q via the dequant
    formula, encode, decode, compare."""
    rng = np.random.default_rng(9)
    d, dmin = np.float32(0.02), np.float32(0.01)
    ls = rng.integers(17, 63, size=8)
    lm = rng.integers(0, 8, size=8)
    q = rng.integers(0, 16, size=(8, 32))
    # force q=0 and q=15 present per sub-block so minmax lands on the
    # same grid endpoints
    q[:, 0], q[:, 1] = 0, 15
    x = (d * ls[:, None] * q - dmin * lm[:, None]).astype(np.float32)
    dec = gguf._dequant_q4_k(gguf.encode_q4_k(x.reshape(-1)), 256)
    np.testing.assert_allclose(dec, x.reshape(-1), rtol=2e-2, atol=2e-3)


def test_convert_q4k_tensor_exact():
    """The native-format path (convert_q4k_tensor) represents every
    Q4_K value exactly in the kernel's asymmetric group-32 layout —
    max error is bf16 rounding of the scale/zoff planes (~0.4% of the
    scale term), vs ~half a 4-bit grid step for the requant chain."""
    import jax.numpy as jnp

    from candle_vllm_tpu.ops.quant import dequantize

    rng = np.random.default_rng(11)
    n_out, n_in = 256, 512
    x = rng.standard_normal(n_out * n_in).astype(np.float32)
    raw = gguf.encode_q4_k(x)
    container = gguf._dequant_q4_k(raw, x.size).reshape(n_out, n_in)

    qw, s, z = gguf.convert_q4k_tensor(raw, n_out, n_in)
    assert s.shape == (n_in // 32, n_out) and z.shape == s.shape
    params = {
        "t.qweight": jnp.asarray(qw),
        "t.scales": jnp.asarray(s, jnp.bfloat16),
        "t.zoffs_unused": jnp.asarray(0.0),
        "t.qzeros": jnp.asarray(z, jnp.bfloat16),
    }
    served = np.asarray(dequantize(params, "t"), np.float32).T  # [out, in]
    scale_mag = np.repeat(np.abs(s.T), 32, axis=1) * 16 + np.abs(
        np.repeat(z.T, 32, axis=1)
    )
    assert np.all(np.abs(served - container) <= scale_mag * 2 ** -8 + 1e-6)
    # exact f32 planes -> bit-exact match with the container dequant
    params["t.scales"] = jnp.asarray(s, jnp.float32)
    params["t.qzeros"] = jnp.asarray(z, jnp.float32)
    served32 = np.asarray(dequantize(params, "t"), np.float32).T
    np.testing.assert_allclose(served32, container, rtol=1e-5, atol=1e-6)


def test_gguf_q4k_native_load(tmp_path):
    """load_gguf(quantize='w4a16') takes the exact path for Q4_K
    projections (qzeros planes present) and the engine generates."""
    import jax.numpy as jnp

    from candle_vllm_tpu.config import (
        CacheConfig, ModelConfig, SchedulerConfig,
    )
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.models.registry import get_model
    from candle_vllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", hidden_size=512,
        intermediate_size=1024, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, head_dim=128,
        vocab_size=2048, max_model_len=256, dtype=jnp.float32,
    )
    params0 = get_model(cfg).init_params(seed=0)
    path = tmp_path / "chain.gguf"
    gguf.write_gguf_from_params(str(path), cfg, params0,
                                ggml_type=gguf.GGML_Q4_K)
    config, params = gguf.load_gguf(str(path), dtype=jnp.float32,
                                    quantize="w4a16", mmproj=None)
    assert "model.layers.0.mlp.gate_proj.qzeros" in params
    assert "model.layers.0.self_attn.o_proj.qzeros" in params
    # group-32 scale planes (in/32 rows)
    assert params["model.layers.0.mlp.gate_proj.scales"].shape[0] == \
        512 // 32
    # lm_head stays on the pad_vocab_out requant path
    assert not any(k == "lm_head.qzeros" for k in params)
    eng = LLMEngine(
        config,
        CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0),
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=64, max_model_len=256),
        params=params, seed=0,
    )
    out = eng.generate(
        [np.random.default_rng(5).integers(0, 2048, size=9).tolist()],
        SamplingParams(temperature=0.0, max_tokens=4),
    )
    assert len(out[0].outputs[0].token_ids) == 4


def test_name_mapping():
    assert gguf.map_gguf_name("token_embd.weight") == "model.embed_tokens.weight"
    assert (
        gguf.map_gguf_name("blk.3.attn_q.weight")
        == "model.layers.3.self_attn.q_proj.weight"
    )
    assert gguf.map_gguf_name("blk.0.ffn_down.weight") == \
        "model.layers.0.mlp.down_proj.weight"
    assert gguf.map_gguf_name("rope_freqs.weight") is None


def _meta_u32(v):
    return (4, struct.pack("<I", v))


def _meta_f32(v):
    return (6, struct.pack("<f", v))


def _meta_str(s):
    return (8, _w_str(s))


def test_gguf_end_to_end(tmp_path):
    """Write a tiny llama GGUF, load it, and generate."""
    import jax.numpy as jnp

    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(3)
    hidden, inter, vocab, heads, kv = 64, 128, 128, 4, 2
    hd = hidden // heads

    def t_f32(arr):  # ggml dims reversed vs numpy shape
        return list(reversed(arr.shape)), gguf.GGML_F32, arr.astype(np.float32).tobytes()

    def lin(i, o):  # HF layout [out, in]
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    tensors = [
        ("token_embd.weight", *t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *t_f32(np.ones(hidden))),
        ("output.weight", *t_f32(lin(hidden, vocab))),
    ]
    for i in range(2):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q.weight", *t_f32(lin(hidden, heads * hd))),
            (f"blk.{i}.attn_k.weight", *t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_v.weight", *t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_output.weight", *t_f32(lin(heads * hd, hidden))),
            (f"blk.{i}.ffn_gate.weight", *t_f32(lin(hidden, inter))),
            (f"blk.{i}.ffn_up.weight", *t_f32(lin(hidden, inter))),
            (f"blk.{i}.ffn_down.weight", *t_f32(lin(inter, hidden))),
        ]
    # one q8_0 tensor exercises the quantized path through the container
    # (HF layout [out=hidden, in=inter]; ggml dims are reversed)
    q8 = rng.standard_normal((hidden, inter)).astype(np.float32) * 0.05
    tensors[-1] = (
        "blk.1.ffn_down.weight", [inter, hidden], gguf.GGML_Q8_0,
        pack_q8_0(q8.reshape(-1)),
    )

    meta = {
        "general.architecture": _meta_str("llama"),
        "llama.embedding_length": _meta_u32(hidden),
        "llama.feed_forward_length": _meta_u32(inter),
        "llama.block_count": _meta_u32(2),
        "llama.attention.head_count": _meta_u32(heads),
        "llama.attention.head_count_kv": _meta_u32(kv),
        "llama.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "llama.context_length": _meta_u32(256),
        "llama.vocab_size": _meta_u32(vocab),
        "llama.rope.freq_base": _meta_f32(10000.0),
    }
    path = tmp_path / "tiny.gguf"
    write_gguf(str(path), meta, tensors)

    g = gguf.GGUFFile(str(path))
    assert g.metadata["general.architecture"] == "llama"
    got_q8 = g.read_tensor("blk.1.ffn_down.weight")
    np.testing.assert_allclose(got_q8, q8, atol=0.02)

    config, params = gguf.load_gguf(str(path), dtype=jnp.float32, quantize=None)
    assert config.num_hidden_layers == 2
    assert config.num_key_value_heads == kv
    assert params["model.layers.0.mlp.down_proj.weight"].shape == (inter, hidden)

    eng = LLMEngine(
        config,
        CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0),
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=64, max_model_len=128),
        params=params,
        seed=0,
    )
    out = eng.generate(
        [rng.integers(0, vocab, size=9).tolist()],
        SamplingParams(temperature=0.0, max_tokens=4),
    )
    assert len(out[0].outputs[0].token_ids) == 4


def test_tokenizer_from_gguf_metadata_bpe():
    from candle_vllm_tpu.utils.tokenizer import tokenizer_from_gguf_metadata

    # byte-level BPE vocab covering "hi there" (gpt2-family GGUFs)
    base = [chr(c) for c in range(33, 127)] + ["Ġ"]  # Ġ = space marker
    extra = ["hi", "th", "er", "ere", "Ġth", "Ġthere"]
    tokens = base + extra
    merges = ["h i", "t h", "e r", "er e", "Ġ th", "Ġth ere"]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": None,
        "tokenizer.ggml.eos_token_id": 0,
        "tokenizer.chat_template": "{{ messages }}",
    }
    tok = tokenizer_from_gguf_metadata(md)
    ids = tok.encode("hi there")
    assert ids, "BPE produced no ids"
    assert tok.decode(ids) == "hi there"
    assert tok.chat_template == "{{ messages }}"


def test_tokenizer_from_gguf_metadata_spm():
    from candle_vllm_tpu.utils.tokenizer import tokenizer_from_gguf_metadata

    tokens = ["<unk>", "<s>", "</s>", "▁", "▁hello", "▁world",
              "hel", "lo", "wor", "ld"] + [f"<0x{i:02X}>" for i in range(256)]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0, -2.0, -3.0, -3.0, -3.0, -3.0] + [-10.0] * 256
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    tok = tokenizer_from_gguf_metadata(md)
    ids = tok.encode("hello world")
    assert ids[0] == 1  # bos prepended
    assert tok.decode(ids) == "hello world"
    assert tok.eos_token_id == 2


def test_tokenizer_from_gguf_metadata_empty_falls_back():
    from candle_vllm_tpu.utils.tokenizer import (
        ByteTokenizer,
        tokenizer_from_gguf_metadata,
    )

    assert isinstance(tokenizer_from_gguf_metadata({}), ByteTokenizer)


# ---------------------------------------------------------------------------
# round-2 breadth: Q2_K / Q3_K / Q5_K + multi-shard discovery
# (reference: src/backend/gguf.rs:48-80)
# ---------------------------------------------------------------------------


def scalar_dequant_q2_k(raw_bytes):
    raw = np.frombuffer(raw_bytes, np.uint8)
    nb = len(raw) // 84
    out = []
    for i in range(nb):
        b = raw[i * 84 : (i + 1) * 84]
        sc = b[:16]
        qs = b[16:80]
        d = b[80:82].copy().view(np.float16).astype(np.float32)[0]
        dmin = b[82:84].copy().view(np.float16).astype(np.float32)[0]
        is_ = 0
        q_off = 0
        for n in range(0, 256, 128):
            shift = 0
            for j in range(4):
                s = sc[is_]; is_ += 1
                dl, ml = d * (s & 0xF), dmin * (s >> 4)
                for l in range(16):
                    out.append(dl * ((qs[q_off + l] >> shift) & 3) - ml)
                s = sc[is_]; is_ += 1
                dl, ml = d * (s & 0xF), dmin * (s >> 4)
                for l in range(16):
                    out.append(dl * ((qs[q_off + 16 + l] >> shift) & 3) - ml)
                shift += 2
            q_off += 32
    return np.asarray(out, np.float32)


def scalar_dequant_q3_k(raw_bytes):
    raw = np.frombuffer(raw_bytes, np.uint8)
    nb = len(raw) // 110
    out = []
    km1, km2 = 0x03030303, 0x0F0F0F0F
    for i in range(nb):
        blk = raw[i * 110 : (i + 1) * 110]
        hm = blk[:32]
        qs = blk[32:96]
        aux = blk[96:108].copy().view(np.uint32)
        d = blk[108:110].copy().view(np.float16).astype(np.float32)[0]
        a = [int(aux[0]), int(aux[1]), 0, 0]
        tmp = int(aux[2])
        a[2] = ((a[0] >> 4) & km2) | (((tmp >> 4) & km1) << 4)
        a[3] = ((a[1] >> 4) & km2) | (((tmp >> 6) & km1) << 4)
        a[0] = (a[0] & km2) | (((tmp >> 0) & km1) << 4)
        a[1] = (a[1] & km2) | (((tmp >> 2) & km1) << 4)
        scales = np.asarray(a, np.uint32).view(np.int8).astype(np.float32) - 32
        is_ = 0
        q_off = 0
        m = 1
        for n in range(0, 256, 128):
            shift = 0
            for j in range(4):
                for sub in range(2):
                    dl = d * scales[is_]; is_ += 1
                    for l in range(16):
                        q = int((qs[q_off + sub * 16 + l] >> shift) & 3)
                        if not (hm[sub * 16 + l] & m):
                            q -= 4
                        out.append(dl * q)
                shift += 2
                m <<= 1
            q_off += 32
    return np.asarray(out, np.float32)


def scalar_dequant_q5_k(raw_bytes):
    raw = np.frombuffer(raw_bytes, np.uint8)
    nb = len(raw) // 176
    out = []
    for i in range(nb):
        blk = raw[i * 176 : (i + 1) * 176]
        d = blk[:2].copy().view(np.float16).astype(np.float32)[0]
        dmin = blk[2:4].copy().view(np.float16).astype(np.float32)[0]
        sc8, mn8 = gguf._unpack_q4k_scales(blk[4:16][None, :])
        qh = blk[16:48]
        qs = blk[48:176]
        u1, u2 = 1, 2
        is_ = 0
        ql_off = 0
        for n in range(0, 256, 64):
            d1 = d * sc8[0, is_]; m1 = dmin * mn8[0, is_]
            d2 = d * sc8[0, is_ + 1]; m2 = dmin * mn8[0, is_ + 1]
            for l in range(32):
                v = (qs[ql_off + l] & 0xF) + (16 if qh[l] & u1 else 0)
                out.append(d1 * v - m1)
            for l in range(32):
                v = (qs[ql_off + l] >> 4) + (16 if qh[l] & u2 else 0)
                out.append(d2 * v - m2)
            ql_off += 32
            is_ += 2
            u1 <<= 2
            u2 <<= 2
    return np.asarray(out, np.float32)


def _rand_blocks(nblocks, block_bytes, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=nblocks * block_bytes, dtype=np.uint8)
    # keep the f16 scale fields finite/small: zero their exponents is
    # overkill; just accept whatever — NaN-free check below filters
    return raw


def _patch_f16(raw, block_bytes, offsets):
    """Replace f16 fields with small sane values to avoid inf/nan."""
    nb = len(raw) // block_bytes
    out = raw.copy().reshape(nb, block_bytes)
    rng = np.random.default_rng(1)
    for off in offsets:
        vals = (rng.normal(size=nb).astype(np.float16) * 0.1).view(np.uint8)
        out[:, off : off + 2] = vals.reshape(nb, 2)
    return out.reshape(-1)


def test_q2_k_matches_scalar_oracle():
    raw = _patch_f16(_rand_blocks(3, 84, 10), 84, [80, 82])
    got = gguf._dequant_q2_k(raw.tobytes(), 768)
    ref = scalar_dequant_q2_k(raw.tobytes())
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_q3_k_matches_scalar_oracle():
    raw = _patch_f16(_rand_blocks(3, 110, 11), 110, [108])
    got = gguf._dequant_q3_k(raw.tobytes(), 768)
    ref = scalar_dequant_q3_k(raw.tobytes())
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_q5_k_matches_scalar_oracle():
    raw = _patch_f16(_rand_blocks(3, 176, 12), 176, [0, 2])
    got = gguf._dequant_q5_k(raw.tobytes(), 768)
    ref = scalar_dequant_q5_k(raw.tobytes())
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_multi_shard_discovery(tmp_path):
    """-NNNNN-of-NNNNN shards merge into one tensor table."""
    import struct as st

    def write_gguf(path, tensors):
        # minimal v3 writer: no metadata, f32 tensors
        with open(path, "wb") as f:
            f.write(st.pack("<II", gguf.GGUF_MAGIC, 3))
            f.write(st.pack("<QQ", len(tensors), 0))
            blobs = []
            offset = 0
            for name, arr in tensors.items():
                nm = name.encode()
                f.write(st.pack("<Q", len(nm)) + nm)
                f.write(st.pack("<I", arr.ndim))
                for dim in reversed(arr.shape):
                    f.write(st.pack("<Q", dim))
                f.write(st.pack("<IQ", gguf.GGML_F32, offset))
                data = arr.astype(np.float32).tobytes()
                blobs.append(data)
                offset += (len(data) + 31) // 32 * 32
            base = f.tell()
            pad = (base + 31) // 32 * 32 - base
            f.write(b"\0" * pad)
            for data in blobs:
                f.write(data)
                f.write(b"\0" * ((len(data) + 31) // 32 * 32 - len(data)))

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(8, dtype=np.float32).reshape(2, 4) * 2
    write_gguf(tmp_path / "m-00001-of-00002.gguf", {"t.a": a})
    write_gguf(tmp_path / "m-00002-of-00002.gguf", {"t.b": b})
    g = gguf.GGUFFile(str(tmp_path / "m-00001-of-00002.gguf"))
    assert set(g.tensors) == {"t.a", "t.b"}
    np.testing.assert_array_equal(g.read_tensor("t.a"), a)
    np.testing.assert_array_equal(g.read_tensor("t.b"), b)


def _meta_bool_arr(vals):
    raw = struct.pack("<IQ", 7, len(vals)) + b"".join(
        struct.pack("<?", v) for v in vals
    )
    return (9, raw)


def test_gguf_mmproj_vision_tower(tmp_path):
    """mmproj discovery + clip.* tensor mapping + split temporal conv
    stacking (reference: pipeline.rs:259-330, utils.rs:245-470)."""
    import jax.numpy as jnp

    from candle_vllm_tpu.models.gguf import (
        find_mmproj,
        load_gguf,
        map_mmproj_name,
    )
    from candle_vllm_tpu.models.registry import get_model

    assert map_mmproj_name("v.blk.3.attn_qkv.weight") == \
        "model.visual.blocks.3.attn.qkv.weight"
    assert map_mmproj_name("mm.0.weight") == \
        "model.visual.merger.linear_fc1.weight"
    assert map_mmproj_name("v.ds_merger.0.fc1.bias") == \
        "model.visual.deepstack_merger_list.0.linear_fc1.bias"
    assert map_mmproj_name("v.unknown.thing") is None

    rng = np.random.default_rng(5)
    hidden, inter, vocab, heads, kv = 64, 128, 128, 4, 2
    hd = hidden // heads

    def t_f32(arr):
        return (list(reversed(arr.shape)), gguf.GGML_F32,
                arr.astype(np.float32).tobytes())

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    # -- main text GGUF (mirrors test_gguf_end_to_end's tiny llama) -------
    tensors = [
        ("token_embd.weight", *t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *t_f32(np.ones(hidden))),
        ("output.weight", *t_f32(lin(hidden, vocab))),
    ]
    for i in range(1):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q.weight", *t_f32(lin(hidden, heads * hd))),
            (f"blk.{i}.attn_k.weight", *t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_v.weight", *t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_output.weight", *t_f32(lin(heads * hd, hidden))),
            (f"blk.{i}.ffn_gate.weight", *t_f32(lin(hidden, inter))),
            (f"blk.{i}.ffn_up.weight", *t_f32(lin(hidden, inter))),
            (f"blk.{i}.ffn_down.weight", *t_f32(lin(inter, hidden))),
        ]
    toks = [f"t{j}" for j in range(vocab)]
    toks[100] = "<|image_pad|>"
    tok_raw = struct.pack("<IQ", 8, len(toks)) + b"".join(
        _w_str(t) for t in toks
    )
    meta = {
        "general.architecture": _meta_str("qwen2"),
        "qwen2.embedding_length": _meta_u32(hidden),
        "qwen2.feed_forward_length": _meta_u32(inter),
        "qwen2.block_count": _meta_u32(1),
        "qwen2.attention.head_count": _meta_u32(heads),
        "qwen2.attention.head_count_kv": _meta_u32(kv),
        "qwen2.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "qwen2.context_length": _meta_u32(256),
        "qwen2.vocab_size": _meta_u32(vocab),
        "qwen2.rope.freq_base": _meta_f32(10000.0),
        "tokenizer.ggml.tokens": (9, tok_raw),
    }
    main = tmp_path / "model.gguf"
    write_gguf(str(main), meta, tensors)

    # -- mmproj GGUF: depth-1 tower, patch 2, merge 2, image 8 ------------
    vh, vi, vheads, ps = 32, 48, 2, 2
    side = 8 // ps
    vt = [
        ("v.blk.0.attn_qkv.weight", *t_f32(lin(vh, 3 * vh))),
        ("v.blk.0.attn_qkv.bias", *t_f32(np.zeros(3 * vh))),
        ("v.blk.0.attn_out.weight", *t_f32(lin(vh, vh))),
        ("v.blk.0.attn_out.bias", *t_f32(np.zeros(vh))),
        ("v.blk.0.ffn_up.weight", *t_f32(lin(vh, vi))),
        ("v.blk.0.ffn_up.bias", *t_f32(np.zeros(vi))),
        ("v.blk.0.ffn_down.weight", *t_f32(lin(vi, vh))),
        ("v.blk.0.ffn_down.bias", *t_f32(np.zeros(vh))),
        ("v.blk.0.ln1.weight", *t_f32(np.ones(vh))),
        ("v.blk.0.ln1.bias", *t_f32(np.zeros(vh))),
        ("v.blk.0.ln2.weight", *t_f32(np.ones(vh))),
        ("v.blk.0.ln2.bias", *t_f32(np.zeros(vh))),
        ("v.post_ln.weight", *t_f32(np.ones(vh))),
        ("v.post_ln.bias", *t_f32(np.zeros(vh))),
        ("mm.0.weight", *t_f32(lin(vh * 4, vh * 4))),
        ("mm.0.bias", *t_f32(np.zeros(vh * 4))),
        ("mm.2.weight", *t_f32(lin(vh * 4, hidden))),
        ("mm.2.bias", *t_f32(np.zeros(hidden))),
        ("v.position_embd.weight",
         *t_f32(rng.standard_normal((side * side, vh)) * 0.05)),
        ("v.patch_embd.weight",
         *t_f32(rng.standard_normal((vh, 3, ps, ps)) * 0.05)),
        ("v.patch_embd.weight.1",
         *t_f32(rng.standard_normal((vh, 3, ps, ps)) * 0.05)),
        ("v.patch_embd.bias", *t_f32(np.zeros(vh))),
    ]
    vmeta = {
        "clip.vision.block_count": _meta_u32(1),
        "clip.vision.embedding_length": _meta_u32(vh),
        "clip.vision.projection_dim": _meta_u32(hidden),
        "clip.vision.feed_forward_length": _meta_u32(vi),
        "clip.vision.attention.head_count": _meta_u32(vheads),
        "clip.vision.patch_size": _meta_u32(ps),
        "clip.vision.image_size": _meta_u32(8),
        "clip.vision.spatial_merge_size": _meta_u32(2),
        "clip.vision.is_deepstack_layers": _meta_bool_arr([False]),
    }
    write_gguf(str(tmp_path / "mmproj-model.gguf"), vmeta, vt)

    assert find_mmproj(str(main)).endswith("mmproj-model.gguf")
    cfg, params = load_gguf(str(main), quantize=None)
    assert cfg.architecture == "Qwen3VLForConditionalGeneration"
    assert cfg.vision is not None and cfg.vision.depth == 1
    assert cfg.vision.temporal_patch_size == 2
    assert cfg.image_token_id == 100
    pw = params["model.visual.patch_embed.proj.weight"]
    assert pw.shape == (3 * 2 * ps * ps, vh)
    assert params["model.visual.pos_embed.weight"].shape == (side * side, vh)

    # the tower + model consume the loaded params end-to-end
    model = get_model(cfg)
    missing = set(model.vision_tower.param_shapes()) - set(params)
    assert not missing, missing


def pack_q4_0(x):
    """x: [n] float, n % 32 == 0 -> bytes (scalar reference packer)."""
    out = b""
    for blk in x.reshape(-1, 32):
        d = np.abs(blk).max() / 8.0 or 1e-8
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        out += np.float16(d).tobytes()
        out += bytes((q[i] | (q[i + 16] << 4)) for i in range(16))
    return out


def pack_q5_1(x):
    out = b""
    for blk in x.reshape(-1, 32):
        mn = blk.min()
        d = (blk.max() - mn) / 31.0 or 1e-8
        q = np.clip(np.round((blk - mn) / d), 0, 31).astype(np.uint32)
        out += np.float16(d).tobytes() + np.float16(mn).tobytes()
        qh = 0
        for i in range(32):
            qh |= int(q[i] >> 4) << i
        out += np.uint32(qh).tobytes()
        out += bytes(int(q[i] & 0xF) | (int(q[i + 16] & 0xF) << 4)
                     for i in range(16))
    return out


def test_q4_0_and_q5_1_roundtrip(tmp_path):
    import candle_vllm_tpu.models.gguf as gg

    rng = np.random.default_rng(9)
    x = (rng.standard_normal(64) * 3).astype(np.float32)
    got = gg._dequant_q4_0(pack_q4_0(x), 64)
    # the toy packer clips +absmax to 15 (one full step); the dequant
    # itself is exact for in-range codes
    d = np.abs(x).max() / 8.0
    np.testing.assert_allclose(got, x, atol=d * 1.01 + 1e-3)

    got5 = gg._dequant_q5_1(pack_q5_1(x), 64)
    dd = (x.max() - x.min()) / 31.0
    np.testing.assert_allclose(got5, x, atol=dd * 0.51 + 1e-2)


# ---------------------------------------------------------------------------
# round-3: MoE / MLA / GDN GGUF twins (reference: pipeline.rs:818-1100,
# quantized_qwen3_moe.rs, quantized_deepseek.rs, quantized_qwen3_5.rs)
# ---------------------------------------------------------------------------


def _t_f32(arr):
    return (list(reversed(arr.shape)), gguf.GGML_F32,
            np.ascontiguousarray(arr).astype(np.float32).tobytes())


def _gen_smoke(config, params, vocab, seed=0):
    import jax.numpy as jnp  # noqa: F401

    from candle_vllm_tpu.config import CacheConfig, SchedulerConfig
    from candle_vllm_tpu.engine.llm_engine import LLMEngine
    from candle_vllm_tpu.sampling_params import SamplingParams

    eng = LLMEngine(
        config,
        CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0),
        SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128,
                        prefill_chunk_size=64, max_model_len=128),
        params=params,
        seed=seed,
    )
    rng = np.random.default_rng(seed)
    out = eng.generate(
        [rng.integers(0, vocab, size=7).tolist()],
        SamplingParams(temperature=0.0, max_tokens=4),
    )
    toks = out[0].outputs[0].token_ids
    assert len(toks) == 4
    return toks


def test_gguf_moe_twin(tmp_path):
    """qwen3moe GGUF: expert banks stack into [E, in, out] banks, the
    router maps to mlp.gate, and the loaded model generates."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    hidden, vocab, heads, kv = 32, 64, 4, 2
    hd = hidden // heads
    E, k, moe_I = 4, 2, 48

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("output.weight", *_t_f32(lin(hidden, vocab))),
    ]
    for i in range(2):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q.weight", *_t_f32(lin(hidden, heads * hd))),
            (f"blk.{i}.attn_k.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_v.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_output.weight", *_t_f32(lin(heads * hd, hidden))),
            (f"blk.{i}.attn_q_norm.weight", *_t_f32(np.ones(hd))),
            (f"blk.{i}.attn_k_norm.weight", *_t_f32(np.ones(hd))),
            # expert banks: ggml dims [in, out, E] -> numpy [E, out, in]
            (f"blk.{i}.ffn_gate_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_up_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_down_exps.weight",
             *_t_f32(rng.standard_normal((E, hidden, moe_I)) * 0.05)),
            (f"blk.{i}.ffn_gate_inp.weight", *_t_f32(lin(hidden, E))),
        ]
    meta = {
        "general.architecture": _meta_str("qwen3moe"),
        "qwen3moe.embedding_length": _meta_u32(hidden),
        "qwen3moe.feed_forward_length": _meta_u32(64),
        "qwen3moe.block_count": _meta_u32(2),
        "qwen3moe.attention.head_count": _meta_u32(heads),
        "qwen3moe.attention.head_count_kv": _meta_u32(kv),
        "qwen3moe.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "qwen3moe.context_length": _meta_u32(256),
        "qwen3moe.vocab_size": _meta_u32(vocab),
        "qwen3moe.rope.freq_base": _meta_f32(10000.0),
        "qwen3moe.expert_count": _meta_u32(E),
        "qwen3moe.expert_used_count": _meta_u32(k),
        "qwen3moe.expert_feed_forward_length": _meta_u32(moe_I),
    }
    path = tmp_path / "moe.gguf"
    write_gguf(str(path), meta, tensors)

    config, params = gguf.load_gguf(str(path), dtype=jnp.float32, quantize=None)
    assert config.architecture == "Qwen3MoeForCausalLM"
    assert config.moe.num_experts == E
    assert config.moe.num_experts_per_tok == k
    assert config.moe.moe_intermediate_size == moe_I
    assert params["model.layers.0.mlp.experts.gate_proj"].shape == (E, hidden, moe_I)
    assert params["model.layers.0.mlp.experts.down_proj"].shape == (E, moe_I, hidden)
    assert params["model.layers.0.mlp.gate.weight"].shape == (hidden, E)
    _gen_smoke(config, params, vocab)


def test_gguf_moe_separate_banks_for_tp(tmp_path):
    """``fuse_moe_gate_up=False`` re-quantizes gate/up expert banks
    separately on 256-wide tiles (TP-shardable scale-aligned, PARITY gap:
    fused GGUF banks replicate under TP) and matches the fused load."""
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    hidden, vocab, heads, kv = 256, 64, 4, 2
    hd = hidden // heads
    E, k, moe_I = 4, 2, 256

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("output.weight", *_t_f32(lin(hidden, vocab))),
    ]
    for i in range(1):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q.weight", *_t_f32(lin(hidden, heads * hd))),
            (f"blk.{i}.attn_k.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_v.weight", *_t_f32(lin(hidden, kv * hd))),
            (f"blk.{i}.attn_output.weight", *_t_f32(lin(heads * hd, hidden))),
            (f"blk.{i}.attn_q_norm.weight", *_t_f32(np.ones(hd))),
            (f"blk.{i}.attn_k_norm.weight", *_t_f32(np.ones(hd))),
            (f"blk.{i}.ffn_gate_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_up_exps.weight",
             *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
            (f"blk.{i}.ffn_down_exps.weight",
             *_t_f32(rng.standard_normal((E, hidden, moe_I)) * 0.05)),
            (f"blk.{i}.ffn_gate_inp.weight", *_t_f32(lin(hidden, E))),
        ]
    meta = {
        "general.architecture": _meta_str("qwen3moe"),
        "qwen3moe.embedding_length": _meta_u32(hidden),
        "qwen3moe.feed_forward_length": _meta_u32(64),
        "qwen3moe.block_count": _meta_u32(1),
        "qwen3moe.attention.head_count": _meta_u32(heads),
        "qwen3moe.attention.head_count_kv": _meta_u32(kv),
        "qwen3moe.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "qwen3moe.context_length": _meta_u32(256),
        "qwen3moe.vocab_size": _meta_u32(vocab),
        "qwen3moe.rope.freq_base": _meta_f32(10000.0),
        "qwen3moe.expert_count": _meta_u32(E),
        "qwen3moe.expert_used_count": _meta_u32(k),
        "qwen3moe.expert_feed_forward_length": _meta_u32(moe_I),
    }
    path = tmp_path / "moe256.gguf"
    write_gguf(str(path), meta, tensors)

    cfg_f, p_fused = gguf.load_gguf(str(path), dtype=jnp.float32)
    assert "model.layers.0.mlp.experts.gate_up_proj.qweight" in p_fused
    cfg_s, p_sep = gguf.load_gguf(
        str(path), dtype=jnp.float32, fuse_moe_gate_up=False
    )
    gq = p_sep["model.layers.0.mlp.experts.gate_proj.qweight"]
    assert "model.layers.0.mlp.experts.gate_up_proj.qweight" not in p_sep
    # 256-wide tiles: tile axis divides common tp sizes
    assert gq.shape[1] == moe_I // 256
    assert p_sep["model.layers.0.mlp.experts.up_proj.qweight"].shape == gq.shape
    # separate banks can host-offload (fused refuse)
    from candle_vllm_tpu.ops.quant import offload_expert_banks

    off = offload_expert_banks(dict(p_sep), 1)
    assert any(n.endswith("_offload") for n in off)

    ta = _gen_smoke(cfg_f, p_fused, vocab)
    tb = _gen_smoke(cfg_s, p_sep, vocab)
    assert ta == tb, (ta, tb)


def test_gguf_mla_twin(tmp_path):
    """deepseek2 GGUF: MLA projections + first-k-dense + MoE layers load
    and the model generates."""
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    hidden, vocab, heads = 32, 64, 2
    q_lora, kv_lora, rope_d, nope, v_dim = 24, 16, 8, 8, 8
    E, k, moe_I, shared_I = 4, 2, 40, 40

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("output.weight", *_t_f32(lin(hidden, vocab))),
    ]
    for i in range(2):
        tensors += [
            (f"blk.{i}.attn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.ffn_norm.weight", *_t_f32(np.ones(hidden))),
            (f"blk.{i}.attn_q_a.weight", *_t_f32(lin(hidden, q_lora))),
            (f"blk.{i}.attn_q_a_norm.weight", *_t_f32(np.ones(q_lora))),
            (f"blk.{i}.attn_q_b.weight",
             *_t_f32(lin(q_lora, heads * (nope + rope_d)))),
            (f"blk.{i}.attn_kv_a_mqa.weight",
             *_t_f32(lin(hidden, kv_lora + rope_d))),
            (f"blk.{i}.attn_kv_a_norm.weight", *_t_f32(np.ones(kv_lora))),
            (f"blk.{i}.attn_kv_b.weight",
             *_t_f32(lin(kv_lora, heads * (nope + v_dim)))),
            (f"blk.{i}.attn_output.weight", *_t_f32(lin(heads * v_dim, hidden))),
        ]
    # layer 0 dense, layer 1 MoE (leading_dense_block_count = 1)
    tensors += [
        ("blk.0.ffn_gate.weight", *_t_f32(lin(hidden, 64))),
        ("blk.0.ffn_up.weight", *_t_f32(lin(hidden, 64))),
        ("blk.0.ffn_down.weight", *_t_f32(lin(64, hidden))),
        ("blk.1.ffn_gate_exps.weight",
         *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
        ("blk.1.ffn_up_exps.weight",
         *_t_f32(rng.standard_normal((E, moe_I, hidden)) * 0.05)),
        ("blk.1.ffn_down_exps.weight",
         *_t_f32(rng.standard_normal((E, hidden, moe_I)) * 0.05)),
        ("blk.1.ffn_gate_inp.weight", *_t_f32(lin(hidden, E))),
        ("blk.1.exp_probs_b.bias", *_t_f32(np.zeros(E))),
        ("blk.1.ffn_gate_shexp.weight", *_t_f32(lin(hidden, shared_I))),
        ("blk.1.ffn_up_shexp.weight", *_t_f32(lin(hidden, shared_I))),
        ("blk.1.ffn_down_shexp.weight", *_t_f32(lin(shared_I, hidden))),
    ]
    meta = {
        "general.architecture": _meta_str("deepseek2"),
        "deepseek2.embedding_length": _meta_u32(hidden),
        "deepseek2.feed_forward_length": _meta_u32(64),
        "deepseek2.block_count": _meta_u32(2),
        "deepseek2.attention.head_count": _meta_u32(heads),
        "deepseek2.attention.head_count_kv": _meta_u32(heads),
        "deepseek2.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "deepseek2.context_length": _meta_u32(256),
        "deepseek2.vocab_size": _meta_u32(vocab),
        "deepseek2.rope.freq_base": _meta_f32(10000.0),
        "deepseek2.attention.q_lora_rank": _meta_u32(q_lora),
        "deepseek2.attention.kv_lora_rank": _meta_u32(kv_lora),
        "deepseek2.attention.key_length": _meta_u32(nope + rope_d),
        "deepseek2.attention.value_length": _meta_u32(v_dim),
        "deepseek2.rope.dimension_count": _meta_u32(rope_d),
        "deepseek2.expert_count": _meta_u32(E),
        "deepseek2.expert_used_count": _meta_u32(k),
        "deepseek2.expert_feed_forward_length": _meta_u32(moe_I),
        "deepseek2.expert_shared_feed_forward_length": _meta_u32(shared_I),
        "deepseek2.leading_dense_block_count": _meta_u32(1),
        "deepseek2.expert_weights_scale": _meta_f32(1.0),
        "deepseek2.expert_gating_func": _meta_u32(2),
    }
    path = tmp_path / "mla.gguf"
    write_gguf(str(path), meta, tensors)

    config, params = gguf.load_gguf(str(path), dtype=jnp.float32, quantize=None)
    assert config.architecture == "DeepseekV2ForCausalLM"
    assert config.q_lora_rank == q_lora
    assert config.kv_lora_rank == kv_lora
    assert config.qk_nope_head_dim == nope
    assert config.v_head_dim == v_dim
    assert config.moe.first_k_dense_replace == 1
    assert config.moe.scoring_func == "sigmoid"
    assert params["model.layers.0.self_attn.q_b_proj.weight"].shape == (
        q_lora, heads * (nope + rope_d)
    )
    assert "model.layers.1.mlp.gate.e_score_correction_bias" in params
    assert "model.layers.1.mlp.shared_expert.gate_proj.weight" in params
    _gen_smoke(config, params, vocab)


def test_gguf_unmapped_tensor_is_hard_error(tmp_path):
    """Unknown tensors must fail the load (silent drops turn a MoE GGUF
    into a broken dense model; VERDICT r2 weak #6)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    hidden, vocab = 32, 64
    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)))),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("blk.0.ffn_whatever_new.weight", *_t_f32(np.ones((4, 4)))),
    ]
    meta = {
        "general.architecture": _meta_str("llama"),
        "llama.embedding_length": _meta_u32(hidden),
        "llama.block_count": _meta_u32(1),
        "llama.vocab_size": _meta_u32(vocab),
    }
    path = tmp_path / "bad.gguf"
    write_gguf(str(path), meta, tensors)
    with pytest.raises(ValueError, match="ffn_whatever_new"):
        gguf.load_gguf(str(path), dtype=jnp.float32, quantize=None)


def test_gguf_gdn_twin_untiling(tmp_path):
    """qwen3.5/qwen3next GDN: split projections map per layer kind, the
    tiled v-head layout untiles, and ssm_a recovers A_log (reference:
    quantized_qwen3_5.rs:25-90,140-330)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    hidden, vocab, heads, kv = 32, 64, 4, 2
    hd = hidden // heads
    n_k, n_v, dk, dv, convw = 2, 4, 8, 8, 4
    key_dim, value_dim = n_k * dk, n_v * dv
    conv_dim = 2 * key_dim + value_dim
    per = n_v // n_k

    def lin(i, o):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.05

    def tile_rows(a, head_dim):
        # canonical [n_k, per, head_dim, ...] -> gguf [per, n_k, head_dim]
        rest = a.shape[1:]
        return np.ascontiguousarray(
            a.reshape(n_k, per, head_dim, *rest).swapaxes(0, 1).reshape(a.shape)
        )

    # canonical split-projection weights, INPUT-MAJOR [in, out] (what the
    # loaded params must equal)
    qkv_w = lin(hidden, 2 * key_dim + value_dim).T
    z_w = lin(hidden, value_dim).T
    b_w = lin(hidden, n_v).T
    a_w = lin(hidden, n_v).T
    out_w = lin(value_dim, hidden).T
    conv_w = rng.standard_normal((conv_dim, convw)).astype(np.float32) * 0.1
    a_log = rng.uniform(0.1, 1.0, n_v).astype(np.float32)
    dt_bias = rng.uniform(0.1, 1.0, n_v).astype(np.float32)

    # gguf layouts: [out, in] with tiled v rows
    qkv_g = np.concatenate(
        [qkv_w.T[: 2 * key_dim], tile_rows(qkv_w.T[2 * key_dim :], dv)], 0
    )
    z_g = tile_rows(z_w.T, dv)
    b_g = tile_rows(b_w.T, 1)
    a_g = tile_rows(a_w.T, 1)
    out_g = out_w.T.reshape(hidden, n_k, per, dv).swapaxes(1, 2).reshape(
        hidden, value_dim
    )
    conv_g = np.concatenate(
        [conv_w[: 2 * key_dim], tile_rows(conv_w[2 * key_dim :], dv)], 0
    )
    ssm_a = -np.exp(tile_rows(a_log[:, None], 1)[:, 0])
    dt_g = tile_rows(dt_bias[:, None], 1)[:, 0]

    tensors = [
        ("token_embd.weight", *_t_f32(rng.standard_normal((vocab, hidden)) * 0.05)),
        ("output_norm.weight", *_t_f32(np.ones(hidden))),
        ("output.weight", *_t_f32(lin(hidden, vocab))),
        # layer 0: GDN; layer 1: full attention (interval 2)
        ("blk.0.attn_norm.weight", *_t_f32(np.ones(hidden))),
        ("blk.0.ffn_norm.weight", *_t_f32(np.ones(hidden))),
        ("blk.0.attn_qkv.weight", *_t_f32(qkv_g)),
        ("blk.0.attn_gate.weight", *_t_f32(z_g)),
        ("blk.0.ssm_beta.weight", *_t_f32(b_g)),
        ("blk.0.ssm_alpha.weight", *_t_f32(a_g)),
        ("blk.0.ssm_out.weight", *_t_f32(out_g)),
        ("blk.0.ssm_conv1d.weight", *_t_f32(conv_g)),
        ("blk.0.ssm_a", *_t_f32(ssm_a)),
        ("blk.0.ssm_dt.bias", *_t_f32(dt_g)),
        ("blk.0.ssm_norm.weight", *_t_f32(np.ones(dv))),
        ("blk.0.ffn_gate.weight", *_t_f32(lin(hidden, 64))),
        ("blk.0.ffn_up.weight", *_t_f32(lin(hidden, 64))),
        ("blk.0.ffn_down.weight", *_t_f32(lin(64, hidden))),
        ("blk.1.attn_norm.weight", *_t_f32(np.ones(hidden))),
        ("blk.1.ffn_norm.weight", *_t_f32(np.ones(hidden))),
        ("blk.1.attn_q.weight", *_t_f32(lin(hidden, 2 * heads * hd))),
        ("blk.1.attn_k.weight", *_t_f32(lin(hidden, kv * hd))),
        ("blk.1.attn_v.weight", *_t_f32(lin(hidden, kv * hd))),
        ("blk.1.attn_output.weight", *_t_f32(lin(heads * hd, hidden))),
        ("blk.1.attn_q_norm.weight", *_t_f32(np.ones(hd))),
        ("blk.1.attn_k_norm.weight", *_t_f32(np.ones(hd))),
        ("blk.1.ffn_gate.weight", *_t_f32(lin(hidden, 64))),
        ("blk.1.ffn_up.weight", *_t_f32(lin(hidden, 64))),
        ("blk.1.ffn_down.weight", *_t_f32(lin(64, hidden))),
    ]
    meta = {
        "general.architecture": _meta_str("qwen3_5"),
        "qwen3_5.embedding_length": _meta_u32(hidden),
        "qwen3_5.feed_forward_length": _meta_u32(64),
        "qwen3_5.block_count": _meta_u32(2),
        "qwen3_5.attention.head_count": _meta_u32(heads),
        "qwen3_5.attention.head_count_kv": _meta_u32(kv),
        "qwen3_5.attention.key_length": _meta_u32(hd),
        "qwen3_5.attention.layer_norm_rms_epsilon": _meta_f32(1e-5),
        "qwen3_5.context_length": _meta_u32(256),
        "qwen3_5.vocab_size": _meta_u32(vocab),
        "qwen3_5.rope.freq_base": _meta_f32(10000.0),
        "qwen3_5.ssm.group_count": _meta_u32(n_k),
        "qwen3_5.ssm.time_step_rank": _meta_u32(n_v),
        "qwen3_5.ssm.state_size": _meta_u32(dk),
        "qwen3_5.ssm.inner_size": _meta_u32(value_dim),
        "qwen3_5.ssm.conv_kernel": _meta_u32(convw),
        "qwen3_5.full_attention_interval": _meta_u32(2),
    }
    path = tmp_path / "gdn.gguf"
    write_gguf(str(path), meta, tensors)

    config, params = gguf.load_gguf(str(path), dtype=jnp.float32, quantize=None)
    assert config.architecture == "Qwen3_5ForCausalLM"
    g = "model.layers.0.linear_attn"
    np.testing.assert_allclose(params[f"{g}.in_proj_qkv.weight"], qkv_w,
                               rtol=1e-6)
    np.testing.assert_allclose(params[f"{g}.in_proj_z.weight"], z_w, rtol=1e-6)
    np.testing.assert_allclose(params[f"{g}.in_proj_b.weight"], b_w, rtol=1e-6)
    np.testing.assert_allclose(params[f"{g}.out_proj.weight"], out_w,
                               rtol=1e-6)
    np.testing.assert_allclose(params[f"{g}.conv1d.weight"], conv_w, rtol=1e-6)
    np.testing.assert_allclose(params[f"{g}.A_log"], a_log, rtol=1e-5)
    np.testing.assert_allclose(params[f"{g}.dt_bias"], dt_bias, rtol=1e-6)
    _gen_smoke(config, params, vocab)
