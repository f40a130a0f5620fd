"""Multimodal pipeline tests: image preprocessing, the vision tower, and
VL generation through the full engine (tiny Qwen3-VL on CPU).

Covers the reference's multimodal surface (multimodal.rs image processing,
qwen3_vl vision tower + deepstack, chunked-prefill image slicing, and
image-seeded prefix hashing, prefix_cache.rs:371-383).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import (
    CacheConfig,
    ModelConfig,
    SchedulerConfig,
    VisionConfig,
)
from candle_vllm_tpu.engine.llm_engine import LLMEngine
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.multimodal.processor import (
    IMAGE_PLACEHOLDER,
    ImageProcessConfig,
    MultiModalInputs,
    Qwen3VLImageProcessor,
    vision_encoder_host_inputs,
)
from candle_vllm_tpu.sampling_params import SamplingParams

IMG_TOK = 120
VSTART, VEND = 118, 119


def tiny_vision():
    return VisionConfig(
        depth=2,
        hidden_size=32,
        out_hidden_size=64,  # = text hidden below
        intermediate_size=48,
        num_heads=2,
        in_channels=3,
        patch_size=2,
        spatial_merge_size=2,
        temporal_patch_size=2,
        num_position_embeddings=16,
        deepstack_visual_indexes=[0, 1],
        image_size=16,
    )


def tiny_vl_config(**kw):
    return ModelConfig(
        architecture=kw.pop("architecture", "Qwen3VLForConditionalGeneration"),
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=kw.pop("max_model_len", 128),
        dtype=jnp.float32,
        eos_token_ids=[],
        vision=tiny_vision(),
        image_token_id=IMG_TOK,
        vision_start_token_id=VSTART,
        vision_end_token_id=VEND,
        **kw,
    )


def proc_config():
    return ImageProcessConfig(
        patch_size=2,
        spatial_merge_size=2,
        temporal_patch_size=2,
        min_pixels=1,
        max_height=16,
        max_width=16,
        max_pixels=16 * 16,
    )


def make_image(h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def make_engine(cfg=None, **kw):
    chunk = kw.pop("prefill_chunk_size", 64)
    cfg = cfg or tiny_vl_config(**kw)
    cache = CacheConfig(block_size=8, num_gpu_blocks=64, num_cpu_blocks=0)
    sched = SchedulerConfig(
        max_num_seqs=8,
        max_num_batched_tokens=256,
        prefill_chunk_size=chunk,
        max_model_len=cfg.max_model_len,
        enable_prefix_caching=True,
        preemption_mode="recompute",
    )
    return LLMEngine(cfg, cache, sched, seed=0)


def vl_prompt(mm):
    n = mm.num_image_tokens
    return [1, 2, 3, VSTART] + [IMG_TOK] * n + [VEND, 4, 5, 6]


# ---------------------------------------------------------------------------
# processor
# ---------------------------------------------------------------------------


def test_patchify_shape_and_order():
    proc = Qwen3VLImageProcessor(proc_config())
    patches, (t, gh, gw) = proc.patchify(make_image(8, 8))
    assert (t, gh, gw) == (1, 4, 4)
    # patch rows: C * tps * ps * ps = 3*2*2*2 = 24 features
    assert patches.shape == (16, 24)
    assert patches.dtype == np.float32


def test_smart_resize_rounds_to_factor():
    proc = Qwen3VLImageProcessor(proc_config())
    nh, nw = proc.smart_resize(7, 9)
    assert nh % 4 == 0 and nw % 4 == 0
    # capped by max_pixels
    nh, nw = proc.smart_resize(400, 400)
    assert nh * nw <= 16 * 16


def test_placeholder_expansion_matches_token_count():
    proc = Qwen3VLImageProcessor(proc_config())
    mm, prompt = proc.process(
        [make_image()], prompt=f"look: {IMAGE_PLACEHOLDER} ok"
    )
    assert mm.num_image_tokens == 4  # 16 patches / merge 4
    assert prompt.count("<|image_pad|>") == 4
    assert "<|vision_start|>" in prompt and "<|vision_end|>" in prompt


def test_mm_seed_tracks_content():
    proc = Qwen3VLImageProcessor(proc_config())
    mm1, _ = proc.process([make_image(seed=1)])
    mm2, _ = proc.process([make_image(seed=2)])
    mm1b, _ = proc.process([make_image(seed=1)])
    assert mm1.seed != mm2.seed
    assert mm1.seed == mm1b.seed


def test_host_inputs_shapes():
    proc = Qwen3VLImageProcessor(proc_config())
    mm, _ = proc.process([make_image(), make_image(seed=3)])
    hi = vision_encoder_host_inputs(mm, tiny_vision())
    Np = hi["patches"].shape[0]
    assert Np == 64  # bucket above 32 patches
    assert hi["seg_ids"].shape == (Np,)
    # two images numbered 1, 2; rest padding 0
    assert set(hi["seg_ids"].tolist()) == {0, 1, 2}
    assert hi["cos"].shape == (Np, 16)  # head_dim
    np.testing.assert_allclose(
        hi["pos_w"].sum(axis=0)[:32], 1.0, atol=1e-6
    )


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------


def encode(model, mm, cfg):
    hi = vision_encoder_host_inputs(mm, cfg.vision)
    return model.encode_vision(model_params(model), hi)


_PARAMS = {}


def model_params(model):
    key = id(model)
    if key not in _PARAMS:
        _PARAMS[key] = model.init_params(seed=0)
    return _PARAMS[key]


def test_vision_encode_shapes_and_determinism():
    cfg = tiny_vl_config()
    model = get_model(cfg)
    proc = Qwen3VLImageProcessor(proc_config())
    mm, _ = proc.process([make_image()])
    out1 = encode(model, mm, cfg)
    out2 = encode(model, mm, cfg)
    # [1 + n_deepstack, bucket/merge, out_hidden]
    assert out1.shape == (3, 16, 64)
    np.testing.assert_array_equal(out1, out2)


def test_vision_segment_isolation():
    """Image A's embedding rows must not change when batched with image B
    (block-diagonal attention via segment ids)."""
    cfg = tiny_vl_config()
    model = get_model(cfg)
    proc = Qwen3VLImageProcessor(proc_config())
    mm_a, _ = proc.process([make_image(seed=1)])
    proc2 = Qwen3VLImageProcessor(proc_config())
    mm_ab, _ = proc2.process([make_image(seed=1), make_image(seed=2)])
    solo = encode(model, mm_a, cfg)[:, :4]
    both = encode(model, mm_ab, cfg)[:, :4]
    np.testing.assert_allclose(solo, both, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# engine end-to-end
# ---------------------------------------------------------------------------


def mm_for(*seeds):
    proc = Qwen3VLImageProcessor(proc_config())
    return proc.process([make_image(seed=s) for s in seeds])[0]


def run_vl(eng, mm, rid="r0", max_tokens=6):
    eng.add_request(
        rid,
        prompt_token_ids=vl_prompt(mm),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=max_tokens),
        mm_inputs=mm,
    )
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    return outs[rid]


def test_vl_generation_end_to_end():
    eng = make_engine()
    mm = mm_for(1)
    out = run_vl(eng, mm)
    assert len(out.outputs[0].token_ids) == 6
    assert out.finished


def test_image_content_changes_output_path():
    """Different pixels with identical token ids must flow through the
    model (embeddings differ => step inputs differ)."""
    eng = make_engine()
    mm1, mm2 = mm_for(1), mm_for(2)
    ids = vl_prompt(mm1)
    e1, p1 = eng._encode_mm(mm1, ids)
    e2, p2 = eng._encode_mm(mm2, ids)
    np.testing.assert_array_equal(p1, p2)
    assert not np.allclose(e1, e2)
    assert p1.tolist().count(-1) == len(ids) - mm1.num_image_tokens


def test_vl_generation_deterministic_across_engines():
    out1 = run_vl(make_engine(), mm_for(1))
    out2 = run_vl(make_engine(), mm_for(1))
    assert out1.outputs[0].token_ids == out2.outputs[0].token_ids


def test_vl_chunked_prefill():
    """Prompt split across multiple prefill chunks still lines image rows
    up with their positions (chunk size < image token run)."""
    base = run_vl(make_engine(), mm_for(1))
    chunked_eng = make_engine(prefill_chunk_size=4)
    chunked = run_vl(chunked_eng, mm_for(1))
    assert base.outputs[0].token_ids == chunked.outputs[0].token_ids


def test_prefix_cache_image_seed_separation():
    """Identical token ids with different images must not share prefix
    blocks (mix_seed, prefix_cache.rs:371-383)."""
    eng = make_engine()
    mm1, mm2 = mm_for(1), mm_for(2)
    assert mm1.seed != mm2.seed
    out1 = run_vl(eng, mm1, rid="a")
    # same-image rerun hits the cache
    eng.add_request(
        "b",
        prompt_token_ids=vl_prompt(mm1),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=2),
        mm_inputs=mm1,
    )
    while eng.has_unfinished_requests():
        eng.step()
    seq_b = None  # cached_tokens recorded on the group's first seq
    # different image: seed changes the hash chain -> no hits
    eng.add_request(
        "c",
        prompt_token_ids=vl_prompt(mm2),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=2),
        mm_inputs=mm2,
    )
    sched = eng.scheduler
    # inspect cached token counts recorded at allocation
    cached = {}
    while eng.has_unfinished_requests():
        for g in list(eng._groups.values()):
            for s in g.seqs.values():
                cached.setdefault(g.request_id, s.num_cached_tokens)
        eng.step()
    assert cached.get("c", 0) == 0


def test_text_only_request_on_vl_model():
    eng = make_engine()
    eng.add_request(
        "t",
        prompt_token_ids=[1, 2, 3, 4],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )
    while eng.has_unfinished_requests():
        outs = eng.step()
    # no crash, text path untouched
    assert True


# ---------------------------------------------------------------------------
# Gemma3-VL: SigLIP tower + avg-pool projector (reference: gemma3_vl/mod.rs)
# ---------------------------------------------------------------------------


def tiny_gemma3vl_config():
    return ModelConfig(
        architecture="Gemma3ForConditionalGeneration",
        model_type="gemma3",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        eos_token_ids=[],
        vision=VisionConfig(
            depth=2, hidden_size=32, out_hidden_size=32,
            intermediate_size=48, num_heads=2, in_channels=3,
            patch_size=2, spatial_merge_size=1, temporal_patch_size=1,
            num_position_embeddings=16, image_size=8,
        ),
        image_token_id=IMG_TOK,
        extra={"_outer_config": {"mm_tokens_per_image": 4}},
    )


def gemma_mm(*seeds):
    from candle_vllm_tpu.multimodal.processor import (
        ImageProcessConfig,
        TileImageProcessor,
    )

    cfg = ImageProcessConfig.from_model_config(tiny_gemma3vl_config())
    assert cfg.model_type == "gemma3"
    assert cfg.spatial_merge_size == 1
    proc = TileImageProcessor(cfg)
    return proc.process([make_image(8, 8, seed=s) for s in seeds])[0]


def test_gemma3vl_processor_fixed_tokens():
    mm = gemma_mm(1, 2)
    assert mm.num_patches == 32        # two 4x4 raster grids
    assert mm.num_image_tokens == 8    # 4 pooled tokens per image


def test_gemma3vl_encode_shapes():
    from candle_vllm_tpu.models.registry import get_model

    cfg = tiny_gemma3vl_config()
    model = get_model(cfg)
    assert type(model).__name__ == "Gemma3VLForConditionalGeneration"
    assert model.has_vision
    params = model.init_params(seed=0)
    mm = gemma_mm(1)
    hi = model.prepare_vision_inputs(mm)
    assert hi["patches"].shape == (1, 16, 12)  # [N, P, C*ps*ps]
    out = model.encode_vision(params, hi)
    assert out.shape == (1, 4, 64)     # [1, tokens_per_image, text hidden]


def test_gemma3vl_engine_end_to_end():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    cfg = tiny_gemma3vl_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_model_len=128, preemption_mode="recompute")
    eng = LLMEngine(cfg, cache, sched, seed=0)
    mm = gemma_mm(1)
    ids = [1, 2] + [IMG_TOK] * mm.num_image_tokens + [3, 4]
    eng.add_request("g", prompt_token_ids=ids,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=5),
                    mm_inputs=mm)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    assert len(outs["g"].outputs[0].token_ids) == 5
    # different image content changes the embeddings
    e1, _ = eng._encode_mm(gemma_mm(1), ids)
    e2, _ = eng._encode_mm(gemma_mm(5), ids)
    assert not np.allclose(e1, e2)


# ---------------------------------------------------------------------------
# Mistral3-VL: Pixtral tower + patch-merger projector
# (reference: mistral3_vl/vision.rs + mod.rs)
# ---------------------------------------------------------------------------


def tiny_mistral3vl_config():
    return ModelConfig(
        architecture="Mistral3ForConditionalGeneration",
        model_type="mistral3",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        eos_token_ids=[],
        vision=VisionConfig(
            depth=2, hidden_size=32, out_hidden_size=32,
            intermediate_size=48, num_heads=2, in_channels=3,
            patch_size=2, spatial_merge_size=2, temporal_patch_size=1,
            image_size=16, rope_theta=10000.0,
        ),
        image_token_id=IMG_TOK,
    )


def mistral_mm(*seeds, size=8):
    from candle_vllm_tpu.multimodal.processor import (
        ImageProcessConfig,
        TileImageProcessor,
    )

    cfg = ImageProcessConfig.from_model_config(tiny_mistral3vl_config())
    assert cfg.model_type == "mistral3"
    assert cfg.image_break_token == "[IMG_BREAK]"
    proc = TileImageProcessor(cfg)
    return proc.process([make_image(size, size, seed=s) for s in seeds])[0]


def test_mistral3vl_encode_shapes_and_determinism():
    from candle_vllm_tpu.models.registry import get_model

    cfg = tiny_mistral3vl_config()
    model = get_model(cfg)
    assert type(model).__name__ == "Mistral3ForConditionalGeneration"
    assert model.has_vision
    params = model.init_params(seed=0)
    mm = mistral_mm(1)                  # 8x8 img -> 4x4 patches, merge 2x2
    assert mm.num_patches == 16
    assert mm.num_image_tokens == 4
    hi = model.prepare_vision_inputs(mm)
    assert hi["patches"].shape[1] == 12          # C*ps*ps
    assert hi["cos"].shape[1] == 8               # head_dim/2
    out = model.encode_vision(params, hi)
    out2 = model.encode_vision(params, hi)
    assert out.shape[0] == 1 and out.shape[2] == 64
    np.testing.assert_allclose(out, out2, rtol=1e-5)


def test_mistral3vl_segment_isolation():
    """Two images in one batch must encode identically to each alone
    (block-diagonal attention via segment masks)."""
    from candle_vllm_tpu.models.registry import get_model

    cfg = tiny_mistral3vl_config()
    model = get_model(cfg)
    params = model.init_params(seed=0)
    both = mistral_mm(1, 2)
    a = mistral_mm(1)
    hb = model.prepare_vision_inputs(both)
    ha = model.prepare_vision_inputs(a)
    ob = model.encode_vision(params, hb)
    oa = model.encode_vision(params, ha)
    nm = a.num_image_tokens
    np.testing.assert_allclose(ob[0, :nm], oa[0, :nm], rtol=2e-4, atol=2e-4)


def test_mistral3vl_engine_end_to_end():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    cfg = tiny_mistral3vl_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_model_len=128, preemption_mode="recompute")
    eng = LLMEngine(cfg, cache, sched, seed=0)
    mm = mistral_mm(1)
    ids = [1, 2] + [IMG_TOK] * mm.num_image_tokens + [3, 4]
    eng.add_request("m", prompt_token_ids=ids,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=5),
                    mm_inputs=mm)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    assert len(outs["m"].outputs[0].token_ids) == 5
    e1, _ = eng._encode_mm(mistral_mm(1), ids)
    e2, _ = eng._encode_mm(mistral_mm(5), ids)
    assert not np.allclose(e1, e2)


# ---------------------------------------------------------------------------
# Llama4-VL: unfold tower + pixel-shuffle adapter
# (reference: llama4/vision.rs + mod.rs:304-343)
# ---------------------------------------------------------------------------


def tiny_llama4vl_config():
    return ModelConfig(
        architecture="Llama4ForConditionalGeneration",
        model_type="llama4",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        eos_token_ids=[],
        vision=VisionConfig(
            depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
            in_channels=3, patch_size=2, image_size=8,
            pixel_shuffle_ratio=0.5, projector_input_dim=24,
            projector_output_dim=24, vision_output_dim=24,
        ),
        image_token_id=IMG_TOK,
    )


def llama4_mm(*seeds):
    from candle_vllm_tpu.multimodal.processor import (
        ImageProcessConfig,
        TileImageProcessor,
    )

    cfg = ImageProcessConfig.from_model_config(tiny_llama4vl_config())
    assert cfg.model_type == "llama4"
    assert cfg.mm_tokens_per_image == 4   # (4 * 0.5)^2
    proc = TileImageProcessor(cfg)
    return proc.process([make_image(8, 8, seed=s) for s in seeds])[0]


def test_llama4vl_encode_shapes():
    from candle_vllm_tpu.models.registry import get_model

    cfg = tiny_llama4vl_config()
    model = get_model(cfg)
    assert type(model).__name__ == "Llama4ForConditionalGeneration"
    assert model.has_vision
    params = model.init_params(seed=0)
    mm = llama4_mm(1)
    hi = model.prepare_vision_inputs(mm)
    assert hi["patches"].shape == (1, 16, 12)
    out = model.encode_vision(params, hi)
    assert out.shape == (1, 4, 64)


def test_llama4vl_pixel_shuffle_layout():
    """Pixel shuffle must gather 2x2 spatial neighborhoods into one
    token's channel dim (vision.rs:430-460)."""
    from candle_vllm_tpu.models.vision import Llama4VisionTower

    cfg = tiny_llama4vl_config()
    tower = Llama4VisionTower(cfg)
    # tag each patch with (row, col); run just the shuffle reshapes
    s = tower.side
    H = cfg.vision.hidden_size
    x = np.zeros((1, s, s, H), np.float32)
    for i in range(s):
        for j in range(s):
            x[0, i, j, 0] = i * 10 + j
    r = cfg.vision.pixel_shuffle_ratio
    w2 = int(round(s * r))
    c2 = int(round(H / r))
    y = x.reshape(1, s, w2, c2).transpose(0, 2, 1, 3)
    y = y.reshape(1, w2, w2, tower.shuffled_dim).transpose(0, 2, 1, 3)
    y = y.reshape(1, tower.tokens_per_tile, tower.shuffled_dim)
    # token 0's channels must contain patches (0,0),(0,1),(1,0),(1,1) tags
    tags = {y[0, 0, k * H] for k in range(4)}
    assert tags == {0.0, 1.0, 10.0, 11.0}


def test_llama4vl_engine_end_to_end():
    from candle_vllm_tpu.engine.llm_engine import LLMEngine

    cfg = tiny_llama4vl_config()
    cache = CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0)
    sched = SchedulerConfig(max_model_len=128, preemption_mode="recompute")
    eng = LLMEngine(cfg, cache, sched, seed=0)
    mm = llama4_mm(1)
    ids = [1, 2] + [IMG_TOK] * mm.num_image_tokens + [3, 4]
    eng.add_request("g", prompt_token_ids=ids,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=5),
                    mm_inputs=mm)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    assert len(outs["g"].outputs[0].token_ids) == 5
    e1, _ = eng._encode_mm(llama4_mm(1), ids)
    e2, _ = eng._encode_mm(llama4_mm(5), ids)
    assert not np.allclose(e1, e2)
