"""End-to-end engine tests: continuous batching, chunked prefill,
preemption, prefix caching, stop handling — tiny model on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from candle_vllm_tpu.engine.llm_engine import LLMEngine
from candle_vllm_tpu.sampling_params import SamplingParams


class FakeTokenizer:
    """Token id <-> text mapping good enough for streaming decode tests."""

    def encode(self, text):
        return [int(w) for w in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def make_engine(**kw):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=kw.pop("max_model_len", 128),
        dtype=jnp.float32,
        eos_token_ids=kw.pop("eos_token_ids", []),
    )
    cache = CacheConfig(
        block_size=8,
        num_gpu_blocks=kw.pop("num_gpu_blocks", 64),
        num_cpu_blocks=kw.pop("num_cpu_blocks", 16),
        kv_cache_dtype=kw.pop("kv_cache_dtype", "auto"),
    )
    sched = SchedulerConfig(
        max_num_seqs=kw.pop("max_num_seqs", 8),
        max_num_batched_tokens=kw.pop("max_num_batched_tokens", 256),
        prefill_chunk_size=kw.pop("prefill_chunk_size", 64),
        max_model_len=cfg.max_model_len,
        enable_prefix_caching=kw.pop("enable_prefix_caching", True),
        preemption_mode=kw.pop("preemption_mode", "recompute"),
        swap_in_cooldown_steps=kw.pop("swap_in_cooldown_steps", 0),
    )
    return LLMEngine(cfg, cache, sched, tokenizer=FakeTokenizer(), seed=0, **kw)


def prompts(rng, n, lo=4, hi=24):
    return [rng.integers(0, 128, size=rng.integers(lo, hi)).tolist() for _ in range(n)]


def test_greedy_generate_deterministic():
    rng = np.random.default_rng(0)
    ps = prompts(rng, 3)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    eng1 = make_engine()
    out1 = eng1.generate(ps, sp)
    eng2 = make_engine()
    out2 = eng2.generate(ps, sp)
    for a, b in zip(out1, out2):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids
        assert len(a.outputs[0].token_ids) == 8
        assert a.outputs[0].finish_reason == "length"
        assert a.finished


def test_batching_matches_sequential():
    """A batch of requests must produce the same tokens as one-at-a-time."""
    rng = np.random.default_rng(1)
    ps = prompts(rng, 4)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    batched = make_engine().generate(ps, sp)
    for i, p in enumerate(ps):
        solo = make_engine().generate([p], sp)
        assert solo[0].outputs[0].token_ids == batched[i].outputs[0].token_ids, i


def test_chunked_prefill_long_prompt():
    rng = np.random.default_rng(2)
    p = rng.integers(0, 128, size=50).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    full = make_engine(prefill_chunk_size=64).generate([p], sp)
    chunked = make_engine(prefill_chunk_size=16).generate([p], sp)
    assert full[0].outputs[0].token_ids == chunked[0].outputs[0].token_ids


def test_preemption_by_recompute():
    # tiny KV pool forces preemption; results must still match the
    # unconstrained engine
    rng = np.random.default_rng(3)
    ps = prompts(rng, 4, lo=8, hi=16)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ref = make_engine().generate(ps, sp)
    tight = make_engine(num_gpu_blocks=14, enable_prefix_caching=False).generate(ps, sp)
    for a, b in zip(ref, tight):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_stop_token_and_stop_string():
    rng = np.random.default_rng(4)
    p = rng.integers(0, 128, size=8).tolist()
    first = make_engine().generate([p], SamplingParams(temperature=0.0, max_tokens=3))
    toks = first[0].outputs[0].token_ids
    # stop on the second generated token
    out = make_engine().generate(
        [p], SamplingParams(temperature=0.0, max_tokens=10, stop_token_ids=[toks[1]])
    )
    assert out[0].outputs[0].finish_reason == "stop"
    first_occurrence = toks.index(toks[1])
    assert out[0].outputs[0].token_ids == toks[: first_occurrence + 1]
    # stop string: the decoded text of token[1]
    out2 = make_engine().generate(
        [p], SamplingParams(temperature=0.0, max_tokens=10, stop=str(toks[1]))
    )
    assert out2[0].outputs[0].finish_reason == "stop"
    assert str(toks[1]) not in out2[0].outputs[0].text


def test_eos_and_ignore_eos():
    rng = np.random.default_rng(5)
    p = rng.integers(0, 128, size=8).tolist()
    first = make_engine().generate([p], SamplingParams(temperature=0.0, max_tokens=2))
    tok0 = first[0].outputs[0].token_ids[0]
    out = make_engine(eos_token_ids=[tok0]).generate(
        [p], SamplingParams(temperature=0.0, max_tokens=10)
    )
    assert out[0].outputs[0].finish_reason == "stop"
    assert len(out[0].outputs[0].token_ids) == 1
    out2 = make_engine(eos_token_ids=[tok0]).generate(
        [p], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    )
    assert len(out2[0].outputs[0].token_ids) == 5


def test_prefix_cache_hit_on_repeat():
    rng = np.random.default_rng(6)
    p = rng.integers(0, 128, size=33).tolist()
    eng = make_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    first = eng.generate([p], sp)
    second = eng.generate([p], sp)
    assert second[0].metrics.cached_tokens >= 24  # 4 blocks of 8
    assert first[0].outputs[0].token_ids == second[0].outputs[0].token_ids


def test_streaming_callback_and_text():
    rng = np.random.default_rng(7)
    p = rng.integers(0, 128, size=6).tolist()
    eng = make_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    eng.add_request("r0", prompt_token_ids=p, sampling_params=sp)
    got = []
    eng._groups["r0"].on_token = lambda seq, tok, delta, fin: got.append((tok, fin))
    outs = []
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    assert len(got) == 5
    assert got[-1][1] is True and all(not f for _, f in got[:-1])
    final = outs[-1]
    assert final.outputs[0].text.strip() == " ".join(
        str(t) for t in final.outputs[0].token_ids
    )


def test_sampled_generation_finite():
    rng = np.random.default_rng(8)
    ps = prompts(rng, 2)
    out = make_engine().generate(
        ps, SamplingParams(temperature=0.8, top_p=0.9, top_k=40, max_tokens=6)
    )
    for o in out:
        assert len(o.outputs[0].token_ids) == 6
        assert all(0 <= t < 128 for t in o.outputs[0].token_ids)


def test_too_long_prompt_ignored():
    p = list(range(100)) * 3  # 300 > max_model_len 128
    out = make_engine().generate([p], SamplingParams(max_tokens=2))
    assert out[0].outputs[0].finish_reason == "length"
    assert out[0].outputs[0].token_ids == []


def test_preemption_by_swap():
    rng = np.random.default_rng(9)
    ps = prompts(rng, 4, lo=8, hi=16)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ref = make_engine().generate(ps, sp)
    swapped = make_engine(
        num_gpu_blocks=14, num_cpu_blocks=32,
        enable_prefix_caching=False, preemption_mode="swap",
    ).generate(ps, sp)
    for a, b in zip(ref, swapped):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_preemption_by_swap_quantized_kv():
    """int8 KV pages and their scale planes must survive a host swap
    round-trip (reference: cache_engine.rs quantized swap)."""
    rng = np.random.default_rng(9)
    ps = prompts(rng, 4, lo=8, hi=16)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ref = make_engine(kv_cache_dtype="int8").generate(ps, sp)
    swapped = make_engine(
        kv_cache_dtype="int8", num_gpu_blocks=14, num_cpu_blocks=32,
        enable_prefix_caching=False, preemption_mode="swap",
    ).generate(ps, sp)
    for a, b in zip(ref, swapped):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_n_best_sampling():
    rng = np.random.default_rng(10)
    p = rng.integers(0, 128, size=8).tolist()
    eng = make_engine()
    out = eng.generate(
        [p], SamplingParams(n=3, temperature=0.9, max_tokens=5, seed=1)
    )[0]
    assert len(out.outputs) == 3
    texts = {tuple(o.token_ids) for o in out.outputs}
    assert len(texts) >= 2  # sampled branches diverge
    # greedy n: all identical
    out2 = make_engine().generate(
        [p], SamplingParams(n=2, temperature=0.0, max_tokens=4)
    )[0]
    assert out2.outputs[0].token_ids == out2.outputs[1].token_ids


def test_best_of_selects_top_n():
    rng = np.random.default_rng(11)
    p = rng.integers(0, 128, size=8).tolist()
    out = make_engine().generate(
        [p], SamplingParams(n=1, best_of=4, temperature=1.2, max_tokens=4)
    )[0]
    assert len(out.outputs) == 1


def test_logprobs_returned():
    rng = np.random.default_rng(12)
    p = rng.integers(0, 128, size=6).tolist()
    out = make_engine().generate(
        [p], SamplingParams(temperature=0.0, max_tokens=3, logprobs=4)
    )[0]
    lps = out.outputs[0].logprobs
    assert lps is not None and len(lps) == 3
    for lp in lps:
        assert lp["logprob"] <= 0.0
        assert len(lp["top"]) == 4
        # greedy token must be the argmax -> appears in top list
        assert lp["token"] in lp["top"]
        assert abs(max(lp["top"].values()) - lp["logprob"]) < 1e-4


def test_seeded_sampling_reproducible():
    rng = np.random.default_rng(13)
    p = rng.integers(0, 128, size=8).tolist()
    sp = SamplingParams(temperature=1.0, max_tokens=6, seed=1234)
    a = make_engine().generate([p], sp)[0].outputs[0].token_ids
    eng_b = make_engine()
    eng_b._key = __import__("jax").random.PRNGKey(99)  # different engine RNG
    b = eng_b.generate([p], sp)[0].outputs[0].token_ids
    assert a == b  # engine RNG differs; request seed pins the draws
    c = make_engine().generate(
        [p], SamplingParams(temperature=1.0, max_tokens=6, seed=777)
    )[0].outputs[0].token_ids
    assert c != a


def test_embed_batched_matches_singleton():
    """Batched embedding packing must give the same vectors as one-at-a-
    time calls (reference: process_embedding_batch, llm_engine.rs:1807)."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (5, 17, 9, 3)]
    eng = make_engine()
    batched = eng.embed(prompts, pooling="last")
    singles = [eng.embed([p], pooling="last")[0] for p in prompts]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(b, s, rtol=2e-4, atol=2e-4)
    bm = eng.embed(prompts, pooling="mean")
    sm = [eng.embed([p], pooling="mean")[0] for p in prompts]
    for b, s in zip(bm, sm):
        np.testing.assert_allclose(b, s, rtol=2e-4, atol=2e-4)
