"""The engine: continuous batching over a jitted TPU step.

Re-designs the reference's ``LLMEngine``
(``/root/reference/src/openai/pipelines/llm_engine.rs``) around XLA's
compilation model: each engine step is ONE device dispatch — a jitted
function fusing the model forward, COW block copies, and batched sampling,
with the KV pages donated in place.  Bucketed input shapes keep the
compiled-shape set closed (the TPU analogue of the reference's CUDA-graph
capture, backend/graph.rs).

Scheduling, block management, detokenization, and stop detection stay on
host in pure Python — single-threaded, no locks (the reference needs
RwLock + unsafe Send/Sync; SURVEY.md §5 'race detection').
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence as Seq, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from candle_vllm_tpu.config import (
    CacheConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from candle_vllm_tpu.engine.block_engine import BlockEngine
from candle_vllm_tpu.engine.detokenizer import IncrementalDetokenizer
from candle_vllm_tpu.engine.input_builder import StepPlan, build_step_input
from candle_vllm_tpu.engine.scheduler import Scheduler, SchedulerOutput
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup, SequenceStatus
from candle_vllm_tpu.models.registry import get_model
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.kv_cache import HostSwapSpace, allocate_kv_pages, copy_blocks
from candle_vllm_tpu.ops.sampling import SamplingTensors, sample
from candle_vllm_tpu.parallel.sharding import ShardingPlan, make_mesh
from candle_vllm_tpu.sampling_params import SamplingParams

MAX_COPY_PAIRS = 128  # fixed-size COW copy list inside the jitted step
# all-padding copy list reused by continuation dispatches (do_copy=False)
_NO_COPY = np.full(MAX_COPY_PAIRS, 1 << 30, np.int32)


@dataclass
class _PendingStep:
    """An in-flight pipelined decode dispatch whose results have not been
    fetched yet.

    The device is already computing (or has computed) these tokens; the
    host processes them one step() call later, after enqueueing the next
    dispatch — so host scheduling/detokenization overlaps device compute
    and the chip never idles between decode steps.
    """

    packed: Any                 # device [n_steps, 2, S]
    top_vals: Any               # device [n_steps, S, k] or None
    top_ids: Any
    next_tokens: Any            # device [T] i32 — next dispatch's q rows
    plan: Any                   # StepPlan of the dispatched step
    row_seqs: List["Sequence"]
    groups: List["SequenceGroup"]   # per row
    n_steps: int
    want_logprobs: int
    greedy_only: bool
    st: SamplingTensors         # numpy leaves (seed_pos advances per chain)
    np_kv_lens: np.ndarray      # [S] i32 kv_lens at dispatch time
    step_start: float


@partial(jax.jit, donate_argnums=(0,))
def _set_pool_row(pool: jnp.ndarray, slot: jnp.ndarray, val: jnp.ndarray):
    """In-place (donated) row write — snapshot restore into a state pool."""
    return pool.at[slot].set(val.astype(pool.dtype))


# ---------------------------------------------------------------------------
# outputs
# ---------------------------------------------------------------------------


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: float = 0.0
    finish_reason: Optional[str] = None
    stop_reason: Any = None
    logprobs: Optional[List[Dict[str, Any]]] = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestMetrics:
    arrival_time: float = 0.0
    first_token_time: Optional[float] = None
    finished_time: Optional[float] = None
    prompt_tokens: int = 0
    cached_tokens: int = 0


@dataclass
class RequestOutput:
    request_id: str
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput]
    finished: bool
    metrics: RequestMetrics = field(default_factory=RequestMetrics)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class LLMEngine:
    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        parallel_config: Optional[ParallelConfig] = None,
        *,
        params: Optional[Dict[str, jnp.ndarray]] = None,
        model_dir: Optional[str] = None,
        tokenizer: Any = None,
        mesh=None,
        seed: int = 0,
        quantization: Optional[str] = None,
    ):
        # "fp8" KV runs as int8-with-per-(token,head)-scales: equal
        # bytes/token, strictly better accuracy than e4m3 on a chip with
        # no fp8 ALU (the reference's FP8-KV capability at parity cost)
        if cache_config.kv_cache_dtype == "fp8":
            import dataclasses as _dc

            cache_config = _dc.replace(cache_config, kv_cache_dtype="int8")
        if cache_config.kv_cache_dtype == "turbo3":
            # turbo3 needs 128-lane-aligned bitplane segments and a plain
            # paged layout; MLA latent caches and odd head shapes fall back
            # (the reference auto-falls back for MLA too, README.md note).
            # Under TP each shard must hold whole lane-aligned bitplane
            # blocks, so the alignment gate is PER-SHARD: K*D % (1024*tp)
            # (caught by the r5 multichip dryrun — the plane-major layout
            # cannot split a 128-byte lane across devices).
            import dataclasses as _dc

            D = model_config.head_dim or (
                model_config.hidden_size // model_config.num_attention_heads
            )
            K = model_config.num_key_value_heads
            tp = parallel_config.tp_size if parallel_config else 1
            local_kd = (max(K, tp) // tp) * D
            if getattr(model_config, "kv_lora_rank", None):
                cache_config = _dc.replace(cache_config, kv_cache_dtype="int8")
            elif model_config.has_hetero_kv or local_kd % 1024 or D % 128:
                cache_config = _dc.replace(cache_config, kv_cache_dtype="int4")
        self.model_config = model_config
        self.cache_config = cache_config
        self.scheduler_config = scheduler_config
        self.parallel_config = parallel_config or ParallelConfig()
        self.tokenizer = tokenizer

        if mesh is None and self.parallel_config.world_size > 1:
            mesh = make_mesh(
                self.parallel_config.tp_size, self.parallel_config.dp_size
            )
        self.mesh = mesh
        self.plan = ShardingPlan(mesh) if mesh is not None else None

        # the model's attention specs must know the cache wire format
        # (int4 nibble packing changes the kernel's page decode)
        model_config.kv_cache_dtype = cache_config.kv_cache_dtype
        self.model = get_model(model_config, mesh=mesh)
        if params is None and model_dir is not None:
            from candle_vllm_tpu.models.weights import load_safetensors

            # streaming ISQ: quantize per tensor at load so the bf16
            # weights never co-reside in HBM (reference ISQ, linear.rs)
            params = load_safetensors(
                model_dir,
                dtype=model_config.dtype,
                plan=self.plan,
                config=model_config,
                quantize=quantization,
                fixup=getattr(self.model, "checkpoint_fixup", None),
            )
        elif params is None:
            if quantization is not None and self.plan is None:
                n_off = getattr(model_config.moe, "num_experts_offload", 0) \
                    if model_config.moe else 0
                if n_off:
                    # offload needs separate gate/up banks
                    from candle_vllm_tpu.ops.quant import quantize_params

                    params = quantize_params(
                        self.model.init_params(seed=seed),
                        method=quantization, moe_fuse_gate_up=False,
                    )
                else:
                    from candle_vllm_tpu.ops.quant import (
                        random_quantized_params,
                    )

                    params = random_quantized_params(
                        self.model, quantization, jax.random.PRNGKey(seed)
                    )
            elif quantization is not None:
                # TP: merged projections can't column-shard; quantize the
                # separate tensors (incl. separate gate/up expert banks)
                from candle_vllm_tpu.ops.quant import quantize_params

                params = quantize_params(
                    self.model.init_params(seed=seed), method=quantization,
                    moe_fuse_gate_up=False,
                )
            else:
                params = self.model.init_params(seed=seed)
        elif quantization is not None:
            from candle_vllm_tpu.ops.quant import quantize_params

            n_off = getattr(model_config.moe, "num_experts_offload", 0) \
                if model_config.moe else 0
            params = quantize_params(
                params, method=quantization,
                moe_fuse_gate_up=self.plan is None and not n_off,
            )
        # expert CPU offload: tail experts' W4 banks move to pinned host
        # memory (reference: num_experts_offload_per_rank)
        if model_config.moe and getattr(
            model_config.moe, "num_experts_offload", 0
        ):
            from candle_vllm_tpu.ops.quant import offload_expert_banks

            params = offload_expert_banks(
                params, model_config.moe.num_experts_offload,
                mesh=self.mesh,
            )
        if self.plan is not None:
            params = self.plan.apply(params)
        self.params = params

        # KV pages: lane-padded on TPU (Mosaic tile-aligned DMA); int8
        # cache carries per-(token,head) scale planes (TurboQuant-style,
        # reference cache_engine.rs:401-518)
        pad = 128 if jax.default_backend() == "tpu" else 1
        # Mosaic DMA slice minimums on the plane (second-minor) dim:
        # int8 pages need multiples of 4, f32 scale planes multiples of 8
        plane_pad = 4 if jax.default_backend() == "tpu" else 1
        scale_pad = 8 if jax.default_backend() == "tpu" else 1
        self.kv_quantized = cache_config.kv_cache_dtype in (
            "int8", "int4", "turbo3"
        )
        self.kv_int4 = cache_config.kv_cache_dtype == "int4"
        self.kv_turbo3 = cache_config.kv_cache_dtype == "turbo3"
        kv_dtype = jnp.int8 if self.kv_quantized else model_config.dtype
        kv_heads, kv_head_dim = self.model.kv_cache_spec()
        # MLA latent caches store k == v once (model sets kv_shared;
        # reference stores ckv+kpe single-copy, cache_engine.rs:172-184)
        kv_shared = bool(getattr(self.model, "kv_shared", False))
        assert not (kv_shared and self.kv_int4), (
            "int4 packing already pairs K/V nibbles; shared MLA caches "
            "use int8 or bf16"
        )
        # recurrent-state slot pool (hybrid GDN models)
        self._state_pool_size = scheduler_config.max_num_seqs * 2 + 2
        self._state_slot_free = list(range(self._state_pool_size))
        self._state_slots: Dict[int, int] = {}
        if hasattr(self.model, "make_caches"):
            # hybrid GDN/mamba: the model builds its per-layer cache mix
            assert not self.kv_quantized, (
                "quantized KV with hybrid state models not supported yet"
            )
            assert scheduler_config.preemption_mode == "recompute", (
                "swap preemption would lose recurrent state; use recompute"
            )
            self.kv_pages = self.model.make_caches(
                cache_config.num_gpu_blocks,
                cache_config.block_size,
                model_config.dtype,
                self._state_pool_size,
                pad_head_dim_to=pad,
                kv_sharding=self.plan.kv_pages_sharding() if self.plan else None,
            )
        elif model_config.has_hetero_kv:
            # gemma4-class per-layer heterogeneous KV: one page array per
            # layer with that layer's (kv_heads, head_dim) (reference:
            # cache_engine.rs:198-235)
            assert not self.kv_quantized, (
                "quantized KV with heterogeneous layer shapes not supported"
            )
            pages = []
            for K_i, D_i in self.model.per_layer_kv_spec():
                pages += allocate_kv_pages(
                    1,
                    cache_config.num_gpu_blocks,
                    cache_config.block_size,
                    K_i,
                    D_i,
                    dtype=kv_dtype,
                    sharding=self.plan.kv_pages_sharding() if self.plan else None,
                    pad_head_dim_to=pad,
                )
            self.kv_pages = pages
        else:
            if self.kv_turbo3:
                from candle_vllm_tpu.ops.kv_cache import (
                    allocate_kv_pages_turbo3,
                )

                pages = allocate_kv_pages_turbo3(
                    model_config.num_hidden_layers,
                    cache_config.num_gpu_blocks,
                    cache_config.block_size,
                    kv_heads,
                    kv_head_dim,
                    sharding=self.plan.kv_pages_sharding(turbo3=True)
                    if self.plan else None,
                )
            elif self.kv_int4:
                from candle_vllm_tpu.ops.kv_cache import (
                    allocate_kv_pages_int4,
                )

                pages = allocate_kv_pages_int4(
                    model_config.num_hidden_layers,
                    cache_config.num_gpu_blocks,
                    cache_config.block_size,
                    kv_heads,
                    kv_head_dim,
                    sharding=self.plan.kv_pages_sharding() if self.plan else None,
                    pad_head_dim_to=pad,
                    pad_planes_to=plane_pad,
                )
            else:
                pages = allocate_kv_pages(
                    model_config.num_hidden_layers,
                    cache_config.num_gpu_blocks,
                    cache_config.block_size,
                    kv_heads,
                    kv_head_dim,
                    dtype=kv_dtype,
                    sharding=self.plan.kv_pages_sharding() if self.plan else None,
                    pad_head_dim_to=pad,
                    pad_planes_to=plane_pad if self.kv_quantized else 1,
                    kv_shared=kv_shared,
                )
            if self.kv_quantized:
                from candle_vllm_tpu.ops.kv_cache import allocate_kv_scales
                from jax.sharding import NamedSharding, PartitionSpec as P

                scales = allocate_kv_scales(
                    model_config.num_hidden_layers,
                    cache_config.num_gpu_blocks,
                    cache_config.block_size,
                    kv_heads,
                    sharding=NamedSharding(self.plan.mesh, P(None, "tp", None))
                    if self.plan else None,
                    pad_planes_to=scale_pad,
                    kv_shared=kv_shared,
                )
                self.kv_pages = list(zip(pages, scales))
            else:
                self.kv_pages = pages
        # host swap tier: shape-agnostic (quantized tuples and hetero-KV
        # layers mirror naturally); hybrid GDN models stay recompute-only
        # (recurrent state is not paged)
        self.swap_space = (
            HostSwapSpace(cache_config.num_cpu_blocks)
            if cache_config.num_cpu_blocks > 0
            and not hasattr(self.model, "make_caches")
            else None
        )

        self.block_engine = BlockEngine(
            cache_config.block_size,
            cache_config.num_gpu_blocks,
            cache_config.num_cpu_blocks,
            enable_prefix_caching=scheduler_config.enable_prefix_caching,
        )
        # hybrid GDN + prefix caching: block hits must restore recurrent
        # state snapshots or the hit is silently wrong — the store's gate
        # caps matches to snapshotted boundaries (mamba.rs:15-291)
        self._snap_store = None
        if (
            hasattr(self.model, "make_caches")
            and scheduler_config.enable_prefix_caching
        ):
            from candle_vllm_tpu.engine.gdn_snapshots import GDNSnapshotStore

            self._snap_store = GDNSnapshotStore()
            self.block_engine.cache_gate = self._snap_store.gate
        self.scheduler = Scheduler(scheduler_config, self.block_engine)
        self.detok = IncrementalDetokenizer(tokenizer) if tokenizer else None

        self._key = jax.random.PRNGKey(seed)
        self._step_counter = 0
        self._next_seq_id = 0
        self._groups: Dict[str, SequenceGroup] = {}
        from candle_vllm_tpu.engine.stats import EngineStats

        self.stats = EngineStats()
        # optional per-request JSONL logger (server --log-requests)
        self.request_logger = None

        self._jit_step = jax.jit(
            self._device_step,
            donate_argnums=(1,),
            static_argnames=("want_logprobs", "greedy_only", "penalties",
                             "dsa_prefill", "n_steps", "do_copy",
                             "emit_next"),
        )
        # per-step sampling keys derive on device from this base key +
        # the step counter (an eager jax.random.split on host costs
        # ~0.7 ms/step of dispatch overhead)
        self._base_key = jax.random.PRNGKey(seed)
        # decode micro-steps per dispatch (CVT_MULTISTEP=1 disables); the
        # host only sees every K-th token boundary, so stop detection and
        # streaming run at K-token granularity
        import os

        self._multistep = max(
            1, int(os.environ.get("CVT_MULTISTEP",
                                  str(scheduler_config.decode_steps)))
        )
        # pipelined decode: keep one dispatch in flight so host-side
        # scheduling/fetch/detokenization overlaps device compute (the
        # serving path then runs at kernel-path throughput; the
        # reference's host stays in the decode loop between CUDA-graph
        # replays, backend/graph.rs)
        self._pipeline = bool(
            int(os.environ.get(
                "CVT_PIPELINE",
                str(int(scheduler_config.pipeline_decode)),
            ))
        )
        self._pending: Optional["_PendingStep"] = None
        # speculative decoding (opt-in; engine/spec.py): prompt-lookup
        # drafts verified in the decode bucket's padding rows
        self._spec = scheduler_config.speculative
        # draft window snaps DOWN to a bucket boundary (7/15/31/63
        # drafts -> 8/16/32/64 verify rows riding the token buckets at
        # ~constant device cost — rows are weight-bound and share the
        # page stream)
        want_d = max(1, min(int(scheduler_config.spec_draft_len), 63))
        self._spec_draft = max(d for d in (7, 15, 31, 63) if d <= want_d) \
            if want_d >= 7 else 7
        self._spec_ngram = max(1, int(scheduler_config.spec_ngram))

    # -- the single-dispatch device step -----------------------------------
    def _device_step(
        self,
        params: Dict[str, jnp.ndarray],
        kv_pages: List[jnp.ndarray],
        step: StepInput,
        copy_src: jnp.ndarray,     # [MAX_COPY_PAIRS] i32 (padded out-of-range)
        copy_dst: jnp.ndarray,
        st: SamplingTensors,
        key_idx: jnp.ndarray,      # [] i32 step counter -> fold_in(base, .)
        *,
        want_logprobs: int = 0,    # top-k alternatives per token (0 = off)
        greedy_only: bool = False,
        penalties: bool = True,
        dsa_prefill: bool = False,
        n_steps: int = 1,
        do_copy: bool = True,
        emit_next: bool = False,   # also return next-step token_ids [T]
    ):
        def _copy(p):
            if isinstance(p, dict):  # GDN state pool: no block COW
                return p
            if isinstance(p, tuple):  # quantized: (pages, scales)
                return (
                    copy_blocks(p[0], copy_src, copy_dst),
                    copy_blocks(p[1], copy_src, copy_dst),
                )
            return copy_blocks(p, copy_src, copy_dst)

        # do_copy is STATIC: steps with no COW pairs (the common case —
        # forks are rare) must not pay a 128-wide page gather+scatter
        # sweep across every layer
        if do_copy:
            kv_pages = [_copy(p) for p in kv_pages]
        key = jax.random.fold_in(self._base_key, key_idx)

        def _forward(kv_pages, s):
            # dsa_prefill is STATIC: flipping the model flag at trace time
            # selects the sparse- or dense-trace for this jit variant.  It
            # is forced BOTH ways — a config with use_dsa_prefill=True must
            # still run dense on decode/chunked steps (the in-batch indexer
            # cannot see paged history).
            if hasattr(self.model, "use_dsa"):
                prev_dsa = self.model.use_dsa
                self.model.use_dsa = dsa_prefill
                try:
                    return self.model.forward(params, kv_pages, s)
                finally:
                    self.model.use_dsa = prev_dsa
            return self.model.forward(params, kv_pages, s)

        if n_steps == 1:
            logits, kv_pages = _forward(kv_pages, step)
            tokens, logprobs = sample(
                logits, st, key, greedy_only=greedy_only, penalties=penalties
            )
            # ONE packed device->host transfer per step: token ids are
            # exact in f32 up to 2^24 (every real vocab); separate fetches
            # each pay a full host round-trip
            packed = jnp.stack([tokens.astype(jnp.float32), logprobs])[None]
            # top-k alternatives for the API's logprobs field — only
            # compiled in when some scheduled request asked for logprobs
            # (a full-vocab log_softmax + top_k is pure wasted bandwidth
            # otherwise).  k honors request top_logprobs up to 20
            # (reference: logits_processor.rs:227+).
            top_vals = top_ids = None
            if want_logprobs:
                logp = jax.nn.log_softmax(logits, axis=-1)
                top_vals, top_ids = jax.lax.top_k(logp, want_logprobs)
                top_vals, top_ids = top_vals[None], top_ids[None]
            next_ids = None
            if emit_next:
                # pipelined decode: the sampled tokens become the next
                # dispatch's q rows without a host round-trip
                T = step.token_ids.shape[0]
                S = tokens.shape[0]
                next_ids = jnp.zeros(T, jnp.int32).at[:S].set(tokens)
            return packed, top_vals, top_ids, next_ids, kv_pages

        # ---- multi-token decode: n_steps micro-steps in one dispatch ----
        # The TPU analogue of replaying a captured CUDA decode graph N
        # times without host round-trips (reference: backend/graph.rs):
        # each micro-step feeds its sampled tokens on-device into the next
        # forward, recomputing positions/slots from the (constant) page
        # tables.  Requires step.decode_only (q row i == sequence i),
        # penalty-free sampling, and K-1 extra reserved KV slots per row
        # (the engine guarantees all three before picking n_steps > 1).
        assert step.decode_only and not penalties
        from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT

        page = self.cache_config.block_size
        T = step.token_ids.shape[0]
        S = step.kv_lens.shape[0]
        active = step.kv_lens > 0                                  # [S]
        rows = jnp.arange(T, dtype=jnp.int32)
        ridx = jnp.clip(rows, 0, S - 1)
        row_active = active[ridx] & (rows < S)                     # [T]
        pt_rows = step.page_tables[ridx]                           # [T, MAXP]

        def micro(k, carry):
            kv_pages, tok_ids, out_packed, out_tv, out_ti = carry
            pos = step.positions + jnp.where(row_active, k, 0)
            slot = pt_rows[rows, pos // page] * page + pos % page
            slot = jnp.where(row_active, slot, INVALID_SLOT)
            s_k = StepInput(
                token_ids=tok_ids,
                positions=pos,
                slot_mapping=slot,
                kv_lens=step.kv_lens + jnp.where(active, k, 0),
                page_tables=step.page_tables,
                cu_q_lens=step.cu_q_lens,
                logits_idx=step.logits_idx,
                state_slots=step.state_slots,
                decode_only=True,
            )
            logits, kv_pages = _forward(kv_pages, s_k)
            st_k = SamplingTensors(
                temperature=st.temperature, top_k=st.top_k, top_p=st.top_p,
                min_p=st.min_p, presence=st.presence, frequency=st.frequency,
                repetition=st.repetition, last_tokens=st.last_tokens,
                greedy=st.greedy, seeds=st.seeds,
                seed_pos=st.seed_pos + k, seed_sub=st.seed_sub,
            )
            tokens, logprobs = sample(
                logits, st_k, jax.random.fold_in(key, k),
                greedy_only=greedy_only, penalties=False,
            )
            out_packed = out_packed.at[k].set(
                jnp.stack([tokens.astype(jnp.float32), logprobs])
            )
            if want_logprobs:
                logp = jax.nn.log_softmax(logits, axis=-1)
                tv, ti = jax.lax.top_k(logp, want_logprobs)
                out_tv = out_tv.at[k].set(tv)
                out_ti = out_ti.at[k].set(ti)
            # sampled token of row i feeds q row i of the next micro-step
            next_ids = jnp.zeros(T, jnp.int32).at[:S].set(tokens)
            return kv_pages, next_ids, out_packed, out_tv, out_ti

        out_packed = jnp.zeros((n_steps, 2, S), jnp.float32)
        out_tv = jnp.zeros((n_steps, S, max(want_logprobs, 1)), jnp.float32)
        out_ti = jnp.zeros((n_steps, S, max(want_logprobs, 1)), jnp.int32)
        kv_pages, last_ids, out_packed, out_tv, out_ti = jax.lax.fori_loop(
            0, n_steps, micro,
            (kv_pages, step.token_ids, out_packed, out_tv, out_ti),
        )
        if not want_logprobs:
            out_tv = out_ti = None
        next_ids = last_ids if emit_next else None
        return out_packed, out_tv, out_ti, next_ids, kv_pages

    # -- request intake ----------------------------------------------------
    def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        prompt_token_ids: Optional[List[int]] = None,
        sampling_params: Optional[SamplingParams] = None,
        mm_inputs: Any = None,
    ) -> None:
        sampling_params = sampling_params or SamplingParams()
        if prompt_token_ids is None:
            assert prompt is not None and self.tokenizer is not None
            prompt_token_ids = self.tokenizer.encode(prompt)
            if hasattr(prompt_token_ids, "ids"):  # raw tokenizers.Encoding
                prompt_token_ids = prompt_token_ids.ids
        # multimodal: encode images ONCE at intake (own bucketed jit); the
        # merged embeddings come back to host and each step carries only
        # the rows its chunks need (reference: process_vision_batch,
        # qwen3_vl/mod.rs + multimodal.rs chunked-prefill image slicing)
        mm_embeds = mm_pos = None
        hash_seed = 0
        if mm_inputs is not None and mm_inputs.grids:
            mm_embeds, mm_pos = self._encode_mm(mm_inputs, prompt_token_ids)
            hash_seed = mm_inputs.seed
        # n-best: best_of parallel sequences, top-n returned (reference:
        # SequenceGroup n-best, sequence.rs:343-477).  Each sequence runs
        # its own prompt pass; sampling rows draw independent gumbel noise
        # so they diverge from the first token.
        seqs = []
        for _ in range(sampling_params.best_of or sampling_params.n):
            seq = Sequence(self._next_seq_id, prompt_token_ids)
            seq.mm_embeds = mm_embeds
            seq.mm_pos = mm_pos
            seq.hash_seed = hash_seed
            seqs.append(seq)
            self._next_seq_id += 1
        self.stats.requests_received += 1
        group = SequenceGroup(request_id, seqs, sampling_params)
        group.prompt = prompt
        self._groups[request_id] = group
        self.scheduler.add_seq_group(group)

    def _encode_mm(
        self, mm_inputs: Any, prompt_token_ids: List[int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Run the vision tower and map image-pad prompt positions to
        embedding rows."""
        if not getattr(self.model, "has_vision", False):
            raise ValueError(
                f"model {self.model_config.architecture} does not accept "
                "image inputs"
            )
        prep = getattr(self.model, "prepare_vision_inputs", None)
        if prep is not None:
            hi = prep(mm_inputs)
        else:
            from candle_vllm_tpu.multimodal.processor import (
                vision_encoder_host_inputs,
            )

            hi = vision_encoder_host_inputs(
                mm_inputs, self.model_config.vision
            )
        emb = self.model.encode_vision(self.params, hi)
        total = mm_inputs.num_image_tokens
        emb = np.ascontiguousarray(emb[:, :total])
        image_token = self.model_config.image_token_id
        assert image_token is not None, "VL config missing image_token_id"
        ids = np.asarray(prompt_token_ids, np.int32)
        pos = np.full(len(ids), -1, np.int32)
        (img_at,) = np.nonzero(ids == image_token)
        if len(img_at) != total:
            raise ValueError(
                f"prompt carries {len(img_at)} image tokens but the images "
                f"produce {total}; expand placeholders with the processor"
            )
        pos[img_at] = np.arange(total, dtype=np.int32)
        return emb, pos

    # -- hybrid GDN prefix snapshots (mamba.rs:15-291 analogue) ------------
    def _restore_snapshot(self, seq: Sequence, slot: int) -> None:
        """Write the stored recurrent state for this sequence's cached
        prefix boundary into its freshly assigned pool slot."""
        bs = self.cache_config.block_size
        k = seq.num_cached_tokens // bs
        layers = None
        if k > 0:
            hashes = self.block_engine._prompt_block_hashes(seq)
            layers = self._snap_store.get(hashes[k - 1])
        if layers is None:
            # snapshot evicted after admission: fall back to recomputing
            # the whole prompt (rewriting identical KV into the shared
            # cached blocks is byte-identical, hence safe)
            seq.num_computed_tokens = 0
            seq.num_cached_tokens = 0
            return
        li = 0
        pages = []
        slot_j = jnp.int32(slot)
        for cache in self.kv_pages:
            if isinstance(cache, dict):
                snap = layers[li]
                li += 1
                cache = {
                    "rec": _set_pool_row(cache["rec"], slot_j,
                                         jnp.asarray(snap["rec"])),
                    "conv": _set_pool_row(cache["conv"], slot_j,
                                          jnp.asarray(snap["conv"])),
                }
            pages.append(cache)
        self.kv_pages = pages

    def _capture_snapshots(self, plan: StepPlan, row_seqs) -> None:
        """Fetch this step's block-boundary state snapshots to host and
        strip them from the cache pytree (keeps the jit signature of the
        next step stable)."""
        if self._snap_store is None:
            return
        if plan.snap_hash_blocks:
            row_of = {s.seq_id: i for i, s in enumerate(row_seqs)}
            for sid, nblocks in plan.snap_hash_blocks.items():
                seq = row_seqs[row_of[sid]]
                hashes = self.block_engine._prompt_block_hashes(seq)
                if nblocks > len(hashes):
                    continue
                row = row_of[sid]
                layers = []
                for cache in self.kv_pages:
                    if isinstance(cache, dict) and "snap_rec" in cache:
                        layers.append({
                            "rec": np.asarray(cache["snap_rec"][row]),
                            "conv": np.asarray(cache["snap_conv"][row]),
                        })
                self._snap_store.put(hashes[nblocks - 1], layers)
        self.kv_pages = [
            {"rec": c["rec"], "conv": c["conv"]}
            if isinstance(c, dict) else c
            for c in self.kv_pages
        ]

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort(request_id)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished()

    # -- one engine iteration ---------------------------------------------
    def step(self) -> List[RequestOutput]:
        """One engine iteration.

        With pipelined decode, each call enqueues dispatch N+1 (fed by the
        previous dispatch's on-device sampled tokens) BEFORE fetching and
        post-processing dispatch N — the device runs back-to-back while
        the host catches up one step behind.  The chain breaks (and the
        call falls back to a normal scheduled step) whenever new work is
        waiting, a row finished/aborted, or blocks run out.
        """
        prev = self._pending
        if prev is not None:
            self._pending = None
            if self._can_continue(prev):
                self._dispatch_continuation(prev)
                return self._finalize_pending(prev)
            outs = self._finalize_pending(prev)
            return outs + self._step_inner()
        return self._step_inner()

    def _can_continue(self, prev: _PendingStep) -> bool:
        """Is the next step a pure continuation of the in-flight decode
        chain (same rows, one more multi-token decode dispatch)?"""
        if not self._pipeline:
            return False
        if self.scheduler.waiting or self.scheduler.swapped:
            return False  # admit / swap-in via a normal scheduler pass
        if self._spec:
            # any draftable sequence should take the speculative path
            # next step instead of chaining 1-token micro-steps
            from candle_vllm_tpu.engine.spec import ngram_draft

            if any(
                ngram_draft(
                    seq.get_token_ids(), self._spec_draft,
                    self._spec_ngram,
                )
                for seq in prev.row_seqs
            ):
                return False
        K = prev.n_steps
        max_len = self.scheduler_config.max_model_len
        for i, seq in enumerate(prev.row_seqs):
            group = prev.groups[i]
            if seq.is_finished or group.cancelled:
                return False
            # prev's K tokens are still unfetched: after this continuation
            # the row holds output_len + 2K tokens / kv_len + K slots
            sp = group.sampling_params
            if seq.get_output_len() + 2 * K > sp.max_tokens:
                return False
            need = int(prev.np_kv_lens[i]) + 2 * K - 1
            if need > max_len:
                return False
            if not self.block_engine.allocate_extend_for_chunk(seq, need):
                return False
        return True

    def _dispatch_continuation(self, prev: _PendingStep) -> None:
        """Enqueue the next decode dispatch of the chain, fed by the
        previous dispatch's on-device sampled tokens (no host round-trip
        touches the critical path)."""
        from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT

        step = prev.plan.step
        S = step.kv_lens.shape[0]
        T = step.token_ids.shape[0]
        K = prev.n_steps
        page = self.cache_config.block_size
        n = len(prev.row_seqs)
        kv_lens = prev.np_kv_lens.copy()
        kv_lens[:n] += K
        positions = np.zeros(T, np.int32)
        positions[:n] = kv_lens[:n] - 1
        maxp = step.page_tables.shape[1]
        pt = np.zeros((S, maxp), np.int32)
        slots = np.full(T, INVALID_SLOT, np.int32)
        for i, seq in enumerate(prev.row_seqs):
            bids = self.block_engine.get_block_ids(seq)
            pt[i, : len(bids)] = bids
            p = int(positions[i])
            slots[i] = pt[i, p // page] * page + p % page
        st0 = prev.st
        st = SamplingTensors(
            temperature=st0.temperature, top_k=st0.top_k, top_p=st0.top_p,
            min_p=st0.min_p, presence=st0.presence, frequency=st0.frequency,
            repetition=st0.repetition, last_tokens=st0.last_tokens,
            greedy=st0.greedy, seeds=st0.seeds,
            seed_pos=st0.seed_pos + K, seed_sub=st0.seed_sub,
        )
        s = StepInput(
            token_ids=prev.next_tokens,  # device array from the chain
            positions=positions,
            slot_mapping=slots,
            kv_lens=kv_lens,
            page_tables=pt,
            cu_q_lens=step.cu_q_lens,
            logits_idx=step.logits_idx,
            state_slots=step.state_slots,
            decode_only=True,
        )
        step_start = time.monotonic()
        packed, tv, ti, nxt, self.kv_pages = self._jit_step(
            self.params, self.kv_pages, s, _NO_COPY, _NO_COPY, st,
            np.int32(self._step_counter),
            want_logprobs=prev.want_logprobs,
            greedy_only=prev.greedy_only,
            penalties=False,
            dsa_prefill=False,
            n_steps=K,
            do_copy=False,
            emit_next=True,
        )
        self._step_counter += 1
        self._pending = _PendingStep(
            packed, tv, ti, nxt, prev.plan, prev.row_seqs, prev.groups,
            K, prev.want_logprobs, prev.greedy_only, st, kv_lens, step_start,
        )

    def _finalize_pending(self, prev: _PendingStep) -> List[RequestOutput]:
        """Fetch and post-process an in-flight dispatch (the device is
        already running the next one)."""
        packed = np.asarray(prev.packed)      # [n_steps, 2, S]
        tokens = packed[:, 0].astype(np.int64)
        logprobs = packed[:, 1]
        top_vals = top_ids = None
        if prev.want_logprobs:
            top_vals = np.asarray(prev.top_vals)
            top_ids = np.asarray(prev.top_ids)
        now = time.monotonic()
        n_accepted = 0
        for i, seq in enumerate(prev.row_seqs):
            if seq.is_finished:
                continue  # aborted after dispatch: discard its tokens
            group = prev.groups[i]
            if group.metrics.get("first_token_time") is None:
                group.metrics["first_token_time"] = now
            for k in range(prev.n_steps):
                seq.num_computed_tokens += 1
                tok = int(tokens[k, i])
                seq.append_token(tok, float(logprobs[k, i]))
                n_accepted += 1
                if group.sampling_params.logprobs:
                    kk = min(
                        group.sampling_params.logprobs, top_ids.shape[2]
                    )
                    seq.output_logprobs.append(
                        {
                            "token": tok,
                            "logprob": float(logprobs[k, i]),
                            "top": {
                                int(top_ids[k, i, j]): float(top_vals[k, i, j])
                                for j in range(kk)
                            },
                        }
                    )
                self._maybe_finish(seq, group)
                if seq.is_finished:
                    break  # discard speculatively decoded tails
        finished_groups = self.scheduler.free_finished()
        self.stats.requests_finished += len(finished_groups)
        self.stats.record_step(
            prefill_tokens=0,
            decode_tokens=n_accepted,
            step_time=now - prev.step_start,
            preempted=0,
        )
        # the in-flight continuation computed garbage if every row just
        # finished — drop it unfetched (its KV writes land at positions
        # beyond each sequence's final length, which nothing reads: full
        # prefix-cache blocks only cover positions < len)
        if self._pending is not None and all(
            s.is_finished for s in self._pending.row_seqs
        ):
            self._pending = None
        outputs = []
        for group in finished_groups:
            out = self._group_output(group)
            outputs.append(out)
            if self.request_logger is not None:
                self.request_logger.log_finished(out)
            self._groups.pop(group.request_id, None)
        return outputs

    def _step_inner(self) -> List[RequestOutput]:
        step_start = time.monotonic()
        sched_out = self.scheduler.schedule()
        if sched_out.is_empty:
            return self._collect_outputs([], sched_out)

        self._execute_swaps(sched_out)

        if hasattr(self.model, "make_caches"):
            # recurrent-state slot assignment (hybrid GDN layers); fresh
            # slots of prefix-cache hits get their snapshot restored
            for sg in sched_out.scheduled:
                for sid in sg.token_chunks:
                    if sid not in self._state_slots:
                        slot = self._state_slot_free.pop()
                        self._state_slots[sid] = slot
                        seq = sg.group.seqs[sid]
                        if (
                            self._snap_store is not None
                            and seq.num_computed_tokens > 0
                            and seq.num_computed_tokens
                            == seq.num_cached_tokens
                        ):
                            self._restore_snapshot(seq, slot)
        # multi-token decode: run K micro-steps in one dispatch when every
        # row is a penalty-free decode-shaped row (q_len == 1) and K-1
        # extra KV slots fit.  Decided BEFORE building the step input so
        # the reserved blocks are in the page tables the device sees.
        # (The reference replays its captured decode graph per token with
        # the host in the loop; here the loop itself lives on device.)
        n_steps = 1
        K = self._multistep
        sched_rows = [
            (sg.group, sg.group.seqs[sid], q)
            for sg in sched_out.scheduled
            for sid, q in sg.token_chunks.items()
        ]
        # speculative decode (engine/spec.py): greedy decode rows with
        # n-gram drafts run as verify chunks instead.  A lone sequence
        # takes the chained DEVICE loop (_spec_step); a batch of 2+
        # verifies per-sequence drafts in one ragged chunk dispatch
        # (_batch_spec_step).  Falls through when nothing drafts.
        if (
            self._spec
            and sched_rows
            and all(q == 1 for _, _, q in sched_rows)
            and not sched_out.blocks_to_copy
            and not hasattr(self.model, "make_caches")
            and not getattr(self.model, "has_dsa", False)
            and all(
                g.sampling_params.is_greedy
                and not g.sampling_params.has_penalties
                and g.sampling_params.n == 1
                and len(g.seqs) == 1
                and s.num_computed_tokens == s.get_len() - 1
                for g, s, _ in sched_rows
            )
        ):
            if len(sched_rows) == 1:
                g0, seq0, _ = sched_rows[0]
                out = self._spec_step(sched_out, g0, seq0, step_start)
            else:
                out = self._batch_spec_step(
                    sched_out, sched_rows, step_start
                )
            if out is not None:
                return out
        if sched_rows:
            # latency-sensitive requests can cap the fused micro-steps
            # (decode_steps=1 restores per-token streaming cadence); the
            # batch steps at the minimum across scheduled rows
            K = max(1, min(
                K,
                min(g.sampling_params.decode_steps or K
                    for g, _, _ in sched_rows),
            ))
        if (
            K > 1
            and sched_rows
            and all(q == 1 for _, _, q in sched_rows)
            and not any(
                g.sampling_params.has_penalties for g, _, _ in sched_rows
            )
            and all(
                seq.get_len() + K - 1 <= self.scheduler_config.max_model_len
                for _, seq, _ in sched_rows
            )
            and all(
                self.block_engine.allocate_extend_for_chunk(
                    seq, seq.get_len() + K - 1
                )
                for _, seq, _ in sched_rows
            )
        ):
            n_steps = K
        plan = build_step_input(
            sched_out.scheduled,
            self.block_engine,
            self.cache_config.block_size,
            self.scheduler_config.max_model_len,
            state_slot_map=self._state_slots,
            snap_boundaries=self._snap_store is not None,
        )
        S = plan.step.kv_lens.shape[0]
        if not plan.step.decode_only or plan.step.token_ids.shape[0] < S:
            n_steps = 1

        rows_params: List[SamplingParams] = []
        rows_hist: List[List[int]] = []
        row_seqs: List[Sequence] = []
        seq_to_group: Dict[int, SequenceGroup] = {}
        for sg in sched_out.scheduled:
            for sid in sg.token_chunks:
                seq_to_group[sid] = sg.group
        rows_pos: List[int] = []
        rows_sub: List[int] = []
        for sid in plan.seq_ids:
            group = seq_to_group[sid]
            seq = group.seqs[sid]
            row_seqs.append(seq)
            rows_params.append(group.sampling_params)
            rows_pos.append(seq.get_output_len())
            rows_sub.append(list(group.seqs).index(sid))
        penalties = any(p.has_penalties for p in rows_params)
        for i, sid in enumerate(plan.seq_ids):
            # honor per-request repeat_last_n (bucketed in SamplingTensors;
            # reference: arbitrary repeat_last_n windows).  History slices
            # are only materialized when some row actually has penalties.
            if penalties:
                seq = row_seqs[i]
                rows_hist.append(
                    seq.get_token_ids()[-rows_params[i].repeat_last_n:]
                )
            else:
                rows_hist.append([])
        st = SamplingTensors.build(
            rows_params, rows_hist, self.model_config.vocab_size, pad_to=S,
            positions=rows_pos, sub_indices=rows_sub,
        )

        copy_src = np.full(MAX_COPY_PAIRS, 1 << 30, np.int32)
        copy_dst = np.full(MAX_COPY_PAIRS, 1 << 30, np.int32)
        pairs = sched_out.blocks_to_copy
        if len(pairs) > MAX_COPY_PAIRS:
            # overflow pairs run as a separate dispatch (rare: > 128 COW
            # forks in one step)
            extra_s = jnp.asarray([s for s, _ in pairs[MAX_COPY_PAIRS:]], jnp.int32)
            extra_d = jnp.asarray([d for _, d in pairs[MAX_COPY_PAIRS:]], jnp.int32)
            self.kv_pages = [
                (copy_blocks(p[0], extra_s, extra_d),
                 copy_blocks(p[1], extra_s, extra_d))
                if isinstance(p, tuple)
                else copy_blocks(p, extra_s, extra_d)
                for p in self.kv_pages
            ]
            pairs = pairs[:MAX_COPY_PAIRS]
        for i, (s, d) in enumerate(pairs):
            copy_src[i] = s
            copy_dst[i] = d

        # top-k alternatives: honor request top_logprobs up to 20 (OpenAI
        # cap; reference: logits_processor.rs:227+).  Bucketed to {8, 20}
        # so the compiled-variant set stays closed.
        wl = max((p.logprobs or 0) for p in rows_params) if rows_params else 0
        want_logprobs = 0 if wl == 0 else (8 if wl <= 8 else 20)
        # DSA sparse prefill (DeepSeek V3.2 / GLM5 class): eligible only
        # when EVERY scheduled row is a whole-prompt prefill chunk (the
        # in-batch indexer sees the full causal context; reference:
        # mla_sparse_paged_prefill scope)
        dsa_prefill = bool(
            getattr(self.model, "has_dsa", False)
            and sched_out.scheduled
            and all(
                seq.num_computed_tokens == 0
                and sg.token_chunks[sid] == seq.get_prompt_len()
                for sg in sched_out.scheduled
                for sid, seq in (
                    (s, sg.group.seqs[s]) for s in sg.token_chunks
                )
            )
        )
        greedy_only = all(p.is_greedy for p in rows_params)
        # pipelined decode: defer the fetch and keep this dispatch in
        # flight when the step is a steady penalty-free decode batch of
        # single (unforked) sequences and no new work is waiting.  The
        # next step() call enqueues the continuation before fetching.
        can_pipe = (
            self._pipeline
            and plan.step.decode_only
            and not penalties
            and plan.needs_sample
            and all(plan.needs_sample)
            and not self.scheduler.waiting
            and not self.scheduler.swapped
            and not hasattr(self.model, "make_caches")
            and all(
                len(seq_to_group[sid].get_unfinished()) == 1
                for sid in plan.seq_ids
            )
            and plan.sample_rows == list(range(len(plan.seq_ids)))
        )
        packed, top_vals, top_ids, next_ids, self.kv_pages = self._jit_step(
            self.params, self.kv_pages, plan.step, copy_src, copy_dst, st,
            np.int32(self._step_counter),
            want_logprobs=want_logprobs,
            greedy_only=greedy_only,
            penalties=penalties,
            dsa_prefill=dsa_prefill,
            n_steps=n_steps,
            do_copy=bool(pairs),
            emit_next=can_pipe,
        )
        if can_pipe:
            self._step_counter += 1
            groups_per_row = [seq_to_group[s.seq_id] for s in row_seqs]
            self._pending = _PendingStep(
                packed, top_vals, top_ids, next_ids, plan, row_seqs,
                groups_per_row, n_steps, want_logprobs, greedy_only, st,
                np.asarray(plan.step.kv_lens), step_start,
            )
            # scheduler bookkeeping for this dispatch happens at fetch
            # time (_finalize_pending), one step() call later
            return self._collect_outputs([], sched_out)
        packed = np.asarray(packed)          # [n_steps, 2, S]
        tokens = packed[:, 0].astype(np.int64)
        logprobs = packed[:, 1]
        self._capture_snapshots(plan, row_seqs)
        if want_logprobs:
            top_vals = np.asarray(top_vals)  # [n_steps, S, 8]
            top_ids = np.asarray(top_ids)
        self._step_counter += 1

        # -- host post-processing ------------------------------------------
        now = time.monotonic()
        n_accepted = 0
        for i, seq in enumerate(row_seqs):
            group = seq_to_group[seq.seq_id]
            q_len = None
            for sg in sched_out.scheduled:
                if seq.seq_id in sg.token_chunks and sg.group is group:
                    q_len = sg.token_chunks[seq.seq_id]
                    break
            assert q_len is not None
            seq.num_computed_tokens += q_len
            if not plan.needs_sample[i]:
                continue  # mid-prompt prefill chunk
            if group.metrics.get("first_token_time") is None:
                group.metrics["first_token_time"] = now
            row = plan.sample_rows[i]
            for k in range(n_steps):
                if k > 0:
                    # micro-step k consumed (computed KV for) the token
                    # sampled at micro-step k-1
                    seq.num_computed_tokens += 1
                tok = int(tokens[k, row])
                seq.append_token(tok, float(logprobs[k, row]))
                n_accepted += 1
                if group.sampling_params.logprobs:
                    kk = min(group.sampling_params.logprobs, top_ids.shape[2])
                    seq.output_logprobs.append(
                        {
                            "token": tok,
                            "logprob": float(logprobs[k, row]),
                            "top": {
                                int(top_ids[k, row, j]): float(top_vals[k, row, j])
                                for j in range(kk)
                            },
                        }
                    )
                self._maybe_finish(seq, group)
                if seq.is_finished:
                    break  # discard speculatively decoded tails

        finished_groups = self.scheduler.free_finished()
        if self._state_slots:
            for g in list(finished_groups) + list(sched_out.preempted):
                for sid in list(g.seqs):
                    slot = self._state_slots.pop(sid, None)
                    if slot is not None:
                        self._state_slot_free.append(slot)
        n_decode = sum(
            1
            for sg in sched_out.scheduled
            for q in sg.token_chunks.values()
            if q == 1
        )
        self.stats.requests_finished += len(finished_groups)
        self.stats.record_step(
            prefill_tokens=sched_out.num_scheduled_tokens - n_decode,
            decode_tokens=n_accepted if n_steps > 1 else n_decode,
            step_time=time.monotonic() - step_start,
            preempted=len(sched_out.preempted),
        )
        return self._collect_outputs(finished_groups, sched_out)

    # -- speculative decode (engine/spec.py) --------------------------------
    def _device_spec_loop(
        self,
        params,
        kv_pages,
        hist,        # [HL] i32 token history (garbage beyond cur_len)
        cur_len,     # [] i32
        pt_row,      # [MAXP] i32 page table of the lone sequence
        st,          # SamplingTensors (greedy rows)
        key_idx,     # [] i32
        *,
        n_steps: int,
        want_logprobs: int,
        draft_len: int = 7,
    ):
        """Device-resident speculative decode loop: each micro-step
        PROPOSES drafts by n-gram lookup over the on-device history,
        VERIFIES them in one (draft_len+1)-row causal chunk, and feeds
        the accepted tokens back — no host round-trip anywhere in the
        chain.  The worst case (no match, zero accepts) is one token
        per micro-step at ~the plain decode dispatch's cost; the best
        case is draft_len+1.  Wider windows ride the T=16/32/64 token
        buckets at near-constant device cost (rows are weight-bound;
        the page stream is shared across rows).  Greedy acceptance
        keeps outputs bit-exact vs sequential argmax."""
        D = draft_len             # drafts per micro-step (S = D+1 rows)
        G = self._spec_ngram
        page = self.cache_config.block_size
        HL = hist.shape[0]
        S = D + 1
        win_idx = (
            jnp.arange(HL - G, dtype=jnp.int32)[:, None]
            + jnp.arange(G, dtype=jnp.int32)[None, :]
        )                                                  # [HL-G, G]

        def micro(k, carry):
            kv_pages, hist, cur_len, out_pk, out_tv, out_ti = carry
            # ---- propose: trailing G-gram lookup over the history ----
            key_g = jax.lax.dynamic_slice(
                hist, (jnp.maximum(cur_len - G, 0),), (G,)
            )
            windows = hist[win_idx]                        # [HL-G, G]
            j_range = jnp.arange(HL - G, dtype=jnp.int32)
            valid = j_range <= cur_len - G - 1             # earlier occurrence
            match = (windows == key_g[None, :]).all(axis=1) & valid
            # prefer the latest match whose continuation window is full
            full = match & (j_range + G + D <= cur_len)
            pick_full = jnp.max(jnp.where(full, j_range, -1))
            pick_any = jnp.max(jnp.where(match, j_range, -1))
            j = jnp.where(pick_full >= 0, pick_full, pick_any)
            has = j >= 0
            start_d = jnp.clip(
                jnp.where(has, j + G, cur_len - 1), 0, HL - D
            )
            draft = jax.lax.dynamic_slice(hist, (start_d,), (D,))
            # no-match fallback: repeat-last drafts (still exact; they
            # simply fail verification and the step nets one token)
            last = hist[jnp.maximum(cur_len - 1, 0)]
            draft = jnp.where(has, draft, jnp.full((D,), last))

            # ---- verify chunk: [last, d1..d7] at positions len-1.. ---
            toks_in = jnp.concatenate([last[None], draft])  # [8]
            pos = cur_len - 1 + jnp.arange(S, dtype=jnp.int32)
            slots = pt_row[pos // page] * page + pos % page
            s_k = StepInput(
                token_ids=toks_in,
                positions=pos,
                slot_mapping=slots,
                kv_lens=jnp.zeros(S, jnp.int32).at[0].set(cur_len - 1 + S),
                page_tables=jnp.zeros(
                    (S, pt_row.shape[0]), jnp.int32
                ).at[0].set(pt_row),
                cu_q_lens=jnp.full(S + 1, S, jnp.int32).at[0].set(0),
                logits_idx=jnp.arange(S, dtype=jnp.int32),
                decode_only=False,
            )
            logits, kv_pages = self.model.forward(params, kv_pages, s_k)
            st_k = SamplingTensors(
                temperature=st.temperature, top_k=st.top_k, top_p=st.top_p,
                min_p=st.min_p, presence=st.presence, frequency=st.frequency,
                repetition=st.repetition, last_tokens=st.last_tokens,
                greedy=st.greedy, seeds=st.seeds,
                seed_pos=st.seed_pos + k, seed_sub=st.seed_sub,
            )
            key = jax.random.fold_in(
                jax.random.fold_in(self._base_key, key_idx), k
            )
            toks, lps = sample(
                logits, st_k, key, greedy_only=True, penalties=False
            )                                              # [S], [S]
            # ---- accept: longest prefix where argmax chain == draft --
            eq = (toks[: D] == draft).astype(jnp.int32)
            acc = jnp.sum(jnp.cumprod(eq))
            count = acc + 1
            # counts ride the packed array (row 2) so the host fetches
            # ONE buffer per dispatch — each extra fetch pays a full
            # tunnel/PCIe round-trip on the non-pipelined spec path
            out_pk = out_pk.at[k].set(
                jnp.stack([
                    toks.astype(jnp.float32), lps,
                    jnp.full((S,), count, jnp.float32),
                ])
            )
            if want_logprobs:
                logp = jax.nn.log_softmax(logits, axis=-1)
                tv, ti = jax.lax.top_k(logp, want_logprobs)
                out_tv = out_tv.at[k].set(tv)
                out_ti = out_ti.at[k].set(ti)
            # ---- feed back: history gains the accepted run -----------
            hist = jax.lax.dynamic_update_slice(
                hist, toks.astype(jnp.int32), (cur_len,)
            )
            cur_len = cur_len + count
            return kv_pages, hist, cur_len, out_pk, out_tv, out_ti

        out_pk = jnp.zeros((n_steps, 3, S), jnp.float32)
        out_tv = jnp.zeros((n_steps, S, max(want_logprobs, 1)), jnp.float32)
        out_ti = jnp.zeros((n_steps, S, max(want_logprobs, 1)), jnp.int32)
        kv_pages, hist, cur_len, out_pk, out_tv, out_ti = (
            jax.lax.fori_loop(
                0, n_steps, micro,
                (kv_pages, hist, cur_len, out_pk, out_tv, out_ti),
            )
        )
        if not want_logprobs:
            out_tv = out_ti = None
        return out_pk, out_tv, out_ti, kv_pages

    def _spec_step(self, sched_out, group, seq, step_start):
        """Dispatch the device-resident speculative loop
        (_device_spec_loop): K micro-steps of propose+verify+feedback
        entirely on device — the speculative analogue of the multi-token
        decode dispatch, netting K..8K tokens per call at the same
        device cost.  Returns None to fall back to the normal path
        (no current n-gram match / no room / short history).  Beyond
        the reference's scope — the one structural lever past the
        single-request weight-stream wall."""
        from candle_vllm_tpu.engine.spec import ngram_draft

        # cheap host gate: only worth the chunk-shaped dispatches while
        # the current text actually drafts (cycling/structured output);
        # otherwise the pipelined multistep path is strictly better
        if not ngram_draft(
            seq.get_token_ids(), self._spec_draft, self._spec_ngram
        ):
            return None
        K = max(1, self._multistep)
        D = self._spec_draft
        L = D + 1
        mml = self.scheduler_config.max_model_len
        len0 = seq.get_len()
        if len0 < self._spec_ngram + 2:
            return None
        if len0 + L * K + L > mml:
            return None  # tail of the context: normal path finishes
        if not self.block_engine.allocate_extend_for_chunk(
            seq, len0 + L * K
        ):
            return None

        page = self.cache_config.block_size
        maxp = (mml + page - 1) // page
        HL = mml + L * (K + 1)
        hist = np.zeros(HL, np.int32)
        hist[:len0] = seq.get_token_ids()
        bids = np.asarray(self.block_engine.get_block_ids(seq), np.int32)
        pt_row = np.zeros(maxp, np.int32)
        pt_row[: len(bids)] = bids
        sp = group.sampling_params
        st = SamplingTensors.build(
            [sp], [[]], self.model_config.vocab_size, pad_to=L,
            positions=[seq.get_output_len()], sub_indices=[0],
        )
        wl = sp.logprobs or 0
        want_logprobs = 0 if wl == 0 else (8 if wl <= 8 else 20)
        if not hasattr(self, "_jit_spec"):
            self._jit_spec = jax.jit(
                self._device_spec_loop, donate_argnums=(1,),
                static_argnames=("n_steps", "want_logprobs", "draft_len"),
            )
        out_pk, top_vals, top_ids, self.kv_pages = self._jit_spec(
            self.params, self.kv_pages, jnp.asarray(hist),
            jnp.int32(len0), jnp.asarray(pt_row), st,
            np.int32(self._step_counter),
            n_steps=K, want_logprobs=want_logprobs, draft_len=D,
        )
        self._step_counter += 1
        out_pk = np.asarray(out_pk)          # [K, 3, 8] (row 2 = count)
        counts = out_pk[:, 2, 0]             # [K]
        if want_logprobs:
            top_vals = np.asarray(top_vals)
            top_ids = np.asarray(top_ids)

        now = time.monotonic()
        if group.metrics.get("first_token_time") is None:
            group.metrics["first_token_time"] = now
        appended = 0
        for k in range(K):
            cnt = int(counts[k])
            self.stats.spec_drafted += D
            self.stats.spec_accepted += cnt - 1
            for i in range(cnt):
                seq.num_computed_tokens += 1
                tok = int(out_pk[k, 0, i])
                seq.append_token(tok, float(out_pk[k, 1, i]))
                appended += 1
                if sp.logprobs and want_logprobs:
                    kk = min(sp.logprobs, top_ids.shape[2])
                    seq.output_logprobs.append(
                        {
                            "token": tok,
                            "logprob": float(out_pk[k, 1, i]),
                            "top": {
                                int(top_ids[k, i, j]):
                                float(top_vals[k, i, j])
                                for j in range(kk)
                            },
                        }
                    )
                self._maybe_finish(seq, group)
                if seq.is_finished:
                    break
            if seq.is_finished:
                break  # discard speculatively decoded tails
        finished_groups = self.scheduler.free_finished()
        self.stats.requests_finished += len(finished_groups)
        self.stats.record_step(
            prefill_tokens=0,
            decode_tokens=appended,
            step_time=time.monotonic() - step_start,
        )
        return self._collect_outputs(finished_groups, sched_out)

    def _device_batch_spec_loop(
        self,
        params,
        kv_pages,
        hist,        # [N, HL] i32 per-sequence histories
        cur_lens,    # [N] i32
        pts,         # [N, MAXP] i32 page tables
        st,          # SamplingTensors (greedy rows, pad_to = T)
        key_idx,     # [] i32
        *,
        n_steps: int,
        want_logprobs: int,
    ):
        """Device-chained BATCHED speculation: the N-sequence analogue
        of _device_spec_loop.  Every micro-step proposes per-sequence
        n-gram drafts (vmapped lookup over the [N, HL] histories),
        verifies all of them in ONE fixed-layout chunk (sequence i owns
        rows [8i, 8i+8): last token + 7 drafts), and feeds each
        sequence's accepted run back — K micro-steps per host
        round-trip.  Inactive padding sequences (cur_len 0) mask out
        via INVALID slots + empty cu spans."""
        from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT

        D = 7
        L = D + 1
        G = self._spec_ngram
        page = self.cache_config.block_size
        N, HL = hist.shape
        T = N * L
        win_idx = (
            jnp.arange(HL - G, dtype=jnp.int32)[:, None]
            + jnp.arange(G, dtype=jnp.int32)[None, :]
        )                                                  # [HL-G, G]
        j_range = jnp.arange(HL - G, dtype=jnp.int32)
        seq_rows = jnp.arange(N, dtype=jnp.int32)

        def propose_one(h, cl):
            key_g = jax.lax.dynamic_slice(h, (jnp.maximum(cl - G, 0),), (G,))
            windows = h[win_idx]
            valid = j_range <= cl - G - 1
            match = (windows == key_g[None, :]).all(axis=1) & valid
            full = match & (j_range + G + D <= cl)
            pick_full = jnp.max(jnp.where(full, j_range, -1))
            pick_any = jnp.max(jnp.where(match, j_range, -1))
            j = jnp.where(pick_full >= 0, pick_full, pick_any)
            has = j >= 0
            start_d = jnp.clip(jnp.where(has, j + G, cl - 1), 0, HL - D)
            draft = jax.lax.dynamic_slice(h, (start_d,), (D,))
            last = h[jnp.maximum(cl - 1, 0)]
            return last, jnp.where(has, draft, jnp.full((D,), last))

        def micro(k, carry):
            kv_pages, hist, cur_lens, out_pk, out_tv, out_ti = carry
            active = cur_lens > 0                          # [N]
            lasts, drafts = jax.vmap(propose_one)(hist, cur_lens)
            toks_in = jnp.concatenate(
                [lasts[:, None], drafts], axis=1
            )                                              # [N, L]
            pos = (cur_lens - 1)[:, None] + jnp.arange(L, dtype=jnp.int32)
            pos = jnp.maximum(pos, 0)                      # [N, L]
            slot = jnp.take_along_axis(
                pts, pos // page, axis=1
            ) * page + pos % page
            slot = jnp.where(active[:, None], slot, INVALID_SLOT)
            kv_lens = jnp.where(active, cur_lens - 1 + L, 0)
            # fixed layout: sequence i owns rows [i*L, (i+1)*L); empty
            # span (cu[i+1] == cu[i]) for inactive sequences would
            # break the fixed row ownership, so inactive rows keep
            # their span but mask via kv_len 0 + INVALID slots
            cu = jnp.arange(N + 1, dtype=jnp.int32) * L
            s_k = StepInput(
                token_ids=toks_in.reshape(T),
                positions=pos.reshape(T),
                slot_mapping=slot.reshape(T),
                kv_lens=kv_lens,
                page_tables=pts,
                cu_q_lens=cu,
                logits_idx=jnp.arange(T, dtype=jnp.int32),
                decode_only=False,
                chunk_bq=L,  # one attention block per sequence slot
            )
            logits, kv_pages = self.model.forward(params, kv_pages, s_k)
            st_k = SamplingTensors(
                temperature=st.temperature, top_k=st.top_k, top_p=st.top_p,
                min_p=st.min_p, presence=st.presence, frequency=st.frequency,
                repetition=st.repetition, last_tokens=st.last_tokens,
                greedy=st.greedy, seeds=st.seeds,
                seed_pos=st.seed_pos + k, seed_sub=st.seed_sub,
            )
            key = jax.random.fold_in(
                jax.random.fold_in(self._base_key, key_idx), k
            )
            toks, lps = sample(
                logits, st_k, key, greedy_only=True, penalties=False
            )                                              # [T], [T]
            toks2 = toks.reshape(N, L)
            eq = (toks2[:, :D] == drafts).astype(jnp.int32)
            counts = 1 + jnp.sum(jnp.cumprod(eq, axis=1), axis=1)  # [N]
            counts = jnp.where(active, counts, 0)
            out_pk = out_pk.at[k].set(jnp.stack([
                toks.astype(jnp.float32), lps,
                jnp.repeat(counts.astype(jnp.float32), L),
            ]))
            if want_logprobs:
                logp = jax.nn.log_softmax(logits, axis=-1)
                tv, ti = jax.lax.top_k(logp, want_logprobs)
                out_tv = out_tv.at[k].set(tv)
                out_ti = out_ti.at[k].set(ti)
            hist = jax.vmap(
                lambda h, t, cl: jax.lax.dynamic_update_slice(h, t, (cl,))
            )(hist, toks2, cur_lens)
            cur_lens = cur_lens + counts
            return kv_pages, hist, cur_lens, out_pk, out_tv, out_ti

        out_pk = jnp.zeros((n_steps, 3, T), jnp.float32)
        out_tv = jnp.zeros((n_steps, T, max(want_logprobs, 1)), jnp.float32)
        out_ti = jnp.zeros((n_steps, T, max(want_logprobs, 1)), jnp.int32)
        kv_pages, hist, cur_lens, out_pk, out_tv, out_ti = (
            jax.lax.fori_loop(
                0, n_steps, micro,
                (kv_pages, hist, cur_lens, out_pk, out_tv, out_ti),
            )
        )
        if not want_logprobs:
            out_tv = out_ti = None
        return out_pk, out_tv, out_ti, kv_pages

    def _batch_spec_step(self, sched_out, sched_rows, step_start):
        """Dispatch the device-chained BATCHED speculative loop: K
        micro-steps, each verifying 7 drafts per sequence in one
        fixed-layout chunk — the weight pass and every sequence's KV
        stream are paid once per micro-step for up to 8 tokens per
        sequence, and the chain never touches the host.  Acceptance
        semantics identical to sequential greedy (bit-exact).  Returns
        None when nothing drafts or the chain doesn't fit (the normal
        multistep path wins then)."""
        from candle_vllm_tpu.engine.spec import ngram_draft

        if not any(
            ngram_draft(seq.get_token_ids(), 7, self._spec_ngram)
            for _, seq, _ in sched_rows
        ):
            return None
        N_real = len(sched_rows)
        if N_real > 32:
            return None
        K = max(1, self._multistep)
        L = 8
        mml = self.scheduler_config.max_model_len
        for g, seq, _ in sched_rows:
            if seq.get_len() < self._spec_ngram + 2:
                return None
            if seq.get_len() + L * K + L > mml:
                return None
            if not self.block_engine.allocate_extend_for_chunk(
                seq, seq.get_len() + L * K
            ):
                return None

        # batch-size bucket keeps the compiled-variant set closed
        N = next(b for b in (2, 4, 8, 16, 32) if b >= N_real)
        T = N * L
        page = self.cache_config.block_size
        maxp = (mml + page - 1) // page
        HL = mml + L * (K + 1)
        hist = np.zeros((N, HL), np.int32)
        cur_lens = np.zeros(N, np.int32)
        pts = np.zeros((N, maxp), np.int32)
        for i, (g, seq, _) in enumerate(sched_rows):
            toks = seq.get_token_ids()
            hist[i, : len(toks)] = toks
            cur_lens[i] = len(toks)
            bids = np.asarray(
                self.block_engine.get_block_ids(seq), np.int32
            )
            pts[i, : len(bids)] = bids
        params_rows = [g.sampling_params for g, _, _ in sched_rows]
        st = SamplingTensors.build(
            params_rows, [[] for _ in sched_rows],
            self.model_config.vocab_size, pad_to=T,
            positions=[s.get_output_len() for _, s, _ in sched_rows],
            sub_indices=[0] * len(sched_rows),
        )
        wl = max((p.logprobs or 0) for p in params_rows)
        want_logprobs = 0 if wl == 0 else (8 if wl <= 8 else 20)
        if not hasattr(self, "_jit_bspec"):
            self._jit_bspec = jax.jit(
                self._device_batch_spec_loop, donate_argnums=(1,),
                static_argnames=("n_steps", "want_logprobs"),
            )
        out_pk, top_vals, top_ids, self.kv_pages = self._jit_bspec(
            self.params, self.kv_pages, jnp.asarray(hist),
            jnp.asarray(cur_lens), jnp.asarray(pts), st,
            np.int32(self._step_counter),
            n_steps=K, want_logprobs=want_logprobs,
        )
        self._step_counter += 1
        out_pk = np.asarray(out_pk)          # [K, 3, T] (row 2 = counts)
        if want_logprobs:
            top_vals = np.asarray(top_vals)
            top_ids = np.asarray(top_ids)

        now = time.monotonic()
        appended = 0
        for i, (g, seq, _) in enumerate(sched_rows):
            base = i * L
            sp = g.sampling_params
            if g.metrics.get("first_token_time") is None:
                g.metrics["first_token_time"] = now
            for k in range(K):
                if seq.is_finished:
                    break  # discard speculatively decoded tails
                cnt = int(out_pk[k, 2, base])
                self.stats.spec_drafted += L - 1
                self.stats.spec_accepted += max(cnt - 1, 0)
                for j in range(cnt):
                    seq.num_computed_tokens += 1
                    tok = int(out_pk[k, 0, base + j])
                    seq.append_token(tok, float(out_pk[k, 1, base + j]))
                    appended += 1
                    if sp.logprobs and want_logprobs:
                        kk = min(sp.logprobs, top_ids.shape[2])
                        seq.output_logprobs.append(
                            {
                                "token": tok,
                                "logprob": float(out_pk[k, 1, base + j]),
                                "top": {
                                    int(top_ids[k, base + j, m]):
                                    float(top_vals[k, base + j, m])
                                    for m in range(kk)
                                },
                            }
                        )
                    self._maybe_finish(seq, g)
                    if seq.is_finished:
                        break
        finished_groups = self.scheduler.free_finished()
        self.stats.requests_finished += len(finished_groups)
        self.stats.record_step(
            prefill_tokens=0,
            decode_tokens=appended,
            step_time=time.monotonic() - step_start,
        )
        return self._collect_outputs(finished_groups, sched_out)

    # -- stop detection -----------------------------------------------------
    def _maybe_finish(self, seq: Sequence, group: SequenceGroup) -> None:
        sp = group.sampling_params
        tok = seq.output_token_ids[-1]

        delta = ""
        if self.detok is not None:
            delta = self.detok.step(
                seq.seq_id, seq.get_token_ids(), seq.get_prompt_len()
            )
            seq.output_text += delta

        if not sp.ignore_eos and (
            tok in self.model_config.eos_token_ids or tok in sp.stop_token_ids
        ):
            seq.status = SequenceStatus.FINISHED_STOPPED
            seq.stop_reason = tok
        elif seq.get_output_len() >= sp.max_tokens:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
        elif seq.get_len() >= self.scheduler_config.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
        elif sp.stop and self.detok is not None:
            for s in sp.stop:
                idx = seq.output_text.find(s)
                if idx != -1:
                    seq.output_text = seq.output_text[:idx]
                    seq.status = SequenceStatus.FINISHED_STOPPED
                    seq.stop_reason = s
                    break
        if group.on_token:
            group.on_token(seq, tok, delta, seq.is_finished)
        if seq.is_finished and self.detok is not None:
            self.detok.finish(seq.seq_id)

    # -- cache ops ----------------------------------------------------------
    def _execute_swaps(self, out: SchedulerOutput) -> None:
        if out.blocks_to_swap_out:
            assert self.swap_space is not None, "no CPU swap space configured"
            self.swap_space.swap_out(self.kv_pages, out.blocks_to_swap_out)
        if out.blocks_to_swap_in:
            assert self.swap_space is not None
            self.kv_pages = self.swap_space.swap_in(
                self.kv_pages, out.blocks_to_swap_in
            )

    # -- outputs -------------------------------------------------------------
    def _group_output(self, group: SequenceGroup) -> RequestOutput:
        outs = []
        seqs = list(group.seqs.values())
        sp = group.sampling_params
        if sp.best_of and sp.best_of > sp.n and group.is_finished:
            # n-best selection: top-n by cumulative logprob
            seqs = sorted(
                seqs, key=lambda s: s.cumulative_logprob, reverse=True
            )[: sp.n]
        for idx, seq in enumerate(seqs):
            outs.append(
                CompletionOutput(
                    index=idx,
                    text=seq.output_text,
                    token_ids=list(seq.output_token_ids),
                    cumulative_logprob=seq.cumulative_logprob,
                    finish_reason=seq.status.finish_reason,
                    stop_reason=seq.stop_reason,
                    logprobs=seq.output_logprobs or None,
                )
            )
        prompt_ids = group.get_seqs()[0].prompt_token_ids
        m = RequestMetrics(
            arrival_time=group.arrival_time,
            first_token_time=group.metrics.get("first_token_time"),
            finished_time=time.monotonic() if group.is_finished else None,
            prompt_tokens=len(prompt_ids),
            cached_tokens=group.get_seqs()[0].num_cached_tokens,
        )
        return RequestOutput(
            request_id=group.request_id,
            prompt_token_ids=prompt_ids,
            outputs=outs,
            finished=group.is_finished,
            metrics=m,
        )

    def _collect_outputs(
        self, finished: List[SequenceGroup], sched_out: SchedulerOutput
    ) -> List[RequestOutput]:
        outputs = []
        for group in finished:
            out = self._group_output(group)
            outputs.append(out)
            if self.request_logger is not None:
                self.request_logger.log_finished(out)
            self._groups.pop(group.request_id, None)
        for group in sched_out.ignored:
            outputs.append(self._group_output(group))
            self._groups.pop(group.request_id, None)
        return outputs

    # -- offline batch API ---------------------------------------------------
    def generate(
        self,
        prompts: Seq[Any],
        sampling_params: Optional[SamplingParams] = None,
    ) -> List[RequestOutput]:
        """Blocking batch generation (reference: api.rs Engine::generate)."""
        for i, p in enumerate(prompts):
            if isinstance(p, str):
                self.add_request(f"gen-{i}", prompt=p, sampling_params=sampling_params)
            else:
                self.add_request(
                    f"gen-{i}", prompt_token_ids=list(p), sampling_params=sampling_params
                )
        results: Dict[str, RequestOutput] = {}
        while self.has_unfinished_requests():
            for out in self.step():
                results[out.request_id] = out
        return [results[f"gen-{i}"] for i in range(len(prompts))]

    # -- embeddings ----------------------------------------------------------
    def embed(
        self, prompts: Seq[List[int]], pooling: str = "last"
    ) -> List[np.ndarray]:
        """Encode prompts to pooled hidden-state vectors (reference:
        /v1/embeddings -> process_embedding_batch, llm_engine.rs:1807).

        Prompts are greedily packed into shared ragged prefill batches
        (one device dispatch serves many prompts, like the reference's
        embedding batch path) within the step token budget."""
        from candle_vllm_tpu.engine.input_builder import build_step_input
        from candle_vllm_tpu.engine.scheduler import ScheduledGroup

        if not hasattr(self, "_jit_hidden"):
            self._jit_hidden = jax.jit(
                self.model.forward_hidden, donate_argnums=(1,)
            )

        budget = self.scheduler_config.max_num_batched_tokens
        max_rows = 256  # input-builder seq bucket cap
        for ids in prompts:
            if len(ids) > budget:
                raise ValueError(
                    f"embedding input ({len(ids)} tokens) exceeds the step "
                    f"budget ({budget})"
                )

        outs: List[Optional[np.ndarray]] = [None] * len(prompts)

        def flush(batch: List[Tuple[int, List[int]]]) -> None:
            scheduled = []
            seqs = []
            try:
                for _, ids in batch:
                    seq = Sequence(self._next_seq_id, list(ids))
                    self._next_seq_id += 1
                    group = SequenceGroup(
                        f"emb-{seq.seq_id}", [seq], SamplingParams()
                    )
                    self.block_engine.allocate(seq)
                    seq.num_cached_tokens = 0
                    seq.num_computed_tokens = 0
                    seqs.append(seq)
                    scheduled.append(
                        ScheduledGroup(group, {seq.seq_id: len(ids)})
                    )
                plan = build_step_input(
                    scheduled,
                    self.block_engine,
                    self.cache_config.block_size,
                    self.scheduler_config.max_model_len,
                )
                hidden, self.kv_pages = self._jit_hidden(
                    self.params, self.kv_pages, plan.step
                )
                h = np.asarray(hidden, np.float32)
                # rows are sorted by chunk length inside build_step_input;
                # recover each prompt's span from the plan's cu boundaries
                sid_to_idx = {
                    seq.seq_id: idx for (idx, _), seq in zip(batch, seqs)
                }
                cu = np.asarray(plan.step.cu_q_lens)
                for i, sid in enumerate(plan.seq_ids):
                    lo, hi = int(cu[i]), int(cu[i + 1])
                    idx = sid_to_idx[sid]
                    if pooling == "mean":
                        outs[idx] = h[lo:hi].mean(axis=0)
                    else:  # last-token pooling
                        outs[idx] = h[hi - 1]
            finally:
                for seq in seqs:
                    self.block_engine.free(seq)

        batch: List[Tuple[int, List[int]]] = []
        used = 0
        for idx, ids in enumerate(prompts):
            if batch and (used + len(ids) > budget or len(batch) >= max_rows):
                flush(batch)
                batch, used = [], 0
            batch.append((idx, list(ids)))
            used += len(ids)
        if batch:
            flush(batch)
        return outs  # type: ignore[return-value]

    # -- introspection -------------------------------------------------------
    def kv_usage(self) -> float:
        return self.scheduler.kv_usage()

    def num_unfinished(self) -> int:
        return self.scheduler.num_unfinished()
