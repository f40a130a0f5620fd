"""Build the per-step device input from scheduler state.

TPU re-design of the reference's input tensorization
(``/root/reference/src/openai/pipelines/inputs.rs:90-575``
``prepare_prompt``/``prepare_decode``): ONE padded ragged batch carries
decode rows and prefill chunks together, shaped to a small closed set of
bucket sizes so jit compiles a handful of shapes (the TPU analogue of CUDA
graph capture, reference backend/graph.rs).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from candle_vllm_tpu.engine.block_engine import BlockEngine
from candle_vllm_tpu.engine.scheduler import ScheduledGroup
from candle_vllm_tpu.engine.sequence import Sequence
from candle_vllm_tpu.models.types import StepInput
from candle_vllm_tpu.ops.kv_cache import INVALID_SLOT

# Token-count buckets: powers of two, plus fine steps at the low end.
_TOKEN_BUCKETS = [8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]
_SEQ_BUCKETS = [8, 16, 32, 64, 128, 256]
# image-embed row buckets for multimodal steps (closed set, like tokens)
_MM_BUCKETS = [64, 256, 1024, 4096, 16384]


def bucket(n: int, buckets: Sequence[int]) -> int:
    i = bisect.bisect_left(buckets, n)
    if i == len(buckets):
        raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")
    return buckets[i]


@dataclass
class StepPlan:
    """Host-side record of what each batch row means."""

    step: StepInput
    # per scheduled sequence, in batch order:
    seq_ids: List[int]
    sample_rows: List[int]        # index into logits rows ([S]) per seq
    needs_sample: List[bool]      # False for mid-prompt prefill chunks
    # hybrid snapshots: seq_id -> number of prompt blocks the captured
    # state covers (key material for the snapshot store)
    snap_hash_blocks: Dict[int, int] = None


def build_step_input(
    scheduled: List[ScheduledGroup],
    block_engine: BlockEngine,
    page_size: int,
    max_model_len: int,
    token_buckets: Sequence[int] = tuple(_TOKEN_BUCKETS),
    seq_buckets: Sequence[int] = tuple(_SEQ_BUCKETS),
    state_slot_map: Optional[Dict[int, int]] = None,
    snap_boundaries: bool = False,
) -> StepPlan:
    """Flatten this step's scheduled chunks into one padded StepInput.

    Decode rows come first (q_len 1), then prefill chunks — so decode-only
    steps share bucket shapes regardless of which requests run.
    """
    rows: List[Tuple[Sequence, int]] = []  # (seq, q_len)
    for sg in scheduled:
        for seq_id, q_len in sg.token_chunks.items():
            rows.append((sg.group.seqs[seq_id], q_len))
    rows.sort(key=lambda r: r[1])  # decode rows (q_len 1) first

    total_tokens = sum(q for _, q in rows)
    T = bucket(max(total_tokens, 1), token_buckets)
    S = bucket(max(len(rows), 1), seq_buckets)
    maxp = (max_model_len + page_size - 1) // page_size

    token_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    slot_mapping = np.full(T, INVALID_SLOT, np.int32)
    kv_lens = np.zeros(S, np.int32)
    page_tables = np.zeros((S, maxp), np.int32)
    cu = np.zeros(S + 1, np.int32)
    logits_idx = np.zeros(S, np.int32)
    state_slots = np.zeros(S, np.int32)
    # hybrid prefix snapshots: capture state at the prompt's last full
    # block boundary when this chunk covers it (mamba.rs:15-291 analogue)
    snap_pos = np.full(S, -1, np.int32) if snap_boundaries else None
    snap_hash_blocks: Dict[int, int] = {}

    seq_ids: List[int] = []
    sample_rows: List[int] = []
    needs_sample: List[bool] = []

    # multimodal: image-embed arrays referenced by this step's chunks and a
    # per-token gather index (the TPU analogue of the reference's
    # image_token_offset chunked-prefill slicing, qwen3_vl/mod.rs:233-268)
    mm_arrays: List[np.ndarray] = []
    mm_offsets: Dict[int, int] = {}
    mm_idx: Optional[np.ndarray] = None

    from candle_vllm_tpu.engine import host_ops

    t = 0
    for i, (seq, q_len) in enumerate(rows):
        start = seq.num_computed_tokens
        toks = seq.get_token_ids()[start : start + q_len]
        assert len(toks) == q_len, (
            f"seq {seq.seq_id}: chunk [{start}:{start+q_len}) out of range "
            f"(len {seq.get_len()})"
        )
        block_ids = np.asarray(block_engine.get_block_ids(seq), np.int32)
        token_ids[t : t + q_len] = toks
        host_ops.fill_slots(
            positions[t : t + q_len],
            slot_mapping[t : t + q_len],
            block_ids,
            start,
            page_size,
        )
        if seq.mm_embeds is not None and start < seq.get_prompt_len():
            arr = seq.mm_embeds
            if id(arr) not in mm_offsets:
                mm_offsets[id(arr)] = sum(a.shape[1] for a in mm_arrays)
                mm_arrays.append(arr)
            off = mm_offsets[id(arr)]
            k = min(q_len, seq.get_prompt_len() - start)
            sl = np.asarray(seq.mm_pos[start : start + k], np.int32)
            if (sl >= 0).any():
                if mm_idx is None:
                    mm_idx = np.full(T, -1, np.int32)
                mm_idx[t : t + k] = np.where(sl >= 0, sl + off, -1)
        t += q_len
        kv_lens[i] = start + q_len
        page_tables[i, : len(block_ids)] = block_ids
        cu[i + 1] = t
        logits_idx[i] = t - 1
        if state_slot_map:
            state_slots[i] = state_slot_map.get(seq.seq_id, 0)
        if snap_pos is not None and q_len > 1:
            plen = seq.get_prompt_len()
            boundary = ((plen - 1) // page_size) * page_size
            if boundary > 0 and start < boundary <= start + q_len:
                snap_pos[i] = boundary - 1 - start
                snap_hash_blocks[seq.seq_id] = boundary // page_size
        seq_ids.append(seq.seq_id)
        sample_rows.append(i)
        # only chunks that reach the end of the known tokens produce a
        # sampleable next-token distribution
        needs_sample.append(start + q_len >= seq.get_len())
    cu[len(rows) + 1 :] = t
    # padding seqs gather row 0 (harmless; ignored)

    mm_embeds: Optional[np.ndarray] = None
    if mm_idx is not None:
        n_ds = mm_arrays[0].shape[0]
        hidden = mm_arrays[0].shape[2]
        M = sum(a.shape[1] for a in mm_arrays)
        Mp = bucket(M, _MM_BUCKETS)
        mm_embeds = np.zeros((n_ds, Mp, hidden), np.float32)
        o = 0
        for a in mm_arrays:
            mm_embeds[:, o : o + a.shape[1]] = a
            o += a.shape[1]

    step = StepInput(
        token_ids=token_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        kv_lens=kv_lens,
        page_tables=page_tables,
        cu_q_lens=cu,
        logits_idx=logits_idx,
        state_slots=state_slots,
        mm_embeds=mm_embeds,
        mm_idx=mm_idx,
        snap_pos=snap_pos,
        # static: all rows are single decode tokens -> q row i == seq i
        # (rows sort decode-first, so this holds exactly when no chunk
        # exceeds one token)
        decode_only=bool(rows) and rows[-1][1] == 1,
    )
    return StepPlan(
        step=step,
        seq_ids=seq_ids,
        sample_rows=sample_rows,
        needs_sample=needs_sample,
        snap_hash_blocks=snap_hash_blocks,
    )
