"""Step input: the dynamic arrays crossing host->device each engine step.

TPU-native replacement for the reference's ``InputMetadata`` +
``ForwardPayload`` (``/root/reference/src/openai/pipelines/inputs.rs``,
``multiprocess.rs:91-255``): one pytree of padded, statically-shaped arrays.
There is no per-step daemon broadcast — every host builds the same
StepInput from its replicated scheduler state (SPMD).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class StepInput:
    """Flat ragged token batch (mixed prefill chunks + decode rows).

    T = padded token count, S = padded sequence count.
    """

    token_ids: jnp.ndarray     # [T] i32; padding rows = 0
    positions: jnp.ndarray     # [T] i32 absolute positions (for rope)
    slot_mapping: jnp.ndarray  # [T] i32 page*page_size+off; INVALID_SLOT pad
    kv_lens: jnp.ndarray       # [S] i32 post-step kv length per seq; 0 pad
    page_tables: jnp.ndarray   # [S, MAXP] i32
    cu_q_lens: jnp.ndarray     # [S+1] i32 (padding seqs repeat final value)
    logits_idx: jnp.ndarray    # [S] i32 rows to gather before lm_head
    # recurrent-state pool slot per sequence (hybrid GDN/mamba layers;
    # reference: mamba slot mapping, inputs.rs:67). Zeros for pure
    # attention models.
    state_slots: jnp.ndarray = None  # [S] i32
    # multimodal (VL models): image embeddings scheduled this step and a
    # per-token gather index into them (-1 = text token).  mm_embeds is
    # [1 + n_deepstack, M, hidden]: row 0 replaces the token embedding,
    # rows 1.. add into the first n_deepstack decoder layers (reference:
    # qwen3_vl/mod.rs:220-270 scatter + qwen.rs:270-292 apply_deep_stack).
    # None for text-only models/steps.
    mm_embeds: jnp.ndarray = None  # [1+n_ds, M, hidden]
    mm_idx: jnp.ndarray = None     # [T] i32; -1 for text/padding rows
    # hybrid GDN models with prefix caching: in-chunk offset at which each
    # sequence's recurrent state is snapshotted for the prefix-snapshot
    # store (-1 = none; reference: scheduler/mamba.rs:15-291).  None for
    # non-hybrid models.
    snap_pos: jnp.ndarray = None   # [S] i32
    # STATIC (pytree aux): every scheduled chunk is a single decode row
    # (q row i belongs to sequence i).  Lets attention pick the
    # decode-specialized kernel; jit variants key on it, which matches
    # the engine's existing decode-vs-prefill shape bucketing.
    decode_only: bool = field(default=False, metadata=dict(static=True))
    # STATIC: query-block size hint for the attention kernel.  The
    # speculative verify chunks lay sequences out in fixed L-row slots;
    # bq == L aligns one block per sequence — zero cross-sequence
    # masked-row waste AND each sequence's pages stream exactly once
    # (0 = kernel default).
    chunk_bq: int = field(default=0, metadata=dict(static=True))

    @property
    def num_tokens(self) -> int:
        return self.token_ids.shape[0]

    @property
    def num_seqs(self) -> int:
        return self.kv_lens.shape[0]
