"""Mesh construction and parameter sharding rules.

The reference implements tensor parallelism with hand-written
column/row/vocab-parallel layers and explicit NCCL all-reduce
(``/root/reference/src/openai/distributed.rs:210-1668``).  Here the same
layout is expressed declaratively: each parameter gets a PartitionSpec and
XLA inserts the collectives (psum after row-parallel o_proj/down_proj,
all-gather for vocab-parallel logits) — riding ICI, scheduled by the
compiler.

Axes:
- ``tp``: tensor parallel (sharded heads / ffn / vocab) — the axis every
  sharding rule below actually partitions, matching the reference's
  TP-only parallelism.
- ``dp``: REPLICA groups.  No rule shards batch or KV pages over it —
  a dp group is a full copy used for multi-host lockstep replicas
  (parallel/multihost.py) and fault domains, not for splitting one
  step's work.  Request-level data parallelism (distinct requests per
  replica) is the roadmap use; the reference has no DP at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp_size: int, dp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp_size * tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, ("dp", "tp"))


# Parameter-name regex -> PartitionSpec over ("dp", "tp") mesh axes.
# Linear weights are stored transposed ([in, out]) — see models/weights.py —
# so column-parallel layers shard the LAST dim and row-parallel the FIRST.
# This mirrors the reference's TensorParallelColumn/RowLinear split
# (distributed.rs:210-250, 538-711) without any explicit collectives.
_DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    # quantized W4 expert banks FIRST (the dense *_proj rules below would
    # otherwise shadow them with 2D/3D specs).  Reference: expert
    # sharding distributed.rs:108-203.  qweight [E, n_tiles, IN, TO/2]
    # shards the tile axis (tiles are contiguous OUT spans — scale-aligned
    # with the scales' OUT shard); down_proj is row-parallel (IN axis /
    # scale-group axis).  Consumed inside models/moe.py's shard_map.
    (r"\.experts\.(gate_proj|up_proj)\.qweight$", P(None, "tp", None, None)),
    (r"\.experts\.(gate_proj|up_proj)\.scales$", P(None, None, "tp")),
    (r"\.experts\.down_proj\.qweight$", P(None, None, "tp", None)),
    (r"\.experts\.down_proj\.scales$", P(None, "tp", None)),
    # embeddings: vocab-sharded (reference: VocabParallelLinear,
    # distributed.rs:1457-1668)
    (r"embed_tokens\.weight$", P("tp", None)),
    (r"lm_head\.weight$", P(None, "tp")),
    # attention: heads sharded (column-parallel qkv, row-parallel o);
    # quantized scale planes shard like their weight; the tile-contiguous
    # qweight [OUT/TO, IN, TO'] shards the tile axis (column-parallel) or
    # the IN axis (row-parallel) — tiles are contiguous OUT spans, so the
    # tile-axis shard matches the scales' OUT shard
    (r"\.(q_proj|k_proj|v_proj)\.(weight|scales|qzeros)$", P(None, "tp")),
    (r"\.(q_proj|k_proj|v_proj)\.qweight$", P("tp", None, None)),
    (r"\.(q_proj|k_proj|v_proj)\.bias$", P("tp")),
    (r"\.o_proj\.(weight|scales|qzeros)$", P("tp", None)),
    (r"\.o_proj\.qweight$", P(None, "tp", None)),
    (r"\.o_proj\.bias$", P()),
    # MLA (DeepSeek family): the per-head up-projections shard by head —
    # q_b [q_lora_rank, H*qk_dim] and kv_b [kv_lora_rank, H*(nope+v)] are
    # column-parallel; the LoRA down-projections (q_a, kv_a_proj_with_mqa)
    # stay replicated (their latent outputs are shared by every head, the
    # analogue of the reference loading them as ReplicatedLinear,
    # mla_attention.rs:83-196)
    (r"\.(q_b_proj|kv_b_proj)\.(weight|scales|qzeros)$", P(None, "tp")),
    (r"\.(q_b_proj|kv_b_proj)\.qweight$", P("tp", None, None)),
    # mlp: column-parallel gate/up, row-parallel down
    (r"\.(gate_proj|up_proj)\.(weight|scales|qzeros)$", P(None, "tp")),
    (r"\.(gate_proj|up_proj)\.qweight$", P("tp", None, None)),
    (r"\.(gate_proj|up_proj)\.bias$", P("tp")),
    (r"\.down_proj\.(weight|scales|qzeros)$", P("tp", None)),
    (r"\.down_proj\.qweight$", P(None, "tp", None)),
    (r"\.down_proj\.bias$", P()),
    # MoE expert banks [E, in, out] / [E, in, out]
    (r"\.experts\.(gate_proj|up_proj)$", P(None, None, "tp")),
    (r"\.experts\.down_proj$", P(None, "tp", None)),
    # llama4-style fused bf16 bank [E, hidden, 2I]: sharded for HBM (the
    # gate/up split resharding is XLA's problem; quantized TP paths use
    # separate banks instead — see ops/quant.quantize_moe_banks)
    (r"\.experts\.gate_up_proj$", P(None, None, "tp")),
    (r"\.(gate|router)\.weight$", P()),
    # norms replicated
    (r".*norm.*\.weight$", P()),
    (r".*\.bias$", P()),
)


@dataclass
class ShardingPlan:
    """Maps parameter names to NamedShardings on a mesh."""

    mesh: Mesh
    rules: Tuple[Tuple[str, P], ...] = _DEFAULT_RULES
    _compiled: Dict[str, "re.Pattern"] = field(default_factory=dict, repr=False)

    def spec(self, name: str) -> P:
        for pattern, spec in self.rules:
            pat = self._compiled.get(pattern)
            if pat is None:
                pat = self._compiled[pattern] = re.compile(pattern)
            if pat.search(name):
                return spec
        return P()

    def sharding(self, name: str) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec(name))

    def kv_pages_sharding(self, turbo3: bool = False) -> NamedSharding:
        # [num_pages, page_size, 2*K, head_dim] — KV heads sharded over tp.
        # turbo3 pages are plane-major [num_pages, planes, page_size, 128]:
        # shard the PLANES dim so each device owns its heads' complete
        # bitplane block (models/layers.py pages_spec must match)
        if turbo3:
            return NamedSharding(self.mesh, P(None, "tp", None, None))
        return NamedSharding(self.mesh, P(None, None, "tp", None))

    def _fits(self, shape: Tuple[int, ...], spec: P) -> bool:
        """A spec only applies when every named axis divides its dim."""
        for dim, axes in zip(shape, spec):
            if axes is None:
                continue
            for ax in (axes if isinstance(axes, tuple) else (axes,)):
                n = self.mesh.shape.get(ax, 1)
                if dim % n:
                    return False
        return True

    def apply(self, params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        specs: Dict[str, P] = {}
        for name, arr in params.items():
            s = self.spec(name)
            if not self._fits(arr.shape, s):
                s = P()
            specs[name] = s
        # quantized expert banks shard all-or-none per layer: the MoE
        # shard_map (models/moe.py) needs every bank tensor of a layer
        # sharded consistently, so one non-divisible tensor drops the
        # whole layer's banks to replicated
        import collections

        groups = collections.defaultdict(list)
        pat = re.compile(
            r"(.*)\.experts\.(gate_proj|up_proj|down_proj)\.(qweight|scales)$"
        )
        for name in params:
            m = pat.match(name)
            if m:
                groups[m.group(1)].append(name)
        for names in groups.values():
            if any(specs[n] == P() for n in names):
                for n in names:
                    specs[n] = P()
        return {
            # host-offloaded banks keep their pinned_host placement
            name: arr if name.endswith("_offload")
            else jax.device_put(arr, NamedSharding(self.mesh, specs[name]))
            for name, arr in params.items()
        }


def param_spec(name: str) -> P:
    for pattern, spec in _DEFAULT_RULES:
        if re.search(pattern, name):
            return spec
    return P()
