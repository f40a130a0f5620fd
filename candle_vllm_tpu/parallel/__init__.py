"""Parallelism: device meshes, sharding plans, collective layout.

Replaces the reference's NCCL daemon architecture
(``/root/reference/src/openai/communicator.rs``,
``src/openai/distributed.rs``) with GSPMD: a ``jax.sharding.Mesh`` with
named axes, ``NamedSharding`` annotations on parameters and KV pages, and
``shard_map`` around Pallas kernels.  There are no per-step payload
broadcasts — all hosts run the same program (SPMD).
"""

from candle_vllm_tpu.parallel.sharding import (  # noqa: F401
    ShardingPlan,
    make_mesh,
    param_spec,
)
