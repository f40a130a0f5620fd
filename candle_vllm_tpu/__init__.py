"""candle_vllm_tpu — a TPU-native LLM inference and serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``EricLBuehler/candle-vllm`` (see SURVEY.md): continuous batching with a paged
KV cache, chunked prefill, prefix caching, quantized execution, tensor
parallelism over a TPU mesh, and an OpenAI-compatible API server.

Architecture notes (TPU-first, not a port):

- The compute path is a single jitted *mixed step*: one flat token batch that
  carries both prefill chunks and decode rows, attended by one ragged paged
  attention kernel.  The reference keeps separate prefill/decode code paths
  (``/root/reference/src/openai/pipelines/inputs.rs:90,376``); unifying them
  minimises jit shape churn (TPU's analogue of CUDA-graph capture is a small,
  closed set of compiled shapes) and keeps the MXU busy on mixed batches.
- Scheduling/block management is device-free pure Python (directly testable,
  mirroring the reference's device-free ``BlockEngine``), while every hot op
  is a Pallas TPU kernel with a pure-jnp fallback for CPU tests.
- Parallelism is GSPMD: ``jax.sharding.Mesh`` + NamedSharding, not NCCL
  daemons.  All hosts run the same program (SPMD), so there is no per-step
  payload broadcast (reference: ``src/openai/pipelines/multiprocess.rs``).
"""

__version__ = "0.1.0"

from candle_vllm_tpu.sampling_params import SamplingParams  # noqa: F401
from candle_vllm_tpu.config import ModelConfig, CacheConfig, SchedulerConfig  # noqa: F401
