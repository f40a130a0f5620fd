"""Model zoo: functional JAX decoder implementations over paged KV.

Re-designs the reference's ``src/openai/models/`` (~30 architectures).
Models are plain pure functions over flat parameter dicts (HF tensor
names), so weight loading is a direct safetensors map, sharding is a
regex->PartitionSpec plan, and the whole forward jits with donated KV
pages.
"""

from candle_vllm_tpu.models.types import StepInput  # noqa: F401
from candle_vllm_tpu.models.registry import get_model  # noqa: F401
