"""Pallas TPU kernels: the native compute substrate of the framework.

Each kernel has a pure-jnp oracle in ``candle_vllm_tpu/ops`` used for CPU
tests (kernels run under ``interpret=True`` off-TPU).
"""
