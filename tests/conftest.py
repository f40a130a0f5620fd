"""Test config: run everything on a virtual 8-device CPU mesh.

The real TPU is reserved for bench runs; all tests must pass on CPU with
``xla_force_host_platform_device_count=8`` so multi-chip sharding logic is
exercised without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
