"""Test config: run everything on a virtual 8-device CPU mesh.

The real TPU is reserved for bench runs; tests must never ride the (slow,
single-chip) device tunnel.  The environment pre-registers a TPU backend at
interpreter start via sitecustomize, so setting JAX_PLATFORMS here is too
late — use jax.config instead, which wins as long as no device has been
touched yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("CVT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
