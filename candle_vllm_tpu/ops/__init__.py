"""TPU compute ops: Pallas kernels with pure-jnp fallbacks.

Every op has (a) a reference jnp implementation that runs anywhere (CPU
tests, interpreters) and (b) a Pallas TPU kernel for the hot path.  The
dispatch default is "auto": Pallas on TPU, jnp elsewhere.
"""

import jax


def default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "jnp"
