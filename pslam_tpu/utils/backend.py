"""Backend dispatch helpers: Pallas kernels on TPU, jnp reference paths
elsewhere (CPU test mesh, interpret-mode checks)."""

from __future__ import annotations

import functools
import os


@functools.cache
def on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def use_pallas() -> bool:
    """Pallas kernels are used on TPU unless PSLAM_DISABLE_PALLAS=1."""
    if os.environ.get("PSLAM_DISABLE_PALLAS", "0") == "1":
        return False
    return on_tpu()
