"""Root conftest: run the test-suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware (SURVEY.md §4). The axon
sitecustomize force-sets ``jax_platforms="axon,cpu"`` after import, so the env
var alone is not enough — we must update jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
