"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are validated
on XLA's host platform with 8 virtual devices (same SPMD semantics).

NOTE: this environment's sitecustomize force-registers the axon TPU plugin
and sets JAX_PLATFORMS=axon, so we must both set the env var AND update the
jax config after import (register() wins over the env var otherwise).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
