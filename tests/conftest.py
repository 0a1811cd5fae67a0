"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be hermetic and multi-device-capable without TPU hardware, so we
force the CPU platform with 8 virtual devices (the driver separately
dry-run-compiles the multi-chip path, and bench.py runs on the real chip).

Note: this machine's sitecustomize registers the remote 'axon' TPU backend
and programmatically sets jax_platforms, overriding the JAX_PLATFORMS env
var — so we must force CPU via jax.config.update before any backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()
