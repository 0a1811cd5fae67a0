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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # This machine's CPUID reports AVX-512 subsets the VM doesn't reliably
    # execute (see the cpu_aot_loader feature-mismatch warnings); XLA:CPU
    # intermittently segfaults inside backend_compile_and_load in long
    # processes. Restricting codegen to AVX2 has been stable.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

# Run provers on the eager per-op path by default: the fused scan prover is
# one compiled program per (curve, mn) and XLA:CPU takes minutes to compile
# its nested scans (TPU is the target for fusion). test_protocol_tpu has one
# dedicated scan-path differential test that re-enables it.
os.environ.setdefault("BPP_FUSE_PROVER", "0")

# XLA:CPU intermittently segfaults inside backend_compile_and_load (LLVM
# codegen; rare, load-dependent — observed ~2 per 100 compile-heavy tests).
# The crashed worker takes its current test down with it even though the
# test is fine on retry. Reschedule tests from crashed workers up to twice
# before letting the failure stand (mirrors pytest-rerunfailures, which is
# not installed here).
_crash_reruns: dict = {}


def pytest_handlecrashitem(crashitem, report, sched):
    n = _crash_reruns.get(crashitem, 0)
    if n < 2:
        _crash_reruns[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"
