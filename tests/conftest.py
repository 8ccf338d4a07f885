"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising shard_map / pjit collectives
without TPU pod hardware (SURVEY.md §4). Note: in this environment the
JAX_PLATFORMS env var is not honoured (an experimental TPU plugin registers
itself regardless), so we must force the platform through jax.config, before
any jax computation runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# PBBI_TEST_TPU=1 leaves the real backend in place so the
# @skipif(backend != "tpu") statistical tests actually execute on
# hardware:  PBBI_TEST_TPU=1 pytest tests/test_pallas.py -k tpu
if os.environ.get("PBBI_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
