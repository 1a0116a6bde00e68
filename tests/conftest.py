"""Test configuration: force CPU backend with a virtual 8-device mesh.

Tests must run without TPU hardware; multi-chip sharding paths are exercised
against ``--xla_force_host_platform_device_count=8`` virtual CPU devices.
This file runs before any test module imports jax, so the env vars take
effect.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# The axon sitecustomize pins jax to the TPU backend regardless of
# JAX_PLATFORMS in the env; override through the config API instead.
jax.config.update("jax_platforms", "cpu")

# Geometry parity tests compare against float64 numpy; enable x64 on the CPU
# test backend. Pipeline code casts to explicit float32 at its entry points,
# so production behavior is unchanged.
jax.config.update("jax_enable_x64", True)
