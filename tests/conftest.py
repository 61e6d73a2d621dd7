"""Test config: force a virtual 8-device CPU platform.

Bench and production run on the real TPU; tests exercise the same code on a
host-only mesh (multi-chip sharding paths included). jax is already imported
by the jaxtyping pytest plugin before this file runs, so env vars alone are
too late — use jax.config.update, which works post-import (backends only
initialize at first use).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
