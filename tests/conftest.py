"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run against CPU device emulation
(SURVEY.md §4 item 4); TPU hardware is exercised by bench.py instead.
This must run before jax is imported anywhere.
"""

import os
import sys

# Force CPU even when the ambient environment points JAX at a TPU tunnel
# (JAX_PLATFORMS=axon): unit tests are platform-parity tests, and sharing the
# single tunneled chip across pytest workers can deadlock. bench.py and the
# driver exercise the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONPATH", None)  # keep subprocesses off the axon site hook
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's axon site hook (sitecustomize on PYTHONPATH) registers a
# TPU-tunnel PJRT plugin at interpreter start and pins
# jax.config.jax_platforms = "axon,cpu" — which silently wins over
# JAX_PLATFORMS=cpu. Re-pin the config to CPU here; the CPU client has not
# been materialized yet, so the device-count flag above still applies.
import jax  # noqa: E402

if "axon" in (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", "cpu")
