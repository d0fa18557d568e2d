"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's graft entry;
the test suite targets determinism and multi-device sharding semantics via
XLA's host-platform device-count flag (SURVEY.md §4 implication (e)).
"""
import os

# Hard override: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel);
# the test suite must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache makes repeated suite runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
