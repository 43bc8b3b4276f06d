# Force tests onto a virtual 8-device CPU mesh.
#
# The sandbox boots every Python process with the axon (tunneled TPU) PJRT
# plugin already registered and jax already imported (sitecustomize), so
# setting JAX_PLATFORMS in the environment here is too late — we must flip
# the live jax config instead.  XLA_FLAGS still works because the CPU client
# is only initialized on first use, which happens after this conftest runs.
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", os.environ.get("PLONKY2_TPU_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
