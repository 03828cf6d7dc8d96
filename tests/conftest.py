"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Hard override: the container pins jax to the remote 'axon' TPU chip
# (sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, so the env var alone is not enough). Unit tests
# must run on the local CPU with a virtual device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
