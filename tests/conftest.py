"""Test harness config: force CPU backend with a virtual 8-device mesh.

Mirrors the reference's test strategy note in SURVEY.md §4: the reference is
single-process OpenMP so has no multi-node tests; we validate multi-chip
sharding on a virtual CPU mesh (xla_force_host_platform_device_count).
"""

import os

# Hard-force CPU: the sandbox exports JAX_PLATFORMS=axon (one real TPU chip
# over a slow relay); unit tests must run on the local CPU backend.
# NOTE: for fast iteration invoke tests as
#   PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m pytest tests/ -x -q
# (dropping /root/.axon_site from PYTHONPATH skips the ~2min axon PJRT
# registration that sitecustomize performs in every interpreter).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the limb-arithmetic graphs are cheap to run
# but slow for XLA:CPU to compile; cache them across test invocations.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
