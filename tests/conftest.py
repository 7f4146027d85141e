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
# The axon PJRT plugin (registered by sitecustomize) overrides the env var
# on some builds (observed round 4: JAX_PLATFORMS=cpu still yields backend
# "tpu"); the config knob is authoritative, so set both.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the virtual 8-device mesh flag is NOT set here — it slows every
# XLA:CPU compile and bifurcates the compile cache.  Multi-chip tests
# (tests/test_parallel.py) skip without it; run them separately with
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#     python -m pytest tests/test_parallel.py -q

# Persistent compilation cache: the limb-arithmetic graphs are cheap to run
# but slow for XLA:CPU to compile; cache them across test invocations.
# Keyed by host CPU features — a cache written on a different machine can
# SIGSEGV on load (see aztec_tpu/utils/jaxcache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()
