"""Small host utilities (jax cache setup, timers)."""

from .jaxcache import setup_compile_cache  # noqa: F401
