"""Persistent XLA compile cache, keyed by host CPU features.

XLA:CPU's persistent cache stores AOT machine code; loading an entry
compiled under different CPU feature detection can SIGSEGV (observed when
reusing a cache written on another host: "Target machine feature
+prefer-no-scatter is not supported on the host machine").  Keying the
cache directory by a hash of the host's CPU flags makes stale foreign
entries invisible instead of fatal.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_tag() -> str:
    h = hashlib.sha256()
    h.update(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


def setup_compile_cache(base: str = "/root/repo/.jax_cache",
                        max_compile_secs: float = 1800.0):
    """Enable the persistent cache, machine-keyed, with a size guard.

    XLA:CPU's executable.serialize() SIGSEGVs on very large modules (the
    2^16-point MSM, observed on this jaxlib), so entries whose compile took
    longer than ``max_compile_secs`` are not persisted on the CPU backend.
    Serialization runs fork-sandboxed (below), so a crash only loses the
    entry — the cap is generous and exists to bound serialize time on
    truly enormous modules.
    """
    # XLA:CPU sporadically SIGSEGVs when compiling a FRESH module late in a
    # process that has already compiled ~20 modules (state-dependent compiler
    # bug; the same module compiles fine early or in a fresh process — see
    # tools/seed_cache.py for the mitigation).  Raising RLIMIT_STACK helps
    # the deep-recursion subset of those crashes.
    try:
        import resource

        resource.setrlimit(
            resource.RLIMIT_STACK,
            (resource.RLIM_INFINITY, resource.RLIM_INFINITY),
        )
    except Exception:
        pass

    import jax

    if os.environ.get("AZTEC_NO_CPU_CACHE"):
        return None
    # Partition by backend: entries are AOT artifacts of ONE compiler.
    # Sharing a dir means a corrupt/poisoned entry for one backend (e.g.
    # the tunneled-TPU deserialize hang observed r4 after a client crash)
    # can wedge loads for every backend; separate dirs make recovery a
    # one-backend wipe.
    backend_tag = os.environ.get("JAX_PLATFORMS", "") or "device"
    backend_tag = backend_tag.split(",")[0].strip() or "device"
    if backend_tag == "device":
        # env unset: resolve the implicit backend choice so TPU and CPU
        # runs never share a dir (ADVICE r4 low #3).  This initializes the
        # backend early, which is fine — every caller is about to use it.
        try:
            backend_tag = jax.default_backend()
        except Exception:
            pass
    path = os.path.join(base, f"{_machine_tag()}-{backend_tag}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: the prover issues hundreds of ~0.45 s eager mini
    # compiles (measured r5: 677 before the first round at 2^17) that a
    # 0.5 s threshold silently repays every process
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jax._src import compilation_cache as cc

    if not getattr(cc, "_aztec_guarded", False):
        orig_put = cc.put_executable_and_time

        def guarded_put(cache_key, module_name, executable, backend,
                        compile_time):
            if backend.platform != "cpu":
                return orig_put(cache_key, module_name, executable, backend,
                                compile_time)
            if os.environ.get("AZTEC_NO_CPU_CACHE_WRITE"):
                return
            # XLA:CPU executable.serialize() SIGSEGVs on some modules in this
            # jaxlib (observed on scan-heavy kernels, killing whole pytest
            # runs from inside the cache-write path).  Serialize + write in a
            # forked child: a crash there loses one cache entry, not the
            # process.  alarm() bounds a child that deadlocks on a lock some
            # other thread held at fork time (SIGALRM's default action kills
            # the child even when deadlocked, so waitpid always returns).
            # jax warns that fork+threads can deadlock — that is exactly the
            # case the alarm bounds, so the warning is handled, not ignored.
            import warnings

            with warnings.catch_warnings():
                # jax's RuntimeWarning ("os.fork() was called") and CPython's
                # DeprecationWarning ("multi-threaded, use of fork() may lead
                # to deadlocks") both fire here; both describe the deadlock
                # case the alarm below already bounds.
                warnings.filterwarnings("ignore", message=".*fork.*")
                pid = os.fork()
            if pid == 0:
                code = 1
                try:
                    import signal

                    # big CPU modules serialize slowly; a short alarm was
                    # silently dropping exactly the entries that cost the
                    # most to recompile (r5: the 200 s mesh-stage modules)
                    signal.alarm(600)
                    orig_put(cache_key, module_name, executable, backend,
                             compile_time)
                    code = 0
                except BaseException:
                    pass
                finally:
                    os._exit(code)
            try:
                os.waitpid(pid, 0)
            except ChildProcessError:
                pass

        cc.put_executable_and_time = guarded_put
        cc._aztec_guarded = True
    return path
