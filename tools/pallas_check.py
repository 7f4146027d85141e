"""Bit-exactness + timing check: fused Pallas group kernels vs jnp path.

Runs on whatever backend is active (intended: the real TPU).  The group
formulas are algebra over canonical limb planes, so random 16-bit planes
exercise the exact same code paths as real points; both paths must agree
bit-for-bit on every plane.

    python tools/pallas_check.py [width_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aztec_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aztec_tpu.curves.spec import BN254_G1  # noqa: E402
from aztec_tpu.curves import group, group_pallas as gp  # noqa: E402
from aztec_tpu.ff import limb, pallas_field as pf  # noqa: E402

SPEC = BN254_G1.field
B = BN254_G1.b


def rand_elem(rng, n):
    # canonical-ish random planes; top limb capped so values stay < p
    x = rng.integers(0, 1 << 16, (16, n), dtype=np.uint32)
    x[15] &= 0x2FFF
    return jnp.asarray(x)


def timed(label, fn, *args, iters=8):
    t0 = time.time()
    r = jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{label:34s} {dt*1e3:9.3f} ms  (compile {c:.1f}s)", flush=True)
    return r


def check(label, a, b):
    a = jax.tree.leaves(a)
    b = jax.tree.leaves(b)
    ok = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, b))
    print(f"{label:34s} {'BIT-EXACT' if ok else '*** MISMATCH ***'}",
          flush=True)
    return ok


def main():
    wlog = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n = 1 << wlog
    rng = np.random.default_rng(11)
    X1, Y1, Z1, X2, Y2, Z2 = (rand_elem(rng, n) for _ in range(6))
    print(f"backend={jax.default_backend()}  width=2^{wlog}", flush=True)

    ok = True

    # mont_mul
    f_ref = jax.jit(lambda a, b: limb.mont_mul(a, b, SPEC))
    f_pal = jax.jit(lambda a, b: pf.mont_mul(a, b, SPEC))
    r0 = timed("mont_mul jnp", f_ref, X1, Y1)
    r1 = timed("mont_mul pallas", f_pal, X1, Y1)
    ok &= check("mont_mul", r0, r1)

    # mixed add
    g_ref = jax.jit(lambda *a: group.mixed_add_unsafe(a[:3], a[3:], SPEC))
    g_pal = jax.jit(lambda *a: gp.mixed_add_unsafe(a[:3], a[3:], SPEC))
    r0 = timed("mixed_add jnp", g_ref, X1, Y1, Z1, X2, Y2)
    r1 = timed("mixed_add pallas", g_pal, X1, Y1, Z1, X2, Y2)
    ok &= check("mixed_add", r0, r1)

    # infinity handling in mixed add
    Z1z = Z1.at[:, : n // 2].set(0)
    r0 = jax.block_until_ready(g_ref(X1, Y1, Z1z, X2, Y2))
    r1 = jax.block_until_ready(g_pal(X1, Y1, Z1z, X2, Y2))
    ok &= check("mixed_add (half infinity)", r0, r1)

    # full jacobian add
    a_ref = jax.jit(lambda *a: group.add_unsafe(a[:3], a[3:], SPEC))
    a_pal = jax.jit(lambda *a: gp.add_unsafe(a[:3], a[3:], SPEC))
    r0 = timed("add_unsafe jnp", a_ref, X1, Y1, Z1, X2, Y2, Z2)
    r1 = timed("add_unsafe pallas", a_pal, X1, Y1, Z1, X2, Y2, Z2)
    ok &= check("add_unsafe", r0, r1)

    # complete projective add
    c_ref = jax.jit(lambda *a: group.proj_add_complete(a[:3], a[3:], SPEC, B))
    c_pal = jax.jit(lambda *a: gp.proj_add_complete(a[:3], a[3:], SPEC, B))
    r0 = timed("proj_add jnp", c_ref, X1, Y1, Z1, X2, Y2, Z2)
    r1 = timed("proj_add pallas", c_pal, X1, Y1, Z1, X2, Y2, Z2)
    ok &= check("proj_add", r0, r1)

    # complete projective double
    d_ref = jax.jit(lambda *a: group.proj_dbl(a, SPEC, B))
    d_pal = jax.jit(lambda *a: gp.proj_dbl(a, SPEC, B))
    r0 = timed("proj_dbl jnp", d_ref, X1, Y1, Z1)
    r1 = timed("proj_dbl pallas", d_pal, X1, Y1, Z1)
    ok &= check("proj_dbl", r0, r1)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
