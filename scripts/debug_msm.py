"""Debug harness: compare engine bucket contents vs brute force, eagerly."""

import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import random
import numpy as np
import jax.numpy as jnp
from jax import lax

from aztec_tpu.curves import golden
from aztec_tpu.curves.group_ops import JacobianOps
from aztec_tpu.curves.spec import BN254_G1
from aztec_tpu.curves.io import affine_to_device, jacobian_to_host
from aztec_tpu.msm.pippenger import _rake_segment_scan, _bucket_phase
from aztec_tpu.numeric import ints_to_limbs

rng = random.Random(5)
g = golden.BN254

n, c, K, K2 = 32, 4, 8, 4
nbuckets = 1 << c
B = n // K

pts = [g.mul(rng.randrange(1, g.order), g.gen) for _ in range(n)]
scalars = [rng.randrange(g.order) for _ in range(n)]

X, Y = affine_to_device(pts, BN254_G1)
sc = np.asarray(ints_to_limbs(scalars))
ops = JacobianOps(BN254_G1)

rounds = 256 // c
acc_expect = None
for r in range(rounds - 8, rounds):  # only the low digit rounds for speed
    ri = rounds - 1 - r
    limb_idx = (c * ri) // 16
    shift = (c * ri) % 16
    d_np = (sc[limb_idx] >> shift) & (nbuckets - 1)

    # brute force buckets
    bf = {}
    for i in range(n):
        dig = int(d_np[i])
        if dig:
            bf[dig] = g.add(bf.get(dig), pts[i])
    W_expect = None
    for j, bj in bf.items():
        W_expect = g.add(W_expect, g.mul(j, bj))

    # engine path (eager)
    d = jnp.asarray(d_np.astype(np.uint32))
    perm = jnp.argsort(d)
    sd = jnp.take(d, perm)
    spts = tuple(jnp.take(p, perm, axis=-1) for p in (X, Y))
    scan, C, fr, sdb = _rake_segment_scan(ops, sd, spts, B, K)

    tail = jnp.concatenate([sd[1:] != sd[:-1], jnp.array([True])])
    tailb = tail.reshape(B, K)
    vals_flat = tuple(s.reshape(s.shape[:-2] + (n,)) for s in scan)
    fr_flat = fr.reshape(n)
    idx_a = jnp.where(tail & ~fr_flat & (sd > 0), sd, nbuckets)
    buckets = ops.infinity((nbuckets,))
    buckets = tuple(
        b.at[..., idx_a].set(v, mode="drop") for b, v in zip(buckets, vals_flat)
    )
    count = jnp.sum(fr, axis=1)
    kstar = count - 1
    bidx = jnp.arange(B)
    first_tail_val = tuple(s[..., bidx, kstar] for s in scan)
    corrected = ops.add_unsafe(first_tail_val, C)
    h = sdb[:, 0]
    is_tail_b = tailb[bidx, kstar]
    idx_b = jnp.where(is_tail_b & (h > 0), h, nbuckets)
    buckets = tuple(
        b.at[..., idx_b].set(v, mode="drop") for b, v in zip(buckets, corrected)
    )

    got_buckets = jacobian_to_host(buckets, BN254_G1)
    ok = True
    for j in range(nbuckets):
        expect = bf.get(j) if j > 0 else None
        if got_buckets[j] != expect:
            ok = False
            print(f"round {r} bucket {j}: got {got_buckets[j]} expect {expect}")
    print(f"round {r}: buckets {'OK' if ok else 'MISMATCH'}")

    W = _bucket_phase(ops, buckets, nbuckets, K2)
    W_got = jacobian_to_host(W, BN254_G1)[0]
    print(f"round {r}: W {'OK' if W_got == W_expect else 'MISMATCH: %s vs %s' % (W_got, W_expect)}")
