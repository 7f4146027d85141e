"""Pure-Python simulation of the MSM engine with golden EC ops.

Mirrors msm_engine step-for-step (including unsafe-add semantics where
equal operands silently produce infinity) to isolate algorithm-vs-plumbing
bugs without any JAX compilation.
"""

import sys, random

sys.path.insert(0, "/root/repo")
from aztec_tpu.curves import golden

g = golden.BN254
INF = None


def add_unsafe(P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    if P[0] == Q[0]:
        return None  # unsafe: equal or negated -> silent infinity
    return g.add(P, Q)


def sim_round(digits, pts, B, K, nbuckets, K2):
    n = len(digits)
    order = sorted(range(n), key=lambda i: digits[i])
    sd = [digits[i] for i in order]
    sp = [pts[i] for i in order]

    # rake serial scan
    scan = [[None] * K for _ in range(B)]
    for b in range(B):
        acc, accd = None, -1
        for k in range(K):
            i = b * K + k
            if sd[i] == accd:
                acc = add_unsafe(acc, sp[i])
            else:
                acc = sp[i]
                accd = sd[i]
            scan[b][k] = acc

    h = [sd[b * K] for b in range(B)]
    t = [sd[b * K + K - 1] for b in range(B)]
    T = [scan[b][K - 1] for b in range(B)]
    cont = [False] + [h[b] == t[b - 1] for b in range(1, B)]
    internal = [
        any(sd[b * K + k] != sd[b * K + k - 1] for k in range(1, K)) for b in range(B)
    ]
    flag = [internal[b] or not cont[b] for b in range(B)]

    # segmented scan over block summaries (sequential reference version)
    scanned = [None] * B
    for b in range(B):
        scanned[b] = T[b] if flag[b] else add_unsafe(scanned[b - 1], T[b])
    C = [scanned[b - 1] if cont[b] else None for b in range(B)]

    fr = [[sd[b * K + k] == h[b] for k in range(K)] for b in range(B)]
    tail = [(i == n - 1) or sd[i + 1] != sd[i] for i in range(n)]

    buckets = [None] * nbuckets
    for b in range(B):
        for k in range(K):
            i = b * K + k
            if tail[i] and not fr[b][k] and sd[i] > 0:
                buckets[sd[i]] = scan[b][k]
    for b in range(B):
        kstar = sum(fr[b]) - 1
        i = b * K + kstar
        if tail[i] and h[b] > 0:
            buckets[h[b]] = add_unsafe(scan[b][kstar], C[b])

    # bucket phase: W = sum_{j>=1} S_j
    S = [None] * nbuckets
    acc = None
    for j in range(nbuckets - 1, -1, -1):
        acc = add_unsafe(acc, buckets[j])  # disjoint contents: unsafe ok
        S[j] = acc
    W = None
    for j in range(1, nbuckets):
        W = g.add(W, S[j])  # overlapping sets (S plateaus): complete add
    return W


def run_case(seed, n, c, K, K2, verbose=False):
    rng = random.Random(seed)
    pts = [g.mul(rng.randrange(1, g.order), g.gen) for _ in range(n)]
    scalars = [rng.randrange(g.order) for _ in range(n)]
    # pad like msm()
    B0 = n // K
    pad = (-n) % K
    extra = pad if (n + pad) // K >= 2 else pad + K
    pts = pts + [pts[0]] * extra
    scalars = scalars + [0] * extra
    n2 = n + extra
    B = n2 // K
    nbuckets = 1 << c
    rounds = 256 // c

    acc = None
    for r in range(rounds):
        for _ in range(c):
            acc = g.dbl(acc)
        ri = rounds - 1 - r
        digits = [(s >> (c * ri)) & (nbuckets - 1) for s in scalars]
        W = sim_round(digits, pts, B, K, nbuckets, K2)
        acc = g.add(acc, W)

    expect = g.msm(scalars[:n], pts[:n])
    ok = acc == expect
    print(f"seed={seed} n={n} c={c} K={K}: {'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    allok = True
    for seed in range(5):
        allok &= run_case(seed, 70, 4, 16, 4)
    allok &= run_case(10, 40, 8, 8, 16)
    allok &= run_case(11, 128, 16, 32, 64)
    print("ALL OK" if allok else "FAILURES")
