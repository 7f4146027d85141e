"""Pure-Python affine curve arithmetic — the test oracle for group kernels.

Plays the role of the reference's generic group implementation
(ecc/groups/element.hpp) as a slow-but-correct host-side oracle, and serves
host-side needs where scalars are few (verifier points, generator tables).
Points are (x, y) int tuples; None is the point at infinity.
"""

from __future__ import annotations

from .spec import CurveSpec, BN254_G1, GRUMPKIN_G1


class GoldenCurve:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.p = spec.field.modulus
        self.b = spec.b
        self.gen = (spec.gen_x, spec.gen_y)
        self.order = spec.order

    def is_on_curve(self, P):
        if P is None:
            return True
        x, y = P
        return (y * y - (x * x * x + self.b)) % self.p == 0

    def neg(self, P):
        if P is None:
            return None
        return (P[0], (-P[1]) % self.p)

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        p = self.p
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            return self.dbl(P)
        lam = ((y2 - y1) * pow(x2 - x1, -1, p)) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def dbl(self, P):
        if P is None:
            return None
        p = self.p
        x, y = P
        if y == 0:
            return None
        lam = (3 * x * x * pow(2 * y, -1, p)) % p
        x3 = (lam * lam - 2 * x) % p
        y3 = (lam * (x - x3) - y) % p
        return (x3, y3)

    def mul(self, k: int, P):
        k %= self.order
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, P)
            P = self.dbl(P)
            k >>= 1
        return acc

    def msm(self, scalars, points):
        acc = None
        for k, P in zip(scalars, points):
            acc = self.add(acc, self.mul(k, P))
        return acc

    def random_points(self, rng, n):
        """n random multiples of the generator (with their scalars)."""
        ks = [rng.randrange(1, self.order) for _ in range(n)]
        return ks, [self.mul(k, self.gen) for k in ks]


BN254 = GoldenCurve(BN254_G1)
GRUMPKIN = GoldenCurve(GRUMPKIN_G1)
