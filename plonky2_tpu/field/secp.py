"""Native secp256k1 math: the witness oracle (host side).

Parity: /root/reference/src/ecdsa/curve/ — curve_types.rs (AffinePoint,
group law), secp256k1.rs (constants), ecdsa.rs (sign/verify),
glv.rs (endomorphism decomposition).  Host Python-int implementation: this
code runs in witness generators (SURVEY.md §3.2 step 1), not on device.
"""

from __future__ import annotations

from dataclasses import dataclass

# Field and curve constants (secp256k1: y^2 = x^3 + 7)
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
A = 0
B = 7
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

# GLV endomorphism: (x, y) -> (beta*x, y) equals multiplication by lambda
GLV_BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
GLV_LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72


@dataclass(frozen=True)
class Point:
    x: int
    y: int
    inf: bool = False

    def is_valid(self) -> bool:
        if self.inf:
            return True
        return (self.y * self.y - self.x ** 3 - A * self.x - B) % P == 0


ZERO = Point(0, 0, True)
G = Point(GX, GY)


def inv_p(x: int) -> int:
    return pow(x, P - 2, P)


def inv_n(x: int) -> int:
    return pow(x, N - 2, N)


def add(p1: Point, p2: Point) -> Point:
    if p1.inf:
        return p2
    if p2.inf:
        return p1
    if p1.x == p2.x:
        if (p1.y + p2.y) % P == 0:
            return ZERO
        return double(p1)
    lam = (p2.y - p1.y) * inv_p(p2.x - p1.x) % P
    x3 = (lam * lam - p1.x - p2.x) % P
    y3 = (lam * (p1.x - x3) - p1.y) % P
    return Point(x3, y3)


def double(p: Point) -> Point:
    if p.inf or p.y == 0:
        return ZERO
    lam = (3 * p.x * p.x + A) * inv_p(2 * p.y) % P
    x3 = (lam * lam - 2 * p.x) % P
    y3 = (lam * (p.x - x3) - p.y) % P
    return Point(x3, y3)


def neg(p: Point) -> Point:
    if p.inf:
        return p
    return Point(p.x, (-p.y) % P)


def mul(p: Point, k: int) -> Point:
    k %= N
    acc = ZERO
    q = p
    while k:
        if k & 1:
            acc = add(acc, q)
        q = double(q)
        k >>= 1
    return acc


def msm(points: list[Point], scalars: list[int]) -> Point:
    acc = ZERO
    for p, s in zip(points, scalars):
        acc = add(acc, mul(p, s))
    return acc


def glv_endo(p: Point) -> Point:
    """psi(x, y) = (beta*x, y) == lambda * (x, y)."""
    return Point(GLV_BETA * p.x % P, p.y)


def glv_decompose(k: int):
    """k = k1 + lambda*k2 (mod n) with |k1|, |k2| ~ sqrt(n).

    Returns (k1, k1_neg, k2, k2_neg) with k1, k2 the magnitudes and flags
    for the signs, mirroring the reference's decomposition output shape
    (/root/reference/src/ecdsa/curve/glv.rs:11-76)."""
    # lattice basis for secp256k1 (standard a1/b1/a2/b2 constants)
    a1 = 0x3086D221A7D46BCDE86C90E49284EB15
    b1 = -0xE4437ED6010E88286F547FA90ABFE4C3
    a2 = 0x114CA50F7A8E2F3F657C1108D9D44CFD8
    b2 = a1
    c1 = (b2 * k) // N
    c2 = (-b1 * k) // N
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    k1_neg, k2_neg = k1 < 0, k2 < 0
    return abs(k1), k1_neg, abs(k2), k2_neg


def glv_mul(p: Point, k: int) -> Point:
    k1, k1n, k2, k2n = glv_decompose(k % N)
    p1 = neg(p) if k1n else p
    p2 = glv_endo(p)
    p2 = neg(p2) if k2n else p2
    return add(mul(p1, k1), mul(p2, k2))


# ------------------------------------------------------------------
# ECDSA (parity: /root/reference/src/ecdsa/curve/ecdsa.rs)
# ------------------------------------------------------------------

def sign(msg_hash: int, sk: int, k: int) -> tuple[int, int]:
    """Sign with explicit nonce k (caller supplies randomness)."""
    msg_hash %= N
    k %= N
    assert k != 0
    r = mul(G, k).x % N
    assert r != 0, "bad nonce"
    s = inv_n(k) * (msg_hash + r * sk) % N
    assert s != 0, "bad nonce"
    return r, s


def verify(msg_hash: int, sig: tuple[int, int], pk: Point) -> bool:
    r, s = sig
    if not (0 < r < N and 0 < s < N) or not pk.is_valid() or pk.inf:
        return False
    c = inv_n(s)
    u1 = msg_hash * c % N
    u2 = r * c % N
    pt = add(mul(G, u1), mul(pk, u2))
    if pt.inf:
        return False
    return pt.x % N == r
