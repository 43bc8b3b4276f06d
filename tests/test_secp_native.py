"""Native secp256k1 layer property tests: optimized projective/windowed
paths vs the naive affine group law (the reference's native-math test
category, SURVEY.md §4.1 — naive-vs-optimized scalar mul at
/root/reference/src/ecdsa/curve/secp256k1.rs:62-99, MSM vs naive at
curve_msm.rs:235-264, batch inversion at curve_types.rs:173-189)."""
import random

from plonky2_tpu.field import secp

RNG = random.Random(0x5EC9)


def naive_mul(p, k):
    k %= secp.N
    acc, q = secp.ZERO, p
    while k:
        if k & 1:
            acc = secp.add(acc, q)
        q = secp.double(q)
        k >>= 1
    return acc


def test_projective_roundtrip_and_group_law():
    a = naive_mul(secp.G, RNG.randrange(1, secp.N))
    b = naive_mul(secp.G, RNG.randrange(1, secp.N))
    pa, pb = secp.to_proj(a), secp.to_proj(b)
    assert secp.to_affine(pa) == a
    assert secp.to_affine(secp.pj_double(pa)) == secp.double(a)
    assert secp.to_affine(secp.pj_add(pa, pb)) == secp.add(a, b)
    assert secp.to_affine(secp.pj_madd(pa, b)) == secp.add(a, b)
    # degenerate cases: identity, doubling collision, inverse pair
    assert secp.to_affine(secp.pj_add(pa, secp.PJ_ZERO)) == a
    assert secp.to_affine(secp.pj_add(pa, pa)) == secp.double(a)
    assert secp.to_affine(secp.pj_madd(pa, secp.neg(a))).inf


def test_batch_inverse():
    xs = [RNG.randrange(1, secp.P) for _ in range(40)] + [0, 1]
    invs = secp.batch_inverse(xs)
    for x, i in zip(xs, invs):
        assert (x * i) % secp.P == (1 if x else 0)
        if x == 0:
            assert i == 0


def test_windowed_mul_vs_naive():
    for k in [1, 2, 15, 16, 17, RNG.randrange(secp.N),
              secp.N - 1, (1 << 255) - 19]:
        assert secp.mul(secp.G, k) == naive_mul(secp.G, k), k
    assert secp.mul(secp.G, 0).inf
    assert secp.mul(secp.ZERO, 12345).inf


def test_glv_mul_vs_naive():
    p = secp.mul(secp.G, RNG.randrange(1, secp.N))
    for k in [1, 7, RNG.randrange(secp.N), secp.N - 2]:
        assert secp.glv_mul(p, k) == naive_mul(p, k), k


def test_msm_vs_naive():
    n = 9
    pts = [secp.mul(secp.G, RNG.randrange(1, secp.N)) for _ in range(n)]
    ks = [RNG.randrange(secp.N) for _ in range(n)]
    want = secp.ZERO
    for p, k in zip(pts, ks):
        want = secp.add(want, naive_mul(p, k))
    assert secp.msm(pts, ks) == want
    # zero scalars / identity points drop out
    assert secp.msm([pts[0], secp.ZERO], [0, 5]).inf


def test_summation_both_regimes():
    for n in (8, 90):                 # below / above the affine threshold
        pts = [secp.mul(secp.G, RNG.randrange(1, secp.N)) for _ in range(n)]
        want = secp.ZERO
        for p in pts:
            want = secp.add(want, p)
        assert secp.summation(pts) == want
    # cancelling pair inside a batch round
    p = secp.mul(secp.G, 777)
    pts = [p, secp.neg(p)] + [secp.mul(secp.G, i + 1) for i in range(100)]
    want = secp.ZERO
    for q in pts:
        want = secp.add(want, q)
    assert secp.summation(pts) == want


def test_ecdsa_native_roundtrip():
    sk = RNG.randrange(1, secp.N)
    pk = secp.mul(secp.G, sk)
    h = RNG.randrange(secp.N)
    r, s = secp.sign(h, sk, RNG.randrange(1, secp.N))
    assert secp.verify(h, (r, s), pk)
    assert not secp.verify((h + 1) % secp.N, (r, s), pk)
