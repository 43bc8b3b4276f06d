"""Goldilocks + GF(p^2) field tests: array path vs Python-int reference.

Mirrors the reference's native-math property-test style (SURVEY.md §4 cat. 1).
"""
import random

import jax
import jax.numpy as jnp
import pytest

from plonky2_tpu.field import ext, gl

RNG = random.Random(0xC0FFEE)


def rand_elems(n):
    return [RNG.randrange(gl.P) for _ in range(n)]


EDGE = [0, 1, 2, gl.P - 1, gl.P - 2, gl.EPSILON, gl.EPSILON + 1,
        gl.P - gl.EPSILON, 0x123456789ABCDEF0 % gl.P, (1 << 63) % gl.P]


@pytest.mark.parametrize("op,ref", [
    (gl.add, gl.add_s),
    (gl.sub, gl.sub_s),
    (gl.mul, gl.mul_s),
])
def test_binary_ops_vs_scalar(op, ref):
    a_list = EDGE + rand_elems(300)
    b_list = (EDGE + rand_elems(300))[: len(a_list)]
    a = gl.to_u64(a_list)
    b = gl.to_u64(b_list)
    got = gl.batch_to_int(op(a, b))
    want = [ref(x, y) for x, y in zip(a_list, b_list)]
    assert got == want


def test_edge_products_exhaustive_pairs():
    vals = EDGE
    n = len(vals)
    a = gl.to_u64([x for x in vals for _ in vals])
    b = gl.to_u64(vals * n)
    got = gl.batch_to_int(jax.jit(gl.mul)(a, b))
    want = [(x * y) % gl.P for x in vals for y in vals]
    assert got == want


def test_neg_inv():
    xs = [x for x in EDGE if x != 0] + rand_elems(100)
    arr = gl.to_u64(xs)
    negs = gl.batch_to_int(jax.jit(gl.neg)(arr))
    invs = gl.batch_to_int(jax.jit(gl.inv)(arr))
    for x, n, i in zip(xs, negs, invs):
        assert n == gl.neg_s(x)
        assert i == gl.inv_s(x)
        assert (x * i) % gl.P == 1


def test_pow_const():
    xs = rand_elems(50)
    arr = gl.to_u64(xs)
    for e in [0, 1, 2, 3, 7, 65537, gl.P - 2]:
        got = gl.batch_to_int(jax.jit(lambda x, e=e: gl.pow_const(x, e))(arr))
        want = [pow(x, e, gl.P) for x in xs]
        assert got == want


def test_roots_of_unity():
    for k in [0, 1, 2, 5, 16, 32]:
        w = gl.primitive_root_of_unity(k)
        assert pow(w, 1 << k, gl.P) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), gl.P) == gl.P - 1  # primitive


def test_generator_order():
    # p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
    factors = [2, 3, 5, 17, 257, 65537]
    assert 2**32 * 3 * 5 * 17 * 257 * 65537 == gl.P - 1
    for q in factors:
        assert pow(gl.GENERATOR, (gl.P - 1) // q, gl.P) != 1


def test_powers():
    ps = gl.batch_to_int(gl.powers(7, 10))
    assert ps == [pow(7, i, gl.P) for i in range(10)]


# ---------------- extension ----------------

def rand_ext():
    return (RNG.randrange(gl.P), RNG.randrange(gl.P))


def test_ext_mul_matches_scalar():
    pairs = [(rand_ext(), rand_ext()) for _ in range(100)]
    a = gl.to_u64([list(p[0]) for p in pairs])
    b = gl.to_u64([list(p[1]) for p in pairs])
    got = gl.batch_to_int(ext.mul(a, b))
    for i, (x, y) in enumerate(pairs):
        c = ext.mul_s(x, y)
        assert got[2 * i] == c[0] and got[2 * i + 1] == c[1]


def test_ext_inv():
    for _ in range(50):
        x = rand_ext()
        assert ext.eq_s(ext.mul_s(x, ext.inv_s(x)), ext.ONE)
    xs = [rand_ext() for _ in range(64)]
    arr = gl.to_u64([list(x) for x in xs])
    invs = jax.jit(ext.inv)(arr)
    prod = gl.batch_to_int(jax.jit(ext.mul)(arr, invs))
    for i in range(64):
        assert prod[2 * i] == 1 and prod[2 * i + 1] == 0


def test_ext_w_nonresidue():
    # W must be a quadratic non-residue: W^((p-1)/2) == -1
    assert pow(ext.W, (gl.P - 1) // 2, gl.P) == gl.P - 1


def test_ext_pow_s():
    x = rand_ext()
    # Frobenius: x^p = conj(x)
    xp = ext.pow_s(x, gl.P)
    assert xp == (x[0], gl.neg_s(x[1]))
    # x^(p^2) = x
    assert ext.pow_s(x, gl.P * gl.P) == x


def test_jit_compatibility():
    import jax
    f = jax.jit(lambda a, b: gl.mul(gl.add(a, b), gl.inv(b)))
    a = gl.to_u64(rand_elems(16))
    b = gl.to_u64([x or 1 for x in rand_elems(16)])
    out = gl.batch_to_int(f(a, b))
    for x, y, o in zip(gl.batch_to_int(a), gl.batch_to_int(b), out):
        assert o == gl.mul_s(gl.add_s(x, y), gl.inv_s(y))
