"""Curve gadget oracle tests (cf. /root/reference/src/ecdsa/gadgets/
curve.rs:276-485).  Scalar-mul variants are exercised in the slow ECDSA
test (tests/test_ecdsa.py) — here we cover the point ops cheaply."""
import random

from plonky2_tpu.field import secp
from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401
import plonky2_tpu.gadgets.curve  # noqa: F401

RNG = random.Random(0xC04E)


def set_point(inputs, tgt, p: secp.Point):
    set_biguint_target(inputs, tgt.x.value, p.x)
    set_biguint_target(inputs, tgt.y.value, p.y)


def limbs(v, n=8):
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


def point_limbs(p: secp.Point):
    return limbs(p.x) + limbs(p.y)


def test_curve_ops_prove_verify():
    b = CircuitBuilder(CircuitConfig.test_config())
    p1 = b.add_virtual_affine_point_target()
    p2 = b.add_virtual_affine_point_target()
    b.curve_assert_valid(p1)
    b.curve_assert_valid(p2)
    s = b.curve_add(p1, p2)
    d = b.curve_double(p1)
    n = b.curve_neg(p2)
    c1 = b.curve_conditional_add(p1, p2, b.one())
    c0 = b.curve_conditional_add(p1, p2, b.zero())
    sel = b.random_access_curve_points(
        b.one(), [p1, p2, s, d])       # index 1 -> entry 1 = p2
    for pt in [s, d, n, c1, c0, sel]:
        for t in pt.x.value.limbs + pt.y.value.limbs:
            b.register_public_input(t.target)
    data = b.build()

    a = secp.mul(secp.G, RNG.randrange(1, secp.N))
    c = secp.mul(secp.G, RNG.randrange(1, secp.N))
    inputs = {}
    set_point(inputs, p1, a)
    set_point(inputs, p2, c)
    proof = data.prove(inputs)
    expect = (point_limbs(secp.add(a, c)) + point_limbs(secp.double(a))
              + point_limbs(secp.neg(c)) + point_limbs(secp.add(a, c))
              + point_limbs(a) + point_limbs(c))
    assert proof.public_inputs == expect
    data.verify(proof)


def test_glv_decompose_gadget():
    b = CircuitBuilder(CircuitConfig.test_config())
    k = b.add_virtual_nonnative_target(secp.N)
    k1, k2, k1n, k2n = b.decompose_secp256k1_scalar(k)
    for t in k1.value.limbs + k2.value.limbs:
        b.register_public_input(t.target)
    b.register_public_input(k1n)
    b.register_public_input(k2n)
    data = b.build()
    kv = RNG.randrange(secp.N)
    inputs = {}
    set_biguint_target(inputs, k.value, kv)
    proof = data.prove(inputs)
    m1, n1, m2, n2 = secp.glv_decompose(kv)
    assert proof.public_inputs == limbs(m1) + limbs(m2) + [int(n1), int(n2)]
    data.verify(proof)
