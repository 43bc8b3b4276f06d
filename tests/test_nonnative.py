"""Non-native field gadget oracle tests over secp256k1's base field
(cf. /root/reference/src/ecdsa/gadgets/nonnative.rs:843-1024)."""
import random

from plonky2_tpu.field import secp
from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0x5EC9)
FP = secp.P


def limbs(v, n=8):
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


def test_nonnative_ops_prove_verify():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_nonnative_target(FP)
    y = b.add_virtual_nonnative_target(FP)

    s = b.add_nonnative(x, y)
    d = b.sub_nonnative(x, y)
    p = b.mul_nonnative(x, y)
    inv = b.inv_nonnative(x)
    neg = b.neg_nonnative(y)
    many = b.add_many_nonnative([x, y, x, y])

    for t in (s.value.limbs + d.value.limbs + p.value.limbs
              + inv.value.limbs + neg.value.limbs + many.value.limbs):
        b.register_public_input(t.target)
    data = b.build()

    xv = RNG.randrange(FP)
    yv = RNG.randrange(FP)
    inputs = {}
    set_biguint_target(inputs, x.value, xv)
    set_biguint_target(inputs, y.value, yv)
    proof = data.prove(inputs)
    expect = (limbs((xv + yv) % FP) + limbs((xv - yv) % FP)
              + limbs(xv * yv % FP) + limbs(pow(xv, FP - 2, FP))
              + limbs((-yv) % FP) + limbs((2 * xv + 2 * yv) % FP))
    assert proof.public_inputs == expect
    data.verify(proof)


def test_nonnative_conditionals_and_splits():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_nonnative_target(FP)
    y = b.add_virtual_nonnative_target(FP)
    one = b.one()
    zero = b.zero()
    sel_a = b.if_nonnative(one, x, y)
    sel_b = b.if_nonnative(zero, x, y)
    cneg = b.nonnative_conditional_neg(x, one)
    l4 = b.split_nonnative_to_4_bit_limbs(x)
    recomb = b.recombine_nonnative_4_bit_limbs(l4, FP)
    for t in sel_a.value.limbs + sel_b.value.limbs + cneg.value.limbs:
        b.register_public_input(t.target)
    for t in l4[:8]:
        b.register_public_input(t)
    for t in recomb.value.limbs:
        b.register_public_input(t.target)
    data = b.build()
    xv, yv = RNG.randrange(FP), RNG.randrange(FP)
    inputs = {}
    set_biguint_target(inputs, x.value, xv)
    set_biguint_target(inputs, y.value, yv)
    proof = data.prove(inputs)
    expect = (limbs(xv) + limbs(yv) + limbs((-xv) % FP)
              + [(xv >> (4 * i)) & 0xF for i in range(8)] + limbs(xv))
    assert proof.public_inputs == expect
    data.verify(proof)
