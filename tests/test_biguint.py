"""BigUint gadget oracle tests (cf. /root/reference/src/ecdsa/gadgets/
biguint.rs:381-542 in-circuit unit tests)."""
import random

from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0xB16)


def test_biguint_ops_prove_verify():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_biguint_target(3)
    y = b.add_virtual_biguint_target(3)

    s = b.add_biguint(x, y)
    d = b.sub_biguint(x, y)          # requires x >= y
    p = b.mul_biguint(x, y)
    le = b.cmp_biguint(x, y)         # x <= y -> 0 here
    div, rem = b.div_rem_biguint(x, y)

    outs = []
    for t in s.limbs + d.limbs + p.limbs + [
            None] + div.limbs + rem.limbs:
        if t is None:
            b.register_public_input(le)
            outs.append("le")
        else:
            b.register_public_input(t.target)
            outs.append("limb")
    data = b.build()

    yv = RNG.randrange(1 << 90)
    xv = yv + RNG.randrange(1 << 90)      # ensure x >= y
    inputs = {}
    set_biguint_target(inputs, x, xv)
    set_biguint_target(inputs, y, yv)
    proof = data.prove(inputs)

    def limbs(v, n):
        return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]

    expect = (limbs(xv + yv, 4) + limbs(xv - yv, 3) + limbs(xv * yv, 6)
              + [1 if xv <= yv else 0]
              + limbs(xv // yv, 3) + limbs(xv % yv, 3))
    assert proof.public_inputs == expect
    data.verify(proof)


def test_biguint_mul_u32_and_bits():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_biguint_target(2)
    k = b.add_virtual_u32_target()
    p = b.mul_biguint_u32(x, k)
    bits = b.split_biguint_to_bits(x)
    for t in p.limbs:
        b.register_public_input(t.target)
    for t in bits[:8]:
        b.register_public_input(t)
    data = b.build()
    xv = RNG.randrange(1 << 64)
    kv = RNG.randrange(1 << 32)
    inputs = {k.target: kv}
    set_biguint_target(inputs, x, xv)
    proof = data.prove(inputs)
    want = [( (xv * kv) >> (32 * i)) & 0xFFFFFFFF for i in range(3)]
    want += [(xv >> i) & 1 for i in range(8)]
    assert proof.public_inputs == want
    data.verify(proof)
