"""u32 gadget layer oracle tests (reference pattern: compute natively,
connect, prove with the real prover — SURVEY.md §4)."""
import random

from plonky2_tpu.field import gl
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401  (attaches gadget APIs)

RNG = random.Random(0xAB32)
M32 = 0xFFFFFFFF


def lrot32(x, n):
    n %= 32
    return ((x << n) | (x >> (32 - n))) & M32


def test_u32_ops_prove_verify():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_u32_target()
    y = b.add_virtual_u32_target()
    z = b.add_virtual_u32_target()

    xor_xy = b.xor_u32(x, y)
    and_xy = b.and_u32(x, y)
    not_x = b.not_u32(x)
    rot7 = b.lrot_u32(x, 7)
    rrot3 = b.rrot_u32(y, 3)
    lsh5 = b.lsh_u32(x, 5)
    rsh9 = b.rsh_u32(y, 9)
    sum_, carry = b.add_u32(x, y)
    mul_lo, mul_hi = b.mul_u32(x, y)
    diff, borrow = b.sub_u32(x, y, b.zero_u32())
    xm = b.unsafe_xor_many_u32([x, y, z, x, z])
    many_lo, many_hi = b.add_many_u32([x, y, z, x])

    for t in [xor_xy, and_xy, not_x, rot7, rrot3, lsh5, rsh9, sum_, carry,
              mul_lo, mul_hi, diff, borrow, xm, many_lo, many_hi]:
        b.register_public_input(t.target)
    data = b.build()

    xv, yv, zv = RNG.randrange(1 << 32), RNG.randrange(1 << 32), RNG.randrange(1 << 32)
    proof = data.prove({x.target: xv, y.target: yv, z.target: zv})
    s = xv + yv
    d = xv - yv
    expected = [
        xv ^ yv, xv & yv, xv ^ M32, lrot32(xv, 7), lrot32(yv, 32 - 3),
        (xv << 5) & M32, yv >> 9, s & M32, s >> 32,
        (xv * yv) & M32, (xv * yv) >> 32,
        d & M32 if d >= 0 else (d + (1 << 32)) & M32, 1 if d < 0 else 0,
        xv ^ yv ^ zv ^ xv ^ zv,
        (xv + yv + zv + xv) & M32, (xv + yv + zv + xv) >> 32,
    ]
    assert proof.public_inputs == expected
    data.verify(proof)


def test_u64_ops_prove_verify():
    b = CircuitBuilder(CircuitConfig.test_config())

    def add_u64():
        return [b.add_virtual_u32_target(), b.add_virtual_u32_target()]

    x = add_u64()
    y = add_u64()
    z = add_u64()
    xor_ = b.xor_u64(x, y)
    and_ = b.and_u64(x, y)
    not_ = b.not_u64(x)
    rot20 = b.lrot_u64(x, 20)
    rot45 = b.lrot_u64(x, 45)
    xm = b.unsafe_xor_many_u64([x, y, z])
    sel = b.conditional_u64(x, y, b.one())
    for pair in [xor_, and_, not_, rot20, rot45, xm, sel]:
        b.register_public_input(pair[0].target)
        b.register_public_input(pair[1].target)
    data = b.build()

    def val64():
        return RNG.randrange(1 << 64)

    xv, yv, zv = val64(), val64(), val64()
    inputs = {}
    for pair, v in [(x, xv), (y, yv), (z, zv)]:
        inputs[pair[0].target] = v & M32
        inputs[pair[1].target] = v >> 32

    def pair64(v):
        return [v & M32, v >> 32]

    rot = lambda v, n: ((v << n) | (v >> (64 - n))) & ((1 << 64) - 1)
    expected = []
    for v in [xv ^ yv, xv & yv, xv ^ ((1 << 64) - 1), rot(xv, 20), rot(xv, 45),
              xv ^ yv ^ zv, xv]:
        expected.extend(pair64(v))
    proof = data.prove(inputs)
    assert proof.public_inputs == expected
    data.verify(proof)
