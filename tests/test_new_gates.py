"""Prove-and-verify oracle tests for RandomAccessGate, U32SubtractionGate,
ComparisonGate, ExponentiationGate (SURVEY.md §4 cat. 2 pattern)."""

import random

import plonky2_tpu.gadgets  # noqa: F401  (attaches gadget methods)
from plonky2_tpu.field import gl
from plonky2_tpu.gadgets.u32 import U32Target
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig

RNG = random.Random(0xACCE55)


def _run(build_fn):
    b = CircuitBuilder(CircuitConfig.test_config())
    inputs = build_fn(b)
    data = b.build()
    proof = data.prove(inputs)
    data.verify(proof)


def test_random_access_circuit():
    def build(b):
        items = [RNG.randrange(gl.P) for _ in range(16)]
        inputs = {}
        for k in (0, 5, 15):
            idx = b.add_virtual_target()
            inputs[idx] = k
            got = b.random_access(idx, [b.constant(v) for v in items])
            b.connect(got, b.constant(items[k]))
        # non-power-of-two list pads with its last element
        idx = b.add_virtual_target()
        inputs[idx] = 2
        got = b.random_access(idx, [b.constant(v) for v in items[:5]])
        b.connect(got, b.constant(items[2]))
        return inputs

    _run(build)


def test_u32_subtraction_circuit():
    def build(b):
        cases = [(7, 3, 0), (3, 7, 0), (0, 0, 1), (0xFFFFFFFF, 1, 1),
                 (5, 5, 0), (5, 5, 1)]
        for x, y, bin_ in cases:
            d = x - y - bin_
            bout = 1 if d < 0 else 0
            res = d + (bout << 32)
            got, got_b = b.sub_u32(U32Target(b.constant(x)),
                                   U32Target(b.constant(y)),
                                   U32Target(b.constant(bin_)))
            b.connect(got.target, b.constant(res))
            b.connect(got_b.target, b.constant(bout))
        return {}

    _run(build)


def test_comparison_circuit():
    def build(b):
        cases = [(3, 7), (7, 3), (5, 5), (0, 0xFFFFFFFF), (0xFFFFFFFF, 0)]
        for x, y in cases:
            c = b.le_compare(b.constant(x), b.constant(y), 32)
            b.connect(c, b.constant(1 if x <= y else 0))
        return {}

    _run(build)


def test_exponentiation_circuit():
    def build(b):
        for base, e in [(3, 0), (3, 1), (7, 41), (2, 63)]:
            got = b.exp_u64(b.constant(base), b.constant(e), 6)
            b.connect(got, b.constant(pow(base, e, gl.P)))
        return {}

    _run(build)
