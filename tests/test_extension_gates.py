"""Extension-arithmetic gate tests: property harness entries live in
test_gates.py; here are the prove-and-verify oracle circuits
(SURVEY.md §4 cat. 2 pattern) for the builder's GF(p^2) API."""

import random

import plonky2_tpu.gadgets  # noqa: F401
from plonky2_tpu.field import ext, gl
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig

RNG = random.Random(0xE87)


def _rand_ext():
    return (RNG.randrange(gl.P), RNG.randrange(gl.P))


def _run(build_fn):
    b = CircuitBuilder(CircuitConfig.test_config())
    inputs = build_fn(b)
    data = b.build()
    proof = data.prove(inputs)
    data.verify(proof)
    return proof


def test_extension_arithmetic_circuit():
    def build(b):
        x, y, z = _rand_ext(), _rand_ext(), _rand_ext()
        xt, yt, zt = (b.constant_extension(v) for v in (x, y, z))
        checks = [
            (b.mul_extension(xt, yt), ext.mul_s(x, y)),
            (b.add_extension(xt, yt), ext.add_s(x, y)),
            (b.sub_extension(xt, yt), ext.sub_s(x, y)),
            (b.mul_add_extension(xt, yt, zt),
             ext.add_s(ext.mul_s(x, y), z)),
            (b.scalar_mul_ext(5, xt), ext.scalar_mul_s(x, 5)),
            (b.arithmetic_extension(3, 4, xt, yt, zt),
             ext.add_s(ext.scalar_mul_s(ext.mul_s(x, y), 3),
                       ext.scalar_mul_s(z, 4))),
        ]
        for got, want in checks:
            b.connect_extension(got, b.constant_extension(want))
        return {}

    _run(build)


def test_coset_interpolation_circuit():
    def build(b):
        bits = 2
        n = 1 << bits
        g = gl.primitive_root_of_unity(bits)
        shift = RNG.randrange(1, gl.P)
        coeffs = [_rand_ext() for _ in range(n)]

        def poly_eval(x):
            acc = ext.ZERO
            for c in reversed(coeffs):
                acc = ext.add_s(ext.mul_s(acc, x), c)
            return acc

        values = [poly_eval(ext.from_base_s(shift * pow(g, i, gl.P) % gl.P))
                  for i in range(n)]
        z = _rand_ext()
        got = b.interpolate_coset(
            bits, b.constant(shift),
            [b.constant_extension(v) for v in values],
            b.constant_extension(z))
        b.connect_extension(got, b.constant_extension(poly_eval(z)))
        return {}

    _run(build)


def test_reducing_gates_circuit():
    def build(b):
        alpha = _rand_ext()
        at = b.constant_extension(alpha)

        # base-field fold, long enough to span several ReducingGate rows
        terms = [RNG.randrange(gl.P) for _ in range(23)]
        acc = ext.ZERO
        for t in terms:
            acc = ext.add_s(ext.mul_s(acc, alpha), ext.from_base_s(t))
        got = b.reduce_with_powers_ext(at, [b.constant(t) for t in terms])
        b.connect_extension(got, b.constant_extension(acc))

        # extension-field fold
        eterms = [_rand_ext() for _ in range(9)]
        eacc = ext.ZERO
        for t in eterms:
            eacc = ext.add_s(ext.mul_s(eacc, alpha), t)
        egot = b.reduce_with_powers_ext_circuit(
            at, [b.constant_extension(t) for t in eterms])
        b.connect_extension(egot, b.constant_extension(eacc))
        return {}

    _run(build)
