"""End-to-end prove + verify: the prove-and-verify oracle pattern of the
reference (SURVEY.md §4), on small circuits with the test FRI config."""
import copy
import random

import pytest

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import poseidon
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig

RNG = random.Random(0xD1CE)


def build_arithmetic_circuit():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.mul_add(x, y, x)            # z = x*y + x
    w = b.sub(z, y)
    b.register_public_input(x)
    b.register_public_input(y)
    b.register_public_input(w)
    data = b.build()
    return data, (x, y, w)


def test_arithmetic_prove_verify():
    data, (x, y, w) = build_arithmetic_circuit()
    xv, yv = 12345, 6789
    wv = (xv * yv + xv - yv) % gl.P
    proof = data.prove({x: xv, y: yv})
    assert proof.public_inputs == [xv, yv, wv]
    data.verify(proof)


def test_arithmetic_rejects_wrong_public_inputs():
    data, (x, y, w) = build_arithmetic_circuit()
    proof = data.prove({x: 3, y: 4})
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % gl.P
    with pytest.raises(AssertionError):
        data.verify(bad)


def test_arithmetic_rejects_corrupt_openings():
    data, _ = build_arithmetic_circuit()
    proof = data.prove({0: 3, 1: 4})
    bad = copy.deepcopy(proof)
    c0, c1 = bad.openings.wires[0]
    bad.openings.wires[0] = ((c0 + 1) % gl.P, c1)
    with pytest.raises(AssertionError):
        data.verify(bad)


def test_poseidon_gate_circuit():
    b = CircuitBuilder(CircuitConfig.test_config())
    ins = b.add_virtual_targets(12)
    outs = b.permute(ins)
    for t in outs[:4]:
        b.register_public_input(t)
    data = b.build()
    in_vals = [RNG.randrange(gl.P) for _ in range(12)]
    proof = data.prove({t: v for t, v in zip(ins, in_vals)})
    want = poseidon.permute_s(in_vals)[:4]
    assert proof.public_inputs == want
    data.verify(proof)


def test_hash_chain_circuit():
    # config #1 of BASELINE.md in miniature: iterated Poseidon hash chain
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_targets(4)
    state = list(x)
    for _ in range(6):
        state = b.two_to_one(state, state)
    b.register_public_inputs(state)
    data = b.build()
    xv = [RNG.randrange(gl.P) for _ in range(4)]
    expect = list(xv)
    for _ in range(6):
        expect = poseidon.two_to_one_s(expect, expect)
    proof = data.prove({t: v for t, v in zip(x, xv)})
    assert proof.public_inputs == expect
    data.verify(proof)


def test_connect_constraints_copy():
    # copy constraints route values: two separate products forced equal
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    a = b.mul(x, y)
    bb = b.mul(y, x)
    b.connect(a, bb)
    b.register_public_input(a)
    data = b.build()
    proof = data.prove({x: 7, y: 9})
    assert proof.public_inputs == [63]
    data.verify(proof)
