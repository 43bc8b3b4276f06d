"""Lookup gate tests: logUp argument exercised end to end.

The reference whitelists LookupGate/LookupTableGate
(/root/reference/src/ecdsa/gadgets/ecdsa.rs:82-84); here the builder API is
`add_lookup_table` / `lookup` (gates/lookup.py) and the prover runs the
logUp helper-poly phase (prove/prover.py lookup_phase).  Pattern: the
prove-and-verify oracle test of SURVEY.md §4 plus a soundness tamper test
(wrong multiplicities must be rejected).
"""
import copy

import pytest

from plonky2_tpu.field import gl
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.witness import hints


TABLE = [(i, (i ** 3 + 5) % 97) for i in range(16)]


def build_lookup_circuit(xs):
    b = CircuitBuilder(CircuitConfig.test_config())
    tid = b.add_lookup_table(TABLE)
    ins = [b.add_virtual_target() for _ in xs]
    for t in ins:
        b.register_public_input(t)
    for t in ins:
        y = b.lookup(t, tid)
        b.register_public_input(y)
    data = b.build()
    return data, dict(zip(ins, xs))


def test_lookup_prove_verify():
    xs = [3, 7, 7, 0, 15, 4, 4, 4]        # repeats exercise multiplicity > 1
    data, inputs = build_lookup_circuit(xs)
    proof = data.prove(inputs)
    want = [dict(TABLE)[x] for x in xs]
    assert proof.public_inputs == xs + want
    data.verify(proof)


def test_lookup_rejects_value_not_in_table():
    data, inputs = build_lookup_circuit([3, 5])
    k = list(inputs)[0]
    inputs[k] = 77                         # not a table input
    with pytest.raises(ValueError):
        data.prove(inputs)


def test_lookup_rejects_wrong_multiplicities():
    """A prover lying about multiplicities must fail verification: the
    logUp running sum no longer telescopes to zero, so the quotient is not
    divisible by Z_H and the zeta identity check fails."""
    xs = [2, 2, 9]
    data, inputs = build_lookup_circuit(xs)
    good = hints.HINTS["lookup_mults"]

    def bad_mults(params, vals):
        out = good(params, vals)
        out[0] = (out[0] + 1) % gl.P       # inflate one count
        return out

    hints.HINTS["lookup_mults"] = bad_mults
    try:
        proof = data.prove(inputs)
    finally:
        hints.HINTS["lookup_mults"] = good
    with pytest.raises(AssertionError):
        data.verify(proof)


def test_lookup_rejects_tampered_output():
    data, inputs = build_lookup_circuit([1, 6])
    proof = data.prove(inputs)
    bad = copy.deepcopy(proof)
    bad.public_inputs[-1] = (bad.public_inputs[-1] + 1) % gl.P
    with pytest.raises(AssertionError):
        data.verify(bad)
