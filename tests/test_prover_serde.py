"""Prover-side CircuitData round-trip: build once, serialize, prove from
the deserialized prover state in the same way the reference round-trips
its CircuitData incl. witness generators
(/root/reference/src/ecdsa/gadgets/ecdsa.rs:298-316).
"""

import random

from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.serialization import (deserialize_prover_data,
                                       serialize_proof,
                                       serialize_prover_data)
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0x5E2DE)
F61 = (1 << 61) - 1          # Mersenne prime: a 2-limb nonnative modulus


def _build():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_nonnative_target(F61)
    y = b.add_virtual_nonnative_target(F61)
    z = b.mul_nonnative(x, y)            # nn_mul hint
    w = b.inv_nonnative(x)               # nn_inv hint
    s = b.add_nonnative(x, y)            # nn_add hint
    a = b.add_virtual_biguint_target(3)
    c = b.add_virtual_biguint_target(2)
    d, r = b.div_rem_biguint(a, c)       # biguint_div_rem hint
    t = b.add_virtual_target()
    eq = b.is_equal(t, b.zero())         # inv_or_zero hint
    for u in z.value.limbs + w.value.limbs + s.value.limbs + d.limbs + r.limbs:
        b.register_public_input(u.target)
    b.register_public_input(eq)
    data = b.build()
    inputs = {}
    set_biguint_target(inputs, x.value, 1234567)
    set_biguint_target(inputs, y.value, 7654321)
    set_biguint_target(inputs, a, (1 << 70) + 99)
    set_biguint_target(inputs, c, 12345)
    inputs[t] = 42
    return data, inputs


def test_prover_data_roundtrip_then_prove():
    data, inputs = _build()
    proof_orig = data.prove(inputs)
    data.verify(proof_orig)

    blob = serialize_prover_data(data.prover)
    data2 = deserialize_prover_data(blob)
    assert data2.common.degree_bits == data.common.degree_bits
    assert [g.key() for g in data2.common.gates] == \
        [g.key() for g in data.common.gates]
    assert data2.verifier.cs_cap == data.verifier.cs_cap

    proof_rt = data2.prove(inputs)
    data2.verify(proof_rt)
    data.verify(proof_rt)                      # original verifier accepts it
    assert serialize_proof(proof_rt) == serialize_proof(proof_orig), \
        "proof from round-tripped prover state differs"

    # double roundtrip (ecdsa.rs:298-316 tests to_bytes(from_bytes(x)) too)
    blob2 = serialize_prover_data(data2.prover)
    assert blob2 == blob
