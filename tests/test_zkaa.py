"""zkAA aggregation (BASELINE config #5): N zkDSA proofs verified inside
one outer circuit.  The 2-proof variant runs in the suite; the full
4-proof BASELINE config runs under PLONKY2_TPU_SLOW_TESTS=1 (and via
`bench.py` config 5 on the TPU, where its numbers are recorded).

Reference anchor: the zkaa slot (/root/reference/src/zkaa/mod.rs, empty
upstream) + the recursion machinery whitelisted at
/root/reference/src/ecdsa/gadgets/ecdsa.rs:31,113.
"""

import os
import random

import pytest

from plonky2_tpu import zkaa
from plonky2_tpu.ir import CircuitConfig
from plonky2_tpu.zkdsa import make_simple_signature_circuit

RNG = random.Random(0xA66)
P = (1 << 64) - (1 << 32) + 1
SLOW = os.environ.get("PLONKY2_TPU_SLOW_TESTS") == "1"


def rand_hash():
    return tuple(RNG.randrange(P) for _ in range(4))


def _aggregate(num_proofs):
    inner = make_simple_signature_circuit(CircuitConfig.test_config())
    proofs = []
    for _ in range(num_proofs):
        sp = inner.prove(rand_hash(), rand_hash())
        inner.verify(sp)
        proofs.append(sp.proof)
    agg = zkaa.make_aggregation_circuit(inner.data.verifier, num_proofs,
                                        CircuitConfig.test_config())
    assert agg.num_slots == num_proofs
    outer_proof = agg.prove(proofs)
    agg.verify(outer_proof)
    want = [v for p in proofs for v in p.public_inputs]
    assert outer_proof.public_inputs == want
    return agg


def test_aggregate_two_zkdsa_proofs():
    _aggregate(2)


@pytest.mark.skipif(not SLOW, reason="4-proof aggregation is a perf-scale run")
def test_aggregate_four_zkdsa_proofs_slow():
    _aggregate(4)
