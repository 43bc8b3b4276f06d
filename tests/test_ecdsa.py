"""ECDSA-verify circuit.  The full prove is expensive (the reference
#[ignore]s its equivalents, /root/reference/src/ecdsa/gadgets/
ecdsa.rs:473-490); it runs only with PLONKY2_TPU_SLOW_TESTS=1 (or via the
perf driver).  The build-only smoke test always runs."""
import os
import random

import pytest

from plonky2_tpu.field import secp
from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.gadgets.ecdsa import ECDSAPublicKeyTarget
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401
import plonky2_tpu.gadgets.curve  # noqa: F401
import plonky2_tpu.gadgets.ecdsa  # noqa: F401

RNG = random.Random(0xECD5A)

SLOW = os.environ.get("PLONKY2_TPU_SLOW_TESTS") == "1"


def build_ecdsa_circuit(config):
    b = CircuitBuilder(config)
    msg = b.add_virtual_nonnative_target(secp.N)
    sig = b.add_virtual_ecdsa_signature_target()
    pk = ECDSAPublicKeyTarget(b.add_virtual_affine_point_target())
    b.verify_message_circuit(msg, sig, pk)
    return b, msg, sig, pk


def test_ecdsa_circuit_builds():
    b, *_ = build_ecdsa_circuit(CircuitConfig.test_config())
    assert b.num_gates() > 1000       # sanity: real circuit was traced


@pytest.mark.skipif(not SLOW, reason="full ECDSA prove is a perf-scale run")
def test_ecdsa_prove_verify_slow():
    b, msg, sig, pk = build_ecdsa_circuit(CircuitConfig.test_config())
    data = b.build()
    sk = RNG.randrange(1, secp.N)
    pk_pt = secp.mul(secp.G, sk)
    h = RNG.randrange(secp.N)
    r, s = secp.sign(h, sk, RNG.randrange(1, secp.N))
    inputs = {}
    set_biguint_target(inputs, msg.value, h)
    set_biguint_target(inputs, sig.r.value, r)
    set_biguint_target(inputs, sig.s.value, s)
    set_biguint_target(inputs, pk.point.x.value, pk_pt.x)
    set_biguint_target(inputs, pk.point.y.value, pk_pt.y)
    proof = data.prove(inputs)
    data.verify(proof)
