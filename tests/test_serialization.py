"""Proof + verifier-key byte-format roundtrips.

Mirrors the reference's CircuitData roundtrip test (double roundtrip,
/root/reference/src/ecdsa/gadgets/ecdsa.rs:298-316) — and covers the u32
gates whose serialization the reference left `todo!()`."""

import random

import pytest

from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.prove.verifier import verify
from plonky2_tpu.serialization import (Buffer, deserialize_proof,
                                       deserialize_verifier_data,
                                       gate_from_key, serialize_proof,
                                       serialize_verifier_data)
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0x5E12)


def _build_mixed_circuit():
    """Circuit touching many gate types: arithmetic, base-sum, Poseidon,
    u32 mul/interleave."""
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    s = b.mul_add(x, y, x)
    bits = b.split_le(x, 8)
    h = b.hash_n_to_hash_no_pad([x, y, s] + bits[:1])
    xs = [b.add_virtual_u32_target(), b.add_virtual_u32_target()]
    z = b.xor_u32(xs[0], xs[1])
    b.register_public_inputs(h)
    b.register_public_input(z.target)
    data = b.build()
    inputs = {x: 7, y: 9, xs[0].target: 0xF0F0F0F0, xs[1].target: 0x0FF0_1234}
    return data, inputs


def test_proof_roundtrip_and_cross_verify():
    data, inputs = _build_mixed_circuit()
    proof = data.prove(inputs)
    data.verify(proof)

    raw = serialize_proof(proof)
    proof2 = deserialize_proof(raw)
    raw2 = serialize_proof(proof2)
    assert raw == raw2            # double roundtrip, byte-identical

    vk_raw = serialize_verifier_data(data.verifier)
    vd2 = deserialize_verifier_data(vk_raw)
    vk_raw2 = serialize_verifier_data(vd2)
    assert vk_raw == vk_raw2

    # deserialized proof verifies against deserialized key
    verify(vd2, proof2)
    assert proof2.public_inputs == proof.public_inputs


def test_corrupt_proof_rejected():
    data, inputs = _build_mixed_circuit()
    proof = data.prove(inputs)
    raw = bytearray(serialize_proof(proof))
    raw[13] ^= 0xFF
    with pytest.raises(Exception):
        bad = deserialize_proof(bytes(raw))
        verify(data.verifier, bad)
    with pytest.raises(Exception):
        deserialize_proof(bytes(raw)[:-3])   # truncated


def test_gate_registry_covers_all_gates():
    from plonky2_tpu.gates import (ArithmeticGate, ConstantGate, NoopGate,
                                   PoseidonGate, PublicInputGate)
    from plonky2_tpu.gates.base_sum import BaseSumGate
    from plonky2_tpu.gates.u32_arithmetic import (U32AddManyGate,
                                                  U32ArithmeticGate,
                                                  U32RangeCheckGate)
    from plonky2_tpu.gates.u32_interleave import (U32InterleaveGate,
                                                  UninterleaveToB32Gate,
                                                  UninterleaveToU32Gate)
    gates = [ArithmeticGate(num_ops=20), ConstantGate(num_consts=2),
             NoopGate(), PoseidonGate(), PublicInputGate(),
             BaseSumGate(2, 32), BaseSumGate(4, 16),
             U32ArithmeticGate(num_ops=3), U32AddManyGate(5, 2),
             U32RangeCheckGate(num_ops=4), U32InterleaveGate(num_ops=2),
             UninterleaveToU32Gate(num_ops=2),
             UninterleaveToB32Gate(num_ops=2)]
    for g in gates:
        g2 = gate_from_key(g.key())
        assert g2.key() == g.key()
        assert g2.num_wires == g.num_wires
        assert g2.num_constraints == g.num_constraints
    with pytest.raises(ValueError):
        gate_from_key("Bogus(num_ops=1)")


def test_buffer_primitives():
    buf = Buffer()
    buf.write_u8(7)
    buf.write_u32(1 << 30)
    buf.write_u64((1 << 63) + 5)
    buf.write_bool(True)
    buf.write_ext((123, 456))
    buf.write_str("hello/κ")
    buf.write_list([1, 2, 3], buf.write_field)
    rd = Buffer(buf.bytes())
    assert rd.read_u8() == 7
    assert rd.read_u32() == 1 << 30
    assert rd.read_u64() == (1 << 63) + 5
    assert rd.read_bool() is True
    assert rd.read_ext() == (123, 456)
    assert rd.read_str() == "hello/κ"
    assert rd.read_list(rd.read_field) == [1, 2, 3]
    assert rd.remaining() == 0
    # non-canonical field element rejected
    bad = Buffer()
    bad.write_u64((1 << 64) - 1)
    with pytest.raises(ValueError):
        Buffer(bad.bytes()).read_field()
