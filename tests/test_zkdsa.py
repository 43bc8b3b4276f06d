"""zkDSA: accounts, simple-signature circuit, address gadget.

Mirrors /root/reference/src/zkdsa/ inline tests (account serde
account.rs:45-58,104-117, signature circuit signature/mod.rs:66-113,
typed wrapper circuits/mod.rs:350-392)."""

import random

import pytest

from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.smt.hash_out import ZERO_HASH
from plonky2_tpu.zkdsa import (Account, Address, AddressTarget,
                               SimpleSignaturePublicInputs,
                               make_simple_signature_circuit,
                               private_key_to_account)
from plonky2_tpu.zkdsa.account import sign_message
from plonky2_tpu.gadgets.smt import set_hash_witness
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0xD5A)
P = (1 << 64) - (1 << 32) + 1


def rand_hash():
    return tuple(RNG.randrange(P) for _ in range(4))


def test_address_hex_serde():
    a = Address(1)
    assert a.to_hex() == "0x0000000000000001"
    assert Address.from_hex("0x01") == a
    for _ in range(5):
        a = Address(RNG.randrange(P))
        s = a.to_hex()
        assert len(s) == 18
        assert Address.from_hex(s) == a


def test_address_hash_out_roundtrip():
    a = Address(RNG.randrange(P))
    h = a.to_hash_out()
    assert h[1:] == (0, 0, 0)
    assert Address.from_hash_out(h) == a
    out = []
    a.write(out)
    assert Address.read(iter(out)) == a
    with pytest.raises(AssertionError):
        Address.from_hash_out((1, 2, 0, 0))


def test_account_derivation():
    sk = rand_hash()
    acct = private_key_to_account(sk)
    assert acct == Account.new(sk)
    assert acct.address.value == acct.public_key[0]
    # pk = H(sk||sk) is deterministic
    assert private_key_to_account(sk).public_key == acct.public_key


def test_default_public_inputs_self_consistent():
    d = SimpleSignaturePublicInputs.default()
    assert d.message == ZERO_HASH
    # with message = 0, signature = H(sk, 0) = H(0, 0) = public_key
    assert d.signature == d.public_key
    assert SimpleSignaturePublicInputs.decode(d.encode()) == d


def test_simple_signature_circuit():
    circuit = make_simple_signature_circuit(CircuitConfig.test_config())
    sk, msg = rand_hash(), rand_hash()
    proof = circuit.prove(sk, msg)
    circuit.verify(proof)

    acct = private_key_to_account(sk)
    assert proof.public_inputs.message == msg
    assert proof.public_inputs.public_key == acct.public_key
    assert proof.public_inputs.signature == sign_message(sk, msg)

    # a different key yields different signature over the same message
    proof2 = circuit.prove(rand_hash(), msg)
    assert proof2.public_inputs.signature != proof.public_inputs.signature


def test_address_target_constrains_padding():
    b = CircuitBuilder(CircuitConfig.test_config())
    t = AddressTarget.add_virtual_to(b)
    b.register_public_inputs(t.elements)
    data = b.build()

    a = Address(RNG.randrange(P))
    pw = {}
    t.set_witness(pw, a)
    proof = data.prove(pw)
    data.verify(proof)
    assert proof.public_inputs == [a.value, 0, 0, 0]

    # nonzero padding element must be rejected
    pw = {}
    set_hash_witness(pw, t.elements, (a.value, 5, 0, 0))
    with pytest.raises(Exception):
        bad = data.prove(pw)
        data.verify(bad)
