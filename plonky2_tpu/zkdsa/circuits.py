"""Typed SimpleSignature circuit wrapper.

Parity: /root/reference/src/zkdsa/circuits/mod.rs —
`make_simple_signature_circuit` registering 12 public inputs in
message‖public_key‖signature order (:24-43), `SimpleSignaturePublicInputs`
encode/decode (:56-180), typed `prove/verify/set_witness_and_prove`
(:313-348), `prove_simple_signature` (:394-424).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..hashes import poseidon
from ..ir import CircuitBuilder, CircuitConfig
from ..smt.hash_out import HashOut, ZERO_HASH
from .gadgets import SimpleSignatureTarget


@dataclass
class SimpleSignaturePublicInputs:
    message: HashOut
    public_key: HashOut
    signature: HashOut

    @classmethod
    def default(cls) -> "SimpleSignaturePublicInputs":
        pk = tuple(poseidon.two_to_one_s(list(ZERO_HASH), list(ZERO_HASH)))
        sig = pk  # H(0, 0) == H(0, default message 0)
        return cls(ZERO_HASH, pk, sig)

    def encode(self) -> list[int]:
        out = list(self.message) + list(self.public_key) + list(self.signature)
        assert len(out) == 12
        return out

    @classmethod
    def decode(cls, public_inputs) -> "SimpleSignaturePublicInputs":
        assert len(public_inputs) == 12
        return cls(tuple(public_inputs[0:4]), tuple(public_inputs[4:8]),
                   tuple(public_inputs[8:12]))


@dataclass
class SimpleSignatureProof:
    proof: object            # prover Proof object
    public_inputs: SimpleSignaturePublicInputs


class SimpleSignatureCircuit:
    def __init__(self, data, targets: SimpleSignatureTarget):
        self.data = data
        self.targets = targets

    def prove(self, private_key: HashOut,
              message: HashOut) -> SimpleSignatureProof:
        pw: dict = {}
        self.targets.set_witness(pw, private_key, message)
        proof = self.data.prove(pw)
        return SimpleSignatureProof(
            proof, SimpleSignaturePublicInputs.decode(proof.public_inputs))

    def verify(self, proof: SimpleSignatureProof) -> None:
        assert proof.proof.public_inputs == proof.public_inputs.encode()
        self.data.verify(proof.proof)


def make_simple_signature_circuit(config=None) -> SimpleSignatureCircuit:
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    targets = SimpleSignatureTarget.add_virtual_to(builder)
    builder.register_public_inputs(targets.message)      # [0..4]
    builder.register_public_inputs(targets.public_key)   # [4..8]
    builder.register_public_inputs(targets.signature)    # [8..12]
    data = builder.build()
    return SimpleSignatureCircuit(data, targets)


def prove_simple_signature(private_key: HashOut, message: HashOut,
                           config=None) -> SimpleSignatureProof:
    circuit = make_simple_signature_circuit(config)
    proof = circuit.prove(private_key, message)
    circuit.verify(proof)
    return proof
