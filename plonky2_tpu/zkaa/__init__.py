"""zkAA: recursive proof aggregation (BASELINE config #5).

The reference reserves this slot (/root/reference/src/zkaa/mod.rs is an
empty placeholder for account-abstraction aggregation over the zkdsa flow);
here it is implemented: an aggregation circuit embeds N in-circuit proof
verifiers (recursion/verifier.py) for a fixed inner circuit shape and
re-exposes the inner public inputs concatenated, so one outer proof attests
to N inner proofs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ir import CircuitBuilder, CircuitConfig
from ..recursion import add_proof_verification, set_proof_witness


@dataclass
class AggregationCircuit:
    data: object                 # outer CircuitData
    proof_targets: list          # list[ProofTarget], one per inner slot
    inner_verifier: object       # the inner VerifierData these slots verify

    @property
    def num_slots(self) -> int:
        return len(self.proof_targets)

    def prove(self, inner_proofs: list):
        """inner_proofs: host Proof objects (must verify against
        `inner_verifier`).  Returns the outer proof, whose public inputs
        are the inner proofs' public inputs concatenated."""
        assert len(inner_proofs) == self.num_slots
        inputs: dict = {}
        for pt, proof in zip(self.proof_targets, inner_proofs):
            set_proof_witness(inputs, pt, proof)
        return self.data.prove(inputs)

    def verify(self, outer_proof) -> None:
        self.data.verify(outer_proof)


def make_aggregation_circuit(inner_vd, num_proofs: int = 4,
                             config=None) -> AggregationCircuit:
    """Build a circuit verifying `num_proofs` proofs of the circuit
    described by `inner_vd` (BASELINE config #5 uses 4 zkdsa proofs)."""
    b = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    pts = []
    for _ in range(num_proofs):
        pt = add_proof_verification(b, inner_vd)
        b.register_public_inputs(pt.public_inputs)
        pts.append(pt)
    data = b.build()
    return AggregationCircuit(data=data, proof_targets=pts,
                              inner_verifier=inner_vd)
