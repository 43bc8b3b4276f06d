"""Recursion subsystem: in-circuit proof verification building blocks.

The reference requires recursive verification for the aggregation config
(SURVEY.md §2.2 "Recursion": every gate's `eval_unfiltered_circuit`, the
`DummyProofGenerator` whitelist slot /root/reference/src/ecdsa/gadgets/
ecdsa.rs:31,113, and the zkaa aggregation placeholder /root/reference/src/
zkaa/mod.rs).  This package provides the TPU-native equivalents:

* `CircuitAlg` — the circuit-emitting algebra: running any `Gate.eval`
  against it emits the gate's constraint evaluation *as circuit targets*
  (the third evaluator promised in gates/base.py, alongside the batched
  prover algebra and the scalar verifier algebra).
* `RecursiveChallenger` — the Fiat-Shamir duplex sponge over targets,
  mirroring transcript/challenger.py observation-for-observation so the
  in-circuit transcript replays the prover's challenges exactly.
"""

from .circuit_alg import CircuitAlg  # noqa: F401
from .challenger import RecursiveChallenger  # noqa: F401
from .merkle import verify_merkle_proof_to_cap_circuit  # noqa: F401
from .verifier import (  # noqa: F401
    ProofTarget,
    add_virtual_proof_target,
    add_proof_verification,
    set_proof_witness,
    verify_proof_circuit,
)
