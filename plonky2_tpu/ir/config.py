"""Circuit configuration presets.

Mirrors plonky2's `CircuitConfig` presets used by the reference
(/root/reference/src/hash/keccak256.rs:219 standard_recursion_config,
/root/reference/src/ecdsa/gadgets/nonnative.rs:865 standard_ecc_config,
/root/reference/src/ecdsa/gadgets/ecdsa.rs:489 wide_ecc_config), folded into
one dataclass per SURVEY.md §5 "Config / flag system".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fri import FriConfig


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 135
    num_routed_wires: int = 80
    num_constants: int = 2
    num_challenges: int = 2
    security_bits: int = 100
    # max degree of a filtered constraint; quotient splits into this many
    # degree-n chunks
    max_quotient_degree_factor: int = 8
    fri: FriConfig = field(default_factory=FriConfig)
    # in-circuit ("inner") algebraic hasher: "poseidon" | "poseidon2".
    # Mirrors the GenericConfig InnerHasher choice (the reference whitelists
    # Poseidon2Gate, /root/reference/src/ecdsa/gadgets/ecdsa.rs:85-87).
    algebraic_hasher: str = "poseidon"
    # transcript/Merkle ("outer") hasher: "poseidon" | "keccak".
    # "keccak" is the KeccakGoldilocksConfig slot the reference proves
    # keccak circuits under (/root/reference/src/hash/keccak256.rs:187,281).
    transcript_hasher: str = "poseidon"

    def hasher_module(self):
        from ..hashes import poseidon, poseidon2
        return poseidon2 if self.algebraic_hasher == "poseidon2" else poseidon

    def transcript_module(self):
        from ..hashes import keccak_hash, poseidon
        return keccak_hash if self.transcript_hasher == "keccak" else poseidon

    @staticmethod
    def standard_recursion_config() -> "CircuitConfig":
        return CircuitConfig()

    @staticmethod
    def keccak_config() -> "CircuitConfig":
        """KeccakGoldilocksConfig analog: Keccak transcript/Merkle hasher,
        Poseidon in-circuit hasher (keccak256.rs:256-296 usage)."""
        return CircuitConfig(transcript_hasher="keccak")

    @staticmethod
    def standard_ecc_config() -> "CircuitConfig":
        return CircuitConfig(num_wires=136)

    @staticmethod
    def wide_ecc_config() -> "CircuitConfig":
        return CircuitConfig(num_wires=234, num_routed_wires=80)

    @staticmethod
    def poseidon2_config() -> "CircuitConfig":
        """standard_recursion_config with Poseidon2 as the inner hasher
        (the reference's Poseidon2GoldilocksConfig slot)."""
        return CircuitConfig(algebraic_hasher="poseidon2")

    @staticmethod
    def test_config() -> "CircuitConfig":
        """Small FRI parameters for fast unit tests (CPU mesh)."""
        return CircuitConfig(
            fri=FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                          num_query_rounds=12, arity_bits=2, final_poly_bits=2))
