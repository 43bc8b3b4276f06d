from .merkle import MerkleTree, verify_merkle_proof_s  # noqa: F401
