"""plonky2_tpu — a TPU-native Plonky2-class zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas implementation of the proving stack and gadget
surface of the reference library (Orbiter-Finance/Plonky2-lib, a Rust gadget
library over the plonky2 Goldilocks/FRI prover).  This is **not** a port: the
circuit is represented as arrays (gate-id per row, selector/constant/sigma
polynomials), witness generation is batched, and every prover hot phase
(LDE/NTT, Merkle hashing, constraint evaluation, FRI folding) is a vectorized
JAX computation that runs on TPU and shards over a device mesh.

Layout (see SURVEY.md §7.1):
    field/      Goldilocks (p = 2^64 - 2^32 + 1) and quadratic extension
    hashes/     Poseidon permutation (vectorized + scalar reference), sponge
    ntt/        radix-2 NTT / coset LDE (single-chip and mesh-sharded)
    merkle/     cap-rooted Merkle commitments over Poseidon
    transcript/ Fiat-Shamir challenger (duplex sponge)
    fri/        FRI commit / query / verify
    ir/         CircuitBuilder, targets, config
    gates/      gate constraint + wire-layout definitions (generic algebra)
    witness/    witness generation scheduler
    prove/      prover + verifier orchestration
    gadgets/    u32 / biguint / nonnative / curve / ecdsa / keccak / smt / zkdsa
    parallel/   mesh sharding of the prover phases
"""

import os as _os

import jax as _jax

# The entire framework computes over 64-bit field elements; uint64 arrays
# require x64 mode.  On TPU, u64 is emulated as u32 pairs by XLA (measured
# ~2.5 G modmul/s/chip on v5e for the Goldilocks schoolbook mul).
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: per-circuit prover kernels are large
# graphs; caching amortizes compile time across processes/test runs.
_cache_dir = _os.environ.get(
    "PLONKY2_TPU_JIT_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "plonky2_tpu_jax"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache is best-effort
    pass

__version__ = "0.1.0"
