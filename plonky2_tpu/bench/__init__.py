"""Benchmark circuits + drivers for the five BASELINE.md configs.

Replaces the reference's perf harness (/root/reference/src/bin/perf.rs:7-9 →
/root/reference/src/ecdsa/gadgets/ecdsa.rs:215-378): build a real circuit,
print gate counts, prove + verify with phase timings.

Configs (BASELINE.md "Benchmark configs"):
  1. Poseidon hash-chain, degree 2^12
  2. u32 add/mul + range-check mix, degree 2^13
  3. SMT process proofs (depth 32), degree 2^14
  4. secp256k1 ECDSA verify, degree 2^16
  5. recursive aggregation of 4 zkDSA proofs (zkaa flow)
"""

from .circuits import (build_ecdsa, build_poseidon_chain, build_smt_process,
                       build_u32_mix)

__all__ = ["build_poseidon_chain", "build_u32_mix", "build_smt_process",
           "build_ecdsa"]
