"""Batch-ECDSA perf driver — the analog of the reference's perf binary
(/root/reference/src/bin/perf.rs:7-9 →
/root/reference/src/ecdsa/gadgets/ecdsa.rs:215-378):

  build a batch-N ECDSA-verify circuit, print gate counts, round-trip the
  verifier key + proof through bytes, prove and verify with TimingTree
  phase spans.

Usage: python scripts/perf.py [batch] [--cpu]
(batch defaults to 2; the reference default is 20 — pass 20 to reproduce.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

from plonky2_tpu import utils
from plonky2_tpu.bench.circuits import build_ecdsa
from plonky2_tpu.serialization import (deserialize_proof,
                                       deserialize_verifier_data,
                                       serialize_proof,
                                       serialize_verifier_data)

utils.profiling_enable()

t0 = time.time()
b, inputs, meta = build_ecdsa(batch=batch)
print(f"batch={batch} num_gates={b.num_gates()} (trace {time.time()-t0:.1f}s)",
      flush=True)
t0 = time.time()
data = b.build()
print(f"built: degree 2^{data.common.degree_bits} ({time.time()-t0:.1f}s)",
      flush=True)

# circuit-data roundtrip (ecdsa.rs:298-316)
vd_bytes = serialize_verifier_data(data.verifier)
vd2 = deserialize_verifier_data(vd_bytes)
assert vd2.cs_cap == data.verifier.cs_cap
print(f"verifier key roundtrip: {len(vd_bytes)} bytes OK", flush=True)

t0 = time.time()
proof = data.prove(inputs)
print(f"prove: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
proof = data.prove(inputs)
print(f"prove (warm): {time.time()-t0:.1f}s", flush=True)

p_bytes = serialize_proof(proof)
proof2 = deserialize_proof(p_bytes)
assert serialize_proof(proof2) == p_bytes
print(f"proof roundtrip: {len(p_bytes)} bytes OK", flush=True)

from plonky2_tpu.prove.verifier import verify
t0 = time.time()
verify(vd2, proof2)
print(f"verify (roundtripped key + proof): {time.time()-t0:.1f}s", flush=True)
print("PERF DRIVER OK", flush=True)
