"""Debug driver: prove a tiny inner circuit, then prove its verification."""
import os, sys, time
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.recursion import add_proof_verification, set_proof_witness
from plonky2_tpu import utils
utils.profiling_enable()

# ---- inner circuit: h = Poseidon(x, y), PIs = (x, y, h) ----
t0 = time.time()
bi = CircuitBuilder(CircuitConfig.test_config())
x = bi.add_virtual_target()
y = bi.add_virtual_target()
h = bi.hash_n_to_hash_no_pad([x, y])
bi.register_public_inputs([x, y] + h)
inner = bi.build()
print(f"inner: {bi.num_gates()} gates, degree 2^{inner.common.degree_bits}, "
      f"build {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
inner_proof = inner.prove({x: 3, y: 5})
inner.verify(inner_proof)
print(f"inner prove+verify {time.time()-t0:.1f}s", flush=True)

# ---- outer circuit verifies the inner proof ----
t0 = time.time()
bo = CircuitBuilder(CircuitConfig.test_config())
pt = add_proof_verification(bo, inner.verifier)
bo.register_public_inputs(pt.public_inputs)
print(f"outer traced: {bo.num_gates()} gates, {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
outer = bo.build()
print(f"outer built: degree 2^{outer.common.degree_bits}, "
      f"{time.time()-t0:.1f}s", flush=True)
inputs = {}
set_proof_witness(inputs, pt, inner_proof)
t0 = time.time()
outer_proof = outer.prove(inputs)
outer.verify(outer_proof)
print(f"outer prove+verify {time.time()-t0:.1f}s", flush=True)
assert outer_proof.public_inputs == inner_proof.public_inputs
print("RECURSION OK", flush=True)
