"""Measure the host-CPU baseline for bench.py's vs_baseline ratio.

Run with: JAX_PLATFORMS=cpu python benchmarks/measure_cpu_baseline.py
Writes benchmarks/baseline_cpu.json.  (The Rust reference publishes no
benchmark numbers — BASELINE.md — so the recorded baseline is this host's
CPU running the same JAX NTT workload, all cores.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from plonky2_tpu.ntt import coset_lde, intt

    num_polys, log_n, rate = 135, 14, 3
    n = 1 << log_n
    rng = np.random.RandomState(0)
    wires = jnp.asarray(rng.randint(0, 1 << 62, size=(num_polys, n),
                                    dtype=np.uint64))

    @jax.jit
    def lde_step(w):
        return coset_lde(intt(w), rate)

    lde_step(wires).block_until_ready()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = lde_step(wires)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    elems = num_polys * (n + (n << rate))
    rate_eps = elems / dt
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_cpu.json")
    with open(out_path, "w") as f:
        json.dump({"ntt_elems_per_sec": rate_eps,
                   "lde_step_ms": dt * 1e3,
                   "host": os.uname().nodename}, f, indent=1)
    print(f"cpu lde_step: {dt*1e3:.1f} ms -> {rate_eps/1e9:.3f} G elems/s")


if __name__ == "__main__":
    main()
