"""Mesh-sharded prover phases (SURVEY.md §5 "distributed backend").

The reference's only parallelism is a rayon thread pool
(/root/reference/src/ecdsa/curve/curve_msm.rs:36,133 and plonky2's internal
rayon).  The TPU-native answer is a 1-D device mesh with two data layouts
and XLA collectives between them:

* **poly-sharded** `[num_polys/d, n]` — iNTT/LDE are embarrassingly
  parallel across polynomials (the wire matrix has 135+ of them);
* **row-sharded** `[N/d, num_polys]` — Merkle leaf hashing and constraint
  evaluation are embarrassingly parallel across domain rows.

The transpose between them is one all-to-all which XLA inserts from the
sharding constraints; Merkle upper levels and caps are reduced with
collective gathers.  Scaling law: LDE+hash+constraint phases are ~linear in
devices; transcript work is O(cap) and replicated.

`sharded_prove_step` is the "training step" of this framework: one full
commit phase (LDE -> leaf hash -> cap) plus a constraint-evaluation pass,
jitted over the mesh.  It is what `__graft_entry__.dryrun_multichip`
compiles on an N-virtual-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import gl
from ..hashes import poseidon
from ..ntt import coset_lde, intt


def make_prover_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    # classic (Auto-axis) mesh: with_sharding_constraint steers GSPMD
    return Mesh(np.array(devs), ("d",))


def sharded_prove_step(mesh: Mesh, wires, rate_bits: int, cap_height: int):
    """One sharded commit + constraint pass.

    wires: [num_polys, n] (num_polys divisible by mesh size for the poly
    phase; N divisible for the row phase).  Returns (cap, sample_constraint)
    with the cap replicated on all devices.
    """
    poly_sharded = NamedSharding(mesh, P("d", None))
    row_sharded = NamedSharding(mesh, P("d", None))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def step(wires):
        # poly-parallel: per-polynomial iNTT + coset LDE
        wires = jax.lax.with_sharding_constraint(wires, poly_sharded)
        coeffs = intt(wires)
        lde = coset_lde(coeffs, rate_bits)              # [num_polys, N]
        # transpose to row-parallel (XLA inserts the all-to-all)
        leaves = jax.lax.with_sharding_constraint(lde.T, row_sharded)
        hashes = poseidon.hash_or_noop(leaves)          # [N, 4] row-local
        # reduce to the cap: local tree levels stay sharded until the level
        # size reaches the cap, then replicate
        cur = hashes
        while cur.shape[0] > (1 << cap_height):
            pairs = cur.reshape(-1, 2, poseidon.HASH_OUT)
            cur = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
        cap = jax.lax.with_sharding_constraint(cur, replicated)

        # row-parallel constraint-style pass over the LDE (sample: a
        # degree-7 s-box of the first wire against the last, the Poseidon
        # gate's hot pattern)
        w0 = lde[0]
        x3 = gl.mul(gl.sqr(w0), w0)
        sample = gl.mul(gl.sqr(x3), w0)
        sample = gl.sub(sample, lde[-1])
        return cap, sample

    return step(jax.device_put(wires, poly_sharded))
