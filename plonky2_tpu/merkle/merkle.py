"""Cap-rooted Merkle commitments over Poseidon.

Device-first, lanes-first: leaves live as a [C, L] *column* matrix (the
layout polynomial oracles already have — [num_polys, N] — so committing an
LDE needs no transpose), leaf hashing is one scanned sponge over columns,
and each internal level is one batched two_to_one over [4, L/2^k] digests.
With the batch on the minor axis every op runs at full 128-lane VPU width
(see hashes/poseidon.py `permute_cols`).  Proof extraction is a batched
device gather (`open_many`); verification is a host-side scalar path
(verifier-sized work).

Mirrors plonky2's MerkleTree/MerkleCap semantics consumed by the reference
(Merkle caps in proofs, SURVEY.md §2.2): a tree is truncated at
`cap_height`, the "root" is the vector of 2^cap_height digests, and a proof
walks from a leaf up to the cap entry `index >> (depth - cap_height)`.

Layout note: LDE oracles commit their leaves in bit-reversed domain
order, matching plonky2's storage (see fri/fri.py module docstring); the
tree itself is order-agnostic.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..hashes import poseidon


# One jitted kernel per (C, L, cap_height) tree shape: the whole tree —
# leaf sponge (a lax.scan) + every compress level — compiles as a single
# executable.  Per-kernel compile latency dominates on a tunneled TPU, so
# one compile per tree shape beats one per level by ~20x; oracles with the
# same shape (and re-proves) share the cached executable.
@functools.partial(jax.jit, static_argnames=("cap_height", "hasher"))
def _merkle_levels(leaves_cols, cap_height: int, hasher=poseidon):
    levels = [hasher.hash_or_noop_cols(leaves_cols)]
    while levels[-1].shape[1] > (1 << cap_height):
        cur = levels[-1]
        levels.append(hasher.two_to_one_cols(cur[:, 0::2], cur[:, 1::2]))
    return tuple(levels)


@dataclass
class MerkleTree:
    """leaves: [C, L] u64 device array (column layout); levels[0] = leaf
    hashes [4, L] ... levels[-1] = cap [4, 2^cap_height]."""

    leaves: jnp.ndarray
    cap_height: int
    levels: list = field(default_factory=list)
    hasher: object = poseidon
    _host_levels: list | None = None
    _host_leaves: np.ndarray | None = None

    @staticmethod
    def build_cols(leaves_cols, cap_height: int, hasher=poseidon) -> "MerkleTree":
        """leaves_cols: [C, L] — one leaf per column."""
        C, L = leaves_cols.shape
        assert L & (L - 1) == 0, "leaf count must be a power of 2"
        assert (1 << cap_height) <= L
        # Pad columns to the sponge rate so circuits with similar oracle
        # widths share compiled leaf-hash kernels.  Pad zeros are bound by
        # the Merkle commitment and ignored by every consumer.
        if C > hasher.HASH_OUT and C % hasher.RATE:
            pad = hasher.RATE - C % hasher.RATE
            leaves_cols = jnp.concatenate(
                [leaves_cols, jnp.zeros((pad, L), dtype=leaves_cols.dtype)],
                axis=0)
        levels = list(_merkle_levels(leaves_cols, cap_height, hasher))
        return MerkleTree(leaves=leaves_cols, cap_height=cap_height,
                          levels=levels, hasher=hasher)

    @staticmethod
    def build(leaves, cap_height: int, hasher=poseidon) -> "MerkleTree":
        """leaves: [L, C] — one leaf per row (row-layout convenience)."""
        return MerkleTree.build_cols(leaves.T, cap_height, hasher)

    @property
    def cap(self):
        """Device cap array [2^cap_height, 4]."""
        return self.levels[-1].T

    _cap_host_cache: list | None = None

    def cap_host(self) -> list[list[int]]:
        if self._cap_host_cache is None:
            self._cap_host_cache = [[int(x) for x in row]
                                    for row in np.asarray(self.cap)]
        return self._cap_host_cache

    def _materialize(self):
        if self._host_levels is None:
            self._host_levels = [np.asarray(l) for l in self.levels]
            self._host_leaves = np.asarray(self.leaves)

    def open(self, index: int):
        """-> (leaf_values: list[int], siblings: list[4-elem digests]).

        Host-side single opening; materializes the whole tree.  For the
        prover's query phase use `open_many` (batched device gather, one
        transfer)."""
        self._materialize()
        leaf = [int(x) for x in self._host_leaves[:, index]]
        siblings = []
        idx = index
        # levels[-1] is the cap: stop before it.
        for lvl in self._host_levels[:-1]:
            sib = [int(x) for x in lvl[:, idx ^ 1]]
            siblings.append(sib)
            idx >>= 1
        return leaf, siblings

    def open_many(self, indices):
        """Batched openings: [Q] indices -> (leaves [Q, C], sibs [Q, D, 4])
        as host numpy arrays, via one jitted device gather + one transfer."""
        idx = jnp.asarray(np.asarray(indices, dtype=np.int64))
        out = _gather_openings(self.leaves, tuple(self.levels[:-1]), idx)
        return jax.device_get(out)


@jax.jit
def _gather_openings(leaves_cols, levels, idx):
    lv = jnp.take(leaves_cols, idx, axis=1).T                  # [Q, C]
    sibs = []
    cur = idx
    for l in levels:
        sibs.append(jnp.take(l, cur ^ 1, axis=1).T)            # [Q, 4]
        cur = cur >> 1
    if sibs:
        sib_arr = jnp.stack(sibs, axis=1)                      # [Q, D, 4]
    else:
        sib_arr = jnp.zeros((idx.shape[0], 0, poseidon.HASH_OUT),
                            dtype=leaves_cols.dtype)
    return lv, sib_arr


def verify_merkle_proof_s(leaf_values: list[int], index: int, cap: list[list[int]],
                          siblings: list[list[int]], hasher=poseidon) -> bool:
    """Scalar verification: recompute the path and compare the cap entry."""
    h = hasher.hash_or_noop_s(leaf_values)
    idx = index
    for sib in siblings:
        if idx & 1:
            h = hasher.two_to_one_s(sib, h)
        else:
            h = hasher.two_to_one_s(h, sib)
        idx >>= 1
    return h == list(cap[idx])
