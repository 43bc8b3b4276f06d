"""Keccak-based transcript/Merkle hasher — the KeccakGoldilocksConfig slot.

The reference proves keccak circuits under `KeccakGoldilocksConfig`
(/root/reference/src/hash/keccak256.rs:187,281): Keccak as the *outer*
hasher (Merkle caps + Fiat-Shamir transcript) with Poseidon still the
in-circuit hasher.  Mirroring plonky2's KeccakPermutation — which is a
strong PRF over the sponge state rather than a bit-permutation — the state
transform here is:

    state12  ->  first 12 lanes of keccak-f1600(state12 || 13 zero lanes),
                 each lane reduced mod p,

with the same width-12 / rate-8 / 4-element-digest sponge discipline as
the Poseidon config (hashes/poseidon.py), so Challenger / MerkleTree /
FRI logic is hasher-generic.  Self-consistent prover/verifier (bit-exact
parity with the Rust fork is blocked for the same reasons as Poseidon —
see README conformance note).

Scalar + device (lanes-first) implementations, tested against each other.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..gadgets import keccak as _kk

WIDTH = 12
RATE = 8
HASH_OUT = 4
LANES = 25


# ------------------------------------------------------------------
# scalar
# ------------------------------------------------------------------

def permute_s(state: list[int]) -> list[int]:
    assert len(state) == WIDTH
    lanes = [int(x) & 0xFFFFFFFFFFFFFFFF for x in state] + [0] * (LANES - WIDTH)
    out = _kk.keccak_f1600_host(lanes)
    return [v % gl.P for v in out[:WIDTH]]


# ------------------------------------------------------------------
# device: f1600 on [25, B] u64 lane arrays (bitops vectorize on the VPU)
# ------------------------------------------------------------------

_M64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x, n: int):
    n %= 64
    if n == 0:
        return x
    return (x << jnp.uint64(n)) | (x >> jnp.uint64(64 - n))


def _f1600_cols(lanes):
    """lanes [25, B] u64 -> [25, B] u64 (keccak-f[1600], 24 rounds).

    The round body is traced once under lax.scan (a 24x-unrolled body
    makes the per-tree Merkle kernels unaffordable to compile)."""
    import jax

    rndc = jnp.asarray(np.array(_kk.RNDC, dtype=np.uint64))

    def round_body(st, rc):
        s = [st[i] for i in range(LANES)]
        # theta
        c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20]
             for x in range(5)]
        d = [c[(x + 4) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        s = [s[i] ^ d[i % 5] for i in range(LANES)]
        # rho + pi:  b[y, 2x+3y] = rotl(a[x, y], r[x, y])
        b = [None] * LANES
        for yy in range(5):
            for xx in range(5):
                src = xx + 5 * yy
                dst = yy + 5 * ((2 * xx + 3 * yy) % 5)
                b[dst] = _rotl(s[src], _ROT[src])
        # chi
        s = [b[i] ^ ((~b[(i % 5 + 1) % 5 + 5 * (i // 5)] & _M64)
                     & b[(i % 5 + 2) % 5 + 5 * (i // 5)])
             for i in range(LANES)]
        # iota
        s[0] = s[0] ^ rc
        return jnp.stack(s, axis=0), None

    out, _ = jax.lax.scan(round_body, lanes, rndc)
    return out


# rotation offsets indexed by lane position x + 5y (standard Keccak table)
def _rot_table():
    rot = [0] * LANES
    x, y = 1, 0
    for t in range(24):
        rot[x + 5 * y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return rot


_ROT = _rot_table()


def permute_cols(state):
    """state [12, B] u64 -> [12, B]: f1600 over zero-extended lanes, first
    12 lanes reduced mod p."""
    B = state.shape[1]
    z = jnp.zeros((LANES - WIDTH, B), dtype=gl.DTYPE)
    lanes = jnp.concatenate([state, z], axis=0)
    out = _f1600_cols(lanes)[:WIDTH]
    # reduce mod p: out < 2^64, one conditional subtract suffices
    return jnp.where(out >= gl._P, out - gl._P, out)


def permute(states):
    """states [..., 12] -> [..., 12] (row-layout convenience)."""
    flat = states.reshape(-1, WIDTH).T
    return permute_cols(flat).T.reshape(states.shape)


# ------------------------------------------------------------------
# sponge API (same discipline as hashes/poseidon.py)
# ------------------------------------------------------------------

def hash_n_to_m_no_pad_s(inputs: list[int], num_outputs: int = HASH_OUT) -> list[int]:
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i:i + RATE]
        state[: len(chunk)] = chunk
        state = permute_s(state)
    outputs: list[int] = []
    while True:
        outputs.extend(state[:RATE])
        if len(outputs) >= num_outputs:
            return outputs[:num_outputs]
        state = permute_s(state)


def hash_no_pad_s(inputs: list[int]) -> list[int]:
    return hash_n_to_m_no_pad_s(inputs, HASH_OUT)


def two_to_one_s(x: list[int], y: list[int]) -> list[int]:
    assert len(x) == HASH_OUT and len(y) == HASH_OUT
    return permute_s(list(x) + list(y) + [0] * (WIDTH - 2 * HASH_OUT))[:HASH_OUT]


def hash_or_noop_s(inputs: list[int]) -> list[int]:
    if len(inputs) <= HASH_OUT:
        return list(inputs) + [0] * (HASH_OUT - len(inputs))
    return hash_no_pad_s(inputs)


def hash_no_pad_cols(inputs, num_outputs: int = HASH_OUT):
    import jax

    L, B = inputs.shape
    full = L // RATE
    rem = L - full * RATE
    state = jnp.zeros((WIDTH, B), dtype=gl.DTYPE)
    if full:
        chunks = inputs[:full * RATE].reshape(full, RATE, B)

        def step(st, chunk):
            st = jnp.concatenate([chunk, st[RATE:]], axis=0)
            return permute_cols(st), None

        state, _ = jax.lax.scan(step, state, chunks)
    if rem:
        state = jnp.concatenate([inputs[full * RATE:], state[rem:]], axis=0)
        state = permute_cols(state)
    outs = [state[:RATE]]
    have = RATE
    while have < num_outputs:
        state = permute_cols(state)
        outs.append(state[:RATE])
        have += RATE
    return jnp.concatenate(outs, axis=0)[:num_outputs]


def two_to_one_cols(x, y):
    z = jnp.zeros((WIDTH - 2 * HASH_OUT, x.shape[1]), dtype=gl.DTYPE)
    return permute_cols(jnp.concatenate([x, y, z], axis=0))[:HASH_OUT]


def hash_or_noop_cols(inputs):
    L = inputs.shape[0]
    if L <= HASH_OUT:
        pad = jnp.zeros((HASH_OUT - L, inputs.shape[1]), dtype=gl.DTYPE)
        return jnp.concatenate([inputs, pad], axis=0)
    return hash_no_pad_cols(inputs)
