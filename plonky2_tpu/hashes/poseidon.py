"""Poseidon permutation + sponge over Goldilocks, width 12.

Parameters mirror plonky2's Goldilocks Poseidon: t = 12, RATE = 8, alpha = 7,
8 full rounds (4 + 4) and 22 partial rounds.  Sponge semantics mirror the
plonky2 `PlonkyPermutation` consumed by the reference
(/root/reference/src/smt/goldilocks_poseidon/mod.rs:162-184):

* `hash_n_to_m_no_pad`: absorb input in chunks of RATE=8, each chunk
  *overwriting* state[0..len(chunk)], permuting after every chunk; squeeze
  8 elements per permutation.
* `hash_pad`: append 1, pad zeros until (len+1) % 12 == 0, append 1
  (so 9 inputs -> [e0..e8, 1, 0, 1], the "ones at 8, 9, 11" leaf layout of
  /root/reference/src/smt/gadgets/common.rs:87-101).
* `two_to_one(x, y)` = first 4 outputs of permute([x, y, 0, 0, 0, 0]).

**Constants.**  The round constants / MDS matrix of the reference's plonky2
*fork* are not recoverable in this offline environment (the fork is neither
vendored nor fetchable, and no Rust toolchain exists here — see README).
They are therefore *parameters*: this module generates a deterministic,
structurally identical set (SHA-256 counter-mode round constants; Cauchy MDS,
provably maximal-distance-separable).  Drop the fork's tables into
`poseidon_constants.json` next to this file to get bit-exact parity; every
downstream component (Merkle, transcript, FRI, gates) reads them from here.

Two implementations, tested against each other:
* scalar (Python ints) for the host transcript/verifier,
* batched jnp (`permute(states[..., 12])`) for device Merkle/witness paths.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from ..field import gl

WIDTH = 12
RATE = 8
FULL_ROUNDS = 8          # 4 + 4
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
ALPHA = 7
HASH_OUT = 4             # elements per digest ("HashOut")


# ------------------------------------------------------------------
# Constant generation (deterministic, swappable)
# ------------------------------------------------------------------

def _prg_field_elems(tag: str, n: int) -> list[int]:
    """n field elements < p from SHA-256(tag || counter), rejection-sampled."""
    out: list[int] = []
    ctr = 0
    while len(out) < n:
        h = hashlib.sha256(f"{tag}/{ctr}".encode()).digest()
        ctr += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off:off + 8], "little")
            if v < gl.P and len(out) < n:
                out.append(v)
    return out


def _cauchy_mds(t: int) -> list[list[int]]:
    """MDS matrix M[i][j] = 1 / (x_i + y_j) with x_i = i, y_j = t + j.

    All x_i + y_j are distinct-per-row/col and nonzero => Cauchy => MDS.
    """
    return [[gl.inv_s((i + t + j) % gl.P) for j in range(t)] for i in range(t)]


def _load_constants():
    path = os.path.join(os.path.dirname(__file__), "poseidon_constants.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        rc = [[int(x) for x in row] for row in data["round_constants"]]
        mds = [[int(x) for x in row] for row in data["mds"]]
        assert len(rc) == N_ROUNDS and all(len(r) == WIDTH for r in rc)
        assert len(mds) == WIDTH and all(len(r) == WIDTH for r in mds)
        return rc, mds
    flat = _prg_field_elems("plonky2_tpu/poseidon/rc/v1", N_ROUNDS * WIDTH)
    rc = [flat[r * WIDTH:(r + 1) * WIDTH] for r in range(N_ROUNDS)]
    return rc, _cauchy_mds(WIDTH)


ROUND_CONSTANTS, MDS = _load_constants()

_RC_DEV = gl.to_u64(ROUND_CONSTANTS)        # [30, 12]
_MDS_DEV = gl.to_u64(MDS)                   # [12, 12]


# ------------------------------------------------------------------
# Scalar permutation (Python ints)
# ------------------------------------------------------------------

def _sbox_s(x: int) -> int:
    x2 = (x * x) % gl.P
    x3 = (x2 * x) % gl.P
    return (x3 * x3 % gl.P) * x % gl.P


def _mds_s(state: list[int]) -> list[int]:
    return [sum(MDS[i][j] * state[j] for j in range(WIDTH)) % gl.P
            for i in range(WIDTH)]


def permute_s(state: list[int]) -> list[int]:
    """Scalar Poseidon permutation on 12 Python ints."""
    assert len(state) == WIDTH
    s = list(state)
    r = 0
    for _ in range(FULL_ROUNDS // 2):
        s = [(x + c) % gl.P for x, c in zip(s, ROUND_CONSTANTS[r])]
        s = _mds_s([_sbox_s(x) for x in s])
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        s = [(x + c) % gl.P for x, c in zip(s, ROUND_CONSTANTS[r])]
        s[0] = _sbox_s(s[0])
        s = _mds_s(s)
        r += 1
    for _ in range(FULL_ROUNDS // 2):
        s = [(x + c) % gl.P for x, c in zip(s, ROUND_CONSTANTS[r])]
        s = _mds_s([_sbox_s(x) for x in s])
        r += 1
    return s


# ------------------------------------------------------------------
# Batched device permutation (jnp, shape [..., 12])
# ------------------------------------------------------------------

def _sbox(x):
    x3 = gl.mul(gl.sqr(x), x)
    return gl.mul(gl.sqr(x3), x)


def _mds_layer(s):
    # prod[..., i, j] = MDS[i][j] * s[..., j]; then mod-sum over j.
    prod = gl.mul(s[..., None, :], _MDS_DEV)
    acc = prod[..., 0]
    for j in range(1, WIDTH):
        acc = gl.add(acc, prod[..., j])
    return acc


def permute(states):
    """Batched Poseidon permutation; states [..., 12] u64."""
    s = states
    r = 0
    for _ in range(FULL_ROUNDS // 2):
        s = gl.add(s, _RC_DEV[r])
        s = _mds_layer(_sbox(s))
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        s = gl.add(s, _RC_DEV[r])
        s = jnp.concatenate([_sbox(s[..., :1]), s[..., 1:]], axis=-1)
        s = _mds_layer(s)
        r += 1
    for _ in range(FULL_ROUNDS // 2):
        s = gl.add(s, _RC_DEV[r])
        s = _mds_layer(_sbox(s))
        r += 1
    return s


# ------------------------------------------------------------------
# Sponge — scalar
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


def pad_inputs(inputs: list[int]) -> list[int]:
    padded = list(inputs) + [1]
    while (len(padded) + 1) % WIDTH != 0:
        padded.append(0)
    padded.append(1)
    return padded


def hash_pad_s(inputs: list[int]) -> list[int]:
    return hash_no_pad_s(pad_inputs(inputs))


def two_to_one_s(x: list[int], y: list[int]) -> list[int]:
    assert len(x) == HASH_OUT and len(y) == HASH_OUT
    return permute_s(list(x) + list(y) + [0] * (WIDTH - 2 * HASH_OUT))[:HASH_OUT]


def hash_or_noop_s(inputs: list[int]) -> list[int]:
    if len(inputs) <= HASH_OUT:
        return list(inputs) + [0] * (HASH_OUT - len(inputs))
    return hash_no_pad_s(inputs)


# ------------------------------------------------------------------
# Sponge — batched (static input length L, leading batch dims)
# ------------------------------------------------------------------

def hash_no_pad(inputs, num_outputs: int = HASH_OUT):
    """Batched sponge: inputs [..., L] -> [..., num_outputs].

    The absorb loop is a lax.scan over rate-sized chunks so the permutation
    is traced once regardless of input length (keeps prover graphs small).
    """
    import jax

    L = inputs.shape[-1]
    batch = inputs.shape[:-1]
    n_chunks = -(-L // RATE)
    pad = n_chunks * RATE - L
    padded = jnp.concatenate(
        [inputs, jnp.zeros((*batch, pad), dtype=gl.DTYPE)], axis=-1) if pad \
        else inputs
    # [n_chunks, ..., RATE] then widen to WIDTH with zeros for masking
    chunks = jnp.moveaxis(padded.reshape(*batch, n_chunks, RATE), -2, 0)
    chunks = jnp.concatenate(
        [chunks, jnp.zeros((n_chunks, *batch, WIDTH - RATE), dtype=gl.DTYPE)],
        axis=-1)
    # mask[k][i]: lane i is overwritten by chunk k (only last chunk partial)
    mask = np.zeros((n_chunks, WIDTH), dtype=bool)
    for k in range(n_chunks):
        c = min(RATE, L - k * RATE)
        mask[k, :c] = True
    mask = jnp.asarray(mask.reshape(n_chunks, *(1,) * len(batch), WIDTH))

    state = jnp.zeros((*batch, WIDTH), dtype=gl.DTYPE)

    def step(state, xs):
        chunk, m = xs
        state = jnp.where(m, chunk, state)
        return permute(state), None

    state, _ = jax.lax.scan(step, state, (chunks, mask))
    outs = [state[..., :RATE]]
    have = RATE
    while have < num_outputs:
        state = permute(state)
        outs.append(state[..., :RATE])
        have += RATE
    return jnp.concatenate(outs, axis=-1)[..., :num_outputs]


def two_to_one(x, y):
    """Batched compress: x, y [..., 4] -> [..., 4]."""
    z = jnp.zeros((*x.shape[:-1], WIDTH - 2 * HASH_OUT), dtype=gl.DTYPE)
    return permute(jnp.concatenate([x, y, z], axis=-1))[..., :HASH_OUT]


def hash_or_noop(inputs):
    L = inputs.shape[-1]
    if L <= HASH_OUT:
        pad = jnp.zeros((*inputs.shape[:-1], HASH_OUT - L), dtype=gl.DTYPE)
        return jnp.concatenate([inputs, pad], axis=-1)
    return hash_no_pad(inputs)
