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

**Constants.**  The round constants of the reference's plonky2 *fork* are
not recoverable in this offline environment (the fork is neither vendored
nor fetchable, and no Rust toolchain exists here — see README).  They are
therefore *parameters*: this module generates a deterministic SHA-256
counter-mode set.  The MDS matrix uses plonky2's exact *structure* — the
small-entry circulant MDS_MATRIX_CIRC/[0]-diagonal of its Goldilocks
Poseidon (consumed at /root/reference/src/smt/goldilocks_poseidon/
mod.rs:162-184) — so the parity delta is round-constants-only, and the
small entries enable a fast MDS layer: per lane, 12 u32-half products
accumulated exactly in u64 and reduced once (vs 144 full Goldilocks muls).
Drop the fork's tables into `poseidon_constants.json` next to this file to
get bit-exact parity; every downstream component (Merkle, transcript, FRI,
gates) reads them from here.

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


# plonky2's Goldilocks-Poseidon MDS: row r of the matrix is the circulant
# shift M[r][j] = CIRC[(j - r) mod 12], plus DIAG[r] on the diagonal.
MDS_CIRC = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
MDS_DIAG = [8] + [0] * 11


def _circulant_mds() -> list[list[int]]:
    return [[MDS_CIRC[(j - i) % WIDTH] + (MDS_DIAG[i] if i == j else 0)
             for j in range(WIDTH)] for i in range(WIDTH)]


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
    return rc, _circulant_mds()


ROUND_CONSTANTS, MDS = _load_constants()

_RC_DEV = gl.to_u64(ROUND_CONSTANTS)        # [30, 12]
_MDS_DEV = gl.to_u64(MDS)                   # [12, 12]
# Fast MDS path requires sum_j M[i][j] * 2^32 to stay well under 2^64;
# entries < 2^20 give a 2^56 bound on each accumulated column half.
_MDS_SMALL = max(max(row) for row in MDS) < (1 << 20)


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


def _mds_reduce_small(acc_lo, acc_hi):
    """Reduce acc_lo + acc_hi*2^32 (both < 2^56) mod p, to canonical form."""
    hi1 = acc_hi >> gl._S32                       # < 2^24
    hi0 = acc_hi & gl._M32
    d = acc_lo + hi1 * gl._EPS                    # < 2^57: no wrap
    t = d + (hi0 << gl._S32)                      # may wrap once
    t = t + jnp.where(t < d, gl._EPS, gl._ZERO)   # wrapped => t small: no re-wrap
    return jnp.where(t >= gl._P, t - gl._P, t)


def _mds_layer(s):
    """MDS layer on lanes-last states [..., 12]."""
    if _MDS_SMALL:
        # Small-entry fast path: per output lane, 12 exact u64 products of
        # each 32-bit input half, one reduction at the end.
        s_lo = s & gl._M32
        s_hi = s >> gl._S32
        acc_lo = jnp.sum(s_lo[..., None, :] * _MDS_DEV, axis=-1)
        acc_hi = jnp.sum(s_hi[..., None, :] * _MDS_DEV, axis=-1)
        return _mds_reduce_small(acc_lo, acc_hi)
    # generic path (injected large-entry MDS): full Goldilocks muls
    prod = gl.mul(s[..., None, :], _MDS_DEV)
    acc = prod[..., 0]
    for j in range(1, WIDTH):
        acc = gl.add(acc, prod[..., j])
    return acc


def mds_cols(s):
    """MDS layer on lanes-first states [12, ...] (prover gate layout)."""
    if _MDS_SMALL:
        mds = _MDS_DEV.reshape((WIDTH, WIDTH) + (1,) * (s.ndim - 1))
        s_lo = (s & gl._M32)[None]
        s_hi = (s >> gl._S32)[None]
        return _mds_reduce_small(jnp.sum(s_lo * mds, axis=1),
                                 jnp.sum(s_hi * mds, axis=1))
    prod = gl.mul(_MDS_DEV.reshape((WIDTH, WIDTH) + (1,) * (s.ndim - 1)), s[None])
    acc = prod[:, 0]
    for j in range(1, WIDTH):
        acc = gl.add(acc, prod[:, j])
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


def permute_cols(s):
    """Poseidon permutation in lanes-first layout: s [12, B] -> [12, B].

    TPU layout note: with the batch on the *minor* axis every elementwise
    op runs at full 128-lane VPU width; the [B, 12] layout leaves 116 of
    128 lanes idle per tile.  This is the prover-side hot variant (Merkle
    leaf hashing, PoW grind).

    On TPU, wide batches dispatch to the VMEM-resident Pallas kernel
    (`pallas_poseidon`): all 30 rounds on-chip, one HBM read + write."""
    if s.ndim == 2 and s.shape[1] >= 512:
        from . import pallas_poseidon
        if pallas_poseidon.use_pallas():
            return pallas_poseidon.permute_cols_pallas(s)
    r = 0
    for _ in range(FULL_ROUNDS // 2):
        s = gl.add(s, _RC_DEV[r][:, None])
        s = mds_cols(_sbox(s))
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        s = gl.add(s, _RC_DEV[r][:, None])
        s = jnp.concatenate([_sbox(s[:1]), s[1:]], axis=0)
        s = mds_cols(s)
        r += 1
    for _ in range(FULL_ROUNDS // 2):
        s = gl.add(s, _RC_DEV[r][:, None])
        s = mds_cols(_sbox(s))
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


# ------------------------------------------------------------------
# Sponge — lanes-first ("cols") layout: [C, B] inputs, [4, B] digests.
# The layout the prover uses for Merkle commits: polynomial oracles are
# already [num_polys, N], so leaf hashing needs no transpose and every op
# is full-VPU-width (see permute_cols).
# ------------------------------------------------------------------

def hash_no_pad_cols(inputs, num_outputs: int = HASH_OUT):
    """inputs [L, B] -> [num_outputs, B].

    Full-rate chunks absorb under one lax.scan (the permutation is traced
    once however wide the oracle — keeps compile time flat), the final
    partial chunk absorbs explicitly."""
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
    """x, y [4, B] -> [4, B]."""
    z = jnp.zeros((WIDTH - 2 * HASH_OUT, x.shape[1]), dtype=gl.DTYPE)
    return permute_cols(jnp.concatenate([x, y, z], axis=0))[:HASH_OUT]


def hash_or_noop_cols(inputs):
    L = inputs.shape[0]
    if L <= HASH_OUT:
        pad = jnp.zeros((HASH_OUT - L, inputs.shape[1]), dtype=gl.DTYPE)
        return jnp.concatenate([inputs, pad], axis=0)
    return hash_no_pad_cols(inputs)
