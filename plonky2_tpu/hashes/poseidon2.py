"""Poseidon2 permutation + sponge over Goldilocks, width 12.

The permutation follows the Poseidon2 structure (Grassi-Khovratovich-
Schofnegger, as shipped in the plonky2 fork the reference whitelists via
`Poseidon2Gate` — /root/reference/src/ecdsa/gadgets/ecdsa.rs:85-87):

* initial external matrix M_E applied to the input state,
* 4 external rounds: add RC to every lane, x^7 s-box on every lane, M_E,
* 22 internal rounds: add RC to lane 0, s-box lane 0 only, internal
  matrix M_I,
* 4 external rounds.

M_E = kron(J3 + I3, M4) with the standard M4 circulant block
[[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]; M_I = diag(mu) + J12 (each lane
gets mu_i * x_i plus the state sum).  Both are materialized as dense 12x12
matrices so the batched device path is the same broadcast-mul + tree-add as
Poseidon's MDS.

**Constants.**  Same policy as poseidon.py: the fork's tables are not
recoverable offline, so deterministic SHA-256 counter-mode constants are
generated; drop the fork's tables into `poseidon2_constants.json` (keys:
external_rcs [8][12], internal_rcs [22], internal_diag [12]) for bit-exact
parity.  Sponge semantics (overwrite-mode, RATE 8, hash_pad to a multiple
of WIDTH) are identical to poseidon.py.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

from ..field import gl
from .poseidon import _prg_field_elems  # deterministic PRG, same policy

WIDTH = 12
RATE = 8
HASH_OUT = 4
EXTERNAL_ROUNDS = 8      # 4 + 4
INTERNAL_ROUNDS = 22
ALPHA = 7

_M4 = [[5, 7, 1, 3],
       [4, 6, 1, 1],
       [1, 3, 5, 7],
       [1, 1, 4, 6]]


def _external_matrix() -> list[list[int]]:
    """kron(J3 + I3, M4): chunk-local M4 plus the M4 of the chunk sums."""
    me = [[0] * WIDTH for _ in range(WIDTH)]
    for bi in range(3):
        for bj in range(3):
            coeff = 2 if bi == bj else 1
            for i in range(4):
                for j in range(4):
                    me[4 * bi + i][4 * bj + j] = coeff * _M4[i][j] % gl.P
    return me


def _internal_matrix(diag: list[int]) -> list[list[int]]:
    mi = [[1] * WIDTH for _ in range(WIDTH)]
    for i in range(WIDTH):
        mi[i][i] = (1 + diag[i]) % gl.P
    return mi


def _load_constants():
    path = os.path.join(os.path.dirname(__file__), "poseidon2_constants.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        ext_rcs = [[int(x) for x in row] for row in data["external_rcs"]]
        int_rcs = [int(x) for x in data["internal_rcs"]]
        diag = [int(x) for x in data["internal_diag"]]
        assert len(ext_rcs) == EXTERNAL_ROUNDS
        assert len(int_rcs) == INTERNAL_ROUNDS and len(diag) == WIDTH
        return ext_rcs, int_rcs, diag
    flat = _prg_field_elems("plonky2_tpu/poseidon2/rc/v1",
                            EXTERNAL_ROUNDS * WIDTH + INTERNAL_ROUNDS + WIDTH)
    ext_rcs = [flat[r * WIDTH:(r + 1) * WIDTH]
               for r in range(EXTERNAL_ROUNDS)]
    rest = flat[EXTERNAL_ROUNDS * WIDTH:]
    return ext_rcs, rest[:INTERNAL_ROUNDS], rest[INTERNAL_ROUNDS:]


EXTERNAL_RCS, INTERNAL_RCS, INTERNAL_DIAG = _load_constants()
M_E = _external_matrix()
M_I = _internal_matrix(INTERNAL_DIAG)

_ME_DEV = gl.to_u64(M_E)
_MI_DEV = gl.to_u64(M_I)
_ERC_DEV = gl.to_u64(EXTERNAL_RCS)
_IRC_DEV = gl.to_u64(INTERNAL_RCS)


# ------------------------------------------------------------------
# Scalar permutation
# ------------------------------------------------------------------

def _sbox_s(x: int) -> int:
    x3 = x * x % gl.P * x % gl.P
    return x3 * x3 % gl.P * x % gl.P


def _matmul_s(m, state):
    return [sum(m[i][j] * state[j] for j in range(WIDTH)) % gl.P
            for i in range(WIDTH)]


def permute_s(state: list[int]) -> list[int]:
    assert len(state) == WIDTH
    s = _matmul_s(M_E, state)
    for r in range(EXTERNAL_ROUNDS // 2):
        s = [_sbox_s((x + c) % gl.P) for x, c in zip(s, EXTERNAL_RCS[r])]
        s = _matmul_s(M_E, s)
    for r in range(INTERNAL_ROUNDS):
        s[0] = _sbox_s((s[0] + INTERNAL_RCS[r]) % gl.P)
        s = _matmul_s(M_I, s)
    for r in range(EXTERNAL_ROUNDS // 2, EXTERNAL_ROUNDS):
        s = [_sbox_s((x + c) % gl.P) for x, c in zip(s, EXTERNAL_RCS[r])]
        s = _matmul_s(M_E, s)
    return s


# ------------------------------------------------------------------
# Batched device permutation ([..., 12] u64)
# ------------------------------------------------------------------

def _sbox(x):
    x3 = gl.mul(gl.sqr(x), x)
    return gl.mul(gl.sqr(x3), x)


def _matmul(m_dev, s):
    """s: [..., 12] -> [..., 12]."""
    prod = gl.mul(m_dev, s[..., None, :])        # [..., 12, 12]
    acc = prod[..., 0]
    for j in range(1, WIDTH):
        acc = gl.add(acc, prod[..., j])
    return acc


def permute(states):
    s = _matmul(_ME_DEV, states)
    for r in range(EXTERNAL_ROUNDS // 2):
        s = _matmul(_ME_DEV, _sbox(gl.add(s, _ERC_DEV[r])))
    for r in range(INTERNAL_ROUNDS):
        lane0 = _sbox(gl.add(s[..., 0], _IRC_DEV[r]))
        s = jnp.concatenate([lane0[..., None], s[..., 1:]], axis=-1)
        s = _matmul(_MI_DEV, s)
    for r in range(EXTERNAL_ROUNDS // 2, EXTERNAL_ROUNDS):
        s = _matmul(_ME_DEV, _sbox(gl.add(s, _ERC_DEV[r])))
    return s


# ------------------------------------------------------------------
# Sponge (identical semantics to poseidon.py)
# ------------------------------------------------------------------

def hash_n_to_m_no_pad_s(inputs: list[int], num_outputs: int = HASH_OUT) -> list[int]:
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i:i + RATE]
        state[:len(chunk)] = chunk
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
    while (len(padded) + 1) % WIDTH:
        padded.append(0)
    return padded + [1]


def hash_pad_s(inputs: list[int]) -> list[int]:
    return hash_no_pad_s(pad_inputs(inputs))


def two_to_one_s(x: list[int], y: list[int]) -> list[int]:
    state = list(x) + list(y) + [0] * (WIDTH - 2 * HASH_OUT)
    return permute_s(state)[:HASH_OUT]


def hash_or_noop_s(inputs: list[int]) -> list[int]:
    if len(inputs) <= HASH_OUT:
        return list(inputs) + [0] * (HASH_OUT - len(inputs))
    return hash_no_pad_s(inputs)


# ---- batched sponge over rows ----

def hash_no_pad(inputs, num_outputs: int = HASH_OUT):
    """inputs: [L, C] u64 -> [L, num_outputs]."""
    L, C = inputs.shape
    state = jnp.zeros((L, WIDTH), dtype=inputs.dtype)
    for i in range(0, C, RATE):
        chunk = inputs[:, i:i + RATE]
        state = state.at[:, :chunk.shape[1]].set(chunk)
        state = permute(state)
    outs = [state[:, :RATE]]
    have = RATE
    while have < num_outputs:
        state = permute(state)
        outs.append(state[:, :RATE])
        have += RATE
    return jnp.concatenate(outs, axis=1)[:, :num_outputs]


def two_to_one(x, y):
    L = x.shape[0]
    z = jnp.zeros((L, WIDTH - 2 * HASH_OUT), dtype=x.dtype)
    return permute(jnp.concatenate([x, y, z], axis=1))[:, :HASH_OUT]


def hash_or_noop(inputs):
    L, C = inputs.shape
    if C <= HASH_OUT:
        pad = jnp.zeros((L, HASH_OUT - C), dtype=inputs.dtype)
        return jnp.concatenate([inputs, pad], axis=1)
    return hash_no_pad(inputs)
