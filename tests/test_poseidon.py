"""Poseidon permutation + sponge: batched device path vs scalar reference."""
import random

import jax
import jax.numpy as jnp

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import poseidon as ps

RNG = random.Random(0xBEEF)


def rand_state():
    return [RNG.randrange(gl.P) for _ in range(ps.WIDTH)]


def test_permute_batch_matches_scalar():
    states = [rand_state() for _ in range(32)] + [[0] * 12, [gl.P - 1] * 12]
    arr = gl.to_u64(states)
    out = jax.jit(ps.permute)(arr)
    got = gl.batch_to_int(out)
    for i, s in enumerate(states):
        want = ps.permute_s(s)
        assert got[12 * i: 12 * (i + 1)] == want, i


def test_permute_not_identity_and_diffuses():
    s0 = [0] * 12
    s1 = [1] + [0] * 11
    o0 = ps.permute_s(s0)
    o1 = ps.permute_s(s1)
    assert o0 != s0
    # Full diffusion: flipping one input lane changes every output lane.
    assert all(a != b for a, b in zip(o0, o1))


def test_mds_invertible():
    # Cauchy matrix must be nonsingular: Gaussian elimination mod p.
    m = [row[:] for row in ps.MDS]
    n = len(m)
    for col in range(n):
        piv = next((r for r in range(col, n) if m[r][col] != 0), None)
        assert piv is not None, "MDS singular"
        m[col], m[piv] = m[piv], m[col]
        inv = gl.inv_s(m[col][col])
        m[col] = [(x * inv) % gl.P for x in m[col]]
        for r in range(n):
            if r != col and m[r][col]:
                f = m[r][col]
                m[r] = [(a - f * b) % gl.P for a, b in zip(m[r], m[col])]
    assert all(m[i][i] == 1 for i in range(n))


def test_sponge_hash_no_pad_matches_scalar():
    for L in [1, 4, 7, 8, 9, 12, 16, 25]:
        batch = [[RNG.randrange(gl.P) for _ in range(L)] for _ in range(4)]
        arr = gl.to_u64(batch)
        out = gl.batch_to_int(ps.hash_no_pad(arr))
        for i, ins in enumerate(batch):
            assert out[4 * i: 4 * (i + 1)] == ps.hash_no_pad_s(ins), (L, i)


def test_two_to_one_matches():
    x = [RNG.randrange(gl.P) for _ in range(4)]
    y = [RNG.randrange(gl.P) for _ in range(4)]
    want = ps.two_to_one_s(x, y)
    got = gl.batch_to_int(ps.two_to_one(gl.to_u64([x]), gl.to_u64([y])))
    assert got == want
    # two_to_one == first 4 of permute([x|y|0000])
    assert want == ps.permute_s(x + y + [0, 0, 0, 0])[:4]


def test_hash_pad_layout():
    # 9 inputs pad to [e0..e8, 1, 0, 1] — the reference SMT leaf layout
    # (/root/reference/src/smt/gadgets/common.rs:87-101: ones at 8, 9, 11).
    ins = [RNG.randrange(gl.P) for _ in range(9)]
    padded = ps.pad_inputs(ins)
    assert len(padded) == 12
    assert padded[:9] == ins and padded[9] == 1 and padded[10] == 0 and padded[11] == 1
    assert ps.hash_pad_s(ins) == ps.hash_no_pad_s(padded)


def test_hash_or_noop():
    short = [5, 6]
    assert ps.hash_or_noop_s(short) == [5, 6, 0, 0]
    long = [RNG.randrange(gl.P) for _ in range(5)]
    assert ps.hash_or_noop_s(long) == ps.hash_no_pad_s(long)
    got = gl.batch_to_int(ps.hash_or_noop(gl.to_u64([long])))
    assert got == ps.hash_no_pad_s(long)


def test_squeeze_multiple_blocks():
    ins = [RNG.randrange(gl.P) for _ in range(10)]
    out12 = ps.hash_n_to_m_no_pad_s(ins, 12)
    out4 = ps.hash_n_to_m_no_pad_s(ins, 4)
    assert out12[:4] == out4
    got = gl.batch_to_int(ps.hash_no_pad(gl.to_u64([ins]), num_outputs=12))
    assert got == out12


def test_cols_layout_matches_row_layout():
    # lanes-first (prover Merkle path) must agree with lanes-last + scalar
    arr = gl.to_u64([rand_state() for _ in range(9)])        # [9, 12]
    a = jax.jit(ps.permute)(arr)
    b = jax.jit(ps.permute_cols)(arr.T).T
    assert gl.batch_to_int(a) == gl.batch_to_int(b)

    for L in [3, 4, 8, 9, 17, 25]:
        batch = [[RNG.randrange(gl.P) for _ in range(L)] for _ in range(5)]
        cols = gl.to_u64(batch).T                            # [L, 5]
        out = gl.batch_to_int(ps.hash_or_noop_cols(cols).T)
        for i, ins in enumerate(batch):
            assert out[4 * i: 4 * (i + 1)] == ps.hash_or_noop_s(ins), (L, i)

    x = gl.to_u64([[RNG.randrange(gl.P) for _ in range(4)] for _ in range(6)])
    y = gl.to_u64([[RNG.randrange(gl.P) for _ in range(4)] for _ in range(6)])
    got = gl.batch_to_int(ps.two_to_one_cols(x.T, y.T).T)
    for i in range(6):
        want = ps.two_to_one_s([int(v) for v in x[i]], [int(v) for v in y[i]])
        assert got[4 * i: 4 * (i + 1)] == want, i
