"""Poseidon2: permutation/sponge consistency + in-circuit oracle tests."""

import random

import jax.numpy as jnp
import numpy as np

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import poseidon, poseidon2 as p2
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig

RNG = random.Random(0xB052)


def rand_state():
    return [RNG.randrange(gl.P) for _ in range(p2.WIDTH)]


def test_scalar_vs_batched_permute():
    states = [rand_state() for _ in range(5)]
    dev = p2.permute(gl.to_u64(states))
    host = [p2.permute_s(s) for s in states]
    assert [[int(x) for x in row] for row in np.asarray(dev)] == host


def test_external_matrix_is_mds_like_structure():
    # M_E = kron(J3+I3, M4): row sums per 4-block follow the 2/1 pattern
    for bi in range(3):
        for bj in range(3):
            blk = [[p2.M_E[4 * bi + i][4 * bj + j] for j in range(4)]
                   for i in range(4)]
            coeff = 2 if bi == bj else 1
            assert blk == [[coeff * v % gl.P for v in row]
                           for row in p2._M4]


def test_internal_matrix_shape():
    s = rand_state()
    out = p2._matmul_s(p2.M_I, s)
    total = sum(s) % gl.P
    for i in range(p2.WIDTH):
        assert out[i] == (total + p2.INTERNAL_DIAG[i] * s[i]) % gl.P


def test_sponge_matches_poseidon_semantics():
    # same overwrite-mode sponge; differs only in the permutation
    inputs = [RNG.randrange(gl.P) for _ in range(9)]
    assert p2.pad_inputs(inputs) == poseidon.pad_inputs(inputs)
    assert len(p2.hash_no_pad_s(inputs)) == 4
    assert p2.hash_pad_s(inputs) != poseidon.hash_pad_s(inputs)
    # batched vs scalar sponge
    rows = [[RNG.randrange(gl.P) for _ in range(11)] for _ in range(4)]
    dev = p2.hash_no_pad(gl.to_u64(rows))
    host = [p2.hash_no_pad_s(r) for r in rows]
    assert [[int(x) for x in row] for row in np.asarray(dev)] == host


def test_permutation_differs_from_poseidon():
    s = rand_state()
    assert p2.permute_s(s) != poseidon.permute_s(s)


def test_poseidon2_circuit_oracle():
    """two_to_one in a poseidon2-config circuit == host two_to_one_s."""
    cfg = CircuitConfig.test_config()
    cfg = type(cfg)(num_wires=cfg.num_wires,
                    num_routed_wires=cfg.num_routed_wires,
                    num_constants=cfg.num_constants,
                    num_challenges=cfg.num_challenges,
                    security_bits=cfg.security_bits,
                    max_quotient_degree_factor=cfg.max_quotient_degree_factor,
                    fri=cfg.fri, algebraic_hasher="poseidon2")
    b = CircuitBuilder(cfg)
    x = b.add_virtual_targets(4)
    y = b.add_virtual_targets(4)
    out = b.two_to_one(x, y)
    b.register_public_inputs(out)
    data = b.build()

    xv = [RNG.randrange(gl.P) for _ in range(4)]
    yv = [RNG.randrange(gl.P) for _ in range(4)]
    inputs = dict(zip(x + y, xv + yv))
    proof = data.prove(inputs)
    data.verify(proof)
    assert proof.public_inputs == p2.two_to_one_s(xv, yv)
