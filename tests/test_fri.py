"""Standalone FRI: prove/verify low-degreeness of a committed polynomial."""
import random

import pytest

from plonky2_tpu.field import ext, gl
from plonky2_tpu.fri import FriConfig, fri_prove, fri_verify
from plonky2_tpu.merkle import MerkleTree
from plonky2_tpu.ntt import COSET_SHIFT
from plonky2_tpu.ntt.ntt import coset_lde_rev
from plonky2_tpu.transcript import Challenger

RNG = random.Random(0x5EED)

CFG = FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                num_query_rounds=12, arity_bits=2, final_poly_bits=2)
DEGREE_BITS = 6


_CACHE = {}


def setup_proof():
    """Build (proof, tree) once; return deep-ish copies safe to tamper."""
    import copy
    if "p" not in _CACHE:
        _CACHE["p"] = _build_proof()
    proof, tree = _CACHE["p"]
    return copy.deepcopy(proof), tree


def _build_proof():
    n = 1 << DEGREE_BITS
    coeffs = [RNG.randrange(gl.P) for _ in range(n)]
    # bit-reversed domain order — the commit layout (fri/fri.py)
    values = coset_lde_rev(gl.to_u64(coeffs), CFG.rate_bits)      # [N]
    tree = MerkleTree.build(values[:, None], CFG.cap_height)
    ch = Challenger()
    ch.observe_cap(tree.cap_host())
    proof = fri_prove(ext.from_base(values), DEGREE_BITS, CFG, ch,
                      COSET_SHIFT, [tree])
    return proof, tree


def combine(idx, leaves):
    return (leaves[0][0], 0)


def run_verify(proof, tree):
    ch = Challenger()
    ch.observe_cap(tree.cap_host())
    fri_verify(proof, DEGREE_BITS, CFG, ch, COSET_SHIFT,
               [tree.cap_host()], combine)


def test_fri_roundtrip():
    proof, tree = setup_proof()
    run_verify(proof, tree)


def test_fri_rejects_corrupt_final_poly():
    proof, tree = setup_proof()
    c0, c1 = proof.final_poly[0]
    proof.final_poly[0] = ((c0 + 1) % gl.P, c1)
    with pytest.raises(AssertionError):
        run_verify(proof, tree)


def test_fri_rejects_corrupt_query_eval():
    proof, tree = setup_proof()
    qr = proof.query_rounds[0]
    e = qr.steps[0].evals[0]
    qr.steps[0].evals[0] = ((e[0] + 1) % gl.P, e[1])
    with pytest.raises(AssertionError):
        run_verify(proof, tree)


def test_fri_rejects_corrupt_initial_opening():
    proof, tree = setup_proof()
    qr = proof.query_rounds[0]
    qr.initial[0].leaf_values[0] = (qr.initial[0].leaf_values[0] + 1) % gl.P
    with pytest.raises(AssertionError):
        run_verify(proof, tree)


def test_fri_rejects_high_degree():
    # Values of a random function (degree ~N) cannot pass: the prover's
    # truncated final polynomial will not match the folded values.
    N = 1 << (DEGREE_BITS + CFG.rate_bits)
    values = gl.to_u64([RNG.randrange(gl.P) for _ in range(N)])
    tree = MerkleTree.build(values[:, None], CFG.cap_height)
    ch = Challenger()
    ch.observe_cap(tree.cap_host())
    proof = fri_prove(ext.from_base(values), DEGREE_BITS, CFG, ch,
                      COSET_SHIFT, [tree])
    with pytest.raises(AssertionError):
        run_verify(proof, tree)


def test_pow_witness_nontrivial():
    proof, tree = setup_proof()
    # with 8 pow bits the witness should rarely be 0; mostly checks the
    # challenger replay agrees between prover and verifier (done above).
    assert isinstance(proof.pow_witness, int)
