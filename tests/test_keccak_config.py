"""KeccakGoldilocksConfig analog: prove + verify under the Keccak
transcript/Merkle hasher (the config the reference proves keccak circuits
under, /root/reference/src/hash/keccak256.rs:187,256-296)."""

import copy

import pytest

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import keccak_hash as kh
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig


def test_keccak_permutation_device_matches_scalar():
    import random

    import jax

    rng = random.Random(0x3C)
    states = [[rng.randrange(gl.P) for _ in range(12)] for _ in range(5)]
    arr = gl.to_u64(states)
    got = gl.batch_to_int(jax.jit(kh.permute_cols)(arr.T).T)
    for i, s in enumerate(states):
        assert got[12 * i:12 * (i + 1)] == kh.permute_s(s), i


def _build(config):
    b = CircuitBuilder(config)
    xs = [b.add_virtual_target() for _ in range(4)]
    cur = xs
    for _ in range(20):
        cur = b.two_to_one(cur, cur)
    for t in cur:
        b.register_public_input(t)
    return b.build(), {xs[i]: i + 1 for i in range(4)}


def test_prove_verify_under_keccak_transcript():
    cfg = CircuitConfig.keccak_config()
    assert cfg.transcript_module() is kh
    data, inputs = _build(cfg)
    proof = data.prove(inputs)
    data.verify(proof)

    # the same circuit under the Poseidon transcript yields different
    # commitments/challenges (different outer hasher), but both verify
    data_p, inputs_p = _build(CircuitConfig.standard_recursion_config())
    proof_p = data_p.prove(inputs_p)
    data_p.verify(proof_p)
    assert proof.wires_cap != proof_p.wires_cap

    # tamper probe under keccak transcript
    bad = copy.deepcopy(proof)
    w0 = bad.openings.wires[0]
    bad.openings.wires[0] = ((w0[0] + 1) % gl.P, w0[1])
    with pytest.raises(Exception):
        data.verify(bad)
