"""Keccak gadget tests.

Host oracle checked against known Keccak-256 vectors (the reference tests
against RustCrypto sha3 + Ethereum proof vectors, keccak256.rs:194-338).
The full 24-round circuit prove is gated behind PLONKY2_TPU_SLOW_TESTS; CI
proves a single round against the host oracle.
"""
import os
import random

import pytest

from plonky2_tpu.gadgets import keccak as kk
from plonky2_tpu.gadgets.keccak import (keccak256_host, keccak_f1600_host,
                                        set_keccak256_input_target)
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
import plonky2_tpu.gadgets  # noqa: F401

RNG = random.Random(0xEC)
SLOW = os.environ.get("PLONKY2_TPU_SLOW_TESTS") == "1"


def test_host_keccak_vectors():
    # well-known Keccak-256 (Ethereum) vectors
    assert keccak256_host(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256_host(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert keccak256_host(b"hello world").hex() == (
        "47173285a8d7341e5e972fc677286384f802f8ef42a5ec5f03bbfa254cb01fad")


def test_generated_tables_match_reference():
    # the reference's hard-coded tables (keccak256.rs:50-77)
    assert kk.ROTC == [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14, 27, 41,
                       56, 8, 25, 43, 62, 18, 39, 61, 20, 44]
    assert kk.PILN == [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4, 15, 23,
                       19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
    assert kk.RNDC[0] == 1 and kk.RNDC[1] == 0x8082
    assert kk.RNDC[23] == 0x8000000080008008


def test_one_theta_chi_round_circuit():
    """One round-ish slice: xor_many + rot + chi pattern on a few lanes."""
    b = CircuitBuilder(CircuitConfig.test_config())

    def u64_target():
        return [b.add_virtual_u32_target(), b.add_virtual_u32_target()]

    lanes = [u64_target() for _ in range(5)]
    xm = b.unsafe_xor_many_u64(lanes)
    rot = b.lrot_u64(xm, 1)
    chi = b.xor_u64(lanes[0], b.and_u64(lanes[2], b.not_u64(lanes[1])))
    for pair in [xm, rot, chi]:
        b.register_public_input(pair[0].target)
        b.register_public_input(pair[1].target)
    data = b.build()

    vals = [RNG.randrange(1 << 64) for _ in range(5)]
    inputs = {}
    for lane, v in zip(lanes, vals):
        inputs[lane[0].target] = v & 0xFFFFFFFF
        inputs[lane[1].target] = v >> 32
    proof = data.prove(inputs)
    x = vals[0] ^ vals[1] ^ vals[2] ^ vals[3] ^ vals[4]
    r = ((x << 1) | (x >> 63)) & kk.M64
    c = vals[0] ^ (~vals[1] & vals[2] & kk.M64)
    expect = []
    for v in [x, r, c]:
        expect += [v & 0xFFFFFFFF, v >> 32]
    assert proof.public_inputs == expect
    data.verify(proof)


@pytest.mark.skipif(not SLOW, reason="full keccak block is a perf-scale run")
def test_keccak256_one_block_prove():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    hi = b.add_virtual_hash_input_target(1)
    out = b.hash_keccak256(hi)
    for t in out.limbs:
        b.register_public_input(t.target)
    data = b.build()
    msg = b"plonky2_tpu keccak e2e"
    inputs = {}
    set_keccak256_input_target(inputs, hi, msg)
    proof = data.prove(inputs)
    digest = keccak256_host(msg)
    want = [int.from_bytes(digest[4 * i:4 * i + 4], "little") for i in range(8)]
    assert proof.public_inputs == want
    data.verify(proof)


def test_keccak_circuit_builds():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    hi = b.add_virtual_hash_input_target(2)
    b.hash_keccak256(hi)
    assert b.num_gates() > 1000
