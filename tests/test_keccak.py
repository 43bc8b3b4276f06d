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


# ---- Ethereum proof vectors (keccak256.rs:194-338) ----

ETH_SHORT_VECTORS = [
    # (hex input, keccak256 hex digest)
    ("", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    # empty trie node
    ("80", "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"),
    # last step of a storage proof
    ("e19f37a9fe364faab93b216da50a3214154f22a0a2b415b23a84c8169e8b636ee301",
     "19225e4ee19eb5a11e5260392e6d5154d4bc6a35d89c9d18bf6a63104e9bbcc2"),
]

# 4-block vectors: Ethereum storage / account / branch nodes
ETH_LONG_VECTORS = [
    ("f90211a0dc6ab9a606e3ef2e125ebd792c502cb6500aa1d1a80fa6e706482175742f4744a0bcb03c1a82cc80a677c98fe35c8ff953d1de3b1322a33f2c8d10132eac5639bfa02d81761f56b3bcd9137ef6823f879ba41c32c925c95f4658a7b1418d14424175a0c1c4d0f264475235249547fdfe63cf4aed82ef8cfc3019ed217fcf5f25620067a0f6d7a23257b2c155b5c4ffb37d76d4e6e8fae6bdab5d3cf2d868d4741b80d214a0f7bb2681b64939b292248bd66c21c40d54fca9460abda45da28a50b746b1b2a1a037bfc201846115d4d0e85eb6b3f0920817a7e0081bcb8bdaeb9c7dcf726b0885a0a238a31e3c6a36f24afa650058eabbf3682cc83a576d58453b7b74a3ffac8d1aa03315cb55fbc6bc9d9987cd0e2001f39305961856126d0ef7280d01d45c0b27d5a03cfc7bd374410e92dba88a3a8ce380a6ceed3ea977ee64f904e3723ce4afed01a0e5d3350effa6d755100afa3e4560d39ddc2dd35988f65bc0931f924134c4a2aba07609fdcdd38bf9e2f7b35b022a30e564877323f4d38381b3c792ac21f7617e28a0cd43ad06bbdd7d4dcf450e5212325ae2b177e80701c64f492b6e095e0cd43bbba0652063acc150fc0a729761d4fd80f230329e2eef41cb0dda1df74a4002ba6c4ca0ee0c0661fec773e14f94d8977e69cb22b41cc15fe9c682160488c0a2aa7daf4ba0d4cb2d1c9f1ff574d4854301a6ea891143e123d4dd04db1432509c2307f10a2180",
     "578d0063e7f59c51a1b609f98ab8447cfb69422e3e92cc3cafdc3499735d98a8"),
    ("f90211a0160c36cc6e1f0499f82e964ad41216e3222f9e439c2c8ecebb9f6d8e8682fbd3a0c9288b274cda35ac8ea4ecc51a40b6291d965f66f8dbd029e9419e583d7f0d6aa08a768a530c839cd9ba26f39f381a4e6d1c75bdbaccfd0e08773275460bebb392a0e8b3c8ca435de4f3614f65507f2ffdf77f446f66dfe295fa57287d838505d85ca0d073345bee411e9ee68097c6797025bdbae114c2847821fb12e8d5876cc74fd5a07471033f73ed2b5f1de920765c8d8c895016833aea875cbedfac28eeaf78b38ca073ef613ea081010ff0c3e685dcdd7599e2724121629d736ae206a779524619cca0062fee86b0c595607a46b39da1db0b8d6950f7ceb15a4240b26502bd28f71266a037433cfba971c3f88dd48a9ba77f00af7b916c813ef05e1621439ce39c06f676a081a896e219d44b627d81c27d6af8deacedf503aac7a709325f244add2ad4320da086fd39396891a30937f64e299a7d2fb85814a910c477cee64b0db109d92206aaa023ed91b155f896a409658f30d87f3f16d5bc6193b4ac2e3d5524a980e57149d4a09885e8e7165d55d4a32b0f8b226c382c6aa6d632ca68bdd79a17fd65c31c7fc0a08a04011c30e2fa3121663b88a08732017130f702a24dfe6107ca5757a8caf92aa0ac8239f39a106972436c768499afcc787d257c3d7928bfa524e90752500f4334a0e68fba45dceffc99e87785a850a7fefa813a803f2eb13359e5602d98fce7845080",
     "f530311917cff532bf25f103e7a0c092be92ace7e919f7a4f644e5b011e677f3"),
    ("f9015180a060f3bdb593359882a705ff924581eb99537f2428a007a0006f459182f07dba16a06776a7e6abd64250488ed106c0fbd66ee338b7ce59ae967714ce43ecd5a3de97a0f8d6740520928d0e540bf439f1c214ce434f349e4c9b71bb9fcce14144a48914a0f31b2b9570033a103b8a4c0db8debbff2cf8dc4eb2ed31fa292d41c7adf13dc980808080a016a530127910d9d4a89450f0c9dc075545441126b222396eb28e30c73c01c8a9a05d9eb59dae800d3f8cfe8efdfa86776fc7f3b09dfc5b2f537b2c2abda9787755a0bcdc8744035201f5d8d9bd0f440887a40d8cafc3f986f20ce276b1b1e37c01fda0f56f6a7cbf29f15d0923780608ffbb5671fcb518b482812bb8a02b46bae016f0a0cc20fa696765f56b03c14de2b16ab042f191dafb61df0dab8e1101cc08e78f3980a0e1328f040062749d53d278300e0e9857744279645fbc7a3ae11fcb87a6e000e680",
     "d4cb2d1c9f1ff574d4854301a6ea891143e123d4dd04db1432509c2307f10a21"),
    ("e19f37a9fe364faab93b216da50a3214154f22a0a2b415b23a84c8169e8b636ee301",
     "19225e4ee19eb5a11e5260392e6d5154d4bc6a35d89c9d18bf6a63104e9bbcc2"),
]


def test_host_keccak_ethereum_vectors():
    for hx, want in ETH_SHORT_VECTORS + ETH_LONG_VECTORS:
        assert keccak256_host(bytes.fromhex(hx)).hex() == want, hx


@pytest.mark.skipif(not SLOW, reason="full keccak circuit prove is a perf-scale run")
def test_keccak256_short_circuit_ethereum_vectors_slow():
    """Port of keccak256.rs:195-252 — one 1-block circuit, three witnesses."""
    b = CircuitBuilder(CircuitConfig.test_config())
    hash_target = b.add_virtual_hash_input_target(1, kk.RATE_BITS)
    out = b.hash_keccak256(hash_target)
    for limb in out.limbs[:8]:
        b.register_public_input(limb.target)
    data = b.build()

    for hx, want in ETH_SHORT_VECTORS:
        inputs = {}
        set_keccak256_input_target(inputs, hash_target, bytes.fromhex(hx))
        proof = data.prove(inputs)
        data.verify(proof)
        # public inputs -> little-endian u32 limbs -> hex (keccak256.rs:316-335)
        pi_hex = b"".join(int(v).to_bytes(4, "little")
                          for v in proof.public_inputs).hex()
        assert pi_hex == want, hx


@pytest.mark.skipif(not SLOW, reason="4-block keccak circuit prove is a perf-scale run")
def test_keccak256_long_circuit_ethereum_vectors_slow():
    """Port of keccak256.rs:256-338 — one 4-block circuit, four witnesses."""
    b = CircuitBuilder(CircuitConfig.test_config())
    hash_target = b.add_virtual_hash_input_target(4, kk.RATE_BITS)
    out = b.hash_keccak256(hash_target)
    for limb in out.limbs[:8]:
        b.register_public_input(limb.target)
    data = b.build()

    for hx, want in ETH_LONG_VECTORS:
        inputs = {}
        set_keccak256_input_target(inputs, hash_target, bytes.fromhex(hx))
        proof = data.prove(inputs)
        data.verify(proof)
        pi_hex = b"".join(int(v).to_bytes(4, "little")
                          for v in proof.public_inputs).hex()
        assert pi_hex == want, hx
