"""SMT circuits: inclusion + process proofs, fed by the native tree.

Mirrors /root/reference/src/smt/gadgets/verify/mod.rs:3-61 and
process/mod.rs:4-240 (randomized op sequence proved in-circuit).
"""

import random

import pytest

from plonky2_tpu.gadgets.smt import (SparseMerkleInclusionProofTarget,
                                     SparseMerkleProcessProofTarget,
                                     add_virtual_hash, add_virtual_bool,
                                     set_hash_witness,
                                     verify_layered_smt_target_connection,
                                     verify_smt_transition)
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.smt import (LayeredSparseMerkleTree, SparseMerkleTree,
                             verify_smt_process_proof)
from plonky2_tpu.smt.hash_out import ZERO_HASH
from plonky2_tpu.smt.tree import PoseidonNodeHash
import plonky2_tpu.gadgets  # noqa: F401

N_LEVELS = 16
RNG = random.Random(0x517)
P = (1 << 64) - (1 << 32) + 1


def rand_hash():
    return tuple(RNG.randrange(P) for _ in range(4))


def build_inclusion_circuit():
    b = CircuitBuilder(CircuitConfig.test_config())
    t = SparseMerkleInclusionProofTarget.add_virtual_to(b, N_LEVELS)
    for e in t.root:
        b.register_public_input(e)
    return b.build(), t


def build_process_circuit():
    b = CircuitBuilder(CircuitConfig.test_config())
    t = SparseMerkleProcessProofTarget.add_virtual_to(b, N_LEVELS)
    for e in t.old_root + t.new_root:
        b.register_public_input(e)
    return b.build(), t


def test_smt_inclusion_circuit():
    tree = SparseMerkleTree()
    keys = [rand_hash() for _ in range(12)]
    for k in keys:
        tree.insert(k, rand_hash())

    data, target = build_inclusion_circuit()

    # inclusion
    inc = tree.find(keys[3])
    assert inc.found
    pw = {}
    target.set_witness(pw, inc)
    proof = data.prove(pw)
    data.verify(proof)
    assert proof.public_inputs == list(inc.root)

    # non-inclusion (same compiled circuit, new witness)
    inc2 = tree.find(rand_hash())
    assert not inc2.found
    pw = {}
    target.set_witness(pw, inc2)
    proof2 = data.prove(pw)
    data.verify(proof2)

    # tampered root must not verify
    pw = {}
    target.set_witness(pw, inc)
    for t_elem, v in zip(target.root, rand_hash()):
        pw[t_elem] = v
    with pytest.raises(Exception):
        bad = data.prove(pw)
        data.verify(bad)


def test_smt_process_circuit_all_roles():
    tree = SparseMerkleTree()
    k1, k2 = rand_hash(), rand_hash()
    proofs = []
    proofs.append(tree.set(k1, rand_hash()))     # insert (is_old0 path)
    proofs.append(tree.set(k2, rand_hash()))     # insert (leaf-collision path)
    proofs.append(tree.set(k1, rand_hash()))     # update
    proofs.append(tree.set(k1, ZERO_HASH))       # delete
    proofs.append(tree.set(rand_hash(), ZERO_HASH))  # noop

    for p in proofs:
        verify_smt_process_proof(PoseidonNodeHash, p, num_levels=N_LEVELS)

    data, target = build_process_circuit()
    for p in proofs:
        pw = {}
        target.set_witness(pw, p)
        proof = data.prove(pw)
        data.verify(proof)
        assert proof.public_inputs == list(p.old_root) + list(p.new_root)


def test_smt_process_circuit_rejects_forged_value():
    tree = SparseMerkleTree()
    for _ in range(4):
        tree.set(rand_hash(), rand_hash())
    p = tree.set(rand_hash(), rand_hash())

    data, target = build_process_circuit()
    pw = {}
    target.set_witness(pw, p)
    # forge the new value without recomputing the root
    for t_elem, v in zip(target.new_value, rand_hash()):
        pw[t_elem] = v
    with pytest.raises(Exception):
        proof = data.prove(pw)
        data.verify(proof)


def test_smt_transition_and_layered_connection_circuit():
    tree = LayeredSparseMerkleTree()
    p1a, p2a = tree.set(rand_hash(), rand_hash(), rand_hash())
    k1, k2 = rand_hash(), rand_hash()
    p1b, p2b = tree.set(k1, k2, rand_hash())

    b = CircuitBuilder(CircuitConfig.test_config())
    prev_new_root = add_virtual_hash(b)
    cur_old_root = add_virtual_hash(b)
    cur_fnc = [add_virtual_bool(b), add_virtual_bool(b)]
    verify_smt_transition(b, cur_fnc, prev_new_root, cur_old_root)

    up_old_v = add_virtual_hash(b)
    up_new_v = add_virtual_hash(b)
    low_old_r = add_virtual_hash(b)
    low_new_r = add_virtual_hash(b)
    up_fnc = [add_virtual_bool(b), add_virtual_bool(b)]
    verify_layered_smt_target_connection(b, up_fnc, up_old_v, up_new_v,
                                         low_old_r, low_new_r)
    data = b.build()

    pw = {}
    set_hash_witness(pw, prev_new_root, p1a.new_root)
    set_hash_witness(pw, cur_old_root, p1b.old_root)
    f0, f1 = p1b.fnc.bits
    pw[cur_fnc[0]], pw[cur_fnc[1]] = int(f0), int(f1)

    set_hash_witness(pw, up_old_v, p1b.old_value)
    set_hash_witness(pw, up_new_v, p1b.new_value)
    set_hash_witness(pw, low_old_r, p2b.old_root)
    set_hash_witness(pw, low_new_r, p2b.new_root)
    g0, g1 = p1b.fnc.bits
    pw[up_fnc[0]], pw[up_fnc[1]] = int(g0), int(g1)

    proof = data.prove(pw)
    data.verify(proof)

    # broken transition must fail
    pw[cur_old_root[0]] = (pw[cur_old_root[0]] + 1) % P
    with pytest.raises(Exception):
        bad = data.prove(pw)
        data.verify(bad)
