"""Native SMT: tree ops, process/inclusion proofs, layered trees.

Mirrors the reference's randomized op-sequence tests
(/root/reference/src/smt/gadgets/process/mod.rs:35-60) plus the inline tree
tests, with a seeded RNG for reproducibility.
"""

import random

import pytest

from plonky2_tpu.smt import (LayeredLayeredSparseMerkleTree,
                             LayeredSparseMerkleTree, ProcessMerkleProofRole,
                             SparseMerkleTree, verify_layered_smt_connection,
                             verify_smt_inclusion_proof,
                             verify_smt_process_proof)
from plonky2_tpu.smt.hash_out import ZERO_HASH, from_hex, to_hex
from plonky2_tpu.smt.tree import PoseidonNodeHash

H = PoseidonNodeHash


def rand_hash(rng):
    P = (1 << 64) - (1 << 32) + 1
    return tuple(rng.randrange(P) for _ in range(4))


def test_hex_roundtrip():
    rng = random.Random(7)
    for _ in range(10):
        h = rand_hash(rng)
        assert from_hex(to_hex(h)) == h
    assert to_hex(ZERO_HASH) == "0x" + "00" * 32


def test_insert_find_get():
    rng = random.Random(1)
    tree = SparseMerkleTree()
    kvs = {}
    for _ in range(40):
        k, v = rand_hash(rng), rand_hash(rng)
        kvs[k] = v
        proof = tree.insert(k, v)
        assert proof.fnc == ProcessMerkleProofRole.Insert
        verify_smt_process_proof(H, proof, num_levels=32)
    for k, v in kvs.items():
        assert tree.get(k) == v
        inc = tree.find(k)
        assert inc.found
        verify_smt_inclusion_proof(H, inc, num_levels=32)
    # non-inclusion
    missing = rand_hash(rng)
    inc = tree.find(missing)
    assert not inc.found
    verify_smt_inclusion_proof(H, inc, num_levels=32)


def test_update_remove():
    rng = random.Random(2)
    tree = SparseMerkleTree()
    keys = [rand_hash(rng) for _ in range(20)]
    for k in keys:
        tree.insert(k, rand_hash(rng))
    for k in keys[:10]:
        proof = tree.update(k, rand_hash(rng))
        assert proof.fnc == ProcessMerkleProofRole.Update
        verify_smt_process_proof(H, proof, num_levels=32)
    for k in keys[10:]:
        proof = tree.remove(k)
        assert proof.fnc == ProcessMerkleProofRole.Delete
        verify_smt_process_proof(H, proof, num_levels=32)
        assert tree.get(k) == ZERO_HASH
    for k in keys[:10]:
        assert tree.get(k) != ZERO_HASH


def test_random_op_sequence():
    """set() dispatch (insert/update/remove/noop) + chained proof roots."""
    rng = random.Random(3)
    tree = SparseMerkleTree()
    live = []
    prev_root = tree.get_root()
    for step in range(120):
        c = rng.random()
        if live and c < 0.25:
            key = rng.choice(live)
            value = ZERO_HASH        # remove
            live.remove(key)
        elif live and c < 0.45:
            key = rng.choice(live)   # update
            value = rand_hash(rng)
        elif c < 0.5:
            key = rand_hash(rng)     # noop (set absent key to zero)
            value = ZERO_HASH
        else:
            key = rand_hash(rng)     # insert
            value = rand_hash(rng)
            live.append(key)
        proof = tree.set(key, value)
        verify_smt_process_proof(H, proof, num_levels=32)
        assert proof.old_root == prev_root
        assert proof.new_root == tree.get_root()
        prev_root = proof.new_root
    for k in live:
        assert tree.get(k) != ZERO_HASH


def test_remove_all_returns_to_empty_root():
    rng = random.Random(4)
    tree = SparseMerkleTree()
    keys = [rand_hash(rng) for _ in range(8)]
    for k in keys:
        tree.insert(k, rand_hash(rng))
    rng.shuffle(keys)
    for k in keys:
        verify_smt_process_proof(H, tree.remove(k), num_levels=32)
    assert tree.get_root() == ZERO_HASH


def test_insert_duplicate_and_zero_value_rejected():
    rng = random.Random(5)
    tree = SparseMerkleTree()
    k = rand_hash(rng)
    tree.insert(k, rand_hash(rng))
    with pytest.raises(KeyError):
        tree.insert(k, rand_hash(rng))
    with pytest.raises(ValueError):
        tree.insert(rand_hash(rng), ZERO_HASH)
    with pytest.raises(KeyError):
        tree.update(rand_hash(rng), rand_hash(rng))


def test_change_root_history():
    rng = random.Random(6)
    tree = SparseMerkleTree()
    k1, v1 = rand_hash(rng), rand_hash(rng)
    k2, v2 = rand_hash(rng), rand_hash(rng)
    tree.insert(k1, v1)
    root1 = tree.get_root()
    tree.insert(k2, v2)
    assert tree.get(k2) == v2
    tree.change_root(root1)       # rollback: deletes were no-ops
    assert tree.get(k1) == v1
    assert tree.get(k2) == ZERO_HASH
    with pytest.raises(KeyError):
        tree.change_root(rand_hash(rng))


def test_layered_tree():
    rng = random.Random(8)
    tree = LayeredSparseMerkleTree()
    entries = {}
    for _ in range(25):
        k1, k2, v = rand_hash(rng), rand_hash(rng), rand_hash(rng)
        entries[(k1, k2)] = v
        p1, p2 = tree.set(k1, k2, v)
        verify_smt_process_proof(H, p1, num_levels=32)
        verify_smt_process_proof(H, p2, num_levels=32)
        verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value,
                                      p2.old_root, p2.new_root)
    for (k1, k2), v in entries.items():
        inc1, inc2 = tree.find(k1, k2)
        assert inc1.found and inc2.found and inc2.value == v
        verify_smt_inclusion_proof(H, inc1, num_levels=32)
        verify_smt_inclusion_proof(H, inc2, num_levels=32)
    # delete one entry
    (k1, k2), _ = next(iter(entries.items()))
    p1, p2 = tree.set(k1, k2, ZERO_HASH)
    verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value,
                                  p2.old_root, p2.new_root)
    _, inc2 = tree.find(k1, k2)
    assert not inc2.found


def test_layered_layered_tree():
    rng = random.Random(9)
    tree = LayeredLayeredSparseMerkleTree()
    for _ in range(10):
        k1, k2, k3 = (rand_hash(rng) for _ in range(3))
        v = rand_hash(rng)
        p1, p2, p3 = tree.set(k1, k2, k3, v)
        for p in (p1, p2, p3):
            verify_smt_process_proof(H, p, num_levels=32)
        verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value,
                                      p2.old_root, p2.new_root)
        verify_layered_smt_connection(p2.fnc, p2.old_value, p2.new_value,
                                      p3.old_root, p3.new_root)
        i1, i2, i3 = tree.find(k1, k2, k3)
        assert i3.found and i3.value == v
