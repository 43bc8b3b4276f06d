"""Nested (2- and 3-level) SMTs sharing one node store.

Parity: /root/reference/src/smt/layered_tree.rs:131-233 and
layered_layered_tree.rs:135-195.  `set` writes the innermost tree first and
then propagates each inner root up as the parent's value; `find` chains
inclusion proofs downward; `verify_layered_smt_connection` checks the
upper-value ↔ lower-root consistency per role.
"""

from __future__ import annotations

from .hash_out import HashOut, ZERO_HASH
from .proof import ProcessMerkleProofRole
from .tree import PoseidonNodeHash, SparseMerkleTree


class LayeredSparseMerkleTree(SparseMerkleTree):
    """2-level SMT: value at (key1, key2); value==0 deletes the entry."""

    def set(self, key1: HashOut, key2: HashOut, value: HashOut):
        layer1_root = self.get_root()
        layer2_root = self._get_at(layer1_root, key1)
        result2, layer2_root = self._process(layer2_root, key2, value)
        result1, layer1_root = self._process(layer1_root, key1, layer2_root)
        self.roots_db.set(layer1_root)
        return result1, result2

    def find(self, key1: HashOut, key2: HashOut):
        result1 = self._find(self.get_root(), key1)
        layer2_root = result1.value if result1.found else ZERO_HASH
        result2 = self._find(layer2_root, key2)
        return result1, result2

    # -- shared helpers (also used by the 3-level variant) ---------------

    def _get_at(self, root: HashOut, key: HashOut) -> HashOut:
        res = self._find(root, key)
        return res.value if res.found else ZERO_HASH

    def _process(self, root: HashOut, key: HashOut, value: HashOut):
        """calc_process_proof against an explicit root (tree.rs:561-586)."""
        res = self._find(root, key)
        if value == ZERO_HASH:
            if res.found:
                return self._remove(root, key)
            return self._noop(root, key)
        if res.found:
            return self._update(root, key, value)
        return self._insert(root, key, value)


class LayeredLayeredSparseMerkleTree(LayeredSparseMerkleTree):
    """3-level SMT: value at (key1, key2, key3)."""

    def set(self, key1: HashOut, key2: HashOut, key3: HashOut,
            value: HashOut):
        layer1_root = self.get_root()
        layer2_root = self._get_at(layer1_root, key1)
        layer3_root = self._get_at(layer2_root, key2)
        result3, layer3_root = self._process(layer3_root, key3, value)
        result2, layer2_root = self._process(layer2_root, key2, layer3_root)
        result1, layer1_root = self._process(layer1_root, key1, layer2_root)
        self.roots_db.set(layer1_root)
        return result1, result2, result3

    def find(self, key1: HashOut, key2: HashOut, key3: HashOut):
        result1 = self._find(self.get_root(), key1)
        layer2_root = result1.value if result1.found else ZERO_HASH
        result2 = self._find(layer2_root, key2)
        layer3_root = result2.value if result2.found else ZERO_HASH
        result3 = self._find(layer3_root, key3)
        return result1, result2, result3


def verify_layered_smt_connection(upper_fnc: ProcessMerkleProofRole,
                                  old_upper_value: HashOut,
                                  new_upper_value: HashOut,
                                  old_lower_root: HashOut,
                                  new_lower_root: HashOut) -> None:
    """Raise if the lower tree's roots don't match the upper tree's values
    (layered_tree.rs:178-233)."""
    R = ProcessMerkleProofRole
    if upper_fnc == R.Update:
        assert old_lower_root == old_upper_value, "update: old root/value"
        assert new_lower_root == new_upper_value, "update: new root/value"
    elif upper_fnc == R.Insert:
        assert old_lower_root == ZERO_HASH, "insert: old root must be zero"
        assert new_lower_root == new_upper_value, "insert: new root/value"
    elif upper_fnc == R.Delete:
        assert old_lower_root == old_upper_value, "delete: old root/value"
        assert new_lower_root == ZERO_HASH, "delete: new root must be zero"
    else:  # NoOp
        assert old_lower_root == ZERO_HASH, "noop: old root must be zero"
        assert new_lower_root == ZERO_HASH, "noop: new root must be zero"
