"""Golden vectors: cross-round byte-stability of hashes, transcript
challenges, and full proof bytes.

The north-star conformance target (byte-identical proofs to the Rust
fork) is environment-blocked: the pinned ZeroKPunk plonky2 fork is not
vendored or fetchable here (/root/reference/Cargo.toml:10-11), so its
Poseidon constants cannot be extracted.  What IS checkable is that THIS
framework's transcript and proof bytes never drift: the vectors below
were generated once (see generate() at the bottom) and any change to
hashing, challenger order, field canonicalization, or proof layout must
show up as a loud failure here — the same pinning role the reference's
hard-coded serde vectors play (SURVEY.md §4.4).

Regenerate intentionally with:
    python tests/test_golden_vectors.py --write
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import poseidon
from plonky2_tpu.transcript import Challenger
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.serialization import serialize_proof

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_vectors.json")


def compute_vectors() -> dict:
    v = {}
    # 1. Poseidon permutation / sponge on fixed inputs
    v["poseidon_perm_0_11"] = [int(x) for x in
                               poseidon.permute_s(list(range(12)))]
    v["poseidon_hash_no_pad_8"] = [
        int(x) for x in poseidon.hash_no_pad_s([3, 1, 4, 1, 5, 9, 2, 6])]
    v["poseidon_two_to_one"] = [
        int(x) for x in poseidon.two_to_one_s([1, 2, 3, 4], [5, 6, 7, 8])]

    # 2. Challenger (Fiat-Shamir duplex sponge) replay
    ch = Challenger(poseidon)
    ch.observe_elements(list(range(7)))
    a = ch.get_n_challenges(3)
    ch.observe_elements([gl.P - 1, 0, 12345])
    b = ch.get_ext_challenge()
    v["challenger"] = [int(x) for x in a] + [int(b[0]), int(b[1])]

    # 3. Full proof bytes of a fixed tiny circuit (pins gate placement,
    # selector grouping, sigma layout, every prover phase, FRI, and the
    # serialization format all at once)
    b_ = CircuitBuilder(CircuitConfig.test_config())
    x = b_.add_virtual_target()
    y = b_.add_virtual_target()
    z = b_.mul_add(x, y, x)
    h = b_.two_to_one([x, y, z, x], [y, z, x, y])
    for t in h:
        b_.register_public_input(t)
    data = b_.build()
    proof = data.prove({x: 111, y: 222})
    data.verify(proof)
    raw = serialize_proof(proof)
    v["tiny_circuit_proof_len"] = len(raw)
    v["tiny_circuit_proof_sha256"] = hashlib.sha256(raw).hexdigest()
    v["tiny_circuit_public_inputs"] = [int(t) for t in proof.public_inputs]
    return v


def test_golden_vectors_stable():
    with open(GOLDEN) as f:
        want = json.load(f)
    got = compute_vectors()
    for key in want:
        assert got[key] == want[key], (
            f"golden vector {key!r} drifted:\n  recorded {want[key]}\n"
            f"  current  {got[key]}\nIf the change is intentional "
            f"(constants swap, transcript change), regenerate with "
            f"`python tests/test_golden_vectors.py --write` and note it "
            f"in the README conformance section.")
    assert set(got) == set(want)


if __name__ == "__main__":
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    if "--write" in sys.argv:
        with open(GOLDEN, "w") as f:
            json.dump(compute_vectors(), f, indent=1)
        print(f"wrote {GOLDEN}")
    else:
        test_golden_vectors_stable()
        print("golden vectors stable")
