"""Self-sizing benchmark circuits for the BASELINE.md configs.

Each builder returns (builder_or_data, inputs, meta).  Circuits size
themselves against the target row count by repeating their unit op until
`num_gates()` reaches the target (the compiler pads to the next power of
two, so landing anywhere in (2^(db-1), 2^db] gives degree 2^db).
"""

from __future__ import annotations

import random

from ..ir import CircuitBuilder, CircuitConfig


def _target_rows(degree_bits: int, margin: int) -> int:
    return (1 << degree_bits) - margin


def _fill(b: CircuitBuilder, add_unit, limit: int) -> int:
    """Add units until one more would cross `limit` rows; returns count.

    The first unit is measured to learn the per-unit gate cost (slot
    packing makes later units slightly cheaper, so this is conservative)."""
    g0 = b.num_gates()
    add_unit()
    unit = max(1, b.num_gates() - g0)
    count = 1
    while b.num_gates() + unit <= limit:
        add_unit()
        count += 1
    return count


def build_poseidon_chain(degree_bits: int = 12):
    """Config 1: Poseidon two_to_one chain (the reference's src/poseidon
    slot, /root/reference/src/poseidon/gadgets/mod.rs:7-28), sized to
    degree 2^degree_bits."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    xs = [b.add_virtual_target() for _ in range(4)]
    cur = xs
    target = _target_rows(degree_bits, 8)
    while b.num_gates() < target:
        cur = b.two_to_one(cur, cur)
    for t in cur:
        b.register_public_input(t)
    inputs = {xs[i]: i + 1 for i in range(4)}
    return b, inputs, {"name": "poseidon_chain", "degree_bits": degree_bits}


def build_u32_mix(degree_bits: int = 13):
    """Config 2: u32 add/mul/sub/cmp + range checks (the reference's
    src/u32 layer, /root/reference/src/u32/interleaved_u32.rs), sized to
    degree 2^degree_bits."""
    import plonky2_tpu.gadgets  # noqa: F401  (attaches u32 builder API)

    rng = random.Random(0x32BE7C4)
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_u32_target()
    y = b.add_virtual_u32_target()
    acc = x
    target = _target_rows(degree_bits, 16)
    while b.num_gates() < target:
        lo, hi = b.mul_u32(acc, y)
        s, _carry = b.add_u32(lo, hi)
        xor = b.xor_u32(s, acc)
        d, _borrow = b.sub_u32(xor, y, b.zero_u32())
        _lt = b.is_less_than_u32(d, y)
        acc = d
    b.register_public_input(acc.target)
    inputs = {x.target: rng.randrange(1 << 32), y.target: rng.randrange(1 << 32)}
    return b, inputs, {"name": "u32_mix", "degree_bits": degree_bits}


def build_smt_process(degree_bits: int = 14, n_levels: int = 32):
    """Config 3: chained SMT process proofs at depth 32 (the reference's
    src/smt circuits, /root/reference/src/smt/gadgets/process/
    process_smt.rs:120-340), sized to degree 2^degree_bits."""
    from ..gadgets.smt import (SparseMerkleProcessProofTarget,
                               verify_smt_transition)
    from ..smt import SparseMerkleTree
    import plonky2_tpu.gadgets  # noqa: F401

    rng = random.Random(0x517BE7C4)
    P = (1 << 64) - (1 << 32) + 1

    def rand_hash():
        return tuple(rng.randrange(P) for _ in range(4))

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    targets = []

    def add_unit():
        t = SparseMerkleProcessProofTarget.add_virtual_to(b, n_levels)
        if targets:
            verify_smt_transition(b, t.fnc, targets[-1].new_root, t.old_root)
        targets.append(t)

    _fill(b, add_unit, _target_rows(degree_bits, 16))
    for e in targets[0].old_root + targets[-1].new_root:
        b.register_public_input(e)

    # native tree drives the witnesses: insert / update / remove mix
    tree = SparseMerkleTree()
    keys = [rand_hash() for _ in range(max(4, len(targets)))]
    proofs = []
    for i in range(len(targets)):
        op = i % 3
        if op == 0:
            proofs.append(tree.insert(keys[i], rand_hash()))
        elif op == 1:
            proofs.append(tree.update(keys[i - 1], rand_hash()))
        else:
            proofs.append(tree.insert(rand_hash(), rand_hash()))
    inputs: dict = {}
    for t, pr in zip(targets, proofs):
        t.set_witness(inputs, pr)
    return b, inputs, {"name": "smt_process", "degree_bits": degree_bits,
                       "num_proofs": len(targets)}


def build_ecdsa(batch: int = 1):
    """Config 4: secp256k1 ECDSA verify (the reference's flagship,
    /root/reference/src/ecdsa/gadgets/ecdsa.rs:138-191).  Natural size;
    batch > 1 loops `verify_message_circuit` like the reference's
    batch_verify_message_circuit."""
    from ..field import secp
    from ..gadgets.biguint import set_biguint_target
    from ..gadgets.ecdsa import ECDSAPublicKeyTarget
    import plonky2_tpu.gadgets  # noqa: F401
    import plonky2_tpu.gadgets.curve  # noqa: F401
    import plonky2_tpu.gadgets.ecdsa  # noqa: F401

    rng = random.Random(0xECD5ABE7)
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    triples = []
    for _ in range(batch):
        msg = b.add_virtual_nonnative_target(secp.N)
        sig = b.add_virtual_ecdsa_signature_target()
        pk = ECDSAPublicKeyTarget(b.add_virtual_affine_point_target())
        b.verify_message_circuit(msg, sig, pk)
        triples.append((msg, sig, pk))

    inputs: dict = {}
    for msg, sig, pk in triples:
        sk = rng.randrange(1, secp.N)
        pk_pt = secp.mul(secp.G, sk)
        h = rng.randrange(secp.N)
        r, s = secp.sign(h, sk, rng.randrange(1, secp.N))
        set_biguint_target(inputs, msg.value, h)
        set_biguint_target(inputs, sig.r.value, r)
        set_biguint_target(inputs, sig.s.value, s)
        set_biguint_target(inputs, pk.point.x.value, pk_pt.x)
        set_biguint_target(inputs, pk.point.y.value, pk_pt.y)
    return b, inputs, {"name": "ecdsa_verify", "batch": batch}


def build_mixed_small():
    """A compact circuit exercising the HARD gate set — u32 arithmetic,
    interleave/uninterleave (xor), lookup tables, and nonnative field ops —
    for the mesh bit-identity test and the multichip dryrun (round-4
    verdict: the mesh path was only ever exercised on Poseidon chains)."""
    from ..field import secp
    from ..gadgets.biguint import set_biguint_target
    import plonky2_tpu.gadgets  # noqa: F401

    rng = random.Random(0x31BEEF)
    b = CircuitBuilder(CircuitConfig.test_config())
    # u32 + interleave: mul, add, xor, compare
    x = b.add_virtual_u32_target()
    y = b.add_virtual_u32_target()
    lo, hi = b.mul_u32(x, y)
    s, _ = b.add_u32(lo, hi)
    xo = b.xor_u32(s, x)
    _lt = b.is_less_than_u32(xo, y)
    b.register_public_input(xo.target)
    # lookup: a small table hit twice
    tbl = b.add_lookup_table([(i, (i * 7 + 3) % 64) for i in range(16)])
    li = b.lookup(b.constant(5), tbl)
    b.register_public_input(li)
    # nonnative: one secp base-field add + mul (hint-and-verify paths)
    a_nn = b.add_virtual_nonnative_target(secp.P)
    c_nn = b.mul_nonnative(b.add_nonnative(a_nn, a_nn), a_nn)
    b.register_public_input(c_nn.value.limbs[0].target)

    inputs: dict = {x.target: rng.randrange(1 << 32),
                    y.target: rng.randrange(1 << 32)}
    set_biguint_target(inputs, a_nn.value, rng.randrange(secp.P))
    return b, inputs, {"name": "mixed_small"}


def build_aggregation(num_proofs: int = 4):
    """Config 5: recursive aggregation of `num_proofs` zkDSA proofs via the
    zkaa slot (/root/reference/src/zkaa/mod.rs — empty upstream, implemented
    here; BASELINE config #5).

    Returns (make, meta) where make() -> (AggregationCircuit, inner_proofs):
    the aggregation flow builds its own outer CircuitData, so it does not
    fit the (builder, inputs) shape of the other configs.
    """
    import random as _random

    from ..ir import CircuitConfig
    from ..zkdsa import make_simple_signature_circuit
    from .. import zkaa

    rng = _random.Random(0xA66BE7C4)
    P = (1 << 64) - (1 << 32) + 1

    def make():
        inner = make_simple_signature_circuit(CircuitConfig.test_config())
        proofs = []
        for _ in range(num_proofs):
            key = tuple(rng.randrange(P) for _ in range(4))
            msg = tuple(rng.randrange(P) for _ in range(4))
            sp = inner.prove(key, msg)
            inner.verify(sp)
            proofs.append(sp.proof)
        agg = zkaa.make_aggregation_circuit(inner.data.verifier, num_proofs,
                                            CircuitConfig.test_config())
        return agg, proofs

    return make, {"name": f"aggregation_{num_proofs}", "num_proofs": num_proofs}
