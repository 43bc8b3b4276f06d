"""Native witness-tape engine vs the dynamic Python scheduler: both must
produce the identical witness on every circuit family (the tape is the
prover's hot path; the scheduler is the semantic reference)."""
import numpy as np
import pytest

from plonky2_tpu import native
from plonky2_tpu.field import gl
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.witness import generate_witness
from plonky2_tpu.witness.tape import generate_witness_tape
import plonky2_tpu.gadgets  # noqa: F401


def _check(data, inputs):
    if native.lib() is None:
        pytest.skip("native library unavailable")
    pd = data.prover
    tape_store = generate_witness_tape(pd, inputs)
    assert tape_store is not None
    dyn_store = generate_witness(pd, inputs)
    for rep, v in dyn_store._vals.items():
        assert tape_store.get_or_zero(rep) == v, rep
    # scatter equality
    n = 1 << pd.common.degree_bits
    from plonky2_tpu.ir.builder import Wire
    wires_dyn = np.zeros((pd.common.config.num_wires, n), dtype=np.uint64)
    for rep, v in dyn_store._vals.items():
        if isinstance(rep, Wire):
            wires_dyn[rep.column, rep.row] = v
        for w in pd.class_wires.get(rep, ()):
            wires_dyn[w.column, w.row] = v
    wires_tape = tape_store.scatter(pd.common.config.num_wires, n)
    assert np.array_equal(wires_dyn, wires_tape)


def test_tape_poseidon_chain():
    b = CircuitBuilder(CircuitConfig.test_config())
    xs = [b.add_virtual_target() for _ in range(4)]
    cur = xs
    for _ in range(5):
        cur = b.two_to_one(cur, cur)
    for t in cur:
        b.register_public_input(t)
    _check(b.build(), {xs[i]: i + 1 for i in range(4)})


def test_tape_u32_mix():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_u32_target()
    y = b.add_virtual_u32_target()
    acc = x
    for _ in range(6):
        lo, hi = b.mul_u32(acc, y)
        s, _c = b.add_u32(lo, hi)
        x2 = b.xor_u32(s, y)          # interleave/uninterleave opcodes
        d, _bo = b.sub_u32(x2, y, b.zero_u32())
        _lt = b.is_less_than_u32(d, y)
        acc = d
    b.register_public_input(acc.target)
    _check(b.build(), {x.target: 0xDEADBEEF, y.target: 0x12345678})


def test_tape_split_and_random_access():
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_target()
    bits = b.split_le(x, 8)
    items = [b.constant(10 + i) for i in range(4)]
    idx = b.add_virtual_target()
    sel = b.random_access(idx, items)
    b.register_public_input(sel)
    for bit in bits[:2]:
        b.register_public_input(bit if isinstance(bit, int) else bit.target)
    _check(b.build(), {x: 0b10110101, idx: 2})


def test_tape_lookup():
    tab = [(i, (3 * i + 1) % 31) for i in range(8)]
    b = CircuitBuilder(CircuitConfig.test_config())
    tid = b.add_lookup_table(tab)
    x = b.add_virtual_target()
    y = b.lookup(x, tid)
    b.register_public_input(y)
    _check(b.build(), {x: 4})


def test_tape_nonnative_hints():
    from plonky2_tpu.field import secp
    b = CircuitBuilder(CircuitConfig.test_config())
    a = b.add_virtual_nonnative_target(secp.N)
    c = b.add_virtual_nonnative_target(secp.N)
    prod = b.mul_nonnative(a, c)
    inv = b.inv_nonnative(a)
    for t in prod.value.limbs + inv.value.limbs:
        b.register_public_input(t.target)
    from plonky2_tpu.gadgets.biguint import set_biguint_target
    inputs = {}
    set_biguint_target(inputs, a.value, 0xABCDEF0123456789)
    set_biguint_target(inputs, c.value, 0x1122334455667788990011)
    _check(b.build(), inputs)


def test_tape_extension_ops():
    b = CircuitBuilder(CircuitConfig.test_config())
    a = b.add_virtual_extension_target()
    c = b.add_virtual_extension_target()
    alpha = b.add_virtual_extension_target()
    prod = b.mul_extension(a, c)                     # mul_ext opcode
    mixed = b.arithmetic_extension(3, 5, a, c, prod)  # arith_ext opcode
    base_terms = [b.add_virtual_target() for _ in range(5)]
    folded = b.reduce_with_powers_ext(alpha, base_terms)      # reduce
    folded2 = b.reduce_with_powers_ext_circuit(alpha, [a, c, mixed])
    for t in (*prod, *mixed, *folded, *folded2):
        b.register_public_input(t)
    inputs = {a[0]: 11, a[1]: 22, c[0]: 33, c[1]: 44,
              alpha[0]: 5, alpha[1]: 6}
    for i, t in enumerate(base_terms):
        inputs[t] = 100 + i
    _check(b.build(), inputs)


def test_tape_conflict_detection():
    if native.lib() is None:
        pytest.skip("native library unavailable")
    b = CircuitBuilder(CircuitConfig.test_config())
    x = b.add_virtual_target()
    y = b.add(x, x)
    b.register_public_input(y)
    data = b.build()
    # forcing y to a wrong value must raise the same conflict error the
    # dynamic scheduler gives
    with pytest.raises(ValueError):
        generate_witness_tape(data.prover, {x: 3, y: 999})
