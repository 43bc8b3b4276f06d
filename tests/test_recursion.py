"""Recursion building-block tests: in-circuit gate constraint evaluation
(CircuitAlg) must agree with the host scalar evaluation (ExtAlg), and the
in-circuit challenger must replay the host transcript exactly."""

import random

import plonky2_tpu.gadgets  # noqa: F401
from plonky2_tpu.field import gl
from plonky2_tpu.gates import ArithmeticGate, ConstantGate
from plonky2_tpu.gates.base import EvalVars, ExtAlg
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.extension import ReducingGate
from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
from plonky2_tpu.recursion import RecursiveChallenger
from plonky2_tpu.recursion.circuit_alg import eval_gate_constraints_circuit
from plonky2_tpu.transcript import Challenger

RNG = random.Random(0x2EC)


def _rand_ext():
    return (RNG.randrange(gl.P), RNG.randrange(gl.P))


def _run(build_fn):
    b = CircuitBuilder(CircuitConfig.test_config())
    inputs = build_fn(b)
    data = b.build()
    proof = data.prove(inputs)
    data.verify(proof)


def test_circuit_alg_matches_ext_alg():
    gates = [ArithmeticGate(2), ConstantGate(3), BaseSumGate(2, 6),
             ReducingGate(3)]

    def build(b):
        for gate in gates:
            wires = [_rand_ext() for _ in range(gate.num_wires)]
            consts = [_rand_ext() for _ in range(max(gate.num_constants, 2))]
            pi = [_rand_ext() for _ in range(4)]
            host = gate.eval(EvalVars(list(wires), list(consts), list(pi)),
                             ExtAlg())
            got = eval_gate_constraints_circuit(
                b, gate,
                [b.constant_extension(w) for w in wires],
                [b.constant_extension(c) for c in consts],
                [b.constant_extension(p) for p in pi])
            assert len(got) == gate.num_constraints
            for g, h in zip(got, host):
                b.connect_extension(g, b.constant_extension(h))
        return {}

    _run(build)


def test_merkle_proof_circuit():
    import numpy as np
    import jax.numpy as jnp
    from plonky2_tpu.merkle.merkle import MerkleTree, verify_merkle_proof_s
    from plonky2_tpu.recursion import verify_merkle_proof_to_cap_circuit

    L, C, cap_height = 16, 6, 1
    leaves = np.array([[RNG.randrange(gl.P) for _ in range(C)]
                       for _ in range(L)], dtype=np.uint64)
    tree = MerkleTree.build(jnp.asarray(leaves), cap_height)
    cap = tree.cap_host()
    index = 11
    leaf, siblings = tree.open(index)
    assert verify_merkle_proof_s(leaf, index, cap, siblings)

    def build(b):
        bits = [b.constant((index >> i) & 1) for i in range(4)]
        verify_merkle_proof_to_cap_circuit(
            b, [b.constant(v) for v in leaf], bits,
            [[b.constant(x) for x in h] for h in cap],
            [[b.constant(x) for x in s] for s in siblings])
        return {}

    _run(build)


def test_recursive_challenger_matches_host():
    def build(b):
        host = Challenger()
        circ = RecursiveChallenger(b)
        xs = [RNG.randrange(gl.P) for _ in range(13)]  # crosses a duplex
        host.observe_elements(xs)
        circ.observe_elements([b.constant(x) for x in xs])
        for c, t in zip(host.get_n_challenges(3), circ.get_n_challenges(3)):
            b.connect(t, b.constant(c))
        host.observe_element(7)          # partial absorb before next draw
        circ.observe_element(b.constant(7))
        e_host = host.get_ext_challenge()
        e_circ = circ.get_ext_challenge()
        b.connect_extension(e_circ, b.constant_extension(e_host))
        return {}

    _run(build)
