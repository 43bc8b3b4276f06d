"""Per-gate property tests: the TPU analogue of plonky2's gate-testing
harness (`test_low_degree` + `test_eval_fns`, SURVEY.md §4 cat. 3;
/root/reference/src/u32/gates/interleave_u32.rs:336-352).

1. fast-vs-generic: `eval_batch_fast` must equal the generic-algebra eval
   value-for-value and in constraint order (the prover uses fast, the
   verifier generic — any divergence breaks the quotient identity).
2. low-degree: with linear wire polynomials, every constraint must
   interpolate to a polynomial of degree <= gate.degree.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_tpu.field import gl
from plonky2_tpu.gates import (ArithmeticGate, BatchAlg, ConstantGate,
                               EvalVars, NoopGate, Poseidon2Gate,
                               PoseidonGate, PublicInputGate)
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.u32_arithmetic import (U32AddManyGate,
                                              U32ArithmeticGate,
                                              U32RangeCheckGate)
from plonky2_tpu.gates.u32_interleave import (U32InterleaveGate,
                                              UninterleaveToB32Gate,
                                              UninterleaveToU32Gate)
from plonky2_tpu.ntt import intt

RNG = random.Random(0x6A7E)

GATES = [
    ArithmeticGate(4),
    ConstantGate(2),
    PublicInputGate(),
    PoseidonGate(),
    Poseidon2Gate(),
    BaseSumGate(2, 8),
    BaseSumGate(4, 16),
    U32ArithmeticGate(3),
    U32AddManyGate(5, 2),
    U32RangeCheckGate(7),
    U32InterleaveGate(2),
    UninterleaveToU32Gate(1),
    UninterleaveToB32Gate(1),
]

from plonky2_tpu.gates.comparison import ComparisonGate, U32SubtractionGate  # noqa: E402
from plonky2_tpu.gates.exponentiation import ExponentiationGate  # noqa: E402
from plonky2_tpu.gates.random_access import RandomAccessGate  # noqa: E402

from plonky2_tpu.gates.extension import (ArithmeticExtensionGate,  # noqa: E402
                                         MulExtensionGate,
                                         ReducingExtensionGate, ReducingGate)

GATES += [
    RandomAccessGate(bits=4, num_copies=2),
    RandomAccessGate(bits=1, num_copies=3),
    U32SubtractionGate(num_ops=2),
    ComparisonGate(num_bits=32),
    ExponentiationGate(num_power_bits=6),
    ArithmeticExtensionGate(num_ops=3),
    MulExtensionGate(num_ops=4),
    ReducingGate(num_coeffs=5),
    ReducingExtensionGate(num_coeffs=3),
]

from plonky2_tpu.gates.coset_interpolation import CosetInterpolationGate  # noqa: E402

GATES += [
    CosetInterpolationGate(subgroup_bits=1),
    CosetInterpolationGate(subgroup_bits=2),
    CosetInterpolationGate(subgroup_bits=3),
]


def _rand_arr(shape):
    return jnp.asarray(np.array(
        [[RNG.randrange(gl.P) for _ in range(shape[1])]
         for _ in range(shape[0])], dtype=np.uint64))


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.key())
def test_fast_matches_generic(gate):
    N = 4
    wires = _rand_arr((max(gate.num_wires, 1), N))
    consts = _rand_arr((max(gate.num_constants, 2), N))
    pi = [jnp.asarray(np.full(N, RNG.randrange(gl.P), dtype=np.uint64))
          for _ in range(4)]
    alg = BatchAlg((N,))
    vars_ = EvalVars(list(wires), list(consts), pi)
    generic = gate.eval(vars_, alg)
    assert len(generic) == gate.num_constraints
    if not hasattr(gate, "eval_batch_fast"):
        return
    fast = gate.eval_batch_fast(wires, consts, pi)
    assert len(list(fast)) == gate.num_constraints
    for i, (a, b) in enumerate(zip(generic, fast)):
        assert gl.batch_to_int(a) == gl.batch_to_int(b), f"constraint {i}"


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.key())
def test_low_degree(gate):
    if gate.num_constraints == 0:
        return
    deg = max(gate.degree, 1)
    m = 1 << (deg + 1).bit_length()          # points > max constraint degree
    w = gl.primitive_root_of_unity(m.bit_length() - 1)
    xs = [pow(w, i, gl.P) for i in range(m)]
    # linear wire/constant polynomials a + b*x
    def lin():
        a, b = RNG.randrange(gl.P), RNG.randrange(gl.P)
        return np.array([(a + b * x) % gl.P for x in xs], dtype=np.uint64)

    wires = jnp.asarray(np.stack([lin() for _ in range(max(gate.num_wires, 1))]))
    consts = jnp.asarray(np.stack([lin() for _ in range(max(gate.num_constants, 2))]))
    pi = [jnp.asarray(lin()) for _ in range(4)]
    alg = BatchAlg((m,))
    outs = gate.eval(EvalVars(list(wires), list(consts), pi), alg)
    for i, c in enumerate(outs):
        coeffs = gl.batch_to_int(intt(c))
        for j in range(gate.degree + 1, m):
            assert coeffs[j] == 0, \
                f"constraint {i} has degree >= {j} (> {gate.degree})"
