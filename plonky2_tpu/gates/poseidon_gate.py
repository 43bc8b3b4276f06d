"""PoseidonGate: one full width-12 permutation per row.

Wire layout (135 wires total — the reason standard configs have 135 wires,
same discipline as plonky2's PoseidonGate):

    0..11    inputs (routed)
    12..23   outputs (routed)
    24       swap flag (routed) — swaps input[0..4] with input[4..8]
    25..28   delta_i = swap * (input[4+i] - input[i])
    29..64   s-box inputs of first-half full rounds r=1..3 (12 each)
    65..86   s-box inputs (lane 0) of the 22 partial rounds
    87..134  s-box inputs of second-half full rounds r=0..3 (12 each)

Every s-box input is exposed as a wire and the permutation is re-derived
between checkpoints, keeping each constraint at degree 7 (alpha=7 s-box).
123 constraints: 1 swap-boolean + 4 delta + 36 + 22 + 48 checkpoint + 12
output.

`eval` is the generic-algebra definition (used by the verifier at zeta and
by tests); `eval_batch_fast` is the stacked device formulation the prover
uses on the LDE domain (state kept as a [12, N] array so the MDS layer is
one broadcast mul + tree add instead of 144 scalar ops).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import gl
from ..hashes import poseidon
from ..witness import Generator
from .base import Gate

W = poseidon.WIDTH

WIRE_INPUT = 0
WIRE_OUTPUT = 12
WIRE_SWAP = 24
WIRE_DELTA = 25
WIRE_FULL1 = 29              # rounds 1..3, 12 each
WIRE_PARTIAL = 65            # 22 lanes
WIRE_FULL2 = 87              # rounds 0..3, 12 each
NUM_WIRES = 135


class PoseidonGate(Gate):
    def key(self) -> str:
        return "Poseidon(width=12)"

    @property
    def num_wires(self):
        return NUM_WIRES

    @property
    def degree(self):
        return 7

    @property
    def num_constraints(self):
        return 1 + 4 + 36 + 22 + 48 + 12

    # ---------------- generic evaluation ----------------

    def eval(self, vars, alg):
        w = vars.local_wires
        cs = []
        swap = w[WIRE_SWAP]
        cs.append(alg.mul(swap, alg.add_const(swap, gl.P - 1)))
        for i in range(4):
            diff = alg.sub(w[WIRE_INPUT + 4 + i], w[WIRE_INPUT + i])
            cs.append(alg.sub(alg.mul(swap, diff), w[WIRE_DELTA + i]))

        def sbox(x):
            x2 = alg.mul(x, x)
            x3 = alg.mul(x2, x)
            return alg.mul(alg.mul(x3, x3), x)

        def mds(state):
            out = []
            for i in range(W):
                acc = alg.mul_const(poseidon.MDS[i][0], state[0])
                for j in range(1, W):
                    acc = alg.add(acc, alg.mul_const(poseidon.MDS[i][j], state[j]))
                out.append(acc)
            return out

        # swapped input state
        s = []
        for i in range(4):
            s.append(alg.add(w[WIRE_INPUT + i], w[WIRE_DELTA + i]))
        for i in range(4):
            s.append(alg.sub(w[WIRE_INPUT + 4 + i], w[WIRE_DELTA + i]))
        for i in range(8, 12):
            s.append(w[WIRE_INPUT + i])

        r = 0
        for fr in range(4):
            s = [alg.add_const(x, poseidon.ROUND_CONSTANTS[r][i])
                 for i, x in enumerate(s)]
            if fr > 0:
                base = WIRE_FULL1 + 12 * (fr - 1)
                for i in range(W):
                    cs.append(alg.sub(s[i], w[base + i]))
                s = [w[base + i] for i in range(W)]
            s = mds([sbox(x) for x in s])
            r += 1
        for k in range(poseidon.PARTIAL_ROUNDS):
            s = [alg.add_const(x, poseidon.ROUND_CONSTANTS[r][i])
                 for i, x in enumerate(s)]
            cs.append(alg.sub(s[0], w[WIRE_PARTIAL + k]))
            s = mds([sbox(w[WIRE_PARTIAL + k])] + s[1:])
            r += 1
        for fr in range(4):
            s = [alg.add_const(x, poseidon.ROUND_CONSTANTS[r][i])
                 for i, x in enumerate(s)]
            base = WIRE_FULL2 + 12 * fr
            for i in range(W):
                cs.append(alg.sub(s[i], w[base + i]))
            s = mds([sbox(w[base + i]) for i in range(W)])
            r += 1
        for i in range(W):
            cs.append(alg.sub(w[WIRE_OUTPUT + i], s[i]))
        return cs

    # ---------------- stacked fast evaluation (prover) ----------------

    def eval_batch_fast(self, wires, constants, pi_hash):
        """wires: [num_wires, N] u64 -> [num_constraints, N]."""
        w = wires
        N = wires.shape[1]
        cs = []
        swap = w[WIRE_SWAP]
        one = jnp.broadcast_to(gl.U64(1), (N,))
        cs.append(gl.mul(swap, gl.sub(swap, one)))
        ins = w[WIRE_INPUT:WIRE_INPUT + 12]
        delta = w[WIRE_DELTA:WIRE_DELTA + 4]
        for i in range(4):
            cs.append(gl.sub(gl.mul(swap, gl.sub(ins[4 + i], ins[i])), delta[i]))

        def sbox(x):
            x3 = gl.mul(gl.sqr(x), x)
            return gl.mul(gl.sqr(x3), x)

        mds = poseidon.mds_cols  # [12, N] -> [12, N], small-entry fast path

        s = jnp.concatenate([
            gl.add(ins[:4], delta),
            gl.sub(ins[4:8], delta),
            ins[8:12],
        ], axis=0)

        rc = poseidon._RC_DEV
        r = 0
        for fr in range(4):
            s = gl.add(s, rc[r][:, None])
            if fr > 0:
                base = WIRE_FULL1 + 12 * (fr - 1)
                chk = w[base:base + 12]
                cs.extend(gl.sub(s, chk))
                s = chk
            s = mds(sbox(s))
            r += 1
        for k in range(poseidon.PARTIAL_ROUNDS):
            s = gl.add(s, rc[r][:, None])
            wk = w[WIRE_PARTIAL + k]
            cs.append(gl.sub(s[0], wk))
            s = mds(jnp.concatenate([sbox(wk)[None], s[1:]], axis=0))
            r += 1
        for fr in range(4):
            s = gl.add(s, rc[r][:, None])
            base = WIRE_FULL2 + 12 * fr
            chk = w[base:base + 12]
            cs.extend(gl.sub(s, chk))
            s = mds(sbox(chk))
            r += 1
        cs.extend(gl.sub(w[WIRE_OUTPUT:WIRE_OUTPUT + 12], s))
        return jnp.stack(cs, axis=0)

    # ---------------- witness ----------------

    def generators(self, row, constants):
        return [PoseidonGenerator(row)]

    def aux_fill(self, rows, wires):
        """Batched fill of the 110 internal s-box/delta wires for every
        Poseidon row at once (native C++ row engine when available), after
        the dataflow pass scattered inputs/swap/outputs.  Keeping these
        out of the Python dataflow store cuts witness-gen dict traffic by
        ~10x (each generator emits 12 pairs instead of 134)."""
        import numpy as np
        aux = 4 + 3 * W + poseidon.PARTIAL_ROUNDS + 4 * W
        ins = wires[WIRE_INPUT:WIRE_INPUT + W][:, rows].T   # [R, 12]
        swaps = wires[WIRE_SWAP][rows]
        vals = None
        if poseidon._MDS_SMALL:
            from .. import native
            vals = native.poseidon_rows(
                ins, swaps, poseidon.ROUND_CONSTANTS, poseidon.MDS,
                poseidon.FULL_ROUNDS // 2, poseidon.PARTIAL_ROUNDS)
        if vals is None:                       # scalar fallback (no g++)
            vals = np.empty((len(rows), aux + W), dtype=np.uint64)
            for i in range(len(rows)):
                a, o = _permute_row([int(x) for x in ins[i]], int(swaps[i]))
                vals[i, :aux] = a
                vals[i, aux:] = o
        wires[WIRE_DELTA:WIRE_DELTA + aux][:, rows] = vals[:, :aux].T


def _permute_row(ins, swap):
    """Scalar permutation -> (aux wire values [WIRE_DELTA..134], outputs)."""
    out = []
    delta = [(swap * ((ins[4 + i] - ins[i]) % gl.P)) % gl.P for i in range(4)]
    out.extend(delta)

    s = [(ins[i] + delta[i]) % gl.P for i in range(4)] + \
        [(ins[4 + i] - delta[i]) % gl.P for i in range(4)] + ins[8:]

    def sbox(x):
        x3 = x * x % gl.P * x % gl.P
        return x3 * x3 % gl.P * x % gl.P

    def mds(state):
        return [sum(poseidon.MDS[i][j] * state[j] for j in range(W)) % gl.P
                for i in range(W)]

    r = 0
    for fr in range(4):
        s = [(x + c) % gl.P for x, c in zip(s, poseidon.ROUND_CONSTANTS[r])]
        if fr > 0:
            out.extend(s)
        s = mds([sbox(x) for x in s])
        r += 1
    for k in range(poseidon.PARTIAL_ROUNDS):
        s = [(x + c) % gl.P for x, c in zip(s, poseidon.ROUND_CONSTANTS[r])]
        out.append(s[0])
        s = mds([sbox(s[0])] + s[1:])
        r += 1
    for fr in range(4):
        s = [(x + c) % gl.P for x, c in zip(s, poseidon.ROUND_CONSTANTS[r])]
        out.extend(s)
        s = mds([sbox(x) for x in s])
        r += 1
    return out, s


class PoseidonGenerator(Generator):
    """Fills the 12 output wires from the 12 input wires + swap flag; the
    110 internal s-box/delta wires are filled later by the gate's batched
    `aux_fill` (they never feed dataflow)."""

    def __init__(self, row: int):
        from ..ir.builder import Wire
        self.row = row
        self.deps = [Wire(row, WIRE_INPUT + i) for i in range(W)] + \
                    [Wire(row, WIRE_SWAP)]
        self.outs = [Wire(row, c) for c in range(WIRE_OUTPUT, WIRE_OUTPUT + W)]

    def run(self, get):
        from ..ir.builder import Wire
        row = self.row
        ins = [get(Wire(row, WIRE_INPUT + i)) for i in range(W)]
        swap = get(Wire(row, WIRE_SWAP))

        # native row engine (C++ Goldilocks; ~100x the Python permutation).
        # Gated on the small-entry MDS (the native accumulator assumes it).
        if poseidon._MDS_SMALL:
            from .. import native
            import numpy as np
            vals = native.poseidon_rows(
                np.array([ins], dtype=np.uint64),
                np.array([swap], dtype=np.uint64),
                poseidon.ROUND_CONSTANTS, poseidon.MDS,
                poseidon.FULL_ROUNDS // 2, poseidon.PARTIAL_ROUNDS)
            if vals is not None:
                v = vals[0]
                aux = 4 + 3 * W + poseidon.PARTIAL_ROUNDS + 4 * W
                return [(Wire(row, WIRE_OUTPUT + i), int(v[aux + i]))
                        for i in range(W)]

        _, outs = _permute_row(ins, swap)
        return [(Wire(row, WIRE_OUTPUT + i), v) for i, v in enumerate(outs)]
