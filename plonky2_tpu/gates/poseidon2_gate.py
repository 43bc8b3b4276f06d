"""Poseidon2Gate: one full width-12 Poseidon2 permutation per row.

The reference's gate whitelist ships `Poseidon2Gate` (with PoseidonGate
commented out — /root/reference/src/ecdsa/gadgets/ecdsa.rs:85-87); this is
the TPU-native equivalent.  Same 135-wire checkpoint layout as
poseidon_gate.py:

    0..11    inputs (routed)        12..23  outputs (routed)
    24       swap flag              25..28  delta_i
    29..64   s-box inputs of first-half external rounds r=1..3
    65..86   s-box inputs (lane 0) of the 22 internal rounds
    87..134  s-box inputs of second-half external rounds r=0..3

Differences from Poseidon: an initial external-matrix application before
round 0 (linear — no checkpoint), internal rounds add a round constant to
lane 0 only, and the linear layers are M_E / M_I (hashes/poseidon2.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import gl
from ..hashes import poseidon2 as p2
from ..witness import Generator
from .base import Gate
from .poseidon_gate import (NUM_WIRES, WIRE_DELTA, WIRE_FULL1, WIRE_FULL2,
                            WIRE_INPUT, WIRE_OUTPUT, WIRE_PARTIAL, WIRE_SWAP)

W = p2.WIDTH
HALF = p2.EXTERNAL_ROUNDS // 2


class Poseidon2Gate(Gate):
    def key(self) -> str:
        return "Poseidon2(width=12)"

    @property
    def num_wires(self):
        return NUM_WIRES

    @property
    def degree(self):
        return 7

    @property
    def num_constraints(self):
        return 1 + 4 + 36 + p2.INTERNAL_ROUNDS + 48 + 12

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

        def matmul(m, state):
            out = []
            for i in range(W):
                acc = alg.mul_const(m[i][0], state[0])
                for j in range(1, W):
                    acc = alg.add(acc, alg.mul_const(m[i][j], state[j]))
                out.append(acc)
            return out

        s = []
        for i in range(4):
            s.append(alg.add(w[WIRE_INPUT + i], w[WIRE_DELTA + i]))
        for i in range(4):
            s.append(alg.sub(w[WIRE_INPUT + 4 + i], w[WIRE_DELTA + i]))
        for i in range(8, 12):
            s.append(w[WIRE_INPUT + i])

        s = matmul(p2.M_E, s)
        for r in range(HALF):
            s = [alg.add_const(x, p2.EXTERNAL_RCS[r][i])
                 for i, x in enumerate(s)]
            if r > 0:
                base = WIRE_FULL1 + 12 * (r - 1)
                for i in range(W):
                    cs.append(alg.sub(s[i], w[base + i]))
                s = [w[base + i] for i in range(W)]
            s = matmul(p2.M_E, [sbox(x) for x in s])
        for r in range(p2.INTERNAL_ROUNDS):
            lane0 = alg.add_const(s[0], p2.INTERNAL_RCS[r])
            cs.append(alg.sub(lane0, w[WIRE_PARTIAL + r]))
            s = matmul(p2.M_I, [sbox(w[WIRE_PARTIAL + r])] + s[1:])
        for fr in range(HALF):
            r = HALF + fr
            s = [alg.add_const(x, p2.EXTERNAL_RCS[r][i])
                 for i, x in enumerate(s)]
            base = WIRE_FULL2 + 12 * fr
            for i in range(W):
                cs.append(alg.sub(s[i], w[base + i]))
            s = matmul(p2.M_E, [sbox(w[base + i]) for i in range(W)])
        for i in range(W):
            cs.append(alg.sub(w[WIRE_OUTPUT + i], s[i]))
        return cs

    # ---------------- stacked fast evaluation (prover) ----------------

    def eval_batch_fast(self, wires, constants, pi_hash):
        w = wires
        N = wires.shape[1]
        cs = []
        swap = w[WIRE_SWAP]
        one = jnp.broadcast_to(gl.U64(1), (N,))
        cs.append(gl.mul(swap, gl.sub(swap, one)))
        ins = w[WIRE_INPUT:WIRE_INPUT + 12]
        delta = w[WIRE_DELTA:WIRE_DELTA + 4]
        for i in range(4):
            cs.append(gl.sub(gl.mul(swap, gl.sub(ins[4 + i], ins[i])),
                             delta[i]))

        def sbox(x):
            x3 = gl.mul(gl.sqr(x), x)
            return gl.mul(gl.sqr(x3), x)

        def matmul(m_dev, s):  # s [12, N]
            prod = gl.mul(m_dev[:, :, None], s[None, :, :])
            acc = prod[:, 0]
            for j in range(1, W):
                acc = gl.add(acc, prod[:, j])
            return acc

        s = jnp.concatenate([
            gl.add(ins[:4], delta),
            gl.sub(ins[4:8], delta),
            ins[8:12],
        ], axis=0)

        s = matmul(p2._ME_DEV, s)
        for r in range(HALF):
            s = gl.add(s, p2._ERC_DEV[r][:, None])
            if r > 0:
                base = WIRE_FULL1 + 12 * (r - 1)
                chk = w[base:base + 12]
                cs.extend(gl.sub(s, chk))
                s = chk
            s = matmul(p2._ME_DEV, sbox(s))
        for r in range(p2.INTERNAL_ROUNDS):
            lane0 = gl.add(s[0], jnp.broadcast_to(p2._IRC_DEV[r], (N,)))
            wk = w[WIRE_PARTIAL + r]
            cs.append(gl.sub(lane0, wk))
            s = matmul(p2._MI_DEV,
                       jnp.concatenate([sbox(wk)[None], s[1:]], axis=0))
        for fr in range(HALF):
            r = HALF + fr
            s = gl.add(s, p2._ERC_DEV[r][:, None])
            base = WIRE_FULL2 + 12 * fr
            chk = w[base:base + 12]
            cs.extend(gl.sub(s, chk))
            s = matmul(p2._ME_DEV, sbox(chk))
        cs.extend(gl.sub(w[WIRE_OUTPUT:WIRE_OUTPUT + 12], s))
        return jnp.stack(cs, axis=0)

    # ---------------- witness ----------------

    def generators(self, row, constants):
        return [Poseidon2Generator(row)]


class Poseidon2Generator(Generator):
    def __init__(self, row: int):
        from ..ir.builder import Wire
        self.row = row
        self.deps = [Wire(row, WIRE_INPUT + i) for i in range(W)] + \
                    [Wire(row, WIRE_SWAP)]
        self.outs = [Wire(row, c)
                     for c in range(WIRE_OUTPUT, WIRE_OUTPUT + W)] + \
                    [Wire(row, c) for c in range(WIRE_DELTA, NUM_WIRES)]

    def run(self, get):
        from ..ir.builder import Wire
        row = self.row
        ins = [get(Wire(row, WIRE_INPUT + i)) for i in range(W)]
        swap = get(Wire(row, WIRE_SWAP))
        out = []
        delta = [(swap * ((ins[4 + i] - ins[i]) % gl.P)) % gl.P
                 for i in range(4)]
        for i in range(4):
            out.append((Wire(row, WIRE_DELTA + i), delta[i]))

        s = [(ins[i] + delta[i]) % gl.P for i in range(4)] + \
            [(ins[4 + i] - delta[i]) % gl.P for i in range(4)] + ins[8:]

        s = p2._matmul_s(p2.M_E, s)
        for r in range(HALF):
            s = [(x + c) % gl.P for x, c in zip(s, p2.EXTERNAL_RCS[r])]
            if r > 0:
                base = WIRE_FULL1 + 12 * (r - 1)
                for i in range(W):
                    out.append((Wire(row, base + i), s[i]))
            s = p2._matmul_s(p2.M_E, [p2._sbox_s(x) for x in s])
        for r in range(p2.INTERNAL_ROUNDS):
            lane0 = (s[0] + p2.INTERNAL_RCS[r]) % gl.P
            out.append((Wire(row, WIRE_PARTIAL + r), lane0))
            s = p2._matmul_s(p2.M_I, [p2._sbox_s(lane0)] + s[1:])
        for fr in range(HALF):
            r = HALF + fr
            s = [(x + c) % gl.P for x, c in zip(s, p2.EXTERNAL_RCS[r])]
            base = WIRE_FULL2 + 12 * fr
            for i in range(W):
                out.append((Wire(row, base + i), s[i]))
            s = p2._matmul_s(p2.M_E, [p2._sbox_s(x) for x in s])
        for i in range(W):
            out.append((Wire(row, WIRE_OUTPUT + i), s[i]))
        return out
