"""Interleave / uninterleave gates: the XOR-via-addition representation.

TPU-native re-design of the reference's three custom gates
(/root/reference/src/u32/gates/interleave_u32.rs:84-228,
uninterleave_to_u32.rs:24-77, uninterleave_to_b32.rs:28-36):

* `U32InterleaveGate`: x (u32) -> x_interleaved with bit i moved to bit 2i.
  Adding two interleaved values then computes XOR in the even bit positions
  and AND in the odd ones, with no bit-blast per op.
* `UninterleaveToU32Gate`: decompose a "dirty" sum of two interleaved
  values into 64 bits; x_evens := packed even bits = XOR, x_odds := packed
  odd bits = AND (carry bits), both returned as plain u32.
* `UninterleaveToB32Gate`: same decomposition but the outputs stay in
  interleaved (B32) form so chained XORs can keep adding
  (`unsafe_xor_many_u32` — the soundness caveat of interleaved sums
  exceeding the field order carries over verbatim, see
  /root/reference/src/u32/interleaved_u32.rs:132-144).

Unlike the reference, gate serialization is NOT todo!(): these gates carry
their parameters in `key()` like every other gate here (SURVEY.md §7.5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..witness import LambdaGenerator
from .base import Gate


def _bool_constraint(alg, b):
    return alg.mul(b, alg.add_const(b, gl.P - 1))


def _bool_fast(bits):
    return gl.mul(bits, gl.sub(bits, jnp.ones_like(bits)))


def _wsum(bits, weights):
    """bits [k, L, N] x weights [L] -> [k, N]."""
    return gl.sum_mod(gl.mul(bits, jnp.asarray(weights)[None, :, None]), axis=1)


class U32InterleaveGate(Gate):
    """Per-op: routed (x, x_interleaved), aux (32 bits, may live past the
    routed region)."""

    IO_WIRES = 2
    AUX_WIRES = 32

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        per_op = U32InterleaveGate.IO_WIRES + U32InterleaveGate.AUX_WIRES
        return U32InterleaveGate(max(1, min(
            config.num_wires // per_op,
            config.num_routed_wires // U32InterleaveGate.IO_WIRES)))

    def key(self):
        return f"U32Interleave(num_ops={self.num_ops})"

    @property
    def num_wires(self):
        return (self.IO_WIRES + self.AUX_WIRES) * self.num_ops

    @property
    def degree(self):
        return 2

    @property
    def num_constraints(self):
        return self.num_ops * 34

    def wires_op(self, i):
        b = self.IO_WIRES * i
        aux = self.IO_WIRES * self.num_ops + self.AUX_WIRES * i
        return dict(x=b, x_il=b + 1, bits=aux)

    def eval(self, vars, alg):
        w = vars.local_wires
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            bits = [w[ws["bits"] + j] for j in range(32)]
            acc2 = alg.zero
            acc4 = alg.zero
            for j in range(31, -1, -1):
                acc2 = alg.add(alg.mul_const(2, acc2), bits[j])
                acc4 = alg.add(alg.mul_const(4, acc4), bits[j])
            out.append(alg.sub(acc2, w[ws["x"]]))
            out.append(alg.sub(acc4, w[ws["x_il"]]))
            out.extend(_bool_constraint(alg, b) for b in bits)
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        idx = [self.wires_op(i) for i in range(self.num_ops)]
        x = wires[jnp.asarray([w["x"] for w in idx])]
        x_il = wires[jnp.asarray([w["x_il"] for w in idx])]
        bits = wires[jnp.asarray(
            [[w["bits"] + j for j in range(32)] for w in idx])]   # [ops,32,N]
        w2 = np.array([1 << i for i in range(32)], dtype=np.uint64)
        w4 = np.array([(1 << (2 * i)) % gl.P for i in range(32)], dtype=np.uint64)
        r2 = gl.sub(_wsum(bits, w2), x)
        r4 = gl.sub(_wsum(bits, w4), x_il)
        rb = _bool_fast(bits)
        out = []
        for i in range(self.num_ops):
            out.append(r2[i])
            out.append(r4[i])
            out.extend(rb[i])
        return out

    def generators(self, row, constants):
        from ..ir.builder import Wire
        gens = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)

            def fn(vals, row=row, ws=ws):
                x = vals[0]
                out = []
                il = 0
                for j in range(32):
                    b = (x >> j) & 1
                    il |= b << (2 * j)
                    out.append((Wire(row, ws["bits"] + j), b))
                out.append((Wire(row, ws["x_il"]), il))
                return out

            gens.append(LambdaGenerator(
                [Wire(row, ws["x"])], fn,
                outs=[Wire(row, ws["x_il"])] +
                     [Wire(row, ws["bits"] + j) for j in range(32)],
                op=("interleave",)))
        return gens


class _UninterleaveBase(Gate):
    """Shared: input (dirty 64-bit value) + 64 bit wires + 2 packed outputs.

    Per-op wires: x_dirty, out_evens, out_odds, 64 bits (67)."""

    IO_WIRES = 3
    AUX_WIRES = 64
    # subclass sets the packing base for outputs: 2 (u32) or 4 (B32)
    PACK_BASE = None
    NAME = None

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @classmethod
    def from_config(cls, config):
        return cls(max(1, min(config.num_wires // (cls.IO_WIRES + cls.AUX_WIRES),
                              config.num_routed_wires // cls.IO_WIRES)))

    def key(self):
        return f"{self.NAME}(num_ops={self.num_ops})"

    @property
    def num_wires(self):
        return (self.IO_WIRES + self.AUX_WIRES) * self.num_ops

    @property
    def degree(self):
        return 2

    @property
    def num_constraints(self):
        return self.num_ops * 67

    def wires_op(self, i):
        b = self.IO_WIRES * i
        aux = self.IO_WIRES * self.num_ops + self.AUX_WIRES * i
        return dict(x=b, evens=b + 1, odds=b + 2, bits=aux)

    def eval(self, vars, alg):
        w = vars.local_wires
        B = self.PACK_BASE
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            bits = [w[ws["bits"] + j] for j in range(64)]
            acc2 = alg.zero
            for j in range(63, -1, -1):
                acc2 = alg.add(alg.mul_const(2, acc2), bits[j])
            out.append(alg.sub(acc2, w[ws["x"]]))
            acc_e = alg.zero
            acc_o = alg.zero
            for j in range(31, -1, -1):
                acc_e = alg.add(alg.mul_const(B, acc_e), bits[2 * j])
                acc_o = alg.add(alg.mul_const(B, acc_o), bits[2 * j + 1])
            out.append(alg.sub(acc_e, w[ws["evens"]]))
            out.append(alg.sub(acc_o, w[ws["odds"]]))
            out.extend(_bool_constraint(alg, b) for b in bits)
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        B = self.PACK_BASE
        idx = [self.wires_op(i) for i in range(self.num_ops)]
        x = wires[jnp.asarray([w["x"] for w in idx])]
        evens = wires[jnp.asarray([w["evens"] for w in idx])]
        odds = wires[jnp.asarray([w["odds"] for w in idx])]
        bits = wires[jnp.asarray(
            [[w["bits"] + j for j in range(64)] for w in idx])]   # [ops,64,N]
        w2 = np.array([(1 << i) % gl.P for i in range(64)], dtype=np.uint64)
        r2 = gl.sub(_wsum(bits, w2), x)
        wB = np.array([pow(B, i, gl.P) for i in range(32)], dtype=np.uint64)
        re = gl.sub(_wsum(bits[:, 0::2, :], wB), evens)
        ro = gl.sub(_wsum(bits[:, 1::2, :], wB), odds)
        rb = _bool_fast(bits)
        out = []
        for i in range(self.num_ops):
            out.append(r2[i])
            out.append(re[i])
            out.append(ro[i])
            out.extend(rb[i])
        return out

    def generators(self, row, constants):
        from ..ir.builder import Wire
        B = self.PACK_BASE
        gens = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)

            def fn(vals, row=row, ws=ws):
                x = vals[0]
                out = []
                ev = od = 0
                for j in range(64):
                    b = (x >> j) & 1
                    out.append((Wire(row, ws["bits"] + j), b))
                for j in range(32):
                    ev += ((x >> (2 * j)) & 1) * (B ** j)
                    od += ((x >> (2 * j + 1)) & 1) * (B ** j)
                out.append((Wire(row, ws["evens"]), ev))
                out.append((Wire(row, ws["odds"]), od))
                return out

            gens.append(LambdaGenerator(
                [Wire(row, ws["x"])], fn,
                outs=[Wire(row, ws["evens"]), Wire(row, ws["odds"])] +
                     [Wire(row, ws["bits"] + j) for j in range(64)],
                op=("uninterleave", B)))
        return gens


class UninterleaveToU32Gate(_UninterleaveBase):
    PACK_BASE = 2
    NAME = "UninterleaveToU32"


class UninterleaveToB32Gate(_UninterleaveBase):
    PACK_BASE = 4
    NAME = "UninterleaveToB32"
