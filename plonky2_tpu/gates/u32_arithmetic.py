"""U32ArithmeticGate and U32AddManyGate: packed 32-bit ops with inline
base-4 range decomposition.

TPU-native equivalents of plonky2_u32's U32ArithmeticGate / U32AddManyGate
(reference whitelist /root/reference/src/ecdsa/gadgets/ecdsa.rs:91-95;
consumed by every biguint/nonnative gadget).  Layout is original: each op
carries its own lo/hi range limbs so one row proves `x*y + z = lo + hi*2^32`
with both halves range-checked.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..witness import LambdaGenerator
from .base import Gate

_LIMBS = 16          # base-4 limbs per u32
_BASE = 4

_W4 = np.array([1 << (2 * i) for i in range(_LIMBS)], dtype=np.uint64)


def _range_fast(limbs):
    """limbs [..., N] -> product limb*(limb-1)*(limb-2)*(limb-3)."""
    one = jnp.ones_like(limbs)
    p = gl.mul(limbs, gl.sub(limbs, one))
    p = gl.mul(p, gl.sub(limbs, gl.add(one, one)))
    return gl.mul(p, gl.sub(limbs, gl.add(gl.add(one, one), one)))


def _recompose_fast(limbs):
    """limbs [k, 16, N] -> [k, N] base-4 recomposition."""
    return gl.sum_mod(gl.mul(limbs, jnp.asarray(_W4)[None, :, None]), axis=1)


def _range_constraints(alg, wires, start, count):
    out = []
    for i in range(count):
        limb = wires[start + i]
        prod = limb
        for v in range(1, _BASE):
            prod = alg.mul(prod, alg.add_const(limb, gl.P - v))
        out.append(prod)
    return out


def _recompose(alg, wires, start, count):
    acc = alg.zero
    for i in range(count - 1, -1, -1):
        acc = alg.add(alg.mul_const(_BASE, acc), wires[start + i])
    return acc


class U32ArithmeticGate(Gate):
    """num_ops slots of: x*y + z -> (lo, hi) as u32 halves.

    Wire layout: routed io block first (5 wires per op: x, y, z, lo, hi),
    then the aux range-decomposition limbs (32 per op) — aux wires may live
    past num_routed_wires, so a 135-wire config packs 3 ops/row and
    wide_ecc_config (234 wires) packs 6, like plonky2_u32.
    """

    IO_WIRES = 5
    AUX_WIRES = 2 * _LIMBS

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config) -> "U32ArithmeticGate":
        per_op = U32ArithmeticGate.IO_WIRES + U32ArithmeticGate.AUX_WIRES
        return U32ArithmeticGate(max(1, min(
            config.num_wires // per_op,
            config.num_routed_wires // U32ArithmeticGate.IO_WIRES)))

    def key(self) -> str:
        return f"U32Arithmetic(num_ops={self.num_ops})"

    @property
    def num_wires(self):
        return (self.IO_WIRES + self.AUX_WIRES) * self.num_ops

    @property
    def degree(self):
        return _BASE

    @property
    def num_constraints(self):
        return self.num_ops * (3 + 2 * _LIMBS)

    def wires_op(self, i: int):
        b = self.IO_WIRES * i
        aux = self.IO_WIRES * self.num_ops + self.AUX_WIRES * i
        return dict(x=b, y=b + 1, z=b + 2, lo=b + 3, hi=b + 4,
                    lo_limbs=aux, hi_limbs=aux + _LIMBS)

    def eval(self, vars, alg):
        w = vars.local_wires
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            x, y, z = w[ws["x"]], w[ws["y"]], w[ws["z"]]
            lo, hi = w[ws["lo"]], w[ws["hi"]]
            combined = alg.add(lo, alg.mul_const(1 << 32, hi))
            out.append(alg.sub(alg.add(alg.mul(x, y), z), combined))
            out.append(alg.sub(_recompose(alg, w, ws["lo_limbs"], _LIMBS), lo))
            out.append(alg.sub(_recompose(alg, w, ws["hi_limbs"], _LIMBS), hi))
            out.extend(_range_constraints(alg, w, ws["lo_limbs"], _LIMBS))
            out.extend(_range_constraints(alg, w, ws["hi_limbs"], _LIMBS))
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        idx = [self.wires_op(i) for i in range(self.num_ops)]
        g = lambda k: wires[jnp.asarray([w[k] for w in idx])]     # [ops, N]
        x, y, z = g("x"), g("y"), g("z")
        lo, hi = g("lo"), g("hi")
        lo_limbs = wires[jnp.asarray(
            [[w["lo_limbs"] + j for j in range(_LIMBS)] for w in idx])]
        hi_limbs = wires[jnp.asarray(
            [[w["hi_limbs"] + j for j in range(_LIMBS)] for w in idx])]
        main = gl.sub(gl.add(gl.mul(x, y), z),
                      gl.add(lo, gl.mul(hi, jnp.full_like(hi, gl.U64(1 << 32)))))
        rlo = gl.sub(_recompose_fast(lo_limbs), lo)
        rhi = gl.sub(_recompose_fast(hi_limbs), hi)
        rnlo = _range_fast(lo_limbs)
        rnhi = _range_fast(hi_limbs)
        out = []
        for i in range(self.num_ops):
            out.append(main[i])
            out.append(rlo[i])
            out.append(rhi[i])
            out.extend(rnlo[i])
            out.extend(rnhi[i])
        return out

    def generators(self, row, constants):
        # Only the routed dataflow (x*y+z -> lo, hi) goes through the
        # scheduler; the 32 range limbs per op are batch-filled by
        # `aux_fill` after the dataflow fixed point.
        from ..ir.builder import Wire
        gens = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)

            def fn(vals, row=row, ws=ws):
                x, y, z = vals
                r = (x * y + z)
                return [(Wire(row, ws["lo"]), r & 0xFFFFFFFF),
                        (Wire(row, ws["hi"]), r >> 32)]

            gens.append(LambdaGenerator(
                [Wire(row, ws["x"]), Wire(row, ws["y"]), Wire(row, ws["z"])],
                fn, outs=[Wire(row, ws["lo"]), Wire(row, ws["hi"])],
                op=("u32muladd",)))
        return gens

    def aux_fill(self, rows, wires):
        """Vectorized limb fill for every row of this gate type: reads the
        scattered lo/hi io wires and writes the base-4 decompositions."""
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            lo = wires[ws["lo"], rows]
            hi = wires[ws["hi"], rows]
            for j in range(_LIMBS):
                sh = np.uint64(2 * j)
                wires[ws["lo_limbs"] + j, rows] = (lo >> sh) & np.uint64(3)
                wires[ws["hi_limbs"] + j, rows] = (hi >> sh) & np.uint64(3)


class U32AddManyGate(Gate):
    """num_ops slots of: sum(addends) + carry_in -> (lo u32, hi small).

    Per-op: routed io (addends[n], carry_in, lo, hi) then aux limbs
    (16 lo + 2 hi) which may live past num_routed_wires.  Requires
    n + max carry_in < 16 so hi fits 2 base-4 limbs.
    """

    AUX_WIRES = _LIMBS + 2

    def __init__(self, num_addends: int, num_ops: int = 1):
        assert 2 <= num_addends <= 14
        self.num_addends = num_addends
        self.num_ops = num_ops

    @staticmethod
    def from_config(config, num_addends: int) -> "U32AddManyGate":
        io = num_addends + 3
        per_op = io + U32AddManyGate.AUX_WIRES
        return U32AddManyGate(num_addends, max(1, min(
            config.num_wires // per_op, config.num_routed_wires // io)))

    def key(self) -> str:
        return f"U32AddMany(num_addends={self.num_addends},num_ops={self.num_ops})"

    @property
    def io_wires(self):
        return self.num_addends + 3

    @property
    def num_wires(self):
        return (self.io_wires + self.AUX_WIRES) * self.num_ops

    @property
    def degree(self):
        return _BASE

    @property
    def num_constraints(self):
        return self.num_ops * (3 + _LIMBS + 2)

    def wires_op(self, i: int):
        n = self.num_addends
        b = self.io_wires * i
        aux = self.io_wires * self.num_ops + self.AUX_WIRES * i
        return dict(addends=b, carry_in=b + n, lo=b + n + 1, hi=b + n + 2,
                    lo_limbs=aux, hi_limbs=aux + _LIMBS)

    def eval(self, vars, alg):
        w = vars.local_wires
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            acc = w[ws["carry_in"]]
            for j in range(self.num_addends):
                acc = alg.add(acc, w[ws["addends"] + j])
            lo, hi = w[ws["lo"]], w[ws["hi"]]
            out.append(alg.sub(acc, alg.add(lo, alg.mul_const(1 << 32, hi))))
            out.append(alg.sub(_recompose(alg, w, ws["lo_limbs"], _LIMBS), lo))
            out.append(alg.sub(_recompose(alg, w, ws["hi_limbs"], 2), hi))
            out.extend(_range_constraints(alg, w, ws["lo_limbs"], _LIMBS))
            out.extend(_range_constraints(alg, w, ws["hi_limbs"], 2))
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        n = self.num_addends
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            addends = wires[jnp.asarray([ws["addends"] + j for j in range(n)])]
            cin = wires[ws["carry_in"]]
            lo, hi = wires[ws["lo"]], wires[ws["hi"]]
            lo_limbs = wires[jnp.asarray([ws["lo_limbs"] + j for j in range(_LIMBS)])]
            hi_limbs = wires[jnp.asarray([ws["hi_limbs"] + j for j in range(2)])]
            total = gl.add(gl.sum_mod(addends, axis=0), cin)
            out.append(gl.sub(total, gl.add(lo, gl.mul(
                hi, jnp.full_like(hi, gl.U64(1 << 32))))))
            out.append(gl.sub(_recompose_fast(lo_limbs[None])[0], lo))
            w2 = jnp.asarray(_W4[:2])
            out.append(gl.sub(gl.sum_mod(gl.mul(hi_limbs, w2[:, None]), axis=0), hi))
            out.extend(_range_fast(lo_limbs))
            out.extend(_range_fast(hi_limbs))
        return out

    def generators(self, row, constants):
        from ..ir.builder import Wire
        n = self.num_addends
        gens = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)

            def fn(vals, row=row, ws=ws):
                s = sum(vals)
                return [(Wire(row, ws["lo"]), s & 0xFFFFFFFF),
                        (Wire(row, ws["hi"]), s >> 32)]

            deps = [Wire(row, ws["addends"] + j) for j in range(n)] + \
                   [Wire(row, ws["carry_in"])]
            gens.append(LambdaGenerator(
                deps, fn, outs=[Wire(row, ws["lo"]), Wire(row, ws["hi"])],
                op=("u32addmany",)))
        return gens

    def aux_fill(self, rows, wires):
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            lo = wires[ws["lo"], rows]
            hi = wires[ws["hi"], rows]
            for j in range(_LIMBS):
                wires[ws["lo_limbs"] + j, rows] = \
                    (lo >> np.uint64(2 * j)) & np.uint64(3)
            for j in range(2):
                wires[ws["hi_limbs"] + j, rows] = \
                    (hi >> np.uint64(2 * j)) & np.uint64(3)


class U32RangeCheckGate(Gate):
    """num_ops packed u32 range checks: routed value + 16 aux base-4 limbs
    (plonky2_u32's U32RangeCheckGate analogue, reference whitelist
    /root/reference/src/ecdsa/gadgets/ecdsa.rs:93)."""

    IO_WIRES = 1
    AUX_WIRES = _LIMBS

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config) -> "U32RangeCheckGate":
        per_op = U32RangeCheckGate.IO_WIRES + U32RangeCheckGate.AUX_WIRES
        return U32RangeCheckGate(max(1, min(config.num_wires // per_op,
                                            config.num_routed_wires)))

    def key(self) -> str:
        return f"U32RangeCheck(num_ops={self.num_ops})"

    @property
    def num_wires(self):
        return (self.IO_WIRES + self.AUX_WIRES) * self.num_ops

    @property
    def degree(self):
        return _BASE

    @property
    def num_constraints(self):
        return self.num_ops * (1 + _LIMBS)

    def wires_op(self, i: int):
        return dict(x=i, limbs=self.num_ops + self.AUX_WIRES * i)

    def eval(self, vars, alg):
        w = vars.local_wires
        out = []
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            out.append(alg.sub(_recompose(alg, w, ws["limbs"], _LIMBS),
                               w[ws["x"]]))
            out.extend(_range_constraints(alg, w, ws["limbs"], _LIMBS))
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        idx = [self.wires_op(i) for i in range(self.num_ops)]
        x = wires[jnp.asarray([w["x"] for w in idx])]
        limbs = wires[jnp.asarray(
            [[w["limbs"] + j for j in range(_LIMBS)] for w in idx])]
        rc = gl.sub(_recompose_fast(limbs), x)
        rn = _range_fast(limbs)
        out = []
        for i in range(self.num_ops):
            out.append(rc[i])
            out.extend(rn[i])
        return out

    def generators(self, row, constants):
        # Pure aux gate: every helper wire is derived from the routed input
        # in the vectorized `aux_fill` pass; no dataflow generators needed.
        return []

    def aux_fill(self, rows, wires):
        for i in range(self.num_ops):
            ws = self.wires_op(i)
            x = wires[ws["x"], rows]
            for j in range(_LIMBS):
                wires[ws["limbs"] + j, rows] = \
                    (x >> np.uint64(2 * j)) & np.uint64(3)
