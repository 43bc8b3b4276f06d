"""BaseSumGate: positional-decomposition gate.

Mirrors plonky2's BaseSumGate<B> (reference whitelist /root/reference/src/
ecdsa/gadgets/ecdsa.rs:74; used via split_le / split_le_base by
/root/reference/src/ecdsa/gadgets/split_nonnative.rs:38-70).

Wires: [sum, limb_0, ..., limb_{L-1}], one instance per row.
Constraints: sum recomposition (deg 1) + per-limb range product
Prod_{v<B}(limb - v) (deg B).
"""

from __future__ import annotations

from ..field import gl
from ..witness import LambdaGenerator
from .base import Gate


class BaseSumGate(Gate):
    def __init__(self, base: int, num_limbs: int):
        assert base >= 2
        self.base = base
        self.num_limbs = num_limbs

    def key(self) -> str:
        return f"BaseSum(base={self.base},limbs={self.num_limbs})"

    @property
    def num_wires(self):
        return 1 + self.num_limbs

    @property
    def degree(self):
        return max(self.base, 1)

    @property
    def num_constraints(self):
        return 1 + self.num_limbs

    WIRE_SUM = 0

    def wire_limb(self, i: int) -> int:
        return 1 + i

    def eval(self, vars, alg):
        out = []
        acc = alg.zero
        # Horner from the most significant limb
        for i in range(self.num_limbs - 1, -1, -1):
            acc = alg.add(alg.mul_const(self.base, acc),
                          vars.local_wires[self.wire_limb(i)])
        out.append(alg.sub(acc, vars.local_wires[self.WIRE_SUM]))
        for i in range(self.num_limbs):
            limb = vars.local_wires[self.wire_limb(i)]
            prod = limb
            for v in range(1, self.base):
                prod = alg.mul(prod, alg.add_const(limb, gl.P - v))
            out.append(prod)
        return out

    def eval_batch_fast(self, wires, constants, pi_hash):
        import jax.numpy as jnp
        import numpy as np
        L, B = self.num_limbs, self.base
        s = wires[self.WIRE_SUM]
        limbs = wires[jnp.asarray([self.wire_limb(i) for i in range(L)])]
        w = np.array([pow(B, i, gl.P) for i in range(L)], dtype=np.uint64)
        out = [gl.sub(gl.sum_mod(gl.mul(limbs, jnp.asarray(w)[:, None]),
                                 axis=0), s)]
        prod = limbs
        one = jnp.ones_like(limbs)
        cur = limbs
        for v in range(1, B):
            shift = jnp.full_like(limbs, gl.U64(v))
            cur = gl.mul(cur, gl.sub(limbs, shift))
        out.extend(cur)
        return out

    def generators(self, row, constants):
        from ..ir.builder import Wire
        base, L = self.base, self.num_limbs

        def fn(vals, row=row):
            s = vals[0]
            out = []
            for i in range(L):
                out.append((Wire(row, self.wire_limb(i)), s % base))
                s //= base
            return out

        return [LambdaGenerator([Wire(row, self.WIRE_SUM)], fn,
                                outs=[Wire(row, self.wire_limb(i))
                                      for i in range(L)],
                                op=("basesum", base))]
