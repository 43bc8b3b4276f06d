"""Quadratic extension GF(p^2) = F_p[X] / (X^2 - W), W = 7.

W = 7 is a quadratic non-residue (it generates F_p^*, whose order is even).
The FRI composite polynomial, opening points (zeta), and constraint-folding
challenges live in this field; the D=2 extension mirrors the reference's
`const D: usize = 2` everywhere (e.g. /root/reference/src/u32/gates/
interleave_u32.rs:89-126).

Representations:
* Scalar: tuple (a0, a1) of Python ints — host transcript/verifier.
* Array: u64 arrays with trailing axis of size 2 — device batched ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import gl

W = 7  # X^2 = 7

# DTH root of unity for Frobenius: X^p = W^((p-1)/2) * X = -X since W is a
# non-residue; so frobenius(a0, a1) = (a0, -a1).

ZERO = (0, 0)
ONE = (1, 0)


# ------------------------------------------------------------------
# Scalar ops (tuples of Python ints)
# ------------------------------------------------------------------

def from_base_s(a: int):
    return (a, 0)


def add_s(a, b):
    return (gl.add_s(a[0], b[0]), gl.add_s(a[1], b[1]))


def sub_s(a, b):
    return (gl.sub_s(a[0], b[0]), gl.sub_s(a[1], b[1]))


def neg_s(a):
    return (gl.neg_s(a[0]), gl.neg_s(a[1]))


def mul_s(a, b):
    a0, a1 = a
    b0, b1 = b
    c0 = gl.add_s(gl.mul_s(a0, b0), gl.mul_s(W, gl.mul_s(a1, b1)))
    c1 = gl.add_s(gl.mul_s(a0, b1), gl.mul_s(a1, b0))
    return (c0, c1)


def sqr_s(a):
    return mul_s(a, a)


def scalar_mul_s(a, k: int):
    return (gl.mul_s(a[0], k), gl.mul_s(a[1], k))


def inv_s(a):
    a0, a1 = a
    # norm = a0^2 - W*a1^2 = (a0 + a1 X)(a0 - a1 X)
    norm = gl.sub_s(gl.mul_s(a0, a0), gl.mul_s(W, gl.mul_s(a1, a1)))
    ninv = gl.inv_s(norm)
    return (gl.mul_s(a0, ninv), gl.mul_s(gl.neg_s(a1), ninv))


def pow_s(a, e: int):
    result = ONE
    base = a
    while e:
        if e & 1:
            result = mul_s(result, base)
        e >>= 1
        base = mul_s(base, base)
    return result


def eq_s(a, b) -> bool:
    return a[0] == b[0] and a[1] == b[1]


# ------------------------------------------------------------------
# Array ops: shape (..., 2) u64
# ------------------------------------------------------------------

def from_base(a):
    """Lift base-field array (...,) to extension (..., 2)."""
    return jnp.stack([a, jnp.zeros_like(a)], axis=-1)


def scalar(a0: int, a1: int = 0, shape=()):
    return jnp.broadcast_to(gl.to_u64([a0, a1]), (*shape, 2))


def add(a, b):
    return gl.add(a, b)       # componentwise


def sub(a, b):
    return gl.sub(a, b)


def neg(a):
    return gl.neg(a)


_W = jnp.uint64(W)


def mul(a, b):
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = gl.add(gl.mul(a0, b0), gl.mul(_W * jnp.uint64(1), gl.mul(a1, b1)))
    c1 = gl.add(gl.mul(a0, b1), gl.mul(a1, b0))
    return jnp.stack([c0, c1], axis=-1)


def mul_base(a, b_base):
    """Extension array * base-field array (broadcast over last axis)."""
    return gl.mul(a, b_base[..., None])


def sqr(a):
    return mul(a, a)


def inv(a):
    a0, a1 = a[..., 0], a[..., 1]
    norm = gl.sub(gl.mul(a0, a0), gl.mul(jnp.uint64(W), gl.mul(a1, a1)))
    ninv = gl.inv(norm)
    return jnp.stack([gl.mul(a0, ninv), gl.mul(gl.neg(a1), ninv)], axis=-1)


def powers_s(base, n: int):
    """[base^0 .. base^(n-1)] as (n, 2) u64 array (host-computed from scalar)."""
    out = []
    cur = ONE
    for _ in range(n):
        out.append(cur)
        cur = mul_s(cur, base)
    return gl.to_u64(out)
