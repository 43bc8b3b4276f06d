"""Goldilocks arithmetic on explicit (hi, lo) uint32-pair planes.

Mosaic (the Pallas TPU compiler) has no 64-bit integer type, so device
kernels represent a field element as two u32 arrays: ``x = hi * 2^32 + lo``.
Every op here is pure element-wise jnp on u32 with explicit carry/borrow
tracking, usable both inside `pl.pallas_call` kernels and under plain XLA.

Semantics mirror `plonky2_tpu.field.gl` (the u64 device path) exactly; the
two are cross-checked in tests/test_field.py.  Reference parity: plonky2's
`GoldilocksField` as consumed by the reference library
(/root/reference/src/smt/goldilocks_poseidon/mod.rs:9).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import gl

U32 = jnp.uint32
_MASK16 = 0xFFFF

# p = 2^64 - 2^32 + 1 = 0xFFFFFFFF_00000001
P_HI = 0xFFFFFFFF
P_LO = 0x00000001


def split(x):
    """u64 array -> (hi, lo) u32 planes.  (Avoids bitcast_convert_type,
    which silently truncates on the tunneled axon backend.)"""
    return (x >> jnp.uint64(32)).astype(U32), \
        (x & jnp.uint64(0xFFFFFFFF)).astype(U32)


def join(a):
    """(hi, lo) u32 planes -> u64 array."""
    hi, lo = a
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def const(v: int, shape=(), dtype=U32):
    """Python int < p -> broadcastable (hi, lo) pair of u32 scalars/arrays."""
    hi = jnp.full(shape, (v >> 32) & 0xFFFFFFFF, dtype=dtype)
    lo = jnp.full(shape, v & 0xFFFFFFFF, dtype=dtype)
    return hi, lo


def _carry(flag):
    return flag.astype(U32)


def _mul32(a, b):
    """u32 * u32 -> full 64-bit product as (hi, lo) u32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl                       # may wrap: carry has weight 2^48
    midc = _carry(mid < lh)
    lo = ll + (mid << 16)
    lc = _carry(lo < ll)
    hi = hh + (mid >> 16) + (midc << 16) + lc
    return hi, lo


def _add64(ah, al, bh, bl):
    """64-bit add with carry-out: returns (hi, lo, carry)."""
    l = al + bl
    c = _carry(l < al)
    h1 = ah + bh
    h = h1 + c
    return h, l, _carry((h1 < ah) | (h < h1))


def _sub64(ah, al, bh, bl):
    """64-bit subtract with borrow-out: returns (hi, lo, borrow)."""
    l = al - bl
    bo = _carry(al < bl)
    h1 = ah - bh
    h = h1 - bo
    return h, l, _carry((ah < bh) | (h1 < bo))


def _canon(h, l):
    """Subtract p once if >= p (inputs < p + small slack, like gl.py)."""
    ge = (h == jnp.uint32(P_HI)) & (l >= jnp.uint32(P_LO))
    # s - p = (h - 0xFFFFFFFF)<<32 + (l - 1) = l - 1 when ge
    return jnp.where(ge, jnp.zeros_like(h), h), jnp.where(ge, l - 1, l)


def add(a, b):
    """(a + b) mod p for canonical inputs."""
    h, l, c = _add64(a[0], a[1], b[0], b[1])
    # wrapped past 2^64: add EPSILON = 2^32 - 1 (cannot re-wrap)
    h, l, _ = _add64(h, l, jnp.zeros_like(h), jnp.uint32(0) - c)
    return _canon(h, l)


def sub(a, b):
    """(a - b) mod p for canonical inputs."""
    h, l, bo = _sub64(a[0], a[1], b[0], b[1])
    h, l, _ = _sub64(h, l, jnp.zeros_like(h), jnp.uint32(0) - bo)
    return h, l


def neg(a):
    zero = (a[0] == 0) & (a[1] == 0)
    h, l, _ = _sub64(jnp.full_like(a[0], P_HI), jnp.full_like(a[1], P_LO),
                     a[0], a[1])
    return jnp.where(zero, jnp.zeros_like(h), h), \
        jnp.where(zero, jnp.zeros_like(l), l)


def _reduce128(hih, hil, loh, lol):
    """(HI64 * 2^64 + LO64) mod p with HI64=(hih,hil), LO64=(loh,lol)."""
    z = jnp.zeros_like(hih)
    # t0 = LO64 - hih ; on borrow subtract EPSILON (wrapping, = +p mod 2^64)
    t0h, t0l, bo = _sub64(loh, lol, z, hih)
    t0h, t0l, _ = _sub64(t0h, t0l, z, jnp.uint32(0) - bo)
    # t1 = hil * EPSILON = (hil << 32) - hil
    nz = _carry(hil != 0)
    t1h = hil - nz
    t1l = jnp.uint32(0) - hil
    sh, sl, c = _add64(t0h, t0l, t1h, t1l)
    sh, sl, _ = _add64(sh, sl, z, jnp.uint32(0) - c)
    return _canon(sh, sl)


def mul(a, b):
    """(a * b) mod p, canonical."""
    ah, al = a
    bh, bl = b
    llh, lll = _mul32(al, bl)
    lhh, lhl = _mul32(al, bh)
    hlh, hll = _mul32(ah, bl)
    hhh, hhl = _mul32(ah, bh)
    # column at weight 2^32: llh + lhl + hll (carries have weight 2^64)
    t = llh + lhl
    c1 = _carry(t < llh)
    t2 = t + hll
    c2 = _carry(t2 < t)
    # HI64 = hh + (lh >> 32) + (hl >> 32) + carries
    hil = hhl + lhh
    d1 = _carry(hil < hhl)
    hil2 = hil + hlh
    d2 = _carry(hil2 < hil)
    hil3 = hil2 + c1 + c2
    d3 = _carry(hil3 < hil2)
    hih = hhh + d1 + d2 + d3
    return _reduce128(hih, hil3, t2, lll)


def mul_u32(a, b32):
    """a * b mod p where b = (0, b32) is a 32-bit constant plane: skips the
    high-limb partial products (twiddle-by-small / MDS constants)."""
    ah, al = a
    llh, lll = _mul32(al, b32)
    hlh, hll = _mul32(ah, b32)
    t2 = llh + hll
    c = _carry(t2 < llh)
    hil = hlh + c                       # < 2^32 (product < 2^96)
    return _reduce128(jnp.zeros_like(hil), hil, t2, lll)


def sel(mask, a, b):
    """where(mask, a, b) on pairs."""
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])
