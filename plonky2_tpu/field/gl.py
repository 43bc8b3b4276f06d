"""Goldilocks field F_p, p = 2^64 - 2^32 + 1.

Two implementations live here and are tested against each other:

* **Scalar ops** (`*_s` suffix) on Python ints — used by the host-side
  transcript, verifier, and witness oracles where sizes are tiny.
* **Array ops** on `jnp.uint64` arrays — the device path.  All ops are pure
  element-wise math (no data-dependent control flow) so they fuse under jit
  and vectorize on the TPU VPU.  The 64x64->128 multiply is composed from
  32-bit halves (XLA emulates u64 as u32 pairs on TPU); reduction uses
  2^64 ≡ 2^32 - 1 (mod p).

Reference parity: semantics of plonky2's `GoldilocksField` as consumed by the
reference library (e.g. /root/reference/src/smt/goldilocks_poseidon/mod.rs:9,
/root/reference/src/hash/keccak256.rs:320).  Structure is original.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

# ------------------------------------------------------------------
# Constants
# ------------------------------------------------------------------

P = 0xFFFFFFFF00000001          # 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF            # 2^64 mod p == 2^32 - 1
MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

# Multiplicative group: |F_p^*| = p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
GENERATOR = 7                   # generator of F_p^* (two-adicity 32)
TWO_ADICITY = 32

U64 = jnp.uint64
_P = U64(P)
_EPS = U64(EPSILON)
_M32 = U64(MASK32)
_S32 = U64(32)
_ZERO = U64(0)
_ONE = U64(1)

DTYPE = jnp.uint64


# ------------------------------------------------------------------
# Scalar (Python int) ops — host reference
# ------------------------------------------------------------------

def add_s(a: int, b: int) -> int:
    s = a + b
    return s - P if s >= P else s


def sub_s(a: int, b: int) -> int:
    d = a - b
    return d + P if d < 0 else d


def neg_s(a: int) -> int:
    return 0 if a == 0 else P - a


def mul_s(a: int, b: int) -> int:
    return (a * b) % P


def inv_s(a: int) -> int:
    if a == 0:
        raise ZeroDivisionError("inverse of 0 in Goldilocks")
    return pow(a, P - 2, P)


def pow_s(a: int, e: int) -> int:
    return pow(a, e, P)


def from_noncanonical_s(x: int) -> int:
    return x % P


@functools.lru_cache(maxsize=None)
def primitive_root_of_unity(n_log: int) -> int:
    """2^n_log-th primitive root of unity (Python int)."""
    if n_log > TWO_ADICITY:
        raise ValueError(f"no 2^{n_log} root of unity (two-adicity {TWO_ADICITY})")
    base = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)  # order 2^32
    for _ in range(TWO_ADICITY - n_log):
        base = (base * base) % P
    return base


# ------------------------------------------------------------------
# Array ops (jnp.uint64) — device path
# ------------------------------------------------------------------

def to_u64(x) -> jnp.ndarray:
    """Build a canonical u64 array from ints / lists / arrays."""
    return jnp.asarray(x, dtype=DTYPE)


def add(a, b):
    """(a + b) mod p for canonical inputs (< p)."""
    s = a + b                                     # wraps mod 2^64
    over = s < a                                  # carry out of 64 bits
    s = s + jnp.where(over, _EPS, _ZERO)          # + 2^64 mod p ; cannot re-wrap
    return jnp.where(s >= _P, s - _P, s)


def sub(a, b):
    d = a - b
    borrow = a < b
    return d - jnp.where(borrow, _EPS, _ZERO)     # d + p (wrapping)


def neg(a):
    return jnp.where(a == _ZERO, _ZERO, _P - a)


def _mul_wide(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) u64 pair."""
    a_lo = a & _M32
    a_hi = a >> _S32
    b_lo = b & _M32
    b_hi = b >> _S32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # carry column at 2^32: ll's top half + low halves of the cross terms
    t = (ll >> _S32) + (lh & _M32) + (hl & _M32)  # <= 3*(2^32-1): fits
    lo = (ll & _M32) | ((t & _M32) << _S32)
    hi = hh + (lh >> _S32) + (hl >> _S32) + (t >> _S32)   # fits in u64
    return hi, lo


def _reduce128(hi, lo):
    """Reduce a 128-bit value (hi*2^64 + lo) mod p, to canonical form.

    Uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p):
        x ≡ lo - hi_hi + hi_lo * (2^32 - 1).
    """
    hi_hi = hi >> _S32
    hi_lo = hi & _M32
    t0 = lo - hi_hi
    t0 = t0 - jnp.where(lo < hi_hi, _EPS, _ZERO)  # borrow: subtract 2^64-p... i.e. +p
    t1 = hi_lo * _EPS                             # < 2^64
    s = t0 + t1
    s = s + jnp.where(s < t1, _EPS, _ZERO)        # carry: + 2^64 mod p; no re-wrap
    return jnp.where(s >= _P, s - _P, s)


def mul(a, b):
    """(a * b) mod p, canonical."""
    hi, lo = _mul_wide(a, b)
    return _reduce128(hi, lo)


def sqr(a):
    return mul(a, a)


def mul_add(a, b, c):
    """a*b + c mod p."""
    return add(mul(a, b), c)


def pow_const(a, e: int):
    """a ** e for a static Python-int exponent (unrolled square-and-multiply)."""
    if e == 0:
        return jnp.full_like(a, _ONE)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def inv(a):
    """Element-wise inverse via Fermat: a^(p-2).

    Uses the addition chain exploiting p - 2 = 0xFFFFFFFE_FFFFFFFF:
    fully data-parallel (no sequential batch-inversion scan), ~72 muls.
    """
    # Build a^(2^k - 1) ladders.
    t2 = mul(sqr(a), a)                     # a^(2^2 - 1)
    t3 = mul(sqr(t2), a)                    # a^(2^3 - 1)
    t6 = mul(_nsqr(t3, 3), t3)              # a^(2^6 - 1)
    t12 = mul(_nsqr(t6, 6), t6)             # a^(2^12 - 1)
    t24 = mul(_nsqr(t12, 12), t12)          # a^(2^24 - 1)
    t30 = mul(_nsqr(t24, 6), t6)            # a^(2^30 - 1)
    t31 = mul(sqr(t30), a)                  # a^(2^31 - 1)
    # p - 2 = (2^31 - 1) * 2^33 + (2^32 - 1)  [since p-2 = 0xFFFFFFFEFFFFFFFF]
    t63 = _nsqr(t31, 33)                    # a^((2^31-1) * 2^33)
    t32 = mul(sqr(t31), a)                  # a^(2^32 - 1)
    return mul(t63, t32)


def _nsqr(x, n: int):
    for _ in range(n):
        x = sqr(x)
    return x


def exp_power_of_2(a, log_e: int):
    """a^(2^log_e)."""
    return _nsqr(a, log_e)


def powers(base: int, n: int) -> jnp.ndarray:
    """[1, base, base^2, ..., base^(n-1)] as a u64 array (host-computed)."""
    out = [1] * n
    cur = 1
    for i in range(1, n):
        cur = (cur * base) % P
        out[i] = cur
    return to_u64(out)


def sum_mod(x, axis: int = 0):
    """Modular sum along an axis via log-depth pairwise folding (jnp.sum
    would overflow 64 bits)."""
    x = jnp.moveaxis(x, axis, 0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        rest = x[2 * half:]
        folded = add(x[0:2 * half:2], x[1:2 * half:2])
        x = jnp.concatenate([folded, rest], axis=0) if rest.shape[0] else folded
    return x[0]


def batch_to_int(arr) -> list[int]:
    """Device array -> list of Python ints (host transfers; test/debug use)."""
    import numpy as np
    return [int(x) for x in np.asarray(arr).reshape(-1)]
