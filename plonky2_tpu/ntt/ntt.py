"""Radix-2 NTT / inverse NTT / coset LDE over Goldilocks.

TPU-first formulation: every butterfly stage is one fully vectorized
reshape + elementwise mul/add over the whole (batched) array, so an n-point
transform is log2(n) fused VPU passes — no scalar loops, no dynamic shapes.
Batched over leading axes ([num_polys, n] is the common layout).

Conventions:
* `ntt(coeffs)[..., i] = poly(w^i)` with w the primitive n-th root of unity,
  indices in natural order.
* `coset_lde(coeffs, rate_bits, shift)` evaluates on the coset
  shift * <w_{n*2^rate}> in natural order — the evaluation-domain layout the
  FRI folding step relies on (x_{i + N/2} = -x_i).

Replaces the rayon-parallel CPU NTT inside the reference's external plonky2
prover (SURVEY.md §2.2 "Prover/verifier"; the TPU hot path of BASELINE.json).
The mesh-sharded four-step variant lives in `plonky2_tpu.parallel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl

# plonky2 evaluates LDEs on cosets shifted by the multiplicative group
# generator g = 7 ("standard coset").
COSET_SHIFT = gl.GENERATOR


# Cached tables are host numpy arrays (jit-safe constants): building jnp
# arrays inside a traced call would leak tracers through the cache.

@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def host_powers(base: int, n: int) -> np.ndarray:
    out = [1] * n
    cur = 1
    for i in range(1, n):
        cur = (cur * base) % gl.P
        out[i] = cur
    return np.array(out, dtype=np.uint64)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle arrays: stage with half-size m gets [w_{2m}^k]_{k<m}."""
    out = []
    for s in range(1, log_n + 1):
        m = 1 << (s - 1)
        root = gl.primitive_root_of_unity(s)
        if inverse:
            root = gl.inv_s(root)
        out.append(host_powers(root, m))
    return tuple(out)


def ntt(coeffs, inverse: bool = False):
    """[..., n] coefficient array -> evaluations (or inverse, unscaled)."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, f"NTT size must be a power of 2, got {n}"
    if n == 1:
        return coeffs
    batch = coeffs.shape[:-1]
    x = jnp.take(coeffs, _bitrev_perm(log_n), axis=-1)
    tw = _stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << (s - 1)
        blocks = n >> s
        x = x.reshape(*batch, blocks, 2, m)
        even = x[..., 0, :]
        odd = gl.mul(x[..., 1, :], tw[s - 1])
        x = jnp.stack([gl.add(even, odd), gl.sub(even, odd)], axis=-2)
        x = x.reshape(*batch, n)
    return x


def intt(evals):
    """Inverse NTT: evaluations (natural order) -> coefficients."""
    n = evals.shape[-1]
    coeffs = ntt(evals, inverse=True)
    n_inv = gl.U64(gl.inv_s(n))
    return gl.mul(coeffs, jnp.broadcast_to(n_inv, coeffs.shape))


def coset_lde(coeffs, rate_bits: int, shift: int = COSET_SHIFT):
    """Evaluate deg<n polys on the coset shift*<w_N>, N = n << rate_bits.

    [..., n] coeffs -> [..., N] values in natural order.
    """
    n = coeffs.shape[-1]
    scaled = gl.mul(coeffs, gl.powers(shift, n))
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (n << rate_bits) - n)]
    return ntt(jnp.pad(scaled, pad))


def lde_from_values(values, rate_bits: int, shift: int = COSET_SHIFT):
    """Values over H (natural order) -> (coeffs, LDE values over the coset)."""
    coeffs = intt(values)
    return coeffs, coset_lde(coeffs, rate_bits, shift)


# Jitted entry point: the eager per-op dispatch of `ntt` costs more than the
# math on small hosts; one fused graph per (shape, rate) makes compile-time
# commits (constants/sigmas oracle) and ad-hoc LDEs cheap.
lde_from_values_jit = jax.jit(lde_from_values,
                              static_argnames=("rate_bits", "shift"))

# Largest n the fused Pallas LDE kernel keeps resident in VMEM.  Measured
# on v5e (16 MB scoped VMEM): n = 2^13 at rate 3 compiles and runs 1.3x
# the XLA path; n = 2^14 OOMs the VMEM stack (24.6 MB request).
import os as _os
PALLAS_LDE_MAX = int(_os.environ.get("PLONKY2_TPU_PALLAS_LDE_MAX",
                                     str(1 << 13)))


def lde_from_values_auto(values, rate_bits: int, shift: int = COSET_SHIFT):
    """Values over H -> (coeffs, coset LDE): fused Pallas kernel on TPU for
    VMEM-sized transforms (one HBM read + write per poly instead of a full
    pass per butterfly stage), stage-wise XLA otherwise.  Unsharded inputs
    only — mesh-sharded proves keep the XLA path (the poly-axis grid would
    not partition)."""
    from .pallas_lde import _supported, lde_from_values_pallas, use_pallas
    n = values.shape[-1]
    if (use_pallas() and _supported(n, rate_bits) and n <= PALLAS_LDE_MAX
            and shift == COSET_SHIFT):
        return lde_from_values_pallas(values, rate_bits, shift)
    return lde_from_values_jit(values, rate_bits, shift)


@functools.partial(jax.jit, static_argnames=("n",))
def _eval_polys_kernel(coeffs, point_a, n: int):
    from ..field import ext
    # device power ladder of the extension point, log-doubling
    pows = jnp.asarray([[1, 0]], dtype=gl.DTYPE)
    cur = point_a
    m = 1
    while m < n:
        take = min(m, n - m)
        stepped = ext.mul(pows[:take], jnp.broadcast_to(cur, (take, 2)))
        pows = jnp.concatenate([pows, stepped], axis=0)
        cur = ext.mul(cur[None, :], cur[None, :])[0]
        m *= 2
    prod = ext.mul_base(pows[:n], coeffs)              # [..., n, 2]
    while prod.shape[-2] > 1:
        half = prod.shape[-2] // 2
        rest = prod[..., 2 * half:, :]
        folded = gl.add(prod[..., :half * 2:2, :], prod[..., 1:half * 2:2, :])
        prod = jnp.concatenate([folded, rest], axis=-2)
    return prod[..., 0, :]


def eval_poly_ext_s(coeffs_host: list[int], point) -> tuple:
    """Horner-evaluate a base-field coefficient list at an extension point.

    Host/scalar path (verifier-size work)."""
    from ..field import ext
    acc = ext.ZERO
    for c in reversed(coeffs_host):
        acc = ext.add_s(ext.mul_s(acc, point), ext.from_base_s(c))
    return acc


def eval_polys_at_ext(coeffs, point):
    """Batch-evaluate base-field polys [..., n] at one extension point.

    Returns [..., 2].  Device path (jitted): a log-doubling power ladder of
    `point`, one broadcast mul, then a log-tree modular reduction.
    """
    n = coeffs.shape[-1]
    point_a = jnp.asarray([point[0], point[1]], dtype=gl.DTYPE) \
        if isinstance(point, tuple) else point
    return _eval_polys_kernel(coeffs, point_a, n)
