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


def ntt_to_rev(coeffs, inverse: bool = False):
    """Natural-order coefficients -> BIT-REVERSED evaluations, via
    decimation-in-frequency stages (no permutation pass at all — the
    input gather of `ntt` disappears).  plonky2 stores every LDE in this
    order; adopting it makes FRI folding cosets contiguous blocks."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, f"NTT size must be a power of 2, got {n}"
    if n == 1:
        return coeffs
    batch = coeffs.shape[:-1]
    x = coeffs
    tw = _stage_twiddles(log_n, inverse)
    # DIF: half-sizes n/2 .. 1; butterfly (e, o) -> (e + o, (e - o) * w^t)
    for s in range(log_n, 0, -1):
        m = 1 << (s - 1)
        blocks = n >> s
        x = x.reshape(*batch, blocks, 2, m)
        e = x[..., 0, :]
        o = x[..., 1, :]
        x = jnp.stack([gl.add(e, o), gl.mul(gl.sub(e, o), tw[s - 1])],
                      axis=-2)
        x = x.reshape(*batch, n)
    return x


def intt_from_rev(evals_rev):
    """BIT-REVERSED evaluations -> natural-order coefficients: the DIT
    stage chain of `ntt` without its input gather, scaled by 1/n."""
    n = evals_rev.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return evals_rev
    batch = evals_rev.shape[:-1]
    x = evals_rev
    tw = _stage_twiddles(log_n, inverse=True)
    for s in range(1, log_n + 1):
        m = 1 << (s - 1)
        blocks = n >> s
        x = x.reshape(*batch, blocks, 2, m)
        even = x[..., 0, :]
        odd = gl.mul(x[..., 1, :], tw[s - 1])
        x = jnp.stack([gl.add(even, odd), gl.sub(even, odd)], axis=-2)
        x = x.reshape(*batch, n)
    n_inv = gl.U64(gl.inv_s(n))
    return gl.mul(x, jnp.broadcast_to(n_inv, x.shape))


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


def coset_lde_rev(coeffs, rate_bits: int, shift: int = COSET_SHIFT):
    """Like `coset_lde` but the [..., N] output is in BIT-REVERSED domain
    order (plonky2's storage layout): position r holds poly(shift * w^rev(r))."""
    n = coeffs.shape[-1]
    scaled = gl.mul(coeffs, gl.powers(shift, n))
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (n << rate_bits) - n)]
    return ntt_to_rev(jnp.pad(scaled, pad))


def lde_from_values_rev(values, rate_bits: int, shift: int = COSET_SHIFT):
    """Values over H (natural order) -> (coeffs natural order, LDE in
    bit-reversed order).  The prover's commit-path entry."""
    coeffs = intt(values)
    return coeffs, coset_lde_rev(coeffs, rate_bits, shift)


lde_from_values_rev_jit = jax.jit(lde_from_values_rev,
                                  static_argnames=("rate_bits", "shift"))


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


# Tiled four-step kernel range: n above the fused-kernel VMEM cap up to
# this bound stream through VMEM-sized tiles (pallas_lde_tiled.py).
PALLAS_LDE_TILED_MAX = int(_os.environ.get("PLONKY2_TPU_PALLAS_TILED_MAX",
                                           str(1 << 20)))


def lde_from_values_rev_auto(values, rate_bits: int, shift: int = COSET_SHIFT):
    """Values over H -> (coeffs natural, LDE bit-reversed): the commit-path
    dispatcher.  Fused Pallas kernel for VMEM-sized n, tiled four-step
    Pallas kernel for n up to PALLAS_LDE_TILED_MAX, stage-wise XLA
    otherwise (and for mesh-sharded proves)."""
    from .pallas_lde import _supported, use_pallas
    n = values.shape[-1]
    if use_pallas() and shift == COSET_SHIFT:
        if _supported(n, rate_bits) and n <= PALLAS_LDE_MAX:
            from .pallas_lde import lde_from_values_pallas_rev
            return lde_from_values_pallas_rev(values, rate_bits, shift)
        if PALLAS_LDE_MAX < n <= PALLAS_LDE_TILED_MAX and n >= (1 << 14):
            from .pallas_lde_tiled import lde_from_values_tiled_rev
            return lde_from_values_tiled_rev(values, rate_bits, shift)
    return lde_from_values_rev_jit(values, rate_bits, shift)


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
