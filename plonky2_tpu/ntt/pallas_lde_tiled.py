"""Tiled four-step values -> (coeffs, bit-reversed coset LDE) for n beyond
the fused kernel's VMEM cap (pallas_lde.py holds whole polynomials resident,
which tops out at n = 2^13 on v5e).

Decompose n = n1 * n2 and view a polynomial as an [n1, n2] matrix
(i = i1*n2 + i2).  The four-step identity, phrased so that *no transpose
and no bit-reversal pass exist anywhere on the device*:

  natural -> full-bitrev DIF_n  =  column-wise DIF_n1 (axis i1)
                                   -> pointwise twiddle w_n^{rev(j1) * i2}
                                   -> row-wise DIF_n2 (axis i2)

because rev_n(j1*n2 + j2) = rev_n1(j1) + n1*rev_n2(j2): the transpose that
textbook four-step needs is absorbed by the bit-reversed output order —
which is the order plonky2 stores LDEs in and this repo now commits
(fri/fri.py).  The inverse is the same network with inverse twiddles; the
big-domain LDE splits into 2^rate independent n-point transforms with
per-coset scales (pallas_lde.py trick), whose coset-major concatenation in
rev_reps coset order IS the bit-reversed big-domain order
(rev_N(k + 2^rate * i) = rev_reps(k)*n + rev_n(i)).

Four Pallas kernels, each one HBM read + one write of its operand:
  A. column DIF-inverse + inter twiddle    [b, n1, n2]   (tile n1 x 128)
  B. row DIF-inverse + 1/n -> bit-reversed coeffs; one XLA gather yields
     natural coeffs (the prover needs those anyway for openings)
  C. per-coset scale + column DIF-forward + inter twiddle  [b, 2^r, n1, n2]
  D. row DIF-forward  -> LDE in bit-reversed big-domain order

Column butterflies are sublane-axis reshapes — the same `_dif_row` code as
row butterflies, with lane-tiled twiddles — so nothing ever gathers across
lanes except the row kernels' m < 128 stages (lane-roll exchanges).

Replaces the rayon-parallel CPU NTT inside the reference's external plonky2
prover (SURVEY.md §2.2 "Prover/verifier") for flagship-size circuits; this
was the top perf item of round 4 (wire commit = 47.7% of warm prove ran the
stage-wise XLA path above n = 2^13).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl, gl32
from .ntt import COSET_SHIFT, _bitrev_perm, host_powers
from .pallas_lde import (LANES, _dif_row, _host_stage_table, _lane_stage,
                         _split_np, use_pallas)


def _split_log(log_n: int) -> tuple[int, int]:
    """(log_n1, log_n2): n2 sized so the column tile (n1 x 128) and row
    tile both stay well under VMEM."""
    log_n2 = min(9, max(7, log_n // 2))
    return log_n - log_n2, log_n2


def _supported_tiled(n: int, rate_bits: int) -> bool:
    return n >= (1 << 14) and (1 << rate_bits) <= 64


def _col_tables(log_n1: int, inverse: bool):
    """Per-stage lane-tiled twiddles for the column (sublane-axis) DIF:
    stage with half-size m rows gets an (m, LANES) table, constant across
    lanes, so `_dif_row` consumes it with half-size m*LANES elements."""
    out = []
    for s in range(log_n1, 0, -1):
        m = 1 << (s - 1)
        root = gl.primitive_root_of_unity(s)       # primitive 2m-th root
        if inverse:
            root = gl.inv_s(root)
        pows = host_powers(root, m)
        out.append((m * LANES, np.repeat(pows[:, None], LANES, axis=1)))
    return out


def _row_tables(log_n2: int, inverse: bool):
    """Per-stage tables for the within-row DIF, half-sizes n2/2 .. 1."""
    return [(1 << (s - 1), _host_stage_table(1 << (s - 1), inverse))
            for s in range(log_n2, 0, -1)]


@functools.lru_cache(maxsize=None)
def _inter_twiddle(log_n: int, log_n1: int, sign: int) -> np.ndarray:
    """[n1, n2] table  w_n^{sign * rev_n1(j1) * i2}  (the four-step
    inter-stage twiddle): row j1 holds powers of w^{sign*rev(j1)}."""
    n1 = 1 << log_n1
    n2 = 1 << (log_n - log_n1)
    w = gl.primitive_root_of_unity(log_n)
    if sign < 0:
        w = gl.inv_s(w)
    rev = _bitrev_perm(log_n1)
    rows = np.empty((n1, n2), dtype=np.uint64)
    for j1 in range(n1):
        rows[j1] = host_powers(pow(int(w), int(rev[j1]), gl.P), n2)
    return rows


def _scale_vectors(log_n: int, log_n1: int, rate_bits: int, shift: int):
    """Host (u, v) outer-product factors of the per-coset scale: coset
    block kk computes coset k = rev_reps(kk) (so the stacked output is
    already in big-domain bit-reversed order), and
    S[kk][j1][j2] = s_k^{j1*n2+j2} = (s_k^{n2})^{j1} * s_k^{j2}."""
    reps = 1 << rate_bits
    n1 = 1 << log_n1
    n2 = 1 << (log_n - log_n1)
    rev_r = _bitrev_perm(rate_bits)
    w_big = gl.primitive_root_of_unity(log_n + rate_bits)
    u = np.empty((reps, n1), dtype=np.uint64)
    v = np.empty((reps, n2), dtype=np.uint64)
    for kk in range(reps):
        s_k = (shift * gl.pow_s(w_big, int(rev_r[kk]))) % gl.P
        v[kk] = host_powers(s_k, n2)
        u[kk] = host_powers(pow(s_k, n2, gl.P), n1)
    return u, v


def _chain(x, stages, interpret):
    """Run a DIF stage chain on flat (rows, LANES) planes.  Each stage is
    (m_elems, (hi_ref_val, lo_ref_val)); DIF butterfly throughout — the
    forward/inverse distinction lives entirely in the twiddle values."""
    for m, tw in stages:
        if m >= LANES:
            x = _dif_row(x, tw, m)
        else:
            x = _lane_stage(x, tw, m, forward=False, interpret=interpret)
    return x


def _z(*shape_ndim):
    return tuple(np.int32(0) for _ in range(shape_ndim[0]))


@functools.lru_cache(maxsize=None)
def _build_tiled(log_n: int, rate_bits: int, shift: int, interpret: bool):
    n = 1 << log_n
    log_n1, log_n2 = _split_log(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    reps = 1 << rate_bits
    big_n = n << rate_bits
    n2l = n2 // LANES                       # lane-tiles per row
    R = max(1, min(n1, (1 << 16) // n2))    # rows per row-kernel block
    assert n1 % R == 0
    rB = R * n2 // LANES                    # flat sublane rows per block
    n_inv = gl.inv_s(n)

    def dev(pairs):
        return [(m, tuple(jnp.asarray(t) for t in _split_np(tab)))
                for m, tab in pairs]

    colA = dev(_col_tables(log_n1, inverse=True))
    colC = dev(_col_tables(log_n1, inverse=False))
    rowB = dev(_row_tables(log_n2, inverse=True))
    rowD = dev(_row_tables(log_n2, inverse=False))

    t1m = _inter_twiddle(log_n, log_n1, -1)
    t1p = _inter_twiddle(log_n, log_n1, +1)
    t1m_hi, t1m_lo = (jnp.asarray(t) for t in _split_np(t1m))
    t1p_hi, t1p_lo = (jnp.asarray(t) for t in _split_np(t1p))

    u_h, v_h = _scale_vectors(log_n, log_n1, rate_bits, shift)
    S = gl.mul(jnp.asarray(u_h)[:, :, None], jnp.asarray(v_h)[:, None, :])
    S_hi, S_lo = gl32.split(S)

    def stages_of(host_list, refs):
        return [(m, (refs[2 * i][...], refs[2 * i + 1][...]))
                for i, (m, _) in enumerate(host_list)]

    # ---- kernels -------------------------------------------------------
    def kernel_A(xh, xl, th, tl, *refs):
        tabs, (oh, ol) = refs[:-2], refs[-2:]
        x = (xh[...].reshape(n1, LANES), xl[...].reshape(n1, LANES))
        x = _chain(x, stages_of(colA, tabs), interpret)
        x = gl32.mul(x, (th[...].reshape(n1, LANES),
                         tl[...].reshape(n1, LANES)))
        oh[...] = x[0].reshape(oh.shape)
        ol[...] = x[1].reshape(ol.shape)

    def kernel_B(xh, xl, *refs):
        tabs, (oh, ol) = refs[:-2], refs[-2:]
        x = (xh[...].reshape(rB, LANES), xl[...].reshape(rB, LANES))
        x = _chain(x, stages_of(rowB, tabs), interpret)
        x = gl32.mul(x, gl32.const(n_inv, shape=(1, 1)))
        oh[...] = x[0].reshape(oh.shape)
        ol[...] = x[1].reshape(ol.shape)

    def kernel_C(xh, xl, sh, sl, th, tl, *refs):
        tabs, (oh, ol) = refs[:-2], refs[-2:]
        x = (xh[...].reshape(n1, LANES), xl[...].reshape(n1, LANES))
        x = gl32.mul(x, (sh[...].reshape(n1, LANES),
                         sl[...].reshape(n1, LANES)))
        x = _chain(x, stages_of(colC, tabs), interpret)
        x = gl32.mul(x, (th[...].reshape(n1, LANES),
                         tl[...].reshape(n1, LANES)))
        oh[...] = x[0].reshape(oh.shape)
        ol[...] = x[1].reshape(ol.shape)

    def kernel_D(xh, xl, *refs):
        tabs, (oh, ol) = refs[:-2], refs[-2:]
        x = (xh[...].reshape(rB, LANES), xl[...].reshape(rB, LANES))
        x = _chain(x, stages_of(rowD, tabs), interpret)
        oh[...] = x[0].reshape(oh.shape)
        ol[...] = x[1].reshape(ol.shape)

    colA_flat = [t for _, pair in colA for t in pair]
    colC_flat = [t for _, pair in colC for t in pair]
    rowB_flat = [t for _, pair in rowB for t in pair]
    rowD_flat = [t for _, pair in rowD for t in pair]

    def vspec(block, imap):
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    def tabspec(t):
        return pl.BlockSpec(t.shape, (lambda *_, nd=t.ndim: _z(nd)),
                            memory_space=pltpu.VMEM)

    rev_dev = jnp.asarray(_bitrev_perm(log_n))

    # Column kernels use 3-D arrays [.., n1, n2] with block (.., n1, LANES):
    # the last two block dims are (n1, LANES) — n1 equals the array dim and
    # LANES divides n2, satisfying Mosaic's block-shape rule.  The lane-tile
    # index c selects a 128-wide column stripe.
    blkA = (1, n1, LANES)
    blkT = (n1, LANES)
    blkB = (1, 1, rB, LANES)
    blkC_out = (1, 1, n1, LANES)
    blkD = (1, 1, 1, rB, LANES)

    def _i32(v):
        return jax.lax.convert_element_type(v, jnp.int32) \
            if not isinstance(v, (int, np.integer)) else np.int32(v)

    def imA(i, c):
        return _i32(i), np.int32(0), _i32(c)

    def imT(i, c):
        return np.int32(0), _i32(c)

    def imB(i, r):
        return _i32(i), _i32(r), np.int32(0), np.int32(0)

    def imC_in(i, k, c):
        return _i32(i), np.int32(0), _i32(c)

    def imC_s(i, k, c):
        return _i32(k), np.int32(0), _i32(c)

    def imC_t(i, k, c):
        return np.int32(0), _i32(c)

    def imC_out(i, k, c):
        return _i32(i), _i32(k), np.int32(0), _i32(c)

    def imD(i, k, r):
        return _i32(i), _i32(k), _i32(r), np.int32(0), np.int32(0)

    @jax.jit
    def run(values):
        batch = values.shape[:-1]
        b = int(np.prod(batch)) if batch else 1
        v = values.reshape(b, n)
        vh, vl = gl32.split(v)

        # A: column inverse transform
        ah, al = pl.pallas_call(
            kernel_A,
            grid=(b, n2l),
            in_specs=[vspec(blkA, imA), vspec(blkA, imA),
                      vspec(blkT, imT), vspec(blkT, imT)]
            + [tabspec(t) for t in colA_flat],
            out_specs=(vspec(blkA, imA), vspec(blkA, imA)),
            out_shape=(jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32),
                       jax.ShapeDtypeStruct((b, n1, n2), jnp.uint32)),
            interpret=interpret,
        )(vh.reshape(b, n1, n2), vl.reshape(b, n1, n2),
          t1m_hi, t1m_lo, *colA_flat)

        # B: row inverse transform -> bit-reversed coeffs
        bh, bl = pl.pallas_call(
            kernel_B,
            grid=(b, n1 // R),
            in_specs=[vspec(blkB, imB), vspec(blkB, imB)]
            + [tabspec(t) for t in rowB_flat],
            out_specs=(vspec(blkB, imB), vspec(blkB, imB)),
            out_shape=(
                jax.ShapeDtypeStruct((b, n1 // R, rB, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((b, n1 // R, rB, LANES), jnp.uint32)),
            interpret=interpret,
        )(ah.reshape(b, n1 // R, rB, LANES),
          al.reshape(b, n1 // R, rB, LANES), *rowB_flat)

        coeffs_rev = gl32.join((bh.reshape(b, n), bl.reshape(b, n)))
        coeffs = jnp.take(coeffs_rev, rev_dev, axis=-1)

        # C: per-coset scale + column forward transform
        ch_, cl_ = gl32.split(coeffs)
        chh, chl = pl.pallas_call(
            kernel_C,
            grid=(b, reps, n2l),
            in_specs=[vspec(blkA, imC_in), vspec(blkA, imC_in),
                      vspec(blkA, imC_s), vspec(blkA, imC_s),
                      vspec(blkT, imC_t), vspec(blkT, imC_t)]
            + [tabspec(t) for t in colC_flat],
            out_specs=(vspec(blkC_out, imC_out), vspec(blkC_out, imC_out)),
            out_shape=(
                jax.ShapeDtypeStruct((b, reps, n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((b, reps, n1, n2), jnp.uint32)),
            interpret=interpret,
        )(ch_.reshape(b, n1, n2), cl_.reshape(b, n1, n2),
          S_hi, S_lo, t1p_hi, t1p_lo, *colC_flat)

        # D: row forward transform -> bit-reversed big-domain LDE
        dh, dl = pl.pallas_call(
            kernel_D,
            grid=(b, reps, n1 // R),
            in_specs=[vspec(blkD, imD), vspec(blkD, imD)]
            + [tabspec(t) for t in rowD_flat],
            out_specs=(vspec(blkD, imD), vspec(blkD, imD)),
            out_shape=(
                jax.ShapeDtypeStruct((b, reps, n1 // R, rB, LANES),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((b, reps, n1 // R, rB, LANES),
                                     jnp.uint32)),
            interpret=interpret,
        )(chh.reshape(b, reps, n1 // R, rB, LANES),
          chl.reshape(b, reps, n1 // R, rB, LANES), *rowD_flat)

        lde_rev = gl32.join((dh.reshape(b, big_n), dl.reshape(b, big_n)))
        return (coeffs.reshape(*batch, n), lde_rev.reshape(*batch, big_n))

    return run


def lde_from_values_tiled_rev(values, rate_bits: int,
                              shift: int = COSET_SHIFT,
                              interpret: bool | None = None):
    """Values over H (natural) -> (coeffs natural, LDE bit-reversed).
    Drop-in for `ntt.lde_from_values_rev` at n >= 2^14."""
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    assert _supported_tiled(n, rate_bits), (n, rate_bits)
    if interpret is None:
        interpret = not use_pallas()
    return _build_tiled(log_n, rate_bits, shift, interpret)(values)
