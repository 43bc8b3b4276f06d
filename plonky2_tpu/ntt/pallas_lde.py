"""Fused values -> (coeffs, coset LDE) as a single Pallas TPU kernel.

The XLA stage-wise NTT (`plonky2_tpu.ntt.ntt`) streams the whole array
through HBM once per butterfly stage (~log N full passes) and pays XLA's
u64-emulation tax on every op.  This kernel keeps one polynomial resident
in VMEM for the entire inverse-NTT -> scale -> pad -> forward-NTT chain:
HBM traffic drops to one read of the values and one write of each output,
and all field math runs on explicit u32 planes (`field.gl32`).

TPU-first formulation (no bit-reversal gathers anywhere, and no reshapes
that touch the 128-lane axis — Mosaic only relayouts sublane dims):

* inverse transform: decimation-in-frequency, natural input -> bit-reversed
  coefficients (row-crossing stages as sublane slices, lane-crossing stages
  as `pltpu.roll` exchanges over the 128-lane axis);
* the big-domain LDE splits into 2^rate independent n-point NTTs: with
  N = n * 2^rate and w_N the N-th root, L[k + 2^rate * i] =
  NTT_n(coeffs * powers(shift * w_N^k))[i] — so instead of zero-padding,
  the kernel row-concatenates 2^rate copies of the (bit-reversed) coeffs,
  multiplies by a per-coset scale table, and runs one batched forward DIT
  (bit-reversed input -> natural output per coset);
* the coset-major [2^rate, n] result is interleaved to the natural domain
  order by one cheap XLA transpose outside the kernel, and the
  natural-order coefficient output by one cheap XLA gather (the kernel
  emits bit-reversed coefficients).

Replaces the rayon-parallel CPU NTT inside the reference's external plonky2
prover (SURVEY.md §2.2 "Prover/verifier") on the TPU hot path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl, gl32
from .ntt import COSET_SHIFT, _bitrev_perm, host_powers

LANES = 128


def _supported(n: int, rate_bits: int) -> bool:
    return n >= 2 * LANES and (1 << rate_bits) <= 64


_RUNTIME_OK = None       # set by a one-time probe launch


def _probe() -> bool:
    global _RUNTIME_OK
    if _RUNTIME_OK is None:
        try:
            from jax._src import core as _core
            if not _core.trace_state_clean():
                return False            # mid-trace: decide later
        except Exception:
            pass
        try:
            vals = jnp.arange(2 * LANES, dtype=jnp.uint64)[None, :]
            coeffs, lde = _build(8, 1, COSET_SHIFT, False)(vals)
            from .ntt import lde_from_values
            cw, lw = lde_from_values(vals, 1)
            _RUNTIME_OK = (np.array_equal(np.asarray(coeffs), np.asarray(cw))
                           and np.array_equal(np.asarray(lde), np.asarray(lw)))
        except Exception:
            _RUNTIME_OK = False
    return _RUNTIME_OK


def use_pallas() -> bool:
    if os.environ.get("PLONKY2_TPU_NO_PALLAS"):
        return False
    from ..hashes.pallas_poseidon import _on_tpu_device
    return _on_tpu_device() and _probe()


def _roll(p, shift, interpret):
    if interpret:
        return jnp.roll(p, shift, axis=1)
    return pltpu.roll(p, np.int32(shift), axis=1)


def _dif_row(x, tw, m):
    """DIF butterfly across rows: half-size m >= 128 elements."""
    r = x[0].shape[0]
    mr = m // LANES
    ev, ov = [], []
    for p in x:
        v = p.reshape(r // (2 * mr), 2, mr, LANES)
        ev.append(v[:, 0])
        ov.append(v[:, 1])
    e, o = tuple(ev), tuple(ov)
    sh, sl = gl32.add(e, o)
    dh, dl = gl32.mul(gl32.sub(e, o), (tw[0][None], tw[1][None]))
    return (jnp.stack([sh, dh], axis=1).reshape(r, LANES),
            jnp.stack([sl, dl], axis=1).reshape(r, LANES))


def _dit_row(x, tw, m):
    """DIT butterfly across rows: half-size m >= 128 elements."""
    r = x[0].shape[0]
    mr = m // LANES
    ev, ov = [], []
    for p in x:
        v = p.reshape(r // (2 * mr), 2, mr, LANES)
        ev.append(v[:, 0])
        ov.append(v[:, 1])
    e, o = tuple(ev), tuple(ov)
    th, tl = gl32.mul((tw[0][None], tw[1][None]), o)
    sh, sl = gl32.add(e, (th, tl))
    dh, dl = gl32.sub(e, (th, tl))
    return (jnp.stack([sh, dh], axis=1).reshape(r, LANES),
            jnp.stack([sl, dl], axis=1).reshape(r, LANES))


def _lane_stage(x, tw, m, forward, interpret):
    """Butterfly with half-size m < 128: partner lane = lane XOR m, realized
    as two lane-rolls plus selects (no gathers)."""
    bit = (jax.lax.broadcasted_iota(jnp.uint32, (1, LANES), 1)
           & jnp.uint32(m)) != 0
    partner = tuple(jnp.where(bit, _roll(p, m, interpret),
                              _roll(p, LANES - m, interpret)) for p in x)
    e = gl32.sel(~bit, x, partner)      # even element of each pair
    o = gl32.sel(bit, x, partner)       # odd element of each pair
    if forward:
        t = gl32.mul(tw, o)
        s = gl32.add(e, t)
        d = gl32.sub(e, t)
    else:
        s = gl32.add(e, o)
        d = gl32.mul(gl32.sub(e, o), tw)
    return gl32.sel(bit, d, s)


def _host_stage_table(m: int, inverse: bool) -> np.ndarray:
    """Twiddles for a half-size-m stage, laid out to broadcast in-kernel."""
    root = gl.primitive_root_of_unity(m.bit_length())   # primitive 2m-th root
    if inverse:
        root = gl.inv_s(root)
    if m >= LANES:
        return host_powers(root, m).reshape(m // LANES, LANES)
    pows = host_powers(root, m)
    return np.tile(pows, LANES // m)[None, :]           # w^(lane mod m)


def _split_np(tab: np.ndarray):
    return ((tab >> np.uint64(32)).astype(np.uint32),
            (tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _build(log_n: int, rate_bits: int, shift: int, interpret: bool,
           rev_order: bool = False):
    n = 1 << log_n
    big_n = n << rate_bits
    reps = 1 << rate_bits
    rows_in = n // LANES
    rows_out = big_n // LANES
    n_inv = gl.inv_s(n)

    # ---- host tables ------------------------------------------------
    inv_stages = []      # (kind, m, first_tab_index)
    tables = []          # flat list of u32 numpy arrays (hi, lo interleaved)

    def push(kind, m, tab):
        hi, lo = _split_np(tab)
        inv_stages.append((kind, m, len(tables)))
        tables.append(hi)
        tables.append(lo)

    # inverse DIF: m = n/2 .. 1
    for s in range(log_n - 1, -1, -1):
        m = 1 << s
        kind = "row_dif" if m >= LANES else "lane_dif"
        push(kind, m, _host_stage_table(m, inverse=True))
    # forward DIT per coset copy: m = 1 .. n/2 (batched over row-stacked
    # copies; block boundaries never cross copies since m <= n/2)
    fwd_stages = []
    for s in range(log_n):
        m = 1 << s
        kind = "row_dit" if m >= LANES else "lane_dit"
        hi, lo = _split_np(_host_stage_table(m, inverse=False))
        fwd_stages.append((kind, m, len(tables)))
        tables.append(hi)
        tables.append(lo)

    # per-coset scale tables (bit-reversed coeff order), rows stacked:
    # row block k holds n_inv * (shift * w_N^k)^bitrev(pos)
    rev = _bitrev_perm(log_n)
    w_big = gl.primitive_root_of_unity(log_n + rate_bits)
    blocks = []
    for k in range(reps):
        s_k = (shift * gl.pow_s(w_big, k)) % gl.P
        blk = (host_powers(s_k, n)[rev].astype(object) * n_inv) % gl.P
        blocks.append(blk.astype(np.uint64).reshape(rows_in, LANES))
    scale_hi, scale_lo = _split_np(np.concatenate(blocks, axis=0))
    tables.append(scale_hi)
    tables.append(scale_lo)
    scale_idx = len(tables) - 2
    n_tabs = len(tables)

    # ---- kernel ------------------------------------------------------
    def kernel(*refs):
        xh_ref, xl_ref = refs[0], refs[1]
        tabs = refs[2:2 + n_tabs]
        ch_ref, cl_ref, oh_ref, ol_ref = refs[2 + n_tabs:]
        x = (xh_ref[0], xl_ref[0])
        for kind, m, ti in inv_stages:
            tw = (tabs[ti][...], tabs[ti + 1][...])
            if kind == "row_dif":
                x = _dif_row(x, tw, m)
            else:
                x = _lane_stage(x, tw, m, forward=False, interpret=interpret)
        # inverse done: emit coefficients (bit-reversed)
        ninv = gl32.const(n_inv, shape=(1, 1))
        c = gl32.mul(x, ninv)
        ch_ref[0] = c[0]
        cl_ref[0] = c[1]
        # row-stack 2^rate copies, scale each by its coset powers
        sc = (tabs[scale_idx][...], tabs[scale_idx + 1][...])
        x = (jnp.concatenate([x[0]] * reps, axis=0),
             jnp.concatenate([x[1]] * reps, axis=0))
        x = gl32.mul(x, sc)
        for kind, m, ti in fwd_stages:
            tw = (tabs[ti][...], tabs[ti + 1][...])
            if kind == "row_dit":
                x = _dit_row(x, tw, m)
            else:
                x = _lane_stage(x, tw, m, forward=True, interpret=interpret)
        oh_ref[0] = x[0]
        ol_ref[0] = x[1]

    tables_dev = [jnp.asarray(t) for t in tables]

    # index maps must produce i32 (under jax_enable_x64 plain python ints
    # lower as i64, which Mosaic rejects)
    def _poly_im(i):
        z = np.int32(0)
        return jax.lax.convert_element_type(i, jnp.int32), z, z

    def _tab_im(i):
        return np.int32(0), np.int32(0)

    def tab_spec(t):
        return pl.BlockSpec(t.shape, _tab_im, memory_space=pltpu.VMEM)

    def poly_spec(rows):
        return pl.BlockSpec((1, rows, LANES), _poly_im,
                            memory_space=pltpu.VMEM)

    in_specs = ([poly_spec(rows_in)] * 2 + [tab_spec(t) for t in tables])
    out_specs = (poly_spec(rows_in), poly_spec(rows_in),
                 poly_spec(rows_out), poly_spec(rows_out))

    rev_dev = jnp.asarray(rev)
    rev_reps_dev = jnp.asarray(_bitrev_perm(rate_bits))

    @jax.jit
    def run(values):
        batch = values.shape[:-1]
        b = int(np.prod(batch)) if batch else 1
        v = values.reshape(b, n)
        vh, vl = gl32.split(v)
        vh = vh.reshape(b, rows_in, LANES)
        vl = vl.reshape(b, rows_in, LANES)
        ch, cl, oh, ol = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((b, rows_in, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((b, rows_in, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((b, rows_out, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((b, rows_out, LANES), jnp.uint32),
            ),
            interpret=interpret,
        )(vh, vl, *tables_dev)
        coeffs_rev = gl32.join((ch.reshape(b, n), cl.reshape(b, n)))
        coeffs = jnp.take(coeffs_rev, rev_dev, axis=-1)
        # kernel emits coset-major [reps, n] (natural order per coset);
        # natural big-domain index t = k + reps*i
        lde_cm = gl32.join((oh.reshape(b, reps, n), ol.reshape(b, reps, n)))
        if rev_order:
            # bit-reversed big-domain order: rev_N(k + reps*i)
            # = rev_reps(k)*n + rev_n(i) -> reorder cosets by rev_reps and
            # each coset's interior by rev_n, then a flat reshape.
            lde = jnp.take(jnp.take(lde_cm, rev_reps_dev, axis=1),
                           rev_dev, axis=2).reshape(b, big_n)
        else:
            lde = lde_cm.transpose(0, 2, 1).reshape(b, big_n)
        return coeffs.reshape(*batch, n), lde.reshape(*batch, big_n)

    return run


def lde_from_values_pallas(values, rate_bits: int, shift: int = COSET_SHIFT,
                           interpret: bool | None = None):
    """Values over H -> (coeffs natural order, LDE over shift*<w_N> natural
    order).  Drop-in for `ntt.lde_from_values`, one kernel launch."""
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    assert _supported(n, rate_bits), (n, rate_bits)
    if interpret is None:
        interpret = not use_pallas()
    return _build(log_n, rate_bits, shift, interpret)(values)


def lde_from_values_pallas_rev(values, rate_bits: int,
                               shift: int = COSET_SHIFT,
                               interpret: bool | None = None):
    """Values over H -> (coeffs natural order, LDE in BIT-REVERSED order —
    the commit-path layout, see fri/fri.py).  Same kernel; the coset-major
    result is assembled by two cheap reorders instead of the interleave."""
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    assert _supported(n, rate_bits), (n, rate_bits)
    if interpret is None:
        interpret = not use_pallas()
    return _build(log_n, rate_bits, shift, interpret, rev_order=True)(values)
