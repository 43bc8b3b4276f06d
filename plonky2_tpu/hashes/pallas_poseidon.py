"""Poseidon permutation as a Pallas TPU kernel (lanes-first layout).

`permute_cols` under plain XLA materializes [12, B] u64 arrays in HBM for
every intermediate of every round — ~GBs of traffic per Merkle commit.
This kernel keeps a block of states resident in VMEM for all 30 rounds:
HBM traffic is one read + one write of the state planes.

Layout [12, B]: batch on the 128-lane axis (full VPU width), the 12 state
rows on sublanes.  All math on explicit (hi, lo) u32 planes (`field.gl32`;
Mosaic has no u64).  The circulant MDS
    out[i] = sum_d CIRC[d] * s[i + d mod 12]  (+ DIAG[0] * s[0] on row 0)
is computed as 12 sublane rotations accumulated over four 16-bit limb
planes (every accumulator stays < 2^27, one 128-bit reduction per round).

Bit-exact with `poseidon.permute_cols` / `poseidon.permute_s`; the kernel
is only built when the active MDS matrix is the small-entry circulant one
(`poseidon._MDS_SMALL`).

Replaces the rayon-parallel Merkle/transcript hashing inside the
reference's external plonky2 prover (SURVEY.md §2.2 "Hashing configs").
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
from . import poseidon as P

_M16 = np.uint32(0xFFFF)


_RUNTIME_OK = None       # set False if the first real launch fails


def _on_tpu_device() -> bool:
    """True on real TPU hardware: the tunneled PJRT plugin reports
    platform "axon" (not "tpu"), so check device_kind too."""
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return ("tpu" in d.platform.lower()
            or "tpu" in getattr(d, "device_kind", "").lower())


def _probe() -> bool:
    """One-time eager launch of a tiny kernel: Mosaic lowering on the
    tunneled backend is unproven territory, and a failure inside an outer
    jit would be unrecoverable — probe once, fall back globally.

    Never probes while a trace is active (launching an eager pallas_call
    mid-trace is exactly the failure mode this guards against): callers
    inside jit see False until someone probes from host context —
    prove()/compile() do so eagerly via ensure_probed()."""
    global _RUNTIME_OK
    if _RUNTIME_OK is None:
        try:
            from jax._src import core as _core
            if not _core.trace_state_clean():
                return False            # mid-trace: decide later
        except Exception:
            pass
        try:
            s = jnp.zeros((P.WIDTH, LANES_PROBE), dtype=jnp.uint64)
            out = permute_cols_pallas(s, interpret=False)
            want = P.permute_s([0] * P.WIDTH)
            _RUNTIME_OK = [int(x) for x in np.asarray(out)[:, 0]] == list(want)
            if not _RUNTIME_OK:
                import sys
                print("# pallas poseidon probe: wrong values; disabled",
                      file=sys.stderr, flush=True)
        except Exception as e:
            import sys
            print(f"# pallas poseidon probe failed ({type(e).__name__}); "
                  f"disabled", file=sys.stderr, flush=True)
            _RUNTIME_OK = False
    return _RUNTIME_OK


LANES_PROBE = 128


def ensure_probed() -> None:
    """Run the probes from host context (prove/compile entry points call
    this before any tracing happens)."""
    use_pallas()
    from ..ntt import pallas_lde
    pallas_lde.use_pallas()


def use_pallas() -> bool:
    if os.environ.get("PLONKY2_TPU_NO_PALLAS"):
        return False
    return _on_tpu_device() and P._MDS_SMALL and _probe()


def _roll_rows(p, d, interpret):
    if d == 0:
        return p
    if interpret:
        return jnp.roll(p, (P.WIDTH - d) % P.WIDTH, axis=0)
    return pltpu.roll(p, np.int32((P.WIDTH - d) % P.WIDTH), axis=0)


def _sbox32(x):
    x2 = gl32.mul(x, x)
    x3 = gl32.mul(x2, x)
    return gl32.mul(gl32.mul(x3, x3), x)


def _mds32(x, interpret):
    """Circulant small-entry MDS on (hi, lo) planes [12, B]."""
    xh, xl = x
    planes = (xl & _M16, xl >> 16, xh & _M16, xh >> 16)
    accs = [jnp.zeros_like(xl) for _ in range(4)]
    for d in range(P.WIDTH):
        c = np.uint32(P.MDS_CIRC[d])
        for k in range(4):
            accs[k] = accs[k] + c * _roll_rows(planes[k], d, interpret)
    diag = np.uint32(P.MDS_DIAG[0])
    if diag:
        accs = [jnp.concatenate([a[0:1] + diag * pl_[0:1], a[1:]], axis=0)
                for a, pl_ in zip(accs, planes)]
    a0, a1, a2, a3 = accs
    # value = a0 + a1*2^16 + a2*2^32 + a3*2^48, every a* < 2^27
    lo = a0 + (a1 << 16)
    c0 = (lo < a0).astype(jnp.uint32)
    mid = a2 + (a1 >> 16) + c0                  # < 2^28: no wrap
    hi = mid + (a3 << 16)
    c1 = (hi < mid).astype(jnp.uint32)
    top = (a3 >> 16) + c1                       # < 2^12
    return gl32._reduce128(jnp.zeros_like(top), top, hi, lo)


@functools.lru_cache(maxsize=None)
def _build(block: int, interpret: bool):
    rc = np.asarray(P.ROUND_CONSTANTS, dtype=np.uint64)     # [30, 12]
    rc_hi = (rc >> np.uint64(32)).astype(np.uint32)[:, :, None]
    rc_lo = (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, :, None]

    def kernel(xh_ref, xl_ref, rch_ref, rcl_ref, oh_ref, ol_ref):
        x = (xh_ref[...], xl_ref[...])
        half = P.FULL_ROUNDS // 2
        for r in range(P.N_ROUNDS):
            x = gl32.add(x, (rch_ref[r], rcl_ref[r]))
            if half <= r < half + P.PARTIAL_ROUNDS:
                s0 = _sbox32((x[0][0:1], x[1][0:1]))
                x = (jnp.concatenate([s0[0], x[0][1:]], axis=0),
                     jnp.concatenate([s0[1], x[1][1:]], axis=0))
            else:
                x = _sbox32(x)
            x = _mds32(x, interpret)
        oh_ref[...] = x[0]
        ol_ref[...] = x[1]

    def _state_im(i):
        return np.int32(0), jax.lax.convert_element_type(i, jnp.int32)

    def _rc_im(i):
        return np.int32(0), np.int32(0), np.int32(0)

    state_spec = pl.BlockSpec((P.WIDTH, block), _state_im,
                              memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec(rc_hi.shape, _rc_im, memory_space=pltpu.VMEM)

    @jax.jit
    def run(sh, sl):
        b = sh.shape[1]
        oh, ol = pl.pallas_call(
            kernel,
            grid=(b // block,),
            in_specs=[state_spec, state_spec, rc_spec, rc_spec],
            out_specs=(state_spec, state_spec),
            out_shape=(jax.ShapeDtypeStruct((P.WIDTH, b), jnp.uint32),
                       jax.ShapeDtypeStruct((P.WIDTH, b), jnp.uint32)),
            interpret=interpret,
        )(sh, sl, jnp.asarray(rc_hi), jnp.asarray(rc_lo))
        return oh, ol

    return run


def permute_cols_pallas(s, interpret: bool | None = None):
    """Drop-in for `poseidon.permute_cols`: s [12, B] u64 -> [12, B]."""
    if interpret is None:
        interpret = not use_pallas()
    b = s.shape[1]
    block = 1024 if b >= 1024 else max(128, 1 << (b - 1).bit_length())
    pad = (-b) % block
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)))
    sh, sl = gl32.split(s)
    oh, ol = _build(block, interpret)(sh, sl)
    out = gl32.join((oh, ol))
    return out[:, :b] if pad else out
