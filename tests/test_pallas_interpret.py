"""Interpret-mode bit-exactness tests for the Pallas TPU kernels.

The suite runs on CPU (conftest), where the Mosaic kernels can't execute —
but Pallas interpret mode runs the same kernel logic through jnp ops, so
these tests pin the u32-plane math (field/gl32), the roll/select butterfly
network, and the circulant-MDS limb accumulation against the plain XLA
reference implementations bit for bit."""
import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_tpu.field import gl
from plonky2_tpu.hashes import poseidon
from plonky2_tpu.hashes.pallas_poseidon import permute_cols_pallas
from plonky2_tpu.ntt import coset_lde, intt
from plonky2_tpu.ntt.pallas_lde import lde_from_values_pallas

RNG = np.random.RandomState(0xA11A5)


def rand_u64(*shape):
    return jnp.asarray(
        RNG.randint(0, 1 << 62, size=shape, dtype=np.uint64) % gl.P)


def test_pallas_poseidon_interpret_bit_exact():
    if not poseidon._MDS_SMALL:
        pytest.skip("pallas poseidon requires the small-entry MDS")
    s = rand_u64(12, 256)
    want = np.asarray(poseidon.permute_cols(s))
    got = np.asarray(permute_cols_pallas(s, interpret=True))
    assert np.array_equal(want, got)
    # scalar cross-check on one column
    col = [int(x) for x in np.asarray(s)[:, 3]]
    assert [int(x) for x in got[:, 3]] == list(poseidon.permute_s(col))


@pytest.mark.parametrize("log_n,rate", [(8, 3), (9, 2), (10, 3)])
def test_pallas_lde_interpret_bit_exact(log_n, rate):
    n = 1 << log_n
    vals = rand_u64(3, n)
    coeffs_want = np.asarray(intt(vals))
    lde_want = np.asarray(coset_lde(jnp.asarray(coeffs_want), rate))
    coeffs_got, lde_got = lde_from_values_pallas(vals, rate, interpret=True)
    assert np.array_equal(coeffs_want, np.asarray(coeffs_got))
    assert np.array_equal(lde_want, np.asarray(lde_got))


def test_pallas_lde_interpret_roundtrip_identity():
    # LDE restricted to the original-domain points must reproduce an
    # evaluation of the interpolant: spot-check degree-1 poly exactly.
    n, rate = 256, 3
    xs = np.asarray(jnp.arange(n, dtype=jnp.uint64))
    # values of p(x) = 5 + 7x on H
    w = gl.primitive_root_of_unity(8)
    pts = [pow(w, i, gl.P) for i in range(n)]
    vals = jnp.asarray(np.asarray([(5 + 7 * x) % gl.P for x in pts],
                                  dtype=np.uint64))[None, :]
    coeffs, lde = lde_from_values_pallas(vals, rate, interpret=True)
    c = np.asarray(coeffs)[0]
    assert int(c[0]) == 5 and int(c[1]) == 7 and not c[2:].any()
    # check a coset point: x0 = shift * w_N^0 = shift
    from plonky2_tpu.ntt import COSET_SHIFT
    assert int(np.asarray(lde)[0, 0]) == (5 + 7 * COSET_SHIFT) % gl.P


def test_pallas_lde_rev_interpret_bit_exact():
    """Fused kernel, bit-reversed output mode (the commit-path layout)."""
    from plonky2_tpu.ntt.ntt import lde_from_values_rev
    from plonky2_tpu.ntt.pallas_lde import lde_from_values_pallas_rev
    vals = rand_u64(3, 1 << 9)
    cw, lw = lde_from_values_rev(vals, 3)
    cg, lg = lde_from_values_pallas_rev(vals, 3, interpret=True)
    assert np.array_equal(np.asarray(cw), np.asarray(cg))
    assert np.array_equal(np.asarray(lw), np.asarray(lg))


def test_pallas_lde_tiled_interpret_bit_exact():
    """Tiled four-step kernel (n >= 2^14) against the stage-wise XLA rev
    path — pins the column/row stage decomposition, the inter-stage
    twiddles, and the per-coset scale outer product bit for bit."""
    from plonky2_tpu.ntt.ntt import lde_from_values_rev
    from plonky2_tpu.ntt.pallas_lde_tiled import lde_from_values_tiled_rev
    vals = rand_u64(2, 1 << 14)
    cw, lw = lde_from_values_rev(vals, 3)
    cg, lg = lde_from_values_tiled_rev(vals, 3, interpret=True)
    assert np.array_equal(np.asarray(cw), np.asarray(cg))
    assert np.array_equal(np.asarray(lw), np.asarray(lg))
