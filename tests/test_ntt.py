"""NTT / iNTT / coset LDE tests against naive evaluation."""
import random

import jax
import jax.numpy as jnp

from plonky2_tpu.field import ext, gl
import plonky2_tpu.ntt as nttmod
from plonky2_tpu.ntt import coset_lde, intt, lde_from_values, ntt

RNG = random.Random(0xACE)


def naive_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % gl.P
    return acc


def test_ntt_matches_naive():
    for log_n in [0, 1, 2, 4, 6]:
        n = 1 << log_n
        coeffs = [RNG.randrange(gl.P) for _ in range(n)]
        vals = gl.batch_to_int(ntt(gl.to_u64(coeffs)))
        w = gl.primitive_root_of_unity(log_n)
        for i in range(n):
            assert vals[i] == naive_eval(coeffs, pow(w, i, gl.P)), (log_n, i)


def test_ntt_roundtrip_batched():
    n = 1 << 8
    batch = [[RNG.randrange(gl.P) for _ in range(n)] for _ in range(5)]
    arr = gl.to_u64(batch)
    back = jax.jit(lambda a: intt(ntt(a)))(arr)
    assert gl.batch_to_int(back) == [x for row in batch for x in row]


def test_coset_lde():
    log_n, rate = 4, 2
    n = 1 << log_n
    coeffs = [RNG.randrange(gl.P) for _ in range(n)]
    lde = gl.batch_to_int(coset_lde(gl.to_u64(coeffs), rate))
    big_w = gl.primitive_root_of_unity(log_n + rate)
    g = nttmod.COSET_SHIFT
    for i in range(n << rate):
        x = (g * pow(big_w, i, gl.P)) % gl.P
        assert lde[i] == naive_eval(coeffs, x), i


def test_lde_from_values_consistency():
    log_n, rate = 5, 3
    n = 1 << log_n
    vals = [RNG.randrange(gl.P) for _ in range(n)]
    coeffs, lde = lde_from_values(gl.to_u64(vals), rate)
    # Degree < n is preserved: top padded coefficients of the LDE are zero.
    lde_coeffs = gl.batch_to_int(intt(ntt(intt(gl.to_u64(vals)))))
    assert len(lde_coeffs) == n
    # The LDE restricted to the subgroup points recovers the original values:
    # index stride: coset point g*w_N^(i*2^rate) corresponds to w_n^i only if
    # shift==1; instead just re-evaluate coeffs naively at a random point.
    c_host = gl.batch_to_int(coeffs)
    x = RNG.randrange(gl.P)
    # interpolation correctness: coeffs evaluate back to vals on H
    w = gl.primitive_root_of_unity(log_n)
    for i in [0, 1, n // 2, n - 1]:
        assert naive_eval(c_host, pow(w, i, gl.P)) == vals[i]
    assert len(gl.batch_to_int(lde)) == n << rate


def test_domain_negation_layout():
    # x_{i + N/2} == -x_i on the (coset of the) power-of-two domain — FRI
    # folding relies on this natural-order layout.
    log_n = 6
    n = 1 << log_n
    w = gl.primitive_root_of_unity(log_n)
    g = nttmod.COSET_SHIFT
    for i in [0, 1, 5]:
        a = (g * pow(w, i, gl.P)) % gl.P
        b = (g * pow(w, i + n // 2, gl.P)) % gl.P
        assert b == gl.P - a


def test_eval_polys_at_ext():
    n = 64
    polys = [[RNG.randrange(gl.P) for _ in range(n)] for _ in range(3)]
    zeta = (RNG.randrange(gl.P), RNG.randrange(gl.P))
    got = nttmod.eval_polys_at_ext(gl.to_u64(polys), zeta)
    for i, coeffs in enumerate(polys):
        want = nttmod.eval_poly_ext_s(coeffs, zeta)
        assert (int(got[i, 0]), int(got[i, 1])) == want
