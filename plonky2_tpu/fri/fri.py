"""FRI low-degree commitment: prover (device) + verifier (host scalar).

Implements the batched-opening FRI used by plonky2-class provers
(SURVEY.md §2.2 "Prover/verifier", §3.2 steps 5-6):

* commit phase: repeatedly Merkle-commit the current layer's values grouped
  into folding cosets, draw beta, and fold by arity 2^a — on device the fold
  is a batched size-a iNTT over every coset plus a Horner evaluation at
  beta/x_j, all fully vectorized over the domain;
* final polynomial in the clear + proof-of-work grind (the grind is a single
  batched Poseidon evaluation over all candidate witnesses — TPU-friendly
  brute force);
* query phase: host-side Merkle openings of the initial oracles and every
  commit-phase layer.

Layout convention (matches plonky2): every LDE array is stored in
BIT-REVERSED domain order — index r holds the value at shift * w^rev(r) —
so an arity-2^a folding coset is the contiguous aligned block
[j*2^a, (j+1)*2^a): block j of layer L folds to index j of layer L+1,
which is again bit-reversed for the squared domain.  Query index bookkeeping: coset index = r >> a (plonky2's
`x_index >> arity_bits`), position within coset = r & (2^a - 1), and the
natural-domain exponent of a stored index is rev(r).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ext, gl
from ..hashes import poseidon
from ..merkle import MerkleTree, verify_merkle_proof_s
from ..ntt import host_powers, intt
from ..ntt.ntt import _bitrev_perm, intt_from_rev
from ..transcript import Challenger


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3
    cap_height: int = 4
    proof_of_work_bits: int = 16
    num_query_rounds: int = 28
    arity_bits: int = 4
    final_poly_bits: int = 5

    def reduction_arity_bits(self, degree_bits: int) -> list[int]:
        out = []
        d = degree_bits
        while d > self.final_poly_bits:
            a = min(self.arity_bits, d - self.final_poly_bits)
            out.append(a)
            d -= a
        return out


@dataclass
class FriInitialOpening:
    leaf_values: list  # list[int]
    siblings: list     # list[list[int]]


@dataclass
class FriQueryStep:
    evals: list        # list[(c0, c1)] — the arity coset values
    siblings: list


@dataclass
class FriQueryRound:
    initial: list      # list[FriInitialOpening], one per initial oracle
    steps: list        # list[FriQueryStep]


@dataclass
class FriProof:
    commit_caps: list  # list[list[4-elem digest]]
    query_rounds: list
    final_poly: list   # list[(c0, c1)] extension coefficients
    pow_witness: int
    query_indices: list = field(default_factory=list)  # derived; kept for debugging


# ------------------------------------------------------------------
# Device helpers
# ------------------------------------------------------------------

def _intt_ext(values):
    """iNTT over the extension: componentwise base-field iNTT on axis -2.

    values [..., n, 2] -> coeffs [..., n, 2]."""
    comp = jnp.moveaxis(values, -1, 0)          # [2, ..., n]
    return jnp.moveaxis(intt(comp), 0, -1)


def _intt_ext_from_rev(values_rev):
    """Like _intt_ext but the evaluations on axis -2 are bit-reversed."""
    comp = jnp.moveaxis(values_rev, -1, 0)
    return jnp.moveaxis(intt_from_rev(comp), 0, -1)


@functools.partial(jax.jit, static_argnames=("shift", "arity_bits"))
def _fold(values, beta_arr, shift: int, arity_bits: int):
    """One FRI fold by arity a = 2^arity_bits: [N, 2] ext values in
    BIT-REVERSED order on shift*<w_N> -> [N/a, 2] bit-reversed values on
    shift^a * <w_{N/a}>.

    Folding coset j is the contiguous block values[j*a:(j+1)*a], holding
    the natural coset {x_j * w_a^k} in rev_a(k) order; iNTT_a of each block
    (bit-reversed input), then Horner at beta/x_j with
    x_j = shift * w_N^rev(j) — all batched over N/a cosets."""
    N = values.shape[0]
    a = 1 << arity_bits
    rows = values.reshape(N // a, a, 2)                         # [N/a, a, 2]
    coeffs = _intt_ext_from_rev(rows)           # q_j coeffs on <w_a>
    # t_j = beta * x_j^{-1}; x_j = shift * w_N^{rev(j)}
    w_inv = gl.inv_s(gl.primitive_root_of_unity(N.bit_length() - 1))
    rev_rows = _bitrev_perm((N // a).bit_length() - 1)
    xinv = host_powers(w_inv, N // a)[rev_rows]                 # w^-rev(j)
    xinv = gl.mul(jnp.asarray(xinv), gl.U64(gl.inv_s(shift)))   # [N/a]
    beta_b = jnp.broadcast_to(beta_arr, (N // a, 2))
    t = ext.mul_base(beta_b, xinv)                              # [N/a, 2]
    acc = coeffs[:, a - 1, :]
    for k in range(a - 2, -1, -1):
        acc = ext.add(ext.mul(acc, t), coeffs[:, k, :])
    return acc


# ------------------------------------------------------------------
# Proof-of-work grind (device)
# ------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("batch", "pos", "hasher"))
def _grind_kernel(state_row, lo, threshold, batch: int, pos: int,
                  hasher=poseidon):
    """state_row [12] -> (found: bool, first_hit_offset: i64).

    Candidates are generated on device and only two scalars cross back to
    the host — the tunneled-TPU-friendly formulation (shipping a
    [batch, 12] base state or a hit mask costs seconds of transfer)."""
    cands = lo + jnp.arange(batch, dtype=gl.DTYPE)
    st = jnp.broadcast_to(state_row[:, None], (hasher.WIDTH, batch))
    st = st.at[pos, :].set(cands)
    out = hasher.permute_cols(st)[hasher.RATE - 1]
    ok = out < threshold
    hit = jnp.argmax(ok)
    return ok[hit], hit


def grind(challenger: Challenger, pow_bits: int, batch: int | None = None,
          max_batches: int = 4096) -> int:
    """Find w such that observe(w); get_challenge() has >= pow_bits leading
    zero bits.  The duplex transition is closed-form (challenger.py), so all
    candidates evaluate as one batched Poseidon permutation per chunk."""
    if batch is None:
        # ~16x the expected number of attempts, floor for vectorization
        batch = max(1 << 12, 16 << pow_bits)
    hasher = challenger.hasher
    buf = challenger.input_buffer
    state = list(challenger.sponge_state)
    assert len(buf) < hasher.RATE
    state[: len(buf)] = buf
    pos = len(buf)
    threshold = gl.U64(1 << (64 - pow_bits))
    state_row = gl.to_u64(state)
    for chunk in range(max_batches):
        lo = gl.U64(chunk * batch)
        found, hit = jax.device_get(
            _grind_kernel(state_row, lo, threshold, batch, pos, hasher))
        if found:
            return chunk * batch + int(hit)
    raise RuntimeError("PoW grind exhausted candidate space")


# ------------------------------------------------------------------
# Prover
# ------------------------------------------------------------------

def fri_prove(values, degree_bits: int, config: FriConfig,
              challenger: Challenger, shift: int,
              initial_trees: list[MerkleTree], hasher=poseidon) -> FriProof:
    """values: [N, 2] ext composite over the LDE coset in BIT-REVERSED
    order, N = 2^(degree_bits + rate_bits).  initial_trees: the
    already-committed (bit-reversed-leaf) oracles whose openings each query
    round must include."""
    N = values.shape[0]
    assert N == 1 << (degree_bits + config.rate_bits)

    from ..utils import timed_span

    arities = config.reduction_arity_bits(degree_bits)
    cur = values
    cur_shift = shift
    layer_trees: list[MerkleTree] = []
    betas = []
    with timed_span("FRI commit/fold layers"):
        for ab in arities:
            a = 1 << ab
            Nc = cur.shape[0]
            # leaf j = the contiguous arity block, flattened (c0, c1) pairs;
            # column layout [2a, rows] feeds build_cols
            leaves_cols = cur.reshape(Nc // a, a, 2).transpose(1, 2, 0).reshape(2 * a, Nc // a)
            tree = MerkleTree.build_cols(leaves_cols, min(config.cap_height, (Nc // a).bit_length() - 1), hasher)
            layer_trees.append(tree)
            challenger.observe_cap(tree.cap_host())
            beta = challenger.get_ext_challenge()
            betas.append(beta)
            cur = _fold(cur, gl.to_u64(list(beta)), cur_shift, ab)
            cur_shift = pow(cur_shift, a, gl.P)

    # Final polynomial (coefficients in the clear).
    with timed_span("FRI final poly"):
        Nf = cur.shape[0]
        q_coeffs = _intt_ext_from_rev(cur)                      # coeffs of f(shift*y)
        sinv_pows = jnp.asarray(host_powers(gl.inv_s(cur_shift), Nf))
        f_coeffs = ext.mul_base(q_coeffs, sinv_pows)
        final_len = 1 << (degree_bits - sum(arities))
        fc_host = np.asarray(f_coeffs)
        final_poly = [(int(fc_host[k, 0]), int(fc_host[k, 1])) for k in range(final_len)]
        for c in final_poly:
            challenger.observe_ext(c)

    # Proof of work.
    with timed_span("FRI PoW grind"):
        pow_witness = grind(challenger, config.proof_of_work_bits)
        challenger.observe_element(pow_witness)
        response = challenger.get_challenge()
        assert response < (1 << (64 - config.proof_of_work_bits))

    # Query rounds: all openings of every tree are gathered on device in
    # one batched take per tree (one host transfer each) — never
    # materialize a full tree on the host.
    with timed_span("FRI query openings (batched gather)"):
        query_indices = [challenger.get_challenge() % N
                         for _ in range(config.num_query_rounds)]
        Q = len(query_indices)
        idx_arr = np.asarray(query_indices, dtype=np.int64)
        initial_data = [t.open_many(idx_arr) for t in initial_trees]
        layer_data = []
        cur_idx, cur_N = idx_arr, N
        for ab, tree in zip(arities, layer_trees):
            rows = cur_N >> ab
            j = cur_idx >> ab            # contiguous blocks: high bits
            layer_data.append(tree.open_many(j))
            cur_idx, cur_N = j, rows

    query_rounds = []
    for q in range(Q):
        initial = [FriInitialOpening([int(x) for x in lv[q]],
                                     [[int(x) for x in s] for s in sib[q]])
                   for lv, sib in initial_data]
        steps = []
        for ab, (lv, sib) in zip(arities, layer_data):
            a = 1 << ab
            row = lv[q]
            evals = [(int(row[2 * k]), int(row[2 * k + 1])) for k in range(a)]
            steps.append(FriQueryStep(
                evals, [[int(x) for x in s] for s in sib[q]]))
        query_rounds.append(FriQueryRound(initial, steps))

    return FriProof(
        commit_caps=[t.cap_host() for t in layer_trees],
        query_rounds=query_rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_indices=query_indices,
    )


# ------------------------------------------------------------------
# Verifier (host scalar)
# ------------------------------------------------------------------

def _interpolate_coset_s(points, values, beta):
    """Lagrange-interpolate {(points[k] base, values[k] ext)} and evaluate at
    beta (ext).  O(a^2), verifier-sized."""
    a = len(points)
    acc = ext.ZERO
    for k in range(a):
        num = ext.ONE
        den = 1
        for m in range(a):
            if m == k:
                continue
            num = ext.mul_s(num, ext.sub_s(beta, ext.from_base_s(points[m])))
            den = gl.mul_s(den, gl.sub_s(points[k], points[m]))
        term = ext.mul_s(values[k], ext.scalar_mul_s(num, gl.inv_s(den)))
        acc = ext.add_s(acc, term)
    return acc


def fri_verify(proof: FriProof, degree_bits: int, config: FriConfig,
               challenger: Challenger, shift: int,
               initial_caps: list, combine_fn, hasher=poseidon) -> None:
    """Raises AssertionError on any failed check.

    combine_fn(index, initial_leaf_values: list[list[int]]) -> ext tuple:
    recomputes the composite value at BIT-REVERSED domain index `index`
    (the point is shift * w^rev(index)) from the opened initial-oracle
    leaves (the plonk layer supplies the batched-opening formula; the
    standalone test supplies identity)."""
    N = 1 << (degree_bits + config.rate_bits)
    arities = config.reduction_arity_bits(degree_bits)
    assert len(proof.commit_caps) == len(arities)

    betas = []
    for cap in proof.commit_caps:
        challenger.observe_cap(cap)
        betas.append(challenger.get_ext_challenge())
    final_len = 1 << (degree_bits - sum(arities))
    assert len(proof.final_poly) == final_len
    for c in proof.final_poly:
        challenger.observe_ext(c)

    challenger.observe_element(proof.pow_witness)
    response = challenger.get_challenge()
    assert response < (1 << (64 - config.proof_of_work_bits)), "PoW check failed"

    query_indices = [challenger.get_challenge() % N
                     for _ in range(config.num_query_rounds)]
    assert len(proof.query_rounds) == len(query_indices)

    for idx, qr in zip(query_indices, proof.query_rounds):
        assert len(qr.initial) == len(initial_caps)
        for opening, cap in zip(qr.initial, initial_caps):
            assert verify_merkle_proof_s(opening.leaf_values, idx, cap,
                                         opening.siblings, hasher), "initial Merkle proof"
        old_eval = combine_fn(idx, [o.leaf_values for o in qr.initial])

        cur_N, cur_i, cur_shift = N, idx, shift
        for (ab, beta, step, cap) in zip(arities, betas, qr.steps, proof.commit_caps):
            a = 1 << ab
            rows = cur_N // a
            j = cur_i >> ab              # contiguous block: high bits
            pos = cur_i & (a - 1)        # slot within block (rev_a order)
            assert step.evals[pos] == tuple(old_eval), "fold consistency"
            leaf = [x for e in step.evals for x in e]
            assert verify_merkle_proof_s(leaf, j, cap, step.siblings,
                                         hasher), "layer Merkle proof"
            # block slot m holds the value at x_j * w_a^{rev_a(m)},
            # x_j = shift * w_N^{rev_rows(j)}
            w_N = gl.primitive_root_of_unity(cur_N.bit_length() - 1)
            rev_rows = _bitrev_perm(rows.bit_length() - 1)
            rev_a = _bitrev_perm(ab)
            x_j = gl.mul_s(cur_shift, pow(w_N, int(rev_rows[j]), gl.P))
            w_a = gl.primitive_root_of_unity(ab)
            pts = [gl.mul_s(x_j, pow(w_a, int(rev_a[m]), gl.P))
                   for m in range(a)]
            vals = [tuple(e) for e in step.evals]
            old_eval = _interpolate_coset_s(pts, vals, beta)
            cur_N, cur_i, cur_shift = rows, j, pow(cur_shift, a, gl.P)

        # Final polynomial check at the surviving point.
        w_f = gl.primitive_root_of_unity(cur_N.bit_length() - 1)
        rev_f = _bitrev_perm(cur_N.bit_length() - 1)
        x = gl.mul_s(cur_shift, pow(w_f, int(rev_f[cur_i]), gl.P))
        acc = ext.ZERO
        for c in reversed(proof.final_poly):
            acc = ext.add_s(ext.mul_s(acc, ext.from_base_s(x)), c)
        assert tuple(acc) == tuple(old_eval), "final poly check"
