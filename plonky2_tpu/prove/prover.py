"""The prover: witness -> proof (SURVEY.md §3.2, all phases).

Phase -> placement:
1. witness generation         host (batched hints; see witness/)
2. wire LDE + Merkle caps     device (NTT + batched Poseidon)       HOT
3. permutation Z polys        device (associative-scan grand product)
4. quotient on the 8n coset   device (vectorized per-gate constraints) HOT
5. openings at zeta           device (power-ladder reductions)
6. FRI commit/fold/PoW        device; query extraction host         HOT

Every device phase is a jitted kernel with static shapes; the per-circuit
kernels (quotient, composite — whose graphs depend on the gate set) are
built once per CircuitData and cached on it.  Host<->device sync happens
only at transcript points (a Merkle cap or opening values crossing into the
Fiat-Shamir challenger), mirroring the hot-path analysis of SURVEY.md §3.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ext, gl
from ..fri import fri_prove
from ..hashes import poseidon
from ..merkle import MerkleTree
from ..ntt import COSET_SHIFT, coset_lde, eval_polys_at_ext, host_powers, intt
from ..transcript import Challenger
from ..witness import generate_witness
from .proof import OpeningSet, Proof


@functools.partial(jax.jit, static_argnames=("rate_bits",))
def _lde_commit(values, rate_bits: int):
    coeffs = intt(values)
    return coeffs, coset_lde(coeffs, rate_bits)


def _prefix_product(r):
    """Exclusive modular prefix product along axis -1 (log-depth scan)."""
    inclusive = jax.lax.associative_scan(gl.mul, r, axis=-1)
    one = jnp.ones(r.shape[:-1] + (1,), dtype=gl.DTYPE)
    return jnp.concatenate([one, inclusive[..., :-1]], axis=-1)


def _ext_arr(c):
    return gl.to_u64(list(c))


def _power_ladder_base(alpha, n: int):
    """[1, alpha, ..., alpha^(n-1)] for a traced base scalar, via log-doubling
    (log n traced ops instead of an n-long chain)."""
    p = jnp.asarray(gl.to_u64([1]))
    cur = alpha
    m = 1
    while m < n:
        take = min(m, n - m)
        p = jnp.concatenate([p, gl.mul(p[:take], cur)])
        cur = gl.mul(cur, cur)
        m *= 2
    return p[:n]


def _power_ladder_ext(alpha_a, n: int):
    """[n, 2] powers of a traced extension scalar via log-doubling."""
    p = jnp.asarray(gl.to_u64([[1, 0]]))
    cur = alpha_a
    m = 1
    while m < n:
        take = min(m, n - m)
        stepped = ext.mul(p[:take], jnp.broadcast_to(cur, (take, 2)))
        p = jnp.concatenate([p, stepped], axis=0)
        c0 = gl.add(gl.mul(cur[0], cur[0]),
                    gl.mul(gl.U64(ext.W), gl.mul(cur[1], cur[1])))
        c1 = gl.add(gl.mul(cur[0], cur[1]), gl.mul(cur[1], cur[0]))
        cur = jnp.stack([c0, c1])
        m *= 2
    return p[:n]


# ------------------------------------------------------------------
# per-circuit jitted kernels
# ------------------------------------------------------------------

def get_kernels(pd):
    k = getattr(pd, "_kernels", None)
    if k is None:
        k = _make_kernels(pd.common)
        pd._kernels = k
    return k


def _make_kernels(common):
    cfg = common.config
    fri_cfg = cfg.fri
    n = 1 << common.degree_bits
    rate = fri_cfg.rate_bits
    N = n << rate
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    qf = cfg.max_quotient_degree_factor
    K = common.num_partial_products + 1

    def _chunk_products(num, den):
        pad = K * qf - nr
        if pad:
            ones = jnp.ones((pad,) + num.shape[1:], dtype=gl.DTYPE)
            num = jnp.concatenate([num, ones], axis=0)
            den = jnp.concatenate([den, ones], axis=0)
        cn = num.reshape(K, qf, *num.shape[1:])
        cd = den.reshape(K, qf, *den.shape[1:])
        pn, pdn = cn[:, 0], cd[:, 0]
        for j in range(1, qf):
            pn = gl.mul(pn, cn[:, j])
            pdn = gl.mul(pdn, cd[:, j])
        return pn, pdn

    @jax.jit
    def z_phase(routed, sigma, k_arr, g_pows, betas, gammas):
        zs, pps = [], []
        for c in range(nc):
            beta, gamma = betas[c], gammas[c]
            num = gl.add(gl.add(routed, gl.mul(gl.mul(beta, k_arr[:, None]),
                                               g_pows[None, :])), gamma)
            den = gl.add(gl.add(routed, gl.mul(beta, sigma)), gamma)
            pn, pdn = _chunk_products(num, den)
            ratio = gl.mul(pn, gl.inv(pdn))              # [K, n]
            full = ratio[0]
            for m in range(1, K):
                full = gl.mul(full, ratio[m])
            z = _prefix_product(full)
            zs.append(z)
            acc = z
            for m in range(K - 1):
                acc = gl.mul(acc, ratio[m])
                pps.append(acc)
        return jnp.stack(zs + pps, axis=0)

    @jax.jit
    def quotient_phase(wires_lde, sel_lde, const_lde, sigma_lde, zs_pp_lde,
                       x_lde, zh_inv, l1, k_arr, betas, gammas, alphas,
                       pi_hash_arr, sinv_pows):
        # Terms are alpha-folded on the fly instead of materialized: the
        # slot-sum identity  sum_t a^t sum_g filt_g c_{g,t}
        #                  = sum_g filt_g sum_t a^t c_{g,t}
        # lets each gate's constraints stay fused intermediates (no
        # max_constraints x [N] slot arrays), cutting the quotient phase's
        # HBM traffic to O(wires + num_gate_types) passes.  The term order
        # (all challenges' vanishing terms, then gate constraint slots)
        # matches the verifier's fold exactly (verifier.py:70-117).
        from ..gates.base import BatchAlg, EvalVars
        one = jnp.ones_like(x_lde)
        vterms = []
        for c in range(nc):
            beta, gamma = betas[c], gammas[c]
            z = zs_pp_lde[c]
            z_next = jnp.roll(z, -(1 << rate))
            pps = [zs_pp_lde[nc + c * (K - 1) + m] for m in range(K - 1)]
            vterms.append(gl.mul(l1, gl.sub(z, one)))
            accs = [z] + pps + [z_next]
            num = gl.add(gl.add(wires_lde[:nr],
                                gl.mul(gl.mul(beta, k_arr[:, None]),
                                       x_lde[None, :])), gamma)
            den = gl.add(gl.add(wires_lde[:nr], gl.mul(beta, sigma_lde)), gamma)
            pn, pdn = _chunk_products(num, den)
            for m in range(K):
                vterms.append(gl.sub(gl.mul(accs[m + 1], pdn[m]),
                                     gl.mul(accs[m], pn[m])))

        T0 = len(vterms)
        maxc = max((g.num_constraints for g in common.gates), default=0)
        apows = [_power_ladder_base(alphas[c], T0 + maxc) for c in range(nc)]

        chal_accs = []
        for c in range(nc):
            acc = jnp.zeros_like(x_lde)
            for t, term in enumerate(vterms):
                acc = gl.add(acc, gl.mul(term, apows[c][t]))
            chal_accs.append(acc)

        sel_info = common.selector_info
        many = len(sel_info.groups) > 1
        shape = x_lde.shape
        alg = BatchAlg(shape)
        pi_arrs = [jnp.broadcast_to(pi_hash_arr[i], shape) for i in range(4)]
        for gi, gate in enumerate(common.gates):
            grp_idx = sel_info.gate_group[gi]
            s = sel_lde[grp_idx]
            filt = one
            for other in sel_info.groups[grp_idx]:
                if other != gi:
                    filt = gl.mul(filt, gl.sub(jnp.full(shape, gl.U64(other)), s))
            if many:
                filt = gl.mul(filt, gl.sub(jnp.full(shape, gl.U64(sel_info.unused)), s))
            if hasattr(gate, "eval_batch_fast"):
                cs = list(gate.eval_batch_fast(wires_lde, const_lde, pi_arrs))
            else:
                vars_ = EvalVars([wires_lde[i] for i in range(gate.num_wires)],
                                 [const_lde[i] for i in range(const_lde.shape[0])],
                                 pi_arrs)
                cs = gate.eval(vars_, alg)
            for c in range(nc):
                gacc = None
                for t_idx, cval in enumerate(cs):
                    w = gl.mul(cval, apows[c][T0 + t_idx])
                    gacc = w if gacc is None else gl.add(gacc, w)
                if gacc is not None:
                    chal_accs[c] = gl.add(chal_accs[c], gl.mul(filt, gacc))

        q_polys = []
        for c in range(nc):
            tq = gl.mul(chal_accs[c], zh_inv)
            q_coeffs = gl.mul(intt(tq), sinv_pows)
            q_polys.append(q_coeffs.reshape(1 << rate, n))
        q_polys = jnp.concatenate(q_polys, axis=0)
        q_lde = coset_lde(q_polys, rate)
        return q_polys, q_lde

    @jax.jit
    def composite(batch0_lde, zs_lde, fri_alpha_a, zeta_a, zeta_next_a,
                  o0_a, o1_a, alpha_b0_a, x_lde):
        # all *_a are traced (2,) u64 extension values
        x_ext = ext.from_base(x_lde)

        def reduce_alpha(polys):
            # Sum_i alpha^i f_i(x): log-doubling alpha-power ladder, then the
            # two extension components are weighted stacked muls + tree sums.
            ap = _power_ladder_ext(fri_alpha_a, polys.shape[0])   # [B, 2]
            r0c = gl.sum_mod(gl.mul(polys, ap[:, 0:1]), axis=0)
            r1c = gl.sum_mod(gl.mul(polys, ap[:, 1:2]), axis=0)
            return jnp.stack([r0c, r1c], axis=-1)      # [N, 2]

        r0 = reduce_alpha(batch0_lde)
        r1 = reduce_alpha(zs_lde)
        inv0 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_a, x_ext.shape)))
        inv1 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_next_a, x_ext.shape)))
        f0 = ext.mul(ext.sub(r0, jnp.broadcast_to(o0_a, x_ext.shape)), inv0)
        f1 = ext.mul(ext.sub(r1, jnp.broadcast_to(o1_a, x_ext.shape)), inv1)
        f1 = ext.mul(f1, jnp.broadcast_to(alpha_b0_a, x_ext.shape))
        return ext.add(f0, f1)

    return {"z_phase": z_phase, "quotient_phase": quotient_phase,
            "composite": composite}


# ------------------------------------------------------------------
# main
# ------------------------------------------------------------------

def prove(pd, inputs: dict) -> Proof:
    from ..utils import timed_span
    with timed_span(f"prove (2^{pd.common.degree_bits} rows)"):
        return _prove_impl(pd, inputs)


def _prove_impl(pd, inputs: dict) -> Proof:
    common = pd.common
    cfg = common.config
    fri_cfg = cfg.fri
    n = 1 << common.degree_bits
    rate = fri_cfg.rate_bits
    N = n << rate
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    kernels = get_kernels(pd)

    # ---- 1. witness ----
    from ..utils import timed_span
    with timed_span("witness generation"):
        store = generate_witness(pd, inputs)
    from ..ir.builder import Wire
    wires_host = np.zeros((cfg.num_wires, n), dtype=np.uint64)
    for rep, v in store._vals.items():
        if isinstance(rep, Wire):
            wires_host[rep.column, rep.row] = v
        for w in pd.class_wires.get(rep, ()):
            wires_host[w.column, w.row] = v
    with timed_span("witness aux fill (batched)"):
        for gi, gate in enumerate(common.gates):
            if hasattr(gate, "aux_fill"):
                rows = pd.gate_rows.get(gi)
                if rows:
                    gate.aux_fill(np.asarray(rows, dtype=np.int64), wires_host)
    pi_values = [store.get(t) for t in pd.pi_targets]
    pi_hash = cfg.hasher_module().hash_no_pad_s(pi_values)

    # ---- 2. commit wires ----
    with timed_span("wire LDE + Merkle commit"):
        wires_coeffs, wires_lde = _lde_commit(jnp.asarray(wires_host), rate)
        wires_tree = MerkleTree.build(wires_lde.T, fri_cfg.cap_height)
        wires_tree.cap_host()

    ch = Challenger()
    ch.observe_cap(pd.cs_tree.cap_host())
    ch.observe_elements(pi_hash)
    ch.observe_cap(wires_tree.cap_host())
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)

    # ---- 3. Z polys + partial products over H ----
    g_pows = jnp.asarray(host_powers(
        gl.primitive_root_of_unity(common.degree_bits), n))
    k_arr = gl.to_u64(common.k_is)
    with timed_span("permutation Z polys + commit"):
        zs_pp_vals = kernels["z_phase"](
            jnp.asarray(wires_host[:nr]), pd.sigma_polys, k_arr, g_pows,
            gl.to_u64(betas), gl.to_u64(gammas))
        zs_pp_coeffs, zs_pp_lde = _lde_commit(zs_pp_vals, rate)
        zs_tree = MerkleTree.build(zs_pp_lde.T, fri_cfg.cap_height)
        zs_tree.cap_host()
    ch.observe_cap(zs_tree.cap_host())
    alphas = ch.get_n_challenges(nc)

    # ---- 4. quotient ----
    sel_count = len(common.selector_info.groups)
    sel_lde = pd.cs_lde[:sel_count]
    const_lde = pd.cs_lde[sel_count:sel_count + common.num_constants_polys]
    sigma_lde = pd.cs_lde[sel_count + common.num_constants_polys:]

    x_lde = gl.mul(jnp.asarray(host_powers(
        gl.primitive_root_of_unity(common.degree_bits + rate), N)),
        gl.U64(COSET_SHIFT))
    shift_n = pow(COSET_SHIFT, n, gl.P)
    w8 = gl.primitive_root_of_unity(rate)
    zh_vals = [(shift_n * pow(w8, j, gl.P) - 1) % gl.P for j in range(1 << rate)]
    zh = jnp.tile(gl.to_u64(zh_vals), N >> rate)
    zh_inv = gl.inv(zh)
    l1 = gl.mul(zh, gl.inv(gl.mul(gl.sub(x_lde, jnp.ones_like(x_lde)),
                                  jnp.full_like(x_lde, gl.U64(n)))))
    sinv_pows = jnp.asarray(host_powers(gl.inv_s(COSET_SHIFT), N))

    with timed_span("quotient evaluation + commit"):
        q_polys, q_lde = kernels["quotient_phase"](
            wires_lde, sel_lde, const_lde, sigma_lde, zs_pp_lde, x_lde, zh_inv,
            l1, k_arr, gl.to_u64(betas), gl.to_u64(gammas), gl.to_u64(alphas),
            gl.to_u64(pi_hash), sinv_pows)
        q_tree = MerkleTree.build(q_lde.T, fri_cfg.cap_height)
        q_tree.cap_host()
    ch.observe_cap(q_tree.cap_host())
    zeta = ch.get_ext_challenge()

    # ---- 5. openings ----
    g = gl.primitive_root_of_unity(common.degree_bits)
    zeta_next = ext.scalar_mul_s(zeta, g)

    def open_at(coeffs, point):
        arr = np.asarray(eval_polys_at_ext(coeffs, point))
        return [(int(a), int(b)) for a, b in arr]

    with timed_span("openings at zeta"):
        cs_open = open_at(pd.cs_coeffs, zeta)
        wires_open = open_at(wires_coeffs, zeta)
        zs_pp_open = open_at(zs_pp_coeffs, zeta)
        zs_next_open = open_at(zs_pp_coeffs[:nc], zeta_next)
        q_open = open_at(q_polys, zeta)

    openings = OpeningSet(cs_open, wires_open, zs_pp_open, zs_next_open, q_open)
    for e in openings.observe_order():
        ch.observe_ext(e)
    fri_alpha = ch.get_ext_challenge()

    # ---- 6. FRI ----
    batch0_lde = jnp.concatenate([pd.cs_lde, wires_lde, zs_pp_lde, q_lde], axis=0)
    batch0_open = cs_open + wires_open + zs_pp_open + q_open
    B0 = len(batch0_open)
    o0 = ext.ZERO
    for v in reversed(batch0_open):
        o0 = ext.add_s(ext.mul_s(o0, fri_alpha), v)
    o1 = ext.ZERO
    for v in reversed(zs_next_open):
        o1 = ext.add_s(ext.mul_s(o1, fri_alpha), v)
    alpha_b0 = ext.pow_s(fri_alpha, B0)
    with timed_span("FRI (composite + commit phases + queries)"):
        composite = kernels["composite"](
            batch0_lde, zs_pp_lde[:nc], _ext_arr(fri_alpha), _ext_arr(zeta),
            _ext_arr(zeta_next), _ext_arr(o0), _ext_arr(o1), _ext_arr(alpha_b0),
            x_lde)
        fri = fri_prove(composite, common.degree_bits, fri_cfg, ch, COSET_SHIFT,
                        [pd.cs_tree, wires_tree, zs_tree, q_tree])

    return Proof(
        wires_cap=wires_tree.cap_host(),
        zs_pp_cap=zs_tree.cap_host(),
        quotient_cap=q_tree.cap_host(),
        openings=openings,
        fri=fri,
        public_inputs=pi_values,
    )
