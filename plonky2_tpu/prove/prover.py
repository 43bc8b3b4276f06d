"""The prover: witness -> proof (SURVEY.md §3.2, all phases).

Phase -> placement:
1. witness generation         host (batched hints; see witness/)
2. wire LDE + Merkle caps     device (NTT + batched Poseidon)       HOT
3. permutation Z polys        device (associative-scan grand product)
4. quotient on the 8n coset   device (vectorized per-gate constraints) HOT
5. openings at zeta           device (power-ladder reductions)
6. FRI commit/fold/PoW        device; query extraction host         HOT
"""

from __future__ import annotations

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


# ------------------------------------------------------------------
# helpers
# ------------------------------------------------------------------

def _prefix_product(r):
    """Exclusive modular prefix product along axis -1 (log-depth scan)."""
    inclusive = jax.lax.associative_scan(gl.mul, r, axis=-1)
    one = jnp.ones(r.shape[:-1] + (1,), dtype=gl.DTYPE)
    return jnp.concatenate([one, inclusive[..., :-1]], axis=-1)


def _reduce_with_powers_base(terms, alpha: int):
    """sum_t alpha^t * terms[t] for base-field [N] arrays, accumulated
    without stacking (memory-lean)."""
    acc = jnp.zeros_like(terms[0])
    apow = 1
    for t in terms:
        acc = gl.add(acc, gl.mul(t, gl.U64(apow)))
        apow = (apow * alpha) % gl.P
    return acc


def _ext_arr(c):
    return gl.to_u64(list(c))


# ------------------------------------------------------------------
# main
# ------------------------------------------------------------------

def prove(pd, inputs: dict) -> Proof:
    common = pd.common
    cfg = common.config
    fri_cfg = cfg.fri
    n = 1 << common.degree_bits
    rate = fri_cfg.rate_bits
    N = n << rate
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    K = common.num_partial_products + 1          # number of wire chunks
    qf = cfg.max_quotient_degree_factor

    # ---- 1. witness ----
    store = generate_witness(pd, inputs)
    from ..ir.builder import Wire
    wires_host = np.zeros((cfg.num_wires, n), dtype=np.uint64)
    for rep, v in store._vals.items():
        if isinstance(rep, Wire):
            wires_host[rep.column, rep.row] = v
        for w in pd.class_wires.get(rep, ()):
            wires_host[w.column, w.row] = v
    pi_values = [store.get(t) for t in pd.pi_targets]
    pi_hash = poseidon.hash_no_pad_s(pi_values)

    # ---- 2. commit wires ----
    wires_dev = jnp.asarray(wires_host)
    wires_coeffs = intt(wires_dev)
    wires_lde = coset_lde(wires_coeffs, rate)
    wires_tree = MerkleTree.build(wires_lde.T, fri_cfg.cap_height)

    ch = Challenger()
    ch.observe_cap(pd.cs_tree.cap_host())
    ch.observe_elements(pi_hash)
    ch.observe_cap(wires_tree.cap_host())
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)

    # ---- 3. Z polys + partial products over H ----
    g_pows = jnp.asarray(host_powers(gl.primitive_root_of_unity(common.degree_bits), n))
    k_arr = gl.to_u64(common.k_is)                       # [nr]
    routed = wires_dev[:nr]                              # [nr, n]
    zs_list, pps_list = [], []
    for c in range(nc):
        beta = gl.U64(betas[c])
        gamma = gl.U64(gammas[c])
        num = gl.add(gl.add(routed, gl.mul(gl.mul(beta, k_arr[:, None]),
                                           g_pows[None, :])), gamma)
        den = gl.add(gl.add(routed, gl.mul(beta, pd.sigma_polys)), gamma)
        # chunk products (pad nr to K*qf with ones)
        pad = K * qf - nr
        if pad:
            ones = jnp.ones((pad, n), dtype=gl.DTYPE)
            num = jnp.concatenate([num, ones], axis=0)
            den = jnp.concatenate([den, ones], axis=0)
        cn = num.reshape(K, qf, n)
        cd = den.reshape(K, qf, n)
        chunk_num = cn[:, 0]
        chunk_den = cd[:, 0]
        for j in range(1, qf):
            chunk_num = gl.mul(chunk_num, cn[:, j])
            chunk_den = gl.mul(chunk_den, cd[:, j])
        ratio = gl.mul(chunk_num, gl.inv(chunk_den))     # [K, n]
        full = ratio[0]
        for m in range(1, K):
            full = gl.mul(full, ratio[m])
        z = _prefix_product(full)                        # [n]
        zs_list.append(z)
        accs = z
        pps_c = []
        for m in range(K - 1):
            accs = gl.mul(accs, ratio[m])
            pps_c.append(accs)
        pps_list.append(pps_c)

    zs_pp_vals = jnp.stack(zs_list + [p for pps in pps_list for p in pps], axis=0)
    zs_pp_coeffs = intt(zs_pp_vals)
    zs_pp_lde = coset_lde(zs_pp_coeffs, rate)
    zs_tree = MerkleTree.build(zs_pp_lde.T, fri_cfg.cap_height)
    ch.observe_cap(zs_tree.cap_host())
    alphas = ch.get_n_challenges(nc)

    # ---- 4. quotient on the size-N coset ----
    sel_count = len(common.selector_info.groups)
    sel_lde = pd.cs_lde[:sel_count]
    const_lde = pd.cs_lde[sel_count:sel_count + common.num_constants_polys]
    sigma_lde = pd.cs_lde[sel_count + common.num_constants_polys:]

    x_lde = jnp.asarray(host_powers(gl.primitive_root_of_unity(
        common.degree_bits + rate), N))
    x_lde = gl.mul(x_lde, gl.U64(COSET_SHIFT))           # domain points

    # Z_H(x) = x^n - 1 has period 2^rate on the coset
    shift_n = pow(COSET_SHIFT, n, gl.P)
    w8 = gl.primitive_root_of_unity(rate)
    zh_vals = [(shift_n * pow(w8, j, gl.P) - 1) % gl.P for j in range(1 << rate)]
    zh = jnp.tile(gl.to_u64(zh_vals), N >> rate)
    zh_inv = gl.inv(zh)
    l1_denom = gl.mul(gl.sub(x_lde, jnp.ones_like(x_lde)),
                      jnp.full_like(x_lde, gl.U64(n)))
    l1 = gl.mul(zh, gl.inv(l1_denom))

    terms = _vanishing_terms(
        common, wires_lde, sel_lde, const_lde, sigma_lde,
        zs_pp_lde, x_lde, l1, betas, gammas, pi_hash, rate, n)

    quotient_chunks = []
    sinv_pows = jnp.asarray(host_powers(gl.inv_s(COSET_SHIFT), N))
    for c in range(nc):
        vanishing = _reduce_with_powers_base(terms, alphas[c])
        tq = gl.mul(vanishing, zh_inv)                   # [N]
        q_coeffs = gl.mul(intt(tq), sinv_pows)           # unshift the coset
        quotient_chunks.append(q_coeffs.reshape(1 << rate, n))
    q_polys = jnp.concatenate(quotient_chunks, axis=0)   # [nc*2^rate, n]
    q_lde = coset_lde(q_polys, rate)
    q_tree = MerkleTree.build(q_lde.T, fri_cfg.cap_height)
    ch.observe_cap(q_tree.cap_host())
    zeta = ch.get_ext_challenge()

    # ---- 5. openings ----
    g = gl.primitive_root_of_unity(common.degree_bits)
    zeta_next = ext.scalar_mul_s(zeta, g)

    def open_at(coeffs, point):
        arr = np.asarray(eval_polys_at_ext(coeffs, point))
        return [(int(a), int(b)) for a, b in arr]

    cs_open = open_at(pd.cs_coeffs, zeta)
    wires_open = open_at(wires_coeffs, zeta)
    zs_pp_open = open_at(zs_pp_coeffs, zeta)
    zs_next_open = open_at(zs_pp_coeffs[:nc], zeta_next)
    q_open = open_at(q_polys, zeta)

    openings = OpeningSet(cs_open, wires_open, zs_pp_open, zs_next_open, q_open)
    for e in openings.observe_order():
        ch.observe_ext(e)
    fri_alpha = ch.get_ext_challenge()

    # ---- 6. FRI on the batched-opening composite ----
    batch0_lde = jnp.concatenate([pd.cs_lde, wires_lde, zs_pp_lde, q_lde], axis=0)
    batch0_open = cs_open + wires_open + zs_pp_open + q_open
    B0 = len(batch0_open)
    composite = _composite(batch0_lde, batch0_open, zs_pp_lde[:nc],
                           zs_next_open, fri_alpha, zeta, zeta_next, x_lde)
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


# ------------------------------------------------------------------
# vanishing terms (base-field batch over the LDE domain)
# ------------------------------------------------------------------

def _vanishing_terms(common, wires_lde, sel_lde, const_lde, sigma_lde,
                     zs_pp_lde, x_lde, l1, betas, gammas, pi_hash, rate, n):
    from ..gates.base import BatchAlg, EvalVars
    cfg = common.config
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    qf = cfg.max_quotient_degree_factor
    K = common.num_partial_products + 1
    N = x_lde.shape[0]
    one = jnp.ones_like(x_lde)
    terms = []

    k_arr = gl.to_u64(common.k_is)
    for c in range(nc):
        beta = gl.U64(betas[c])
        gamma = gl.U64(gammas[c])
        z = zs_pp_lde[c]
        z_next = jnp.roll(z, -(1 << rate))
        pps = [zs_pp_lde[nc + c * (K - 1) + m] for m in range(K - 1)]
        terms.append(gl.mul(l1, gl.sub(z, one)))
        accs = [z] + pps + [z_next]
        num = gl.add(gl.add(wires_lde[:nr], gl.mul(gl.mul(beta, k_arr[:, None]),
                                                   x_lde[None, :])), gamma)
        den = gl.add(gl.add(wires_lde[:nr], gl.mul(beta, sigma_lde)), gamma)
        pad = K * qf - nr
        if pad:
            ones = jnp.ones((pad, N), dtype=gl.DTYPE)
            num = jnp.concatenate([num, ones], axis=0)
            den = jnp.concatenate([den, ones], axis=0)
        cn = num.reshape(K, qf, N)
        cd = den.reshape(K, qf, N)
        for m in range(K):
            pn = cn[m, 0]
            pdn = cd[m, 0]
            for j in range(1, qf):
                pn = gl.mul(pn, cn[m, j])
                pdn = gl.mul(pdn, cd[m, j])
            terms.append(gl.sub(gl.mul(accs[m + 1], pdn), gl.mul(accs[m], pn)))

    # ---- gate constraints, filtered & slot-summed ----
    sel_info = common.selector_info
    many = len(sel_info.groups) > 1
    max_constraints = max((g.num_constraints for g in common.gates), default=0)
    slots = [jnp.zeros_like(x_lde) for _ in range(max_constraints)]
    alg = BatchAlg(x_lde.shape)
    pi_hash_arrs = [jnp.broadcast_to(gl.U64(h), x_lde.shape) for h in pi_hash]
    for gi, gate in enumerate(common.gates):
        grp_idx = sel_info.gate_group[gi]
        s = sel_lde[grp_idx]
        filt = one
        for other in sel_info.groups[grp_idx]:
            if other != gi:
                filt = gl.mul(filt, gl.sub(jnp.full_like(s, gl.U64(other)), s))
        if many:
            filt = gl.mul(filt, gl.sub(jnp.full_like(s, gl.U64(sel_info.unused)), s))
        if hasattr(gate, "eval_batch_fast"):
            cs = list(gate.eval_batch_fast(wires_lde, const_lde, pi_hash_arrs))
        else:
            vars_ = EvalVars([wires_lde[i] for i in range(gate.num_wires)],
                             [const_lde[i] for i in range(const_lde.shape[0])],
                             pi_hash_arrs)
            cs = gate.eval(vars_, alg)
        for t_idx, cval in enumerate(cs):
            slots[t_idx] = gl.add(slots[t_idx], gl.mul(filt, cval))
    terms.extend(slots)
    return terms


# ------------------------------------------------------------------
# FRI composite (device)
# ------------------------------------------------------------------

def _composite(batch0_lde, batch0_open, zs_lde, zs_next_open,
               fri_alpha, zeta, zeta_next, x_lde):
    B0 = batch0_lde.shape[0]
    x_ext = ext.from_base(x_lde)                               # [N, 2]

    def reduce_batch(polys_lde, openings):
        # Horner in alpha over the polys (memory-lean: never materializes the
        # [B, N, 2] product tensor), mirrored on the host opening values.
        B = polys_lde.shape[0]
        acc = ext.from_base(polys_lde[B - 1])
        alpha_arr = jnp.broadcast_to(_ext_arr(fri_alpha), acc.shape)
        for i in range(B - 2, -1, -1):
            acc = ext.add(ext.mul(acc, alpha_arr), ext.from_base(polys_lde[i]))
        o = ext.ZERO
        for v in reversed(openings):
            o = ext.add_s(ext.mul_s(o, fri_alpha), v)
        return acc, o

    r0, o0 = reduce_batch(batch0_lde, batch0_open)
    r1, o1 = reduce_batch(zs_lde, zs_next_open)

    inv0 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(_ext_arr(zeta), x_ext.shape)))
    inv1 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(_ext_arr(zeta_next), x_ext.shape)))
    f0 = ext.mul(ext.sub(r0, jnp.broadcast_to(_ext_arr(o0), x_ext.shape)), inv0)
    f1 = ext.mul(ext.sub(r1, jnp.broadcast_to(_ext_arr(o1), x_ext.shape)), inv1)
    alpha_b0 = ext.pow_s(fri_alpha, B0)
    f1 = ext.mul(f1, jnp.broadcast_to(_ext_arr(alpha_b0), x_ext.shape))
    return ext.add(f0, f1)
