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
from ..ntt import COSET_SHIFT, eval_polys_at_ext, host_powers, intt
from ..ntt.ntt import _bitrev_perm, coset_lde_rev, intt_from_rev
from ..transcript import Challenger
from ..witness import generate_witness
from .proof import OpeningSet, Proof


@functools.partial(jax.jit, static_argnames=("rate_bits",))
def _lde_commit(values, rate_bits: int):
    """(coeffs natural, LDE bit-reversed) — the mesh-path commit transform
    (poly-sharded: both transforms are along the unsharded last axis)."""
    coeffs = intt(values)
    return coeffs, coset_lde_rev(coeffs, rate_bits)


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
    from ..gates.lookup import lookup_info
    lki = lookup_info(common)
    n_zb = nc + nc * (K - 1)                 # lookup block base in zs oracle
    pcc = lki.get("polys_per_challenge", 0)
    r1_idx = list(range(nc))                 # polys opened at zeta*g
    if lki["has"]:
        r1_idx += [n_zb + c * pcc + lki["k"] for c in range(nc)]

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
    def lookup_phase(routed, lk_masks, tb_masks, lams, lgams):
        """logUp helper polys over H (gates/lookup.py): per challenge,
        per-slot A_s = mu_s/(lgam - (x + lam*y)) (one batched inverse) and
        the exclusive running sum S (one associative scan).
        routed [nr, n]; masks [k, n] hold the per-row filter constants."""
        outs = []
        for c in range(nc):
            lam, lgam = lams[c], lgams[c]
            As = []
            for s in range(lki["k"]):
                x = routed[3 * s]
                y = routed[3 * s + 1]
                m = routed[3 * s + 2]
                combo = gl.add(x, gl.mul(lam, y))
                denom = gl.sub(lgam, combo)
                mu = gl.sub(gl.mul(tb_masks[s], m), lk_masks[s])
                As.append(gl.mul(mu, gl.inv(denom)))
            tot = As[0]
            for a_ in As[1:]:
                tot = gl.add(tot, a_)
            incl = jax.lax.associative_scan(gl.add, tot)
            zero1 = jnp.zeros((1,), dtype=gl.DTYPE)
            S = jnp.concatenate([zero1, incl[:-1]])
            outs.extend(As + [S])
        return jnp.stack(outs, axis=0)

    @functools.partial(jax.jit, static_argnames=("m",))
    def quotient_chunk(wires_lde, sel_lde, const_lde, sigma_lde, zs_lde,
                       zs_next, x_lde, zh_inv, l1, k_arr, betas, gammas,
                       alphas, lams, lgams, pi_hash_arr, s0, m: int):
        # One domain chunk [*, m] starting at s0 -> [nc, m] quotient values.
        # Slicing happens INSIDE the kernel (lax.dynamic_slice on a traced
        # start): eager out-of-jit slices are separate dispatches that copy
        # gigabytes per chunk on a tunneled backend.
        def cut(a):
            return jax.lax.dynamic_slice_in_dim(a, s0, m, axis=a.ndim - 1)

        wires_c, sel_c, const_c, sigma_c = map(cut, (wires_lde, sel_lde,
                                                     const_lde, sigma_lde))
        zs_c, zs_next_c = cut(zs_lde), cut(zs_next)
        x_c, zh_inv_c, l1_c = cut(x_lde), cut(zh_inv), cut(l1)
        #
        # Terms are alpha-folded on the fly instead of materialized: the
        # slot-sum identity  sum_t a^t sum_g filt_g c_{g,t}
        #                  = sum_g filt_g sum_t a^t c_{g,t}
        # lets each gate's constraints stay fused intermediates (no
        # max_constraints x [N] slot arrays), cutting the quotient phase's
        # HBM traffic to O(wires + num_gate_types) passes.  The term order
        # (all challenges' vanishing terms, then gate constraint slots)
        # matches the verifier's fold exactly (verifier.py:70-117).
        #
        # Chunking bounds live-tensor footprint at any circuit size and
        # keeps the compiled kernel size independent of the domain (the
        # same executable runs N/M times).
        from ..gates.base import BatchAlg, EvalVars
        one = jnp.ones_like(x_c)
        vterms = []
        for c in range(nc):
            beta, gamma = betas[c], gammas[c]
            z = zs_c[c]
            z_next = zs_next_c[c]
            pps = [zs_c[nc + c * (K - 1) + m] for m in range(K - 1)]
            vterms.append(gl.mul(l1_c, gl.sub(z, one)))
            accs = [z] + pps + [z_next]
            num = gl.add(gl.add(wires_c[:nr],
                                gl.mul(gl.mul(beta, k_arr[:, None]),
                                       x_c[None, :])), gamma)
            den = gl.add(gl.add(wires_c[:nr], gl.mul(beta, sigma_c)), gamma)
            pn, pdn = _chunk_products(num, den)
            for m in range(K):
                vterms.append(gl.sub(gl.mul(accs[m + 1], pdn[m]),
                                     gl.mul(accs[m], pn[m])))
            if lki["has"]:
                # logUp terms (gates/lookup.py): boundary L1*S, per-slot
                # A*(lgam-combo) - mu, and the S running-sum transition
                kk_ = lki["k"]
                S = zs_c[n_zb + c * pcc + kk_]
                S_next = zs_next_c[n_zb + c * pcc + kk_]
                lam, lgam = lams[c], lgams[c]
                vterms.append(gl.mul(l1_c, S))

                def filt_of(gi):
                    si = common.selector_info
                    sv = sel_c[si.gate_group[gi]]
                    f = one
                    for other in si.groups[si.gate_group[gi]]:
                        if other != gi:
                            f = gl.mul(f, gl.sub(
                                jnp.full_like(sv, gl.U64(other)), sv))
                    if len(si.groups) > 1:
                        f = gl.mul(f, gl.sub(
                            jnp.full_like(sv, gl.U64(si.unused)), sv))
                    return f

                # normalized filters: filt_gi(x) * kappa^-1 == the 0/1
                # masks of lookup_phase on H (see lookup_info docstring)
                lk_filts = {gi: gl.mul(filt_of(gi), gl.U64(kinv))
                            for gi, _, kinv in lki["lk"]}
                tb_filts = {gi: gl.mul(filt_of(gi), gl.U64(kinv))
                            for gi, _, kinv in lki["tb"]}
                sumA = None
                for s in range(kk_):
                    A = zs_c[n_zb + c * pcc + s]
                    x_w = wires_c[3 * s]
                    y_w = wires_c[3 * s + 1]
                    m_w = wires_c[3 * s + 2]
                    combo = gl.add(x_w, gl.mul(lam, y_w))
                    mu = jnp.zeros_like(x_w)
                    for gi, ns, _ in lki["tb"]:
                        if s < ns:
                            mu = gl.add(mu, gl.mul(tb_filts[gi], m_w))
                    for gi, ns, _ in lki["lk"]:
                        if s < ns:
                            mu = gl.sub(mu, lk_filts[gi])
                    vterms.append(gl.sub(gl.mul(A, gl.sub(lgam, combo)), mu))
                    sumA = A if sumA is None else gl.add(sumA, A)
                vterms.append(gl.sub(gl.sub(S_next, S), sumA))

        T0 = len(vterms)
        maxc = max((g.num_constraints for g in common.gates), default=0)
        apows = [_power_ladder_base(alphas[c], T0 + maxc) for c in range(nc)]

        chal_accs = []
        for c in range(nc):
            acc = jnp.zeros_like(x_c)
            for t, term in enumerate(vterms):
                acc = gl.add(acc, gl.mul(term, apows[c][t]))
            chal_accs.append(acc)

        sel_info = common.selector_info
        many = len(sel_info.groups) > 1
        shape = x_c.shape
        alg = BatchAlg(shape)
        pi_arrs = [jnp.broadcast_to(pi_hash_arr[i], shape) for i in range(4)]
        for gi, gate in enumerate(common.gates):
            grp_idx = sel_info.gate_group[gi]
            s = sel_c[grp_idx]
            filt = one
            for other in sel_info.groups[grp_idx]:
                if other != gi:
                    filt = gl.mul(filt, gl.sub(jnp.full(shape, gl.U64(other)), s))
            if many:
                filt = gl.mul(filt, gl.sub(jnp.full(shape, gl.U64(sel_info.unused)), s))
            if hasattr(gate, "eval_batch_fast"):
                cs = list(gate.eval_batch_fast(wires_c, const_c, pi_arrs))
            else:
                vars_ = EvalVars([wires_c[i] for i in range(gate.num_wires)],
                                 [const_c[i] for i in range(const_c.shape[0])],
                                 pi_arrs)
                cs = gate.eval(vars_, alg)
            for c in range(nc):
                gacc = None
                for t_idx, cval in enumerate(cs):
                    w = gl.mul(cval, apows[c][T0 + t_idx])
                    gacc = w if gacc is None else gl.add(gacc, w)
                if gacc is not None:
                    chal_accs[c] = gl.add(chal_accs[c], gl.mul(filt, gacc))

        return jnp.stack([gl.mul(a, zh_inv_c) for a in chal_accs], axis=0)

    # zs(g*x) in bit-reversed order: natural order is a roll by 2^rate;
    # conjugating by the bit-reversal permutation gives a fixed gather.
    rev_N = _bitrev_perm(common.degree_bits + rate)
    nxt = np.empty(N, dtype=np.int64)
    nxt[rev_N] = rev_N[(np.arange(N) + (1 << rate)) % N]
    nxt_dev = jnp.asarray(nxt)

    @jax.jit
    def zs_next_roll(zs_pp_lde):
        return jnp.take(zs_pp_lde, nxt_dev, axis=-1)

    @jax.jit
    def quotient_finish(tq, sinv_pows):
        # tq [nc, N] bit-reversed -> (q_polys [nc<<rate, n] natural coeffs,
        # q_lde [nc<<rate, N] bit-reversed)
        q_coeffs = gl.mul(intt_from_rev(tq), sinv_pows)
        q_polys = q_coeffs.reshape(nc << rate, n)
        return q_polys, coset_lde_rev(q_polys, rate)

    # Chunk the 8n domain so per-call live tensors stay ~flat (≈2^18 rows)
    # while small circuits still run in one call.  Mesh-sharded proves run
    # a single chunk: SPMD already divides the live footprint by the device
    # count, and slicing a domain-sharded axis would serialize the shards.
    M = min(N, 1 << 18)

    def quotient_phase(wires_lde, sel_lde, const_lde, sigma_lde, zs_pp_lde,
                       x_lde, zh_inv, l1, k_arr, betas, gammas, alphas,
                       lams, lgams, pi_hash_arr, sinv_pows,
                       single_chunk=False, replicate=None):
        zs_next = zs_next_roll(zs_pp_lde)
        step = N if single_chunk else M
        outs = []
        for s0 in range(0, N, step):
            outs.append(quotient_chunk(
                wires_lde, sel_lde, const_lde, sigma_lde, zs_pp_lde,
                zs_next, x_lde, zh_inv, l1, k_arr, betas, gammas,
                alphas, lams, lgams, pi_hash_arr, jnp.int32(s0), step))
        tq = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if replicate is not None:
            # nc (=2) polys can't poly-shard: replicate the small [nc, N]
            # array so the iNTT runs local instead of per-stage collective
            tq = replicate(tq)
        return quotient_finish(tq, sinv_pows)

    @functools.partial(jax.jit, static_argnames=("m",))
    def composite_chunk(cs_full, wires_full, zs_full, q_full, fri_alpha_a,
                        zeta_a, zeta_next_a, o0_a, o1_a, alpha_b0_a, x_full,
                        s0=None, m: int = 0):
        if s0 is not None:
            def cut(a):
                return jax.lax.dynamic_slice_in_dim(a, s0, m, axis=a.ndim - 1)
            cs_lde, wires_lde, zs_pp_lde, q_lde, x_lde = map(
                cut, (cs_full, wires_full, zs_full, q_full, x_full))
        else:
            cs_lde, wires_lde, zs_pp_lde, q_lde, x_lde = (
                cs_full, wires_full, zs_full, q_full, x_full)
        # all *_a are traced (2,) u64 extension values.  The four oracles
        # stay separate (concatenating them would allocate an extra
        # full-batch copy — an OOM at 2^18+) and fold with per-oracle
        # alpha offsets: sum_i a^i f_i over the concatenated order equals
        # R(cs) + a^|cs| R(wires) + a^|cs|+|w| R(zs) + ... .
        x_ext = ext.from_base(x_lde)

        def reduce_alpha(polys, offset_pow):
            # Sum_i alpha^(i) f_i(x): log-doubling alpha-power ladder, then
            # the two extension components are weighted stacked muls + tree
            # sums; offset_pow (ext scalar) shifts the whole ladder.
            ap = _power_ladder_ext(fri_alpha_a, polys.shape[0])   # [B, 2]
            ap = ext.mul(ap, jnp.broadcast_to(offset_pow, ap.shape))
            r0c = gl.sum_mod(gl.mul(polys, ap[:, 0:1]), axis=0)
            r1c = gl.sum_mod(gl.mul(polys, ap[:, 1:2]), axis=0)
            return jnp.stack([r0c, r1c], axis=-1)      # [N, 2]

        one_e = jnp.asarray(gl.to_u64([1, 0]))
        r0 = None
        off = one_e
        for polys in (cs_lde, wires_lde, zs_pp_lde, q_lde):
            part = reduce_alpha(polys, off)
            r0 = part if r0 is None else ext.add(r0, part)
            off = ext.mul(off[None, :], _power_ladder_ext(
                fri_alpha_a, polys.shape[0] + 1)[polys.shape[0]][None, :])[0]
        r1 = reduce_alpha(jnp.take(zs_pp_lde, jnp.asarray(r1_idx), axis=0),
                          one_e)
        inv0 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_a, x_ext.shape)))
        inv1 = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_next_a, x_ext.shape)))
        f0 = ext.mul(ext.sub(r0, jnp.broadcast_to(o0_a, x_ext.shape)), inv0)
        f1 = ext.mul(ext.sub(r1, jnp.broadcast_to(o1_a, x_ext.shape)), inv1)
        f1 = ext.mul(f1, jnp.broadcast_to(alpha_b0_a, x_ext.shape))
        return ext.add(f0, f1)

    def composite(cs_lde, wires_lde, zs_pp_lde, q_lde, fri_alpha_a, zeta_a,
                  zeta_next_a, o0_a, o1_a, alpha_b0_a, x_lde,
                  single_chunk=False):
        # Domain-chunked like the quotient: the alpha-fold over a
        # 300+-poly oracle would otherwise materialize multi-GB
        # intermediates on top of the live LDEs.
        step = N if single_chunk else M
        outs = []
        for s0 in range(0, N, step):
            outs.append(composite_chunk(
                cs_lde, wires_lde, zs_pp_lde, q_lde, fri_alpha_a, zeta_a,
                zeta_next_a, o0_a, o1_a, alpha_b0_a, x_lde,
                jnp.int32(s0), step))
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    return {"z_phase": z_phase, "quotient_phase": quotient_phase,
            "composite": composite, "lookup_phase": lookup_phase,
            "lki": lki, "r1_idx": r1_idx}


def _lookup_masks(pd, lki):
    """Per-slot [k, n] 0/1 row masks (gates/lookup.py lookup_info):
    lk_masks[s][r] = 1 on rows of lookup gate gi with num_slots > s;
    tb_masks likewise.  Unit masks match the quotient's NORMALIZED
    filters filt_gi(x)*kappa^-1 on H.  Cached on pd."""
    cached = getattr(pd, "_lookup_masks", None)
    if cached is not None:
        return cached
    n = len(pd.row_gate)
    k = lki["k"]
    row_gate = np.asarray(pd.row_gate, dtype=np.int64)
    lk = np.zeros((k, n), dtype=np.uint64)
    tb = np.zeros((k, n), dtype=np.uint64)
    for gi, ns, _kinv in lki["lk"]:
        rows = row_gate == gi
        for s in range(ns):
            lk[s][rows] = 1
    for gi, ns, _kinv in lki["tb"]:
        rows = row_gate == gi
        for s in range(ns):
            tb[s][rows] = 1
    pd._lookup_masks = (lk, tb)
    return pd._lookup_masks


# ------------------------------------------------------------------
# main
# ------------------------------------------------------------------

class _MeshPlacer:
    """Sharding placements for mesh-parallel proving (SURVEY.md §7.7).

    Two layouts, one all-to-all between them (XLA inserts it from the
    shardings): *poly-sharded* [num_polys/d, n] for iNTT/LDE (transforms
    are along the unsharded last axis, so fully local), *domain-sharded*
    [..., N/d] for Merkle leaf hashing, Z/quotient evaluation and FRI
    (elementwise across domain points, so fully local).  All math is exact
    integer arithmetic — the proof is bit-identical for any device count.
    """

    def __init__(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec
        self.mesh = mesh
        self.d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.poly = NamedSharding(mesh, PartitionSpec("d"))
        self.repl = NamedSharding(mesh, PartitionSpec())

    def polys(self, arr):
        """Shard axis 0 (polynomials), zero-padding to the device count.
        Callers slice the pad off with `unpad` after the transform."""
        arr = jnp.asarray(arr)
        pad = (-arr.shape[0]) % self.d
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)
        return jax.device_put(arr, self.poly)

    def unpad(self, arr, p: int):
        return arr if arr.shape[0] == p else arr[:p]

    def rows(self, arr):
        """Shard the last axis (domain points / leaf columns)."""
        from jax.sharding import NamedSharding, PartitionSpec
        spec = PartitionSpec(*([None] * (arr.ndim - 1) + ["d"]))
        return jax.device_put(jnp.asarray(arr),
                              NamedSharding(self.mesh, spec))

    def replicate(self, arr):
        return jax.device_put(jnp.asarray(arr), self.repl)


class _NullPlacer:
    def polys(self, arr):
        return jnp.asarray(arr)

    def unpad(self, arr, p: int):
        return arr

    def rows(self, arr):
        return jnp.asarray(arr)

    def replicate(self, arr):
        return jnp.asarray(arr)


def prove(pd, inputs: dict, mesh=None) -> Proof:
    from ..hashes.pallas_poseidon import ensure_probed
    from ..utils import timed_span
    ensure_probed()          # host context: settle pallas dispatch now
    with timed_span(f"prove (2^{pd.common.degree_bits} rows)"):
        return _prove_impl(pd, inputs, mesh)


def _prove_impl(pd, inputs: dict, mesh=None) -> Proof:
    common = pd.common
    cfg = common.config
    fri_cfg = cfg.fri
    n = 1 << common.degree_bits
    rate = fri_cfg.rate_bits
    N = n << rate
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    kernels = get_kernels(pd)
    pl = _MeshPlacer(mesh) if mesh is not None else _NullPlacer()
    th = cfg.transcript_module()

    # ---- 1. witness ----
    from ..utils import timed_span
    from ..witness.tape import TapeUnsupported, generate_witness_tape
    with timed_span("witness generation"):
        store = None
        try:
            store = generate_witness_tape(pd, inputs)   # native engine
        except TapeUnsupported:
            store = None
        if store is None:
            store = generate_witness(pd, inputs)        # dynamic fallback
    from ..ir.builder import Wire
    with timed_span("witness scatter to wire matrix"):
        if hasattr(store, "scatter"):
            wires_host = store.scatter(cfg.num_wires, n)
        else:
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
    _wb = 8 * cfg.num_wires * (2 * n + N)        # read values, write c+LDE
    _mb = 8 * cfg.num_wires * N                  # Merkle leaf read
    with timed_span("wire LDE + Merkle commit", nbytes=_wb + _mb):
        # poly-sharded transform, then one all-to-all into the
        # domain-sharded layout every later phase uses
        with timed_span("wire LDE (iNTT + coset NTT)", nbytes=_wb):
            if mesh is None:
                from ..ntt import lde_from_values_rev_auto
                wires_coeffs, wires_lde = lde_from_values_rev_auto(
                    jnp.asarray(wires_host), rate)
            else:
                wires_coeffs, wires_lde = _lde_commit(pl.polys(wires_host),
                                                      rate)
            wires_coeffs = pl.unpad(wires_coeffs, cfg.num_wires)
            wires_lde = pl.rows(pl.unpad(wires_lde, cfg.num_wires))
            # no block_until_ready here: forcing a sync serializes the LDE
            # against the Merkle dispatch and costs ~100ms of tunnel
            # latency per prove; sub-span attribution is approximate.
        with timed_span("wire Merkle tree (leaf hash + levels)", nbytes=_mb):
            wires_tree = MerkleTree.build_cols(wires_lde, fri_cfg.cap_height,
                                               th)
            wires_tree.cap_host()

    ch = Challenger(th)
    ch.observe_cap(pd.cs_tree.cap_host())
    ch.observe_elements(pi_hash)
    ch.observe_cap(wires_tree.cap_host())
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    lki = kernels["lki"]
    if lki["has"]:
        lams = ch.get_n_challenges(nc)
        lgams = ch.get_n_challenges(nc)
    else:
        lams, lgams = [0] * nc, [0] * nc

    # ---- 3. Z polys + partial products over H ----
    g_pows = jnp.asarray(host_powers(
        gl.primitive_root_of_unity(common.degree_bits), n))
    k_arr = gl.to_u64(common.k_is)
    _zn = nc + nc * (common.num_partial_products)
    with timed_span("permutation Z polys + commit",
                    nbytes=8 * (3 * nr * n + _zn * (2 * n + 2 * N))):
        routed_rows = pl.rows(wires_host[:nr])
        zs_pp_vals = kernels["z_phase"](
            routed_rows, pl.rows(pd.sigma_polys), k_arr,
            pl.rows(g_pows), gl.to_u64(betas), gl.to_u64(gammas))
        if lki["has"]:
            lk_masks, tb_masks = _lookup_masks(pd, lki)
            lk_vals = kernels["lookup_phase"](
                routed_rows, pl.rows(lk_masks), pl.rows(tb_masks),
                gl.to_u64(lams), gl.to_u64(lgams))
            zs_pp_vals = jnp.concatenate([zs_pp_vals, lk_vals], axis=0)
        n_zspp = zs_pp_vals.shape[0]
        if mesh is None:
            from ..ntt import lde_from_values_rev_auto
            zs_pp_coeffs, zs_pp_lde = lde_from_values_rev_auto(zs_pp_vals, rate)
        else:
            zs_pp_coeffs, zs_pp_lde = _lde_commit(pl.polys(zs_pp_vals), rate)
        zs_pp_coeffs = pl.unpad(zs_pp_coeffs, n_zspp)
        zs_pp_lde = pl.rows(pl.unpad(zs_pp_lde, n_zspp))
        zs_tree = MerkleTree.build_cols(zs_pp_lde, fri_cfg.cap_height, th)
        zs_tree.cap_host()
    ch.observe_cap(zs_tree.cap_host())
    alphas = ch.get_n_challenges(nc)

    # ---- 4. quotient ----
    sel_count = len(common.selector_info.groups)
    cs_lde = pl.rows(pd.cs_lde)
    sel_lde = cs_lde[:sel_count]
    const_lde = cs_lde[sel_count:sel_count + common.num_constants_polys]
    sigma_lde = cs_lde[sel_count + common.num_constants_polys:]

    # Every domain table is in bit-reversed order (index r <-> point
    # shift * w^rev(r)) to match the LDE storage layout (fri/fri.py).
    rev_N_perm = _bitrev_perm(common.degree_bits + rate)
    x_lde = pl.rows(gl.mul(jnp.asarray(host_powers(
        gl.primitive_root_of_unity(common.degree_bits + rate), N)[rev_N_perm]),
        gl.U64(COSET_SHIFT)))
    shift_n = pow(COSET_SHIFT, n, gl.P)
    w8 = gl.primitive_root_of_unity(rate)
    zh_vals = [(shift_n * pow(w8, j, gl.P) - 1) % gl.P for j in range(1 << rate)]
    zh_nat = np.tile(np.asarray(zh_vals, dtype=np.uint64), N >> rate)
    zh = jnp.asarray(zh_nat[rev_N_perm])
    zh_inv = pl.rows(gl.inv(zh))
    l1 = gl.mul(jnp.asarray(zh), gl.inv(gl.mul(gl.sub(x_lde, jnp.ones_like(x_lde)),
                                               jnp.full_like(x_lde, gl.U64(n)))))
    sinv_pows = jnp.asarray(host_powers(gl.inv_s(COSET_SHIFT), N))

    _qr = (cs_lde.shape[0] + cfg.num_wires + zs_pp_lde.shape[0]) * N
    with timed_span("quotient evaluation + commit",
                    nbytes=8 * (_qr + (nc << rate) * (3 * N))):
        q_polys, q_lde = kernels["quotient_phase"](
            wires_lde, sel_lde, const_lde, sigma_lde, zs_pp_lde, x_lde, zh_inv,
            l1, k_arr, gl.to_u64(betas), gl.to_u64(gammas), gl.to_u64(alphas),
            gl.to_u64(lams), gl.to_u64(lgams),
            gl.to_u64(pi_hash), sinv_pows, single_chunk=mesh is not None,
            replicate=pl.replicate if mesh is not None else None)
        q_lde = pl.rows(q_lde)
        q_tree = MerkleTree.build_cols(q_lde, fri_cfg.cap_height, th)
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
        zs_next_open = open_at(
            jnp.take(zs_pp_coeffs, jnp.asarray(kernels["r1_idx"]), axis=0),
            zeta_next)
        q_open = open_at(q_polys, zeta)

    openings = OpeningSet(cs_open, wires_open, zs_pp_open, zs_next_open, q_open)
    for e in openings.observe_order():
        ch.observe_ext(e)
    fri_alpha = ch.get_ext_challenge()

    # ---- 6. FRI ----
    batch0_open = cs_open + wires_open + zs_pp_open + q_open
    B0 = len(batch0_open)
    o0 = ext.ZERO
    for v in reversed(batch0_open):
        o0 = ext.add_s(ext.mul_s(o0, fri_alpha), v)
    o1 = ext.ZERO
    for v in reversed(zs_next_open):
        o1 = ext.add_s(ext.mul_s(o1, fri_alpha), v)
    alpha_b0 = ext.pow_s(fri_alpha, B0)
    with timed_span("FRI (composite + commit phases + queries)",
                    nbytes=8 * (_qr + (nc << rate) * N + 2 * 2 * N)):
        composite = kernels["composite"](
            cs_lde, wires_lde, zs_pp_lde, q_lde, _ext_arr(fri_alpha),
            _ext_arr(zeta), _ext_arr(zeta_next), _ext_arr(o0), _ext_arr(o1),
            _ext_arr(alpha_b0), x_lde, single_chunk=mesh is not None)
        fri = fri_prove(composite, common.degree_bits, fri_cfg, ch, COSET_SHIFT,
                        [pd.cs_tree, wires_tree, zs_tree, q_tree], th)

    return Proof(
        wires_cap=wires_tree.cap_host(),
        zs_pp_cap=zs_tree.cap_host(),
        quotient_cap=q_tree.cap_host(),
        openings=openings,
        fri=fri,
        public_inputs=pi_values,
    )
