"""Circuit compilation: builder graph -> array-form proving/verifying keys.

The TPU analogue of plonky2's `builder.build::<C>()` (SURVEY.md §3.1): place
the public-input gate, pad to a power of two with noops, group gates into
selector polynomials, pack per-gate constants into constant polynomials,
resolve the copy-constraint union-find into sigma index arrays, LDE +
Merkle-commit the constants/sigmas oracle, and freeze the witness-generator
schedule.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..gates import NoopGate, PublicInputGate
from ..hashes import poseidon
from ..merkle import MerkleTree
from ..ntt import coset_lde, host_powers, intt
from ..witness import LambdaGenerator


@dataclass
class SelectorInfo:
    groups: list          # list[list[int]] — gate indices per selector poly
    unused: int           # selector value on foreign rows
    gate_group: dict      # gate index -> group index


@dataclass
class CommonData:
    config: object
    degree_bits: int
    gates: list           # unique gate objects, index = selector value
    selector_info: SelectorInfo
    num_constants_polys: int
    k_is: list            # coset shifts per routed wire (host ints)
    num_public_inputs: int
    num_partial_products: int   # per challenge
    chunk_size: int


@dataclass
class ProverData:
    common: CommonData
    # device arrays
    selector_polys: jnp.ndarray      # [num_groups, n]
    constant_polys: jnp.ndarray      # [num_constants_polys, n]
    sigma_polys: jnp.ndarray         # [num_routed, n]
    cs_coeffs: jnp.ndarray           # constants_sigmas coefficients
    cs_lde: jnp.ndarray              # [C, 8n]
    cs_tree: MerkleTree
    # host structures
    rep_of: object                   # target -> canonical representative
    generators: list
    gate_rows: dict                  # gate index -> list of row numbers
    row_gate: list                   # row -> gate index
    instance_list: list              # [(gate, constants)] padded
    pi_targets: list                 # registered public-input targets
    class_wires: dict = None         # rep -> list[Wire] (copy classes)
    classes: dict = None             # rep -> set of all members (serde)
    pi_gate_row: int = -1            # row of the PublicInputGate
    custom_generators: list = None   # gadget hints only (serde)


@dataclass
class VerifierData:
    common: CommonData
    cs_cap: list                     # host cap


@dataclass
class CircuitData:
    prover: ProverData
    verifier: VerifierData

    @property
    def common(self):
        return self.prover.common

    def prove(self, inputs: dict, mesh=None):
        """Prove; with `mesh` (jax.sharding.Mesh, axis "d") every device
        phase runs SPMD-sharded over it (see prover._MeshPlacer)."""
        from .prover import prove
        return prove(self.prover, inputs, mesh)

    def verify(self, proof):
        from .verifier import verify
        return verify(self.verifier, proof)


def _selector_groups(gates, max_degree_factor: int) -> SelectorInfo:
    """Greedy grouping: filtered degree = gate_deg + group_size (+unused
    factor counted via the +1 below) must stay <= max_degree_factor + 1."""
    order = sorted(range(len(gates)), key=lambda i: -gates[i].degree)
    groups: list[list[int]] = []
    for gi in order:
        placed = False
        for grp in groups:
            max_deg = max(gates[i].degree for i in grp + [gi])
            # filter degree = len(grp) (others) + 1 (unused selector factor)
            if max_deg + len(grp) + 1 <= max_degree_factor + 1:
                grp.append(gi)
                placed = True
                break
        if not placed:
            # singleton group: filtered degree = gate_deg + 1 (unused factor)
            assert gates[gi].degree + 1 <= max_degree_factor + 1, (
                f"gate {gates[gi].key()} has degree {gates[gi].degree} > "
                f"max_quotient_degree_factor {max_degree_factor}; honest "
                f"proofs would fail verification")
            groups.append([gi])
    gate_group = {gi: g for g, grp in enumerate(groups) for gi in grp}
    return SelectorInfo(groups=groups, unused=len(gates), gate_group=gate_group)


def compile_circuit(builder) -> CircuitData:
    from ..hashes.pallas_poseidon import ensure_probed
    from ..utils import timed_span
    ensure_probed()          # host context: settle pallas dispatch now
    with timed_span(f"build ({len(builder.gate_instances)} gate rows)"):
        return _compile_impl(builder)


def _compile_impl(builder) -> CircuitData:
    from ..utils import timed_span
    config = builder.config
    fri_cfg = config.fri

    # ---- public-input gate + padding ----
    pi_gate_row = builder.add_gate(PublicInputGate(), [])
    n_rows = len(builder.gate_instances)
    degree_bits = max(2, (n_rows - 1).bit_length())
    n = 1 << degree_bits
    while len(builder.gate_instances) < n:
        builder.add_gate(NoopGate(), [])
    instances = builder.gate_instances

    # ---- unique gates + selectors ----
    key_to_idx: dict = {}
    gates: list = []
    row_gate = []
    for g, _ in instances:
        k = g.key()
        if k not in key_to_idx:
            key_to_idx[k] = len(gates)
            gates.append(g)
        row_gate.append(key_to_idx[k])
    sel = _selector_groups(gates, config.max_quotient_degree_factor)

    sel_vals = np.full((len(sel.groups), n), sel.unused, dtype=np.uint64)
    for r, gi in enumerate(row_gate):
        sel_vals[sel.gate_group[gi], r] = gi

    # ---- constant polynomials ----
    num_const_polys = max([config.num_constants] +
                          [g.num_constants for g in gates])
    const_vals = np.zeros((num_const_polys, n), dtype=np.uint64)
    for r, (g, consts) in enumerate(instances):
        for i, c in enumerate(consts):
            const_vals[i, r] = c

    # ---- sigma polynomials from the copy-constraint forest ----
    from ..ir.builder import Wire
    _sigma_span = timed_span("sigma construction (copy classes)"); _sigma_span.__enter__()

    nr = config.num_routed_wires
    k_is = [pow(gl.GENERATOR, i, gl.P) for i in range(nr)]
    # copy-equivalence classes, keyed by representative
    universe = set(builder._parent.keys()) | set(builder._parent.values())
    classes: dict = {}
    rep_map: dict = {}        # frozen union-find: item -> canonical rep
    for item in universe:
        rep = builder._find(item)
        classes.setdefault(rep, set()).update((item, rep))
        rep_map[item] = rep

    # successor permutation as flat indices into the label table [nr, n]
    perm = np.arange(nr * n, dtype=np.int64).reshape(nr, n)
    for members in classes.values():
        ms = sorted(m for m in members if isinstance(m, Wire))
        if len(ms) < 2:
            continue
        for i, m in enumerate(ms):
            nxt = ms[(i + 1) % len(ms)]
            perm[m.column, m.row] = nxt.column * n + nxt.row

    g_pows = host_powers(gl.primitive_root_of_unity(degree_bits), n)
    labels = gl.mul(gl.to_u64(k_is)[:, None],
                    jnp.asarray(g_pows)[None, :])            # [nr, n]
    sigma_vals = jnp.take(labels.reshape(-1), jnp.asarray(perm.reshape(-1)),
                          axis=0).reshape(nr, n)

    _sigma_span.__exit__(None, None, None)
    # ---- commit constants_sigmas oracle: [selectors | constants | sigmas] ----
    cs_vals = jnp.concatenate([jnp.asarray(sel_vals),
                               jnp.asarray(const_vals),
                               sigma_vals], axis=0)
    from ..ntt import lde_from_values_rev_auto
    with timed_span("constants/sigmas LDE + Merkle commit"):
        cs_coeffs, cs_lde = lde_from_values_rev_auto(cs_vals, fri_cfg.rate_bits)
        cs_tree = MerkleTree.build_cols(cs_lde, fri_cfg.cap_height,
                                        config.transcript_module())
        cs_tree.cap_host()

    # ---- witness generators ----
    _gen_span = timed_span("generator schedule"); _gen_span.__enter__()
    generators = list(builder.custom_generators)
    for r, (g, consts) in enumerate(instances):
        generators.extend(g.generators(r, consts))
    _gen_span.__exit__(None, None, None)
    # public-input hash generator: fills the PI gate wires
    from ..ir.builder import Wire
    pi_targets = list(builder.public_inputs)

    _pi_hasher = config.hasher_module()

    def _pi_fn(vals, row=pi_gate_row, hasher=_pi_hasher):
        h = hasher.hash_no_pad_s([v % gl.P for v in vals])
        return [(Wire(row, i), h[i]) for i in range(4)]

    generators.append(LambdaGenerator(
        pi_targets, _pi_fn, outs=[Wire(pi_gate_row, i) for i in range(4)]))

    common = CommonData(
        config=config,
        degree_bits=degree_bits,
        gates=gates,
        selector_info=sel,
        num_constants_polys=num_const_polys,
        k_is=k_is,
        num_public_inputs=len(pi_targets),
        num_partial_products=(nr + config.max_quotient_degree_factor - 1)
        // config.max_quotient_degree_factor - 1,
        chunk_size=config.max_quotient_degree_factor,
    )
    gate_rows: dict = {}
    for r, gi in enumerate(row_gate):
        gate_rows.setdefault(gi, []).append(r)

    prover = ProverData(
        common=common,
        selector_polys=jnp.asarray(sel_vals),
        constant_polys=jnp.asarray(const_vals),
        sigma_polys=sigma_vals,
        cs_coeffs=cs_coeffs,
        cs_lde=cs_lde,
        cs_tree=cs_tree,
        # frozen flat map (one dict.get per lookup) — the witness scheduler
        # calls this millions of times per prove; the live union-find's
        # path-compression walk was ~35% of ECDSA witness generation
        rep_of=lambda t, _m=rep_map: _m.get(t, t),
        generators=generators,
        gate_rows=gate_rows,
        row_gate=row_gate,
        instance_list=instances,
        pi_targets=pi_targets,
        class_wires={rep: [m for m in members if isinstance(m, Wire)]
                     for rep, members in classes.items()},
        classes=classes,
        pi_gate_row=pi_gate_row,
        custom_generators=list(builder.custom_generators),
    )
    verifier = VerifierData(common=common, cs_cap=cs_tree.cap_host())
    return CircuitData(prover=prover, verifier=verifier)
