"""Prover-side CircuitData serialization: build once, prove later — in a
different process, without re-tracing the circuit.

Parity: the reference round-trips its whole CircuitData including witness
generators (/root/reference/src/ecdsa/gadgets/ecdsa.rs:298-316, generator
whitelist :99-135).  Here the portable prover state is:

* the compiled arrays (selector / constant / sigma polynomials),
* the gate instance list (gate registry keys + per-row constants) — gate
  witness generators rebuild from it,
* the copy-constraint classes (target -> representative mapping),
* every gadget hint as a `NamedGenerator` (witness/hints.py) — name +
  JSON params + dep/out targets.

The constants/sigmas LDE + Merkle tree are *recomputed* on load (device
work, jit-cached) rather than shipped: at rate 8 they are 8x the payload
and derive deterministically from the committed polynomials.
"""

from __future__ import annotations

import json

import numpy as np

from ..ir.builder import Wire
from ..prove.compile import (CommonData, ProverData, SelectorInfo,
                             VerifierData, CircuitData)
from ..witness import LambdaGenerator, NamedGenerator
from .buffer import Buffer
from .serde import _read_config, _write_config, gate_from_key


def _write_target(buf: Buffer, t) -> None:
    if isinstance(t, Wire):
        buf.write_u8(1)
        buf.write_u32(t.row)
        buf.write_u32(t.column)
    else:
        buf.write_u8(0)
        buf.write_u64(int(t))


def _read_target(buf: Buffer):
    if buf.read_u8():
        row = buf.read_u32()
        return Wire(row, buf.read_u32())
    return buf.read_u64()


def _write_arr(buf: Buffer, arr) -> None:
    a = np.asarray(arr, dtype=np.uint64)
    buf.write_u32(a.shape[0])
    buf.write_u32(a.shape[1])
    buf._data.extend(a.tobytes())


def _read_arr(buf: Buffer) -> np.ndarray:
    r = buf.read_u32()
    c = buf.read_u32()
    raw = buf._take(r * c * 8)
    return np.frombuffer(raw, dtype=np.uint64).reshape(r, c).copy()


def serialize_prover_data(pd: ProverData) -> bytes:
    common = pd.common
    buf = Buffer()
    _write_config(buf, common.config)
    buf.write_u32(common.degree_bits)
    buf.write_list([g.key() for g in common.gates],
                   lambda k: buf.write_str(k))
    buf.write_list(common.selector_info.groups,
                   lambda grp: buf.write_list(grp, buf.write_u32))
    buf.write_u32(common.num_constants_polys)
    buf.write_u32(common.num_public_inputs)
    buf.write_u32(pd.pi_gate_row)
    buf.write_list(pd.pi_targets, lambda t: _write_target(buf, t))
    buf.write_list(pd.row_gate, buf.write_u32)
    # per-row gate constants (sparse: most rows have none)
    buf.write_list(pd.instance_list,
                   lambda inst: buf.write_list(
                       [int(c) for c in inst[1]], buf.write_u64))
    _write_arr(buf, pd.selector_polys)
    _write_arr(buf, pd.constant_polys)
    _write_arr(buf, pd.sigma_polys)
    # copy classes — canonical order (sets/dicts iterate arbitrarily)
    def _tkey(t):
        return (1, t.row, t.column) if isinstance(t, Wire) else (0, int(t), 0)

    items = sorted(pd.classes.items(), key=lambda kv: _tkey(kv[0]))
    buf.write_u32(len(items))
    for rep, members in items:
        _write_target(buf, rep)
        buf.write_u32(len(members))
        for m in sorted(members, key=_tkey):
            _write_target(buf, m)
    # gadget hints (must all be NamedGenerators; gate generators and the
    # PI-hash lambda rebuild on load from the instance list)
    named = pd.custom_generators
    bad = [g for g in named if not isinstance(g, NamedGenerator)]
    assert not bad, (
        "non-serializable hint generators present; register them in "
        f"witness/hints.py: {bad[:3]}")
    buf.write_u32(len(named))
    for g in named:
        buf.write_str(g.name)
        buf.write_str(json.dumps(g.params))
        buf.write_list(g.deps, lambda t: _write_target(buf, t))
        buf.write_list(g.outs, lambda t: _write_target(buf, t))
    return buf.bytes()


def deserialize_prover_data(data: bytes) -> CircuitData:
    import jax.numpy as jnp

    from ..field import gl
    from ..merkle import MerkleTree
    from ..ntt import lde_from_values_jit

    buf = Buffer(data)
    config = _read_config(buf)
    degree_bits = buf.read_u32()
    gates = [gate_from_key(buf.read_str())
             for _ in range(buf.read_u32())]
    groups = buf.read_list(lambda: buf.read_list(buf.read_u32))
    gate_group = {gi: g for g, grp in enumerate(groups) for gi in grp}
    sel = SelectorInfo(groups=groups, unused=len(gates),
                       gate_group=gate_group)
    num_constants_polys = buf.read_u32()
    num_public_inputs = buf.read_u32()
    pi_gate_row = buf.read_u32()
    pi_targets = buf.read_list(lambda: _read_target(buf))
    row_gate = buf.read_list(buf.read_u32)
    consts_per_row = buf.read_list(lambda: buf.read_list(buf.read_u64))
    sel_vals = _read_arr(buf)
    const_vals = _read_arr(buf)
    sigma_vals = _read_arr(buf)
    n_classes = buf.read_u32()
    classes = {}
    rep_map = {}
    for _ in range(n_classes):
        rep = _read_target(buf)
        members = set()
        for _ in range(buf.read_u32()):
            m = _read_target(buf)
            members.add(m)
            rep_map[m] = rep
        classes[rep] = members

    n_named = buf.read_u32()
    custom = []
    for _ in range(n_named):
        name = buf.read_str()
        params = json.loads(buf.read_str())
        deps = buf.read_list(lambda: _read_target(buf))
        outs = buf.read_list(lambda: _read_target(buf))
        custom.append(NamedGenerator(name, params, deps, outs))

    # ---- reconstruct derived state ----
    nr = config.num_routed_wires
    k_is = [pow(gl.GENERATOR, i, gl.P) for i in range(nr)]
    instances = [(gates[gi], tuple(consts))
                 for gi, consts in zip(row_gate, consts_per_row)]
    generators = list(custom)
    for r, (g, consts) in enumerate(instances):
        generators.extend(g.generators(r, consts))

    _pi_hasher = config.hasher_module()

    def _pi_fn(vals, row=pi_gate_row, hasher=_pi_hasher):
        h = hasher.hash_no_pad_s([v % gl.P for v in vals])
        return [(Wire(row, i), h[i]) for i in range(4)]

    generators.append(LambdaGenerator(
        pi_targets, _pi_fn, outs=[Wire(pi_gate_row, i) for i in range(4)]))

    cs_vals = jnp.concatenate([jnp.asarray(sel_vals),
                               jnp.asarray(const_vals),
                               jnp.asarray(sigma_vals)], axis=0)
    from ..ntt import lde_from_values_rev_auto
    cs_coeffs, cs_lde = lde_from_values_rev_auto(cs_vals, config.fri.rate_bits)
    cs_tree = MerkleTree.build_cols(cs_lde, config.fri.cap_height)

    common = CommonData(
        config=config,
        degree_bits=degree_bits,
        gates=gates,
        selector_info=sel,
        num_constants_polys=num_constants_polys,
        k_is=k_is,
        num_public_inputs=num_public_inputs,
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
        sigma_polys=jnp.asarray(sigma_vals),
        cs_coeffs=cs_coeffs,
        cs_lde=cs_lde,
        cs_tree=cs_tree,
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
        custom_generators=custom,
    )
    verifier = VerifierData(common=common, cs_cap=cs_tree.cap_host())
    return CircuitData(prover=prover, verifier=verifier)
