"""Named witness hints: the serializable form of gadget hint generators.

The reference serializes its witness generators through a whitelist
(`CustomGeneratorSerializer`, /root/reference/src/ecdsa/gadgets/
ecdsa.rs:99-135; per-generator serialize/deserialize such as
nonnative.rs:492-531).  Here every gadget hint is a `NamedGenerator`:
a registry name + a JSON-able params dict + dep/out target lists.  The
hint function maps (params, dep values) -> output values aligned with
`outs`, so the whole generator round-trips as plain data
(serialization/prover_serde.py).
"""

from __future__ import annotations

from ..field import ext, gl
from .witness import Generator

HINTS: dict = {}


def hint_fn(name: str):
    def reg(fn):
        assert name not in HINTS, f"duplicate hint {name}"
        HINTS[name] = fn
        return fn
    return reg


class NamedGenerator(Generator):
    """Serializable hint: run() zips `outs` with the registry fn's values."""

    __slots__ = ("name", "params", "deps", "outs")

    def __init__(self, name: str, params: dict, deps: list, outs: list):
        assert name in HINTS, f"unknown hint {name}"
        self.name = name
        self.params = params
        self.deps = deps
        self.outs = outs

    def run(self, get):
        vals = [get(d) for d in self.deps]
        return list(zip(self.outs, HINTS[self.name](self.params, vals)))


def _int_of(limbs: list) -> int:
    v = 0
    for i, l in enumerate(limbs):
        v |= int(l) << (32 * i)
    return v


def _limbs_of(v: int, n: int) -> list:
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


@hint_fn("inv_or_zero")
def _inv_or_zero(p, vals):
    d = vals[0]
    return [gl.inv_s(d) if d else 0]


@hint_fn("ext_inv")
def _ext_inv(p, vals):
    v = ext.inv_s((vals[0], vals[1]))
    return [v[0], v[1]]


@hint_fn("biguint_div_rem")
def _biguint_div_rem(p, vals):
    av = _int_of(vals[:p["na"]])
    bv = _int_of(vals[p["na"]:p["na"] + p["nb"]])
    d, r = divmod(av, bv) if bv else (0, 0)
    return _limbs_of(d, p["na"]) + _limbs_of(r, p["nb"])


@hint_fn("nn_add")
def _nn_add(p, vals):
    m = p["p"]
    s = _int_of(vals[:p["nl"]]) + _int_of(vals[p["nl"]:])
    o = 1 if s >= m else 0
    return _limbs_of(s - o * m, p["n_out"]) + [o]


@hint_fn("nn_add_many")
def _nn_add_many(p, vals):
    m = p["p"]
    total, off = 0, 0
    for n in p["nl"]:
        total += _int_of(vals[off:off + n])
        off += n
    o, s = divmod(total, m)
    return _limbs_of(s, p["n_out"]) + [o]


@hint_fn("nn_sub")
def _nn_sub(p, vals):
    m = p["p"]
    d = _int_of(vals[:p["nl"]]) - _int_of(vals[p["nl"]:])
    o = 1 if d < 0 else 0
    return _limbs_of(d + o * m, p["n_out"]) + [o]


@hint_fn("nn_mul")
def _nn_mul(p, vals):
    m = p["p"]
    o, s = divmod(_int_of(vals[:p["nl"]]) * _int_of(vals[p["nl"]:]), m)
    return _limbs_of(s, p["n_out"]) + _limbs_of(o, p["n_ovf"])


@hint_fn("nn_inv")
def _nn_inv(p, vals):
    m = p["p"]
    xv = _int_of(vals)
    iv = pow(xv, m - 2, m) if xv % m else 0
    d = (xv * iv - 1) // m if xv % m else 0
    return _limbs_of(iv, p["n_inv"]) + _limbs_of(d, p["n_div"])


@hint_fn("nn_div")
def _nn_div(p, vals):
    m = p["p"]
    av = _int_of(vals[:p["nl"]]) % m
    bv = _int_of(vals[p["nl"]:]) % m
    q = av * pow(bv, m - 2, m) % m if bv else 0
    return _limbs_of(q, p["n_out"])


@hint_fn("glv_decompose")
def _glv_decompose(p, vals):
    from ..field import secp
    kv = _int_of(vals) % secp.N
    m1, n1, m2, n2 = secp.glv_decompose(kv)
    return (_limbs_of(m1, p["n1"]) + _limbs_of(m2, p["n2"])
            + [int(n1), int(n2)])


@hint_fn("lookup_out")
def _lookup_out(p, vals):
    table = {int(a): int(b) for a, b in p["table"]}
    x = vals[0]
    if x not in table:
        raise ValueError(f"lookup input {x} not in table")
    return [table[x]]


@hint_fn("lookup_mults")
def _lookup_mults(p, vals):
    """vals = every looked-up input; outs = per-table-slot multiplicities.
    Duplicate slots (padding repeats entries) put the full count on the
    first slot holding a value."""
    from collections import Counter
    counts = Counter(vals)
    out = []
    seen = set()
    for t in p["table_in"]:
        t = int(t)
        if t in seen:
            out.append(0)
        else:
            seen.add(t)
            out.append(counts.get(t, 0))
    return out
