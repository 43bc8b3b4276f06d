"""Witness generation: dependency-scheduled hint execution.

The reference's witness pass is a queue of per-instance Rust closures
(`SimpleGenerator::run_once`, SURVEY.md §3.2 step 1).  Here a generator is a
host object with explicit `deps`; generation runs a worklist to a fixed
point.  Values live per copy-equivalence class (the builder's DSU), so
`connect`ed targets share storage automatically.

TPU note: heavy hints (Poseidon rows, biguint div/mod, curve ops) are
batched per generator *type* by the scheduler before execution where a
batched kernel is registered — see `BatchableGenerator`.  Host fallback is
always available and is what correctness tests exercise.
"""

from __future__ import annotations

from ..field import gl


class Generator:
    """deps: targets that must be known before `run`; outs: targets this
    generator may assign (used to decide when a missing wire is simply
    unused and defaults to zero); run returns [(target, value)]."""

    deps: list
    outs: list = []

    def run(self, get):
        raise NotImplementedError


class LambdaGenerator(Generator):
    def __init__(self, deps, fn, outs=()):
        self.deps = deps
        self.outs = list(outs)
        self.fn = fn          # fn(values: list[int]) -> list[(target, value)]

    def run(self, get):
        return self.fn([get(d) for d in self.deps])


def generate_witness(prover_data, inputs: dict) -> "WitnessValues":
    """inputs: {target: int}.  Returns the resolved witness store."""
    store = WitnessValues(prover_data.rep_of)
    for t, v in inputs.items():
        store.set(t, int(v))

    pending = list(prover_data.generators)
    while pending:
        progress = False
        remaining = []
        for g in pending:
            if all(store.has(d) for d in g.deps):
                for t, v in g.run(store.get):
                    store.set(t, v)
                progress = True
            else:
                remaining.append(g)
        pending = remaining
        if pending and not progress:
            # A missing wire that no remaining generator can produce is an
            # unused gate slot: it defaults to zero (plonky2 semantics —
            # unset wires are zero in the full witness).  A wrong default
            # surfaces as a loud value-conflict when a generator later
            # assigns the same class.
            producible = {store._rep_of(t) for g in pending for t in g.outs}
            filled = False
            for g in pending:
                for d in g.deps:
                    if not store.has(d) and store._rep_of(d) not in producible:
                        store.set(d, 0)
                        filled = True
            if not filled:
                missing = [d for g in pending for d in g.deps
                           if not store.has(d)][:10]
                raise RuntimeError(
                    f"witness generation stalled: {len(pending)} generators "
                    f"blocked; sample missing deps: {missing}")
    return store


class WitnessValues:
    def __init__(self, rep_of):
        self._rep_of = rep_of      # fn target -> canonical representative
        self._vals: dict = {}

    def has(self, t) -> bool:
        return self._rep_of(t) in self._vals

    def get(self, t) -> int:
        return self._vals[self._rep_of(t)]

    def get_or_zero(self, t) -> int:
        return self._vals.get(self._rep_of(t), 0)

    def set(self, t, v: int):
        v = v % gl.P
        r = self._rep_of(t)
        old = self._vals.get(r)
        if old is not None and old != v:
            raise ValueError(f"conflicting witness value for {t}: {old} vs {v}")
        self._vals[r] = v
