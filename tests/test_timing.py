"""TimingTree phase profiler (the reference's profiling_enable analogue)."""

import logging

from plonky2_tpu.utils import TimingTree, profiling_enable, timed_span
from plonky2_tpu.utils.timing import profiling_disable


def test_disabled_is_noop():
    profiling_disable()
    with timed_span("quiet"):
        pass


def test_nested_spans_capture(caplog):
    profiling_enable()
    try:
        with TimingTree("root") as t:
            with t.span("phase-a"):
                with t.span("inner"):
                    pass
            with t.span("phase-b"):
                pass
        lines = []
        t.print(emit=lines.append)
        assert any("root" in l for l in lines)
        assert any("phase-a" in l for l in lines)
        assert any("inner" in l for l in lines)
        # nesting depth shows as indentation
        inner = next(l for l in lines if "inner" in l)
        phase_a = next(l for l in lines if "phase-a" in l)
        assert inner.index("ms") > phase_a.index("ms") or \
            len(inner) - len(inner.lstrip()) > len(phase_a) - len(phase_a.lstrip())
    finally:
        profiling_disable()


def test_prover_phases_logged():
    from plonky2_tpu.ir import CircuitBuilder, CircuitConfig
    from plonky2_tpu.utils import timing as timing_mod

    records = []

    class _Collect(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = _Collect(level=logging.DEBUG)
    timing_mod.logger.addHandler(handler)
    profiling_enable()
    try:
        b = CircuitBuilder(CircuitConfig.test_config())
        x = b.add_virtual_target()
        b.register_public_input(b.mul(x, x))
        data = b.build()
        proof = data.prove({x: 3})
        data.verify(proof)
        text = "\n".join(records)
        for phase in ("witness generation", "wire LDE", "quotient",
                      "openings", "FRI", "prove (2^"):
            assert phase in text, f"missing phase span: {phase}"
    finally:
        timing_mod.logger.removeHandler(handler)
        profiling_disable()
