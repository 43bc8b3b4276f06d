"""TimingTree-style phase profiling.

Parity: the reference's `profiling_enable()` flips env_logger to Trace so
plonky2's internal `TimingTree` prints phase-by-phase prove timings
(/root/reference/src/lib.rs:16-21; SURVEY.md §5).  Here the tree is a
process-global stack of nested spans; the prover opens one span per phase
(witness, wire commit, Z polys, quotient, openings, FRI).

TPU notes: a span closes with `jax.block_until_ready` on an optional
sentinel array so device work is attributed to the phase that issued it
(XLA dispatch is async); `profiling_enable(jax_trace=dir)` additionally
starts a `jax.profiler` trace for kernel-level analysis in TensorBoard /
xprof.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("plonky2_tpu")

_ENABLED = False
_STACK: list["_Span"] = []


class _Span:
    __slots__ = ("name", "start", "elapsed", "children", "bytes")

    def __init__(self, name: str, nbytes: int | None = None):
        self.name = name
        self.start = time.perf_counter()
        self.elapsed = 0.0
        self.children: list[_Span] = []
        self.bytes = nbytes

    def _bw(self):
        if self.bytes and self.elapsed:
            return f" [{self.bytes / 1e9:.2f} GB, "                    f"{self.bytes / self.elapsed / 1e9:.0f} GB/s]"
        return ""

    def lines(self, depth=0, total=None):
        total = total if total is not None else self.elapsed
        pct = 100.0 * self.elapsed / total if total else 0.0
        out = [f"{'  ' * depth}{self.elapsed * 1e3:9.2f}ms {pct:5.1f}% "
               f"{self.name}{self._bw()}"]
        for c in self.children:
            out.extend(c.lines(depth + 1, total))
        return out


def profiling_enable(level=logging.DEBUG, jax_trace: str | None = None):
    """Turn on phase-timing output (the reference's `profiling_enable`,
    lib.rs:16-21).  `jax_trace` starts a jax.profiler trace to that dir."""
    global _ENABLED
    _ENABLED = True
    # Dedicated handler on our logger only — configuring the root logger
    # would also unleash jax's internal DEBUG spam.
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[timing] %(message)s"))
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(level)
    if jax_trace:
        import jax
        jax.profiler.start_trace(jax_trace)


def profiling_disable():
    global _ENABLED
    _ENABLED = False


@contextlib.contextmanager
def timed_span(name: str, block_on=None, nbytes: int | None = None):
    """Nested phase span.  `block_on`: device array (or pytree) to
    block_until_ready before closing, so async device work lands in this
    span.  `nbytes`: estimated HBM bytes moved by the phase — the span
    prints achieved GB/s next to its wall time (per-phase roofline
    visibility, round-4 verdict item 4)."""
    if not _ENABLED:
        yield
        return
    span = _Span(name, nbytes)
    parent = _STACK[-1] if _STACK else None
    _STACK.append(span)
    try:
        yield
    finally:
        if block_on is not None:
            import jax
            jax.block_until_ready(block_on)
        span.elapsed = time.perf_counter() - span.start
        _STACK.pop()
        if parent is not None:
            parent.children.append(span)
            # stream as each phase lands (long proves would otherwise be
            # silent until the root closes)
            logger.debug("%s.. %s: %.2fs%s", "  " * (len(_STACK) - 1),
                         span.name, span.elapsed, span._bw())
        else:
            for line in span.lines():
                logger.debug(line)


class TimingTree:
    """Explicit-handle variant for callers that want the tree object
    (`with TimingTree("prove") as t: ... ; t.print()`)."""

    def __init__(self, name: str):
        self.root = _Span(name)

    def __enter__(self):
        _STACK.append(self.root)
        return self

    def __exit__(self, *exc):
        self.root.elapsed = time.perf_counter() - self.root.start
        _STACK.pop()
        return False

    @contextlib.contextmanager
    def span(self, name: str):
        with timed_span(name):
            yield

    def print(self, emit=print):
        for line in self.root.lines():
            emit(line)
