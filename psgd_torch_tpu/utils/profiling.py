"""Profiling / observability helpers (absent in the reference, which only
uses ad-hoc time.time() in demos — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import re
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_DTYPE_BYTES = {"bf16": 2, "pred": 1}
_DTYPE_BITS_PAT = re.compile(r"[fsuc](\d+)")


def _dtype_bytes(dt: str) -> float:
    """Bytes per element for an HLO dtype token.  Width-suffixed tokens
    (f32, s4, u8, c128, f8e4m3fn, ...) are parsed from their leading bit
    count, so fp8 variants and sub-byte int4 are sized correctly."""
    if dt in _DTYPE_BYTES:
        return _DTYPE_BYTES[dt]
    m = _DTYPE_BITS_PAT.match(dt)
    return int(m.group(1)) / 8 if m else 4


def collective_bytes(compiled, per_op: bool = False):
    """Sum the output bytes of every collective op in a compiled program's
    HLO — the per-device communication volume of one execution.

    Parses the optimized HLO text for all-reduce / all-gather / all-to-all /
    reduce-scatter / collective-permute ops and sums their result sizes.
    Returns total bytes (int), or a dict {op_kind: bytes} with
    ``per_op=True``.  This is the evidence artifact behind the scaling
    claims (BASELINE.md >= 85% 1-chip -> 2-hosts target)."""
    import re
    text = compiled.as_text()
    out: dict = {}
    # result can be a plain shape `f32[a,b]{...} = all-reduce(...)` or a
    # tuple `(f32[..], f32[..]) = all-to-all(...)`
    pat = re.compile(
        r"=\s*(\([^)]*\)|\w+\[[\d,]*\][^=\n]*?)\s*"
        r"(all-reduce|all-gather|all-to-all|reduce-scatter|"
        r"collective-permute)(-start)?\(")
    shape_pat = re.compile(r"(\w+?)\[([\d,]*)\]")
    for m in pat.finditer(text):
        shapes, kind = m.group(1), m.group(2)
        total = 0
        for sm in shape_pat.finditer(shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += int(n * _dtype_bytes(dt))
        out[kind] = out.get(kind, 0) + total
    if per_op:
        return out
    return sum(out.values())


class StepTimer:
    """Wall-clock step timer with warmup discard and simple stats.

    On async runtimes call ``mark`` with a value you've forced to host
    (e.g. float(loss)) so the clock covers real execution.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t = None
        self._n = 0

    def start(self):
        self._t = time.perf_counter()

    def mark(self):
        if self._t is None:
            self.start()
            return
        dt = time.perf_counter() - self._t
        self._t = time.perf_counter()
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else float("nan")
