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


_COLLECTIVE_PAT = re.compile(
    r"=\s*(\([^)]*\)|\w+\[[\d,]*\][^=\n]*?)\s*"
    r"(all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute)"
    r"(?:-start)?\(([^\n]*)")
_SHAPE_PAT = re.compile(r"(\w+?)\[([\d,]*)\]")
_IOTA_GROUPS_PAT = re.compile(
    r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?")
_EXPLICIT_GROUPS_PAT = re.compile(r"replica_groups=\{(\{[^=]*?\})\}")
_PAIRS_PAT = re.compile(
    r"source_target_pairs=\{((?:\{\d+,\d+\},?)*)\}")


def _shapes_bytes(shapes: str) -> int:
    total = 0
    for sm in _SHAPE_PAT.finditer(shapes):
        dt, dims = sm.group(1), sm.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += int(n * _dtype_bytes(dt))
    return total


def _parse_groups(attrs: str):
    """Replica groups of one HLO collective as a list of id lists, handling
    both the explicit ``{{0,1},{2,3}}`` and the iota
    ``[G,S]<=[dims]T(perm)`` encodings; None if no groups attribute."""
    m = _IOTA_GROUPS_PAT.search(attrs)
    if m:
        import numpy as np
        g, s = int(m.group(1)), int(m.group(2))
        dims = [int(d) for d in m.group(3).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(4):
            ids = ids.transpose([int(p) for p in m.group(4).split(",")])
        return ids.reshape(g, s).tolist()
    m = _EXPLICIT_GROUPS_PAT.search(attrs)
    if m:
        return [[int(x) for x in grp.split(",") if x.strip()]
                for grp in re.findall(r"\{([\d,\s]*)\}", m.group(1))]
    return None


def collective_boundary_bytes(compiled, group_of, per_op: bool = False):
    """Split one execution's collective traffic into intra- vs
    cross-boundary bytes, given ``group_of``: a sequence mapping each
    logical device position (the order of the mesh's flattened devices) to
    a boundary label — e.g. ``process_index`` per device, so "cross" means
    the collective rides DCN rather than ICI.

    Returns ``{"intra": bytes, "cross": bytes}``, or with ``per_op=True``
    ``{op_kind: {"intra": b, "cross": b}}``.  A collective counts as cross
    if ANY of its replica groups (or any collective-permute source→target
    pair) spans two boundary labels.  This is the testable proxy for the
    BASELINE.md multi-host scaling target: Q-fit collectives must ride only
    the ICI axes (assert cross == 0 on the optimizer-update program)."""
    group_of = list(group_of)
    text = compiled.as_text()
    out: dict = {}
    for m in _COLLECTIVE_PAT.finditer(text):
        shapes, kind, attrs = m.group(1), m.group(2), m.group(3)
        nbytes = _shapes_bytes(shapes)
        crosses = False
        groups = _parse_groups(attrs)
        pm = _PAIRS_PAT.search(attrs)
        if groups is not None:
            for grp in groups:
                labels = {group_of[i] for i in grp if i < len(group_of)}
                if len(labels) > 1:
                    crosses = True
                    break
        elif pm:
            for s, t in re.findall(r"\{(\d+),(\d+)\}", pm.group(1)):
                if group_of[int(s)] != group_of[int(t)]:
                    crosses = True
                    break
        else:  # no groups attribute: spans all devices
            crosses = len(set(group_of)) > 1
        slot = out.setdefault(kind, {"intra": 0, "cross": 0})
        slot["cross" if crosses else "intra"] += nbytes
    if per_op:
        return out
    return {"intra": sum(v["intra"] for v in out.values()),
            "cross": sum(v["cross"] for v in out.values())}


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
