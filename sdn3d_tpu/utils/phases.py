"""Per-phase wall-clock + transfer-byte accounting for the fused chain.

The 92-pair benchmark runs against a TPU behind a network relay whose
measured costs are ~50 ms per device->host fetch round-trip, ~45 MB/s
d2h and ~70-100 MB/s h2d — so end-to-end time is governed as much by
*how many bytes cross the link and in how many round trips* as by kernel
time.  This registry gives the chain an always-available breakdown
(VERDICT round-2 item 1): each phase records wall seconds, call count,
and the device<->host bytes it moved.

Off by default and zero-cost when off.  When enabled, device-phase
callers route results through `block()` so the phase's wall time
includes the device work it launched (this serializes phases that could
otherwise overlap — the breakdown is for attribution, the headline
numbers come from non-instrumented runs).

Usage:
    from sdn3d_tpu.utils import phases
    with phases.phase("geo.render"):
        out = phases.block(fn(x))          # block iff profiling
    phases.add_bytes("geo.fetch", arr)     # count a host fetch
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, List

enabled = False
_LOCK = threading.Lock()
# name -> [seconds, calls, bytes, first_call_seconds]
_TIMES: Dict[str, List[float]] = {}


def reset(on: bool = True) -> None:
    global enabled
    with _LOCK:
        _TIMES.clear()
        enabled = on


@contextlib.contextmanager
def phase(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            rec = _TIMES.setdefault(name, [0.0, 0, 0, 0.0])
            if rec[1] == 0:
                rec[3] = dt          # first call carries the jit compile
            rec[0] += dt
            rec[1] += 1


def block(tree):
    """block_until_ready iff profiling is on (so instrumented phases
    charge their own device work instead of the next fetch)."""
    if not enabled:
        return tree
    import jax
    return jax.block_until_ready(tree)


def _nbytes(x) -> int:
    try:
        return int(x.size) * int(x.dtype.itemsize)
    except AttributeError:
        return 0


def add_bytes(name: str, *arrays) -> None:
    """Attribute transfer volume (either direction) to a phase."""
    if not enabled:
        return
    n = sum(_nbytes(a) for a in arrays)
    with _LOCK:
        rec = _TIMES.setdefault(name, [0.0, 0, 0, 0.0])
        rec[2] += n


def snapshot() -> Dict[str, Dict[str, float]]:
    """first_s isolates the compile-carrying first call; steady_avg_s is
    the per-call mean over the remaining calls (the serving rate)."""
    with _LOCK:
        out = {}
        for k, v in sorted(_TIMES.items()):
            rec = {"s": round(v[0], 3), "calls": v[1],
                   "MB": round(v[2] / 1e6, 2)}
            if v[1] > 1:
                rec["first_s"] = round(v[3], 3)
                rec["steady_avg_s"] = round((v[0] - v[3]) / (v[1] - 1), 4)
            out[k] = rec
        return out
