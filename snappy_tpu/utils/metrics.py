"""Structured per-run metrics (SURVEY.md §5: observability the reference lacks).

Collects throughput/ratio/scaling numbers and emits them as JSON for the
bench driver and for humans.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class Metrics:
    run: dict = field(default_factory=dict)
    results: list = field(default_factory=list)

    def add(self, **kv) -> None:
        self.results.append(kv)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"run": self.run, "results": self.results, "ts": time.time()}, f, indent=2)


def _sync(out) -> None:
    """Force REAL device completion.

    `block_until_ready` does not reliably fence device work on remote
    (tunnelled) platforms — measured: a 25ms/call computation timed at
    0.05ms with block_until_ready. Pulling one scalar of the result to the
    host is the only dependable fence.
    """
    import numpy as np

    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    arr = np.asarray(leaf)
    _ = arr.ravel()[0] if arr.size else None


def time_device_fn(fn, args, iters: int = 10, warmup: int = 3) -> float:
    """Per-call device seconds, excluding dispatch/transfer overhead.

    Strategy: dispatch `iters` back-to-back calls (they pipeline on the
    device), fence once with a host read of the last result, and subtract
    the single-call + fence baseline. This isolates device compute from
    the ~24ms round-trip latency of a tunnelled host->device link, which
    would otherwise dominate for sub-100ms computations.
    """

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)

    # Baseline: one call + one fence.
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    base = time.perf_counter() - t0

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        total = time.perf_counter() - t0
        per = (total - base) / max(iters - 1, 1)
        best = per if best is None else min(best, per)
    return max(best, 1e-9)
