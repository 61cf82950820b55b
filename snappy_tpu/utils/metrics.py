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


def time_device_fn(fn, args, iters: int = 10, warmup: int = 3) -> float:
    """Median wall seconds of a device computation (block_until_ready)."""
    import jax

    def run_once():
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
