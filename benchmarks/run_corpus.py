"""Per-file corpus benchmark replicating the reference's README table
(reference test/benchmarks.jl:10-102, README.md:28-47): compress and
uncompress throughput per corpus file, device path vs native baseline,
plus compressed-size ratios.

    python benchmarks/run_corpus.py [--device] [--files N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FILES = [
    ("txt", "alice29.txt"),
    ("html", "html"),
    ("jpeg", "fireworks.jpeg"),
    ("pdf", "paper-100k.pdf"),
    ("urls", "urls.10K"),
    ("json", "sample-tweet.json"),
]


def human(bps: float) -> str:
    return f"{bps / 1e9:.2f} GB/s" if bps >= 1e9 else f"{bps / 1e6:.0f} MB/s"


def median_time(fn, iters: int = 9) -> float:
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true", help="also time the XLA device path")
    ap.add_argument("--iters", type=int, default=9)
    args = ap.parse_args()

    from snappy_tpu.native import runtime as nat

    rows = []
    for label, name in FILES:
        raw = open(os.path.join(REPO, "testdata", name), "rb").read()
        comp = nat.compress(raw)
        nat.uncompress(comp)  # warm
        t_c = median_time(lambda: nat.compress(raw), args.iters)
        t_u = median_time(lambda: nat.uncompress(comp), args.iters)
        row = {
            "file": label,
            "size": len(raw),
            "ratio": len(comp) / len(raw),
            "native_compress": len(raw) / t_c,
            "native_uncompress": len(raw) / t_u,
        }
        if args.device:
            from snappy_tpu.ops import host as xh

            dcomp = xh.compress(raw)
            xh.uncompress(dcomp)  # warm/compile
            row["xla_ratio"] = len(dcomp) / len(raw)
            row["xla_compress"] = len(raw) / median_time(lambda: xh.compress(raw), args.iters)
            row["xla_uncompress"] = len(raw) / median_time(lambda: xh.uncompress(dcomp), args.iters)
        rows.append(row)

    hdr = f"| {'file':6s} | {'size':>7s} | {'ratio':>6s} | {'native comp':>11s} | {'native unc':>11s} |"
    if args.device:
        hdr += f" {'xla ratio':>9s} | {'xla comp':>11s} | {'xla unc':>11s} |"
    print(hdr)
    for r in rows:
        line = (
            f"| {r['file']:6s} | {r['size']:7d} | {r['ratio']:6.3f} "
            f"| {human(r['native_compress']):>11s} | {human(r['native_uncompress']):>11s} |"
        )
        if args.device:
            line += f" {r['xla_ratio']:9.3f} | {human(r['xla_compress']):>11s} | {human(r['xla_uncompress']):>11s} |"
        print(line)


if __name__ == "__main__":
    main()
