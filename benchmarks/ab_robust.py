"""Robust within-run decode A/B: round-robin interleaved, median-of-rounds.

The chip's regime can drift WITHIN a run (r4 itself measured 31 ms and
41 ms in one process, round 5), so back-to-back per-variant timing cannot
resolve ~10% differences. This harness interleaves all variants
round-robin for ROUNDS rounds and compares the per-variant MEDIAN of
per-round minima — drift hits every variant equally within a round.

Usage: python benchmarks/ab_robust.py [--foreign-only]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import bench
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import pallas_decode, pallas_decode_r4

ROUNDS = 6


def own_streams(raw):
    from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
    from snappy_tpu.ops import pallas_encode

    inp = np.frombuffer(raw, np.uint8)
    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT)
    buf0 = np.zeros((bench.BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(bench.BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    out, olens = enc(jax.device_put(buf0), jax.device_put(np.full(bench.BATCH, BLOCK_SIZE, np.int32)))
    out = np.asarray(out)
    olens = np.asarray(olens)
    return [out[i, : olens[i]].tobytes() for i in range(bench.BATCH)]


def foreign_streams(raw):
    from snappy_tpu.native import runtime as nat

    stream = nat.compress(raw)
    ulen, hdr = nat.uncompressed_length(stream)
    body = stream[hdr:]
    starts, _ = nat.scan_blocks(body, ulen)
    bounds = list(starts) + [len(body)]
    return [body[bounds[i] : bounds[i + 1]] for i in range(len(starts))]


def run_set(label, streams, raw, builders):
    cmax, comp_np, clens_np = bench.pack_streams(streams, pallas_decode.COMP_PAD)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(clens_np)
    dulens = jax.device_put(np.full(len(streams), BLOCK_SIZE, np.int32))
    fns = {}
    for name, mk in builders.items():
        fn = mk(cmax)
        o, k, _ = fn(dcomp, dclens, dulens)
        if "_m" not in name:  # debug modes skip drains: output incomplete
            assert bool(np.asarray(k).all()), f"{label}/{name} flagged corrupt"
            assert np.asarray(o).tobytes() == raw, f"{label}/{name} mismatch"
        fns[name] = fn
    times = {n: [] for n in fns}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            st = bench.time_dispatch_stats(fn, (dcomp, dclens, dulens), iters=3)
            times[name].append(st["min"] * 1e3)
    summary = {}
    for name, ts in times.items():
        ts_sorted = sorted(ts)
        med = ts_sorted[len(ts_sorted) // 2]
        summary[name] = {
            "ms_median_of_rounds": round(med, 2),
            "ms_min": round(ts_sorted[0], 2),
            "gbps_at_median": round(len(streams) * BLOCK_SIZE / (med / 1e3) / 1e9, 4),
            "rounds_ms": [round(t, 1) for t in ts],
        }
    print(json.dumps({"set": label, "results": summary}, indent=2), flush=True)
    return summary


def main() -> None:
    assert jax.devices()[0].platform == "tpu"
    raw = bench.corpus_stream(bench.BATCH * BLOCK_SIZE)
    builders = {
        "r4": lambda cmax: pallas_decode_r4.decode_blocks_jit(cmax, BLOCK_SIZE),
        "r5_fold": lambda cmax: jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False)),
        "r5_nofold": lambda cmax: jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, fold=False)),
    }
    if "--decompose" in sys.argv:
        import functools
        def mkmode(mode):
            return lambda cmax: jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, debug_mode=mode))
        builders["r5_m2_walk"] = mkmode(2)
        builders["r5_m3_wlit"] = mkmode(3)
        builders["r5_m4_wlitfar"] = mkmode(4)
    if "--foreign-only" not in sys.argv:
        run_set("own", own_streams(raw), raw, builders)
    if "--own-only" not in sys.argv:
        run_set("foreign", foreign_streams(raw), raw, builders)


if __name__ == "__main__":
    main()
