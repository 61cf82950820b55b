"""Within-run A/B: round-5 FAR/NEAR decode kernel vs the pinned round-4 kernel.

Chip regime swings ±15-30% between runs, so the only trustworthy
round-over-round comparison is both kernels timed in ONE process on the
SAME streams (bench.py applies the same discipline to the headline).
Optionally also times the fused kernel's debug modes (walk-only,
walk+literals) for the component account.

Usage: python benchmarks/ab_decode.py [--modes] [--foreign]
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


def main() -> None:
    assert jax.devices()[0].platform == "tpu", "A/B needs the real chip"
    raw = bench.corpus_stream(bench.BATCH * BLOCK_SIZE)
    inp = np.frombuffer(raw, np.uint8)

    from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
    from snappy_tpu.ops import pallas_encode

    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT)
    buf0 = np.zeros((bench.BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(bench.BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    out, olens = enc(jax.device_put(buf0), jax.device_put(np.full(bench.BATCH, BLOCK_SIZE, np.int32)))
    out = np.asarray(out)
    olens = np.asarray(olens)
    streams = [out[i, : olens[i]].tobytes() for i in range(bench.BATCH)]

    variants = {}
    cmax, comp_np, clens_np = bench.pack_streams(streams, pallas_decode.COMP_PAD)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(clens_np)
    dulens = jax.device_put(np.full(len(streams), BLOCK_SIZE, np.int32))

    def add(name, fn, check=True):
        o, k, _ = fn(dcomp, dclens, dulens)
        if check:
            assert bool(np.asarray(k).all()), f"{name} flagged corrupt"
            assert np.asarray(o).tobytes() == raw, f"{name} mismatch"
        variants[name] = fn

    add("r4", pallas_decode_r4.decode_blocks_jit(cmax, BLOCK_SIZE))
    add("r5", pallas_decode.decode_blocks_jit(cmax, BLOCK_SIZE))
    if "--variants" in sys.argv:
        add("r5_c64", jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, chunk=64)))
        add("r5_c256", jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, chunk=256)))
        add("r5_g8", jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, near_group=8)))
        add("r5_nofold", jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, fold=False)))
    if "--modes" in sys.argv:
        for mode, name in ((2, "r5_walk_only"), (3, "r5_walk_lit"), (4, "r5_walk_lit_far")):
            fn = jax.jit(pallas_decode._build(cmax, BLOCK_SIZE, False, debug_mode=mode))
            o, k, t = fn(dcomp, dclens, dulens)
            variants[name] = fn

    results = {}
    # interleave: time each variant twice in alternating order to expose
    # within-run drift
    order = list(variants) + list(reversed(variants))
    for name in order:
        st = bench.time_dispatch_stats(variants[name], (dcomp, dclens, dulens), iters=5)
        gbps = len(streams) * BLOCK_SIZE / st["min"] / 1e9
        results.setdefault(name, []).append(
            {"gbps": round(gbps, 4), "ms": round(st["min"] * 1e3, 2), "spread": round(st["spread"], 3)}
        )

    best = {n: max(r["gbps"] for r in rs) for n, rs in results.items()}
    summary = {
        "streams": "own (device encoder)",
        "results": results,
        "gbps_best": best,
        "r5_vs_r4": round(best.get("r5", 0) / best.get("r4", 1), 3),
    }
    print(json.dumps(summary, indent=2), flush=True)

    if "--foreign" in sys.argv:
        from snappy_tpu.native import runtime as nat

        stream = nat.compress(raw)
        ulen, hdr = nat.uncompressed_length(stream)
        body = stream[hdr:]
        starts, oplens = nat.scan_blocks(body, ulen)
        bounds = list(starts) + [len(body)]
        foreign = [body[bounds[i] : bounds[i + 1]] for i in range(len(starts))]
        cmaxf, compf, clensf = bench.pack_streams(foreign, pallas_decode.COMP_PAD)
        dcf = jax.device_put(compf)
        dlf = jax.device_put(clensf)
        duf = jax.device_put(np.full(len(foreign), BLOCK_SIZE, np.int32))
        fres = {}
        for name, builder in (
            ("r4", pallas_decode_r4.decode_blocks_jit),
            ("r5", pallas_decode.decode_blocks_jit),
        ):
            fn = builder(cmaxf, BLOCK_SIZE)
            o, k, _ = fn(dcf, dlf, duf)
            assert bool(np.asarray(k).all()) and np.asarray(o).tobytes() == raw
            st = bench.time_dispatch_stats(fn, (dcf, dlf, duf), iters=5)
            fres[name] = round(len(foreign) * BLOCK_SIZE / st["min"] / 1e9, 4)
        print(json.dumps({"streams": "foreign", "gbps": fres,
                          "r5_vs_r4": round(fres["r5"] / fres["r4"], 3)}), flush=True)


if __name__ == "__main__":
    main()
