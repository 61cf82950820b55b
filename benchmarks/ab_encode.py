"""Within-run A/B for encode-side changes (prepass + kernel variants).

Times, in ONE process on the same 128-block corpus batch:
  - the full encode (current production encoder),
  - the XLA prepass alone (candidate_cmds jitted), isolating sort cost,
  - optional kernel debug modes for the walk/emission decomposition.

Usage: python benchmarks/ab_encode.py [--modes]
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
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import pallas_encode


def main() -> None:
    assert jax.devices()[0].platform == "tpu"
    raw = bench.corpus_stream(bench.BATCH * BLOCK_SIZE)
    inp = np.frombuffer(raw, np.uint8)
    buf0 = np.zeros((bench.BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(bench.BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    dbuf = jax.device_put(buf0)
    dlens = jax.device_put(np.full(bench.BATCH, BLOCK_SIZE, np.int32))

    res = {}

    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT)
    out, olens = enc(dbuf, dlens)
    total = int(np.asarray(olens).sum())
    res["total_compressed"] = total

    prep = jax.jit(
        lambda b_, l_: pallas_encode.candidate_cmds(b_, l_, DEFAULT_MIN_PROFIT)
    )
    _ = prep(dbuf, dlens)

    variants = {"full_encode": (enc, (dbuf, dlens)), "prepass_only": (prep, (dbuf, dlens))}
    if "--modes" in sys.argv:
        for mode, name in ((5, "take_chain"), (4, "walk_ext"), (2, "walk_ext_contest")):
            fn = jax.jit(pallas_encode._build(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT, debug_mode=mode))
            fn(dbuf, dlens)
            variants[name] = (fn, (dbuf, dlens))

    order = list(variants) + list(reversed(variants))
    for name in order:
        fn, args = variants[name]
        st = bench.time_dispatch_stats(fn, args, iters=5)
        res.setdefault(name, []).append(
            {"ms": round(st["min"] * 1e3, 2), "spread": round(st["spread"], 3)}
        )
    res["encode_gbps"] = round(
        bench.BATCH * BLOCK_SIZE / (min(r["ms"] for r in res["full_encode"]) / 1e3) / 1e9, 4
    )
    print(json.dumps(res, indent=2), flush=True)


if __name__ == "__main__":
    main()
