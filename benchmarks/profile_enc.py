"""Fenced encoder timings: prepass (candidate_cmds) vs full pipeline, with
density + roundtrip gates. Diagnostic tool."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.ops import pallas_encode
from bench import corpus_stream, time_dispatch

BATCH = 128
CLOCK_GHZ = 0.94


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", flush=True)
    raw = corpus_stream(BATCH * BLOCK_SIZE)
    inp = np.frombuffer(raw, np.uint8)
    buf0 = np.zeros((BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    dbuf = jax.device_put(buf0)
    dlens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

    pp = jax.jit(lambda x, l: pallas_encode.candidate_cmds(x, l, DEFAULT_MIN_PROFIT))
    t_pp = time_dispatch(pp, (dbuf, dlens))
    print(f"prepass candidate_cmds: {t_pp*1e3:8.3f} ms", flush=True)

    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, not on_tpu, DEFAULT_MIN_PROFIT)
    out, olens = enc(dbuf, dlens)
    out = np.asarray(out)
    olens = np.asarray(olens)
    ratio = olens.sum() / (BATCH * BLOCK_SIZE)
    print(f"ratio: {ratio:.4f}", flush=True)

    # roundtrip gate through the oracle (varint header + block stream)
    from snappy_tpu.core import varint
    from snappy_tpu.cpu import oracle

    for i in range(0, BATCH, 16):
        s = varint.encode32(BLOCK_SIZE) + out[i, : olens[i]].tobytes()
        assert oracle.uncompress(s) == raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE], f"block {i}"
    print("roundtrip ok", flush=True)

    t = time_dispatch(enc, (dbuf, dlens), iters=3)
    print(
        f"full encode: {t*1e3:8.3f} ms  {BATCH*BLOCK_SIZE/t/1e9:6.3f} GB/s  "
        f"(kernel ~{(t-t_pp)*1e3:.1f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
