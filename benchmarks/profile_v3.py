"""Round-3 experiment batch: decode GROUP sweep on own/foreign streams +
min_profit=4 (adaptive) density/tag/decode-speed probe. Diagnostic."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.core import varint
from snappy_tpu.ops import pallas_encode
from snappy_tpu.ops.pallas_decode import COMP_PAD, _build
from snappy_tpu.native import runtime as nat
from snappy_tpu.native import libsnappy as ls
from bench import corpus_stream, time_dispatch

BATCH = 128
CLOCK_GHZ = 0.94
GROUPS = [int(g) for g in os.environ.get("PROF_GROUPS", "16,24,32").split(",")]
PROFITS = [int(p) for p in os.environ.get("PROF_PROFITS", "3,4").split(",")]


def count_tags(streams):
    tags = 0
    for s in streams:
        buf = np.frombuffer(s, np.uint8)
        ip = 0
        n = len(buf)
        while ip < n:
            c = int(buf[ip]); kind = c & 3; hi6 = c >> 2
            tags += 1
            if kind == 0:
                extra = max(0, hi6 - 59)
                ln = (int.from_bytes(buf[ip+1:ip+1+extra].tobytes(), "little") + 1) if extra else hi6 + 1
                ip += 1 + extra + ln
            else:
                ip += 2 if kind == 1 else (3 if kind == 2 else 5)
    return tags


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

    ls_total = sum(
        len(ls.compress(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])) - 3 for i in range(BATCH)
    ) if ls.available() else None

    streams_by_mp = {}
    for mp in PROFITS:
        enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, not on_tpu, mp)
        out, olens = enc(dbuf, dlens)
        out = np.asarray(out); olens = np.asarray(olens)
        streams = [out[i, : olens[i]].tobytes() for i in range(BATCH)]
        streams_by_mp[mp] = streams
        tags = count_tags(streams)
        tot = int(olens.sum())
        ok_gate = "" if ls_total is None else f"  vs libsnappy {tot/ls_total:.4f} ({'PASS' if tot <= ls_total else 'FAIL'})"
        t_enc = time_dispatch(enc, (dbuf, dlens), iters=3)
        print(f"mp{mp}: ratio {tot/(BATCH*BLOCK_SIZE):.4f}, {tags/BATCH:.0f} tags/blk, "
              f"encode {t_enc*1e3:.1f} ms ({BATCH*BLOCK_SIZE/t_enc/1e9:.3f} GB/s){ok_gate}", flush=True)
        if ls.available():
            for i in range(0, BATCH, 16):
                s = varint.encode32(BLOCK_SIZE) + streams[i]
                assert ls.uncompress(s) == raw[i*BLOCK_SIZE:(i+1)*BLOCK_SIZE], f"mp{mp} blk {i} wire"

    # foreign segments from one true raw stream
    stream = nat.compress(raw)
    ulen, hdr = nat.uncompressed_length(stream)
    body = stream[hdr:]
    starts, oplens = nat.scan_blocks(body, ulen)
    bounds = list(starts) + [len(body)]
    foreign = [body[bounds[i] : bounds[i + 1]] for i in range(len(starts))]

    suites = [(f"own-mp{mp}", s) for mp, s in streams_by_mp.items()] + [("foreign", foreign)]
    allstreams = [s for _, ss in suites for s in ss]
    cmax = -(-(max(len(s) for s in allstreams) + COMP_PAD) // 512) * 512
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
    for group in GROUPS:
        dec = jax.jit(_build(cmax, BLOCK_SIZE, not on_tpu, group=group))
        for name, streams in suites:
            comp = np.zeros((BATCH, cmax), np.uint8)
            for i, s in enumerate(streams):
                comp[i, : len(s)] = np.frombuffer(s, np.uint8)
            dcomp = jax.device_put(comp)
            dclens = jax.device_put(np.array([len(s) for s in streams], np.int32))
            o, ok, tot = dec(dcomp, dclens, dulens)
            assert bool(np.asarray(ok).all()), f"{name} g{group} corrupt"
            assert np.asarray(o).tobytes() == raw, f"{name} g{group} mismatch"
            t = time_dispatch(dec, (dcomp, dclens, dulens))
            tags = count_tags(streams)
            print(f"g{group} {name}: {t*1e3:8.3f} ms  {BATCH*BLOCK_SIZE/t/1e9:6.3f} GB/s  "
                  f"{t*CLOCK_GHZ*1e9/tags:5.1f} cyc/tag", flush=True)


if __name__ == "__main__":
    main()
