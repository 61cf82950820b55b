"""Stage split (walk / +literals / full) for OWN device-encoder streams,
plus RLE stats — diagnosing why own streams cost more cycles/tag than
foreign ones despite fewer tags. Diagnostic tool."""

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
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.ops import pallas_encode
from snappy_tpu.ops.pallas_decode import COMP_PAD, _build
from bench import corpus_stream, time_dispatch

BATCH = 128
CLOCK_GHZ = 0.94


def stream_stats(streams):
    st = dict(tags=0, lits=0, cpys=0, rle=0, rle_iters=0, litbytes=0, ovf=0)
    for s in streams:
        buf = np.frombuffer(s, np.uint8)
        ip = op = 0
        n = len(buf)
        while ip < n:
            c = int(buf[ip]); kind = c & 3; hi6 = c >> 2
            st["tags"] += 1
            if kind == 0:
                extra = max(0, hi6 - 59)
                ln = (int.from_bytes(buf[ip+1:ip+1+extra].tobytes(), "little") + 1) if extra else hi6 + 1
                st["lits"] += 1
                st["litbytes"] += ln
                if (op & 127) + ln > 256:
                    st["ovf"] += 1
                ip += 1 + extra + ln; op += ln
            else:
                if kind == 1:
                    ln = 4 + (hi6 & 7); f = ((hi6 >> 3) & 7) << 8 | int(buf[ip+1]); ip += 2
                elif kind == 2:
                    ln = hi6 + 1; f = int(buf[ip+1]) | int(buf[ip+2]) << 8; ip += 3
                else:
                    ln = hi6 + 1; f = int.from_bytes(buf[ip+1:ip+5].tobytes(), "little"); ip += 5
                st["cpys"] += 1
                if f < ln:
                    st["rle"] += 1
                    it = f
                    while it < min(ln, 128 - (op & 127)):
                        it *= 2; st["rle_iters"] += 1
                op += ln
    return st


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", flush=True)
    raw = corpus_stream(BATCH * BLOCK_SIZE)
    inp = np.frombuffer(raw, np.uint8)

    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, not on_tpu, DEFAULT_MIN_PROFIT)
    buf0 = np.zeros((BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    out, olens = enc(jax.device_put(buf0), jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32)))
    out = np.asarray(out); olens = np.asarray(olens)
    own = [out[i, : olens[i]].tobytes() for i in range(BATCH)]
    st = stream_stats(own)
    print(f"own: {st['tags']/BATCH:.0f} tags/blk ({st['lits']/BATCH:.0f} lit, "
          f"{st['cpys']/BATCH:.0f} cpy), rle {100*st['rle']/st['cpys']:.1f}% of copies, "
          f"rle dbl-iters/blk {st['rle_iters']/BATCH:.0f}, lit ovf/blk {st['ovf']/BATCH:.1f}",
          flush=True)

    cmax = -(-(max(len(s) for s in own) + COMP_PAD) // 512) * 512
    comp = np.zeros((BATCH, cmax), np.uint8)
    for i, s in enumerate(own):
        comp[i, : len(s)] = np.frombuffer(s, np.uint8)
    dcomp = jax.device_put(comp)
    dclens = jax.device_put(np.array([len(s) for s in own], np.int32))
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
    prev = 0.0
    for name, mode in [("walkonly", 2), ("walk+lit", 3), ("full", 0)]:
        fn = jax.jit(_build(cmax, BLOCK_SIZE, not on_tpu, debug_mode=mode))
        t = time_dispatch(fn, (dcomp, dclens, dulens))
        print(f"{name:9s}: {t*1e3:8.3f} ms  {BATCH*BLOCK_SIZE/t/1e9:6.3f} GB/s  "
              f"{t*CLOCK_GHZ*1e9/st['tags']:5.1f} cyc/tag (+{(t-prev)*CLOCK_GHZ*1e9/st['tags']:5.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
