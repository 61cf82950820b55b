"""Time the current pallas_decode kernel at each debug level (diagnostic).

  mode 2: walk only (records emitted, no drains)  -> scalar walk cost
  mode 3: walk + literal drain                    -> + literal move cost
  mode 0: full kernel (walk + both drains)        -> library path

Also prints tag/record statistics from the CPU oracle so times convert to
cycles/tag and cycles/record.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import pallas_decode
from snappy_tpu.ops.pallas_decode import COMP_PAD, LANES, _build
from bench import corpus_stream

BATCH = int(os.environ.get("PROF_BATCH", "128"))
# TPU clock for cycles/tag conversion; override for other generations.
CLOCK_GHZ = float(os.environ.get("PROF_CLOCK_GHZ", "0.94"))


def time_meta(fn, args, iters: int = 7):
    """Min/median seconds, with the (large, ~24 ms on the tunnelled TPU)
    host fence cost calibrated out the same way bench.time_dispatch does."""

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = np.asarray(leaf.reshape(-1)[-1:])

    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    fence_cost = time.perf_counter() - t0
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        times.append(max(time.perf_counter() - t0 - fence_cost, 1e-9))
    times.sort()
    return times[0], times[len(times) // 2]


def tag_stats(stream: bytes, ulen: int) -> tuple[int, int]:
    """(tags, records) for one headerless block stream, mirroring the kernel's
    row-split record emission."""
    buf = np.frombuffer(stream, np.uint8)
    ip, op, tags, recs = 0, 0, 0, 0
    n = len(buf)

    def spans(o, length):
        r = 0
        while length > 0:
            take = min(length, LANES - (o & 127))
            o += take
            length -= take
            r += 1
        return r

    while ip < n:
        c = int(buf[ip])
        kind = c & 3
        hi6 = c >> 2
        tags += 1
        if kind == 0:
            extra = max(0, hi6 - 59)
            if extra:
                ln = int.from_bytes(buf[ip + 1 : ip + 1 + extra].tobytes(), "little") + 1
            else:
                ln = hi6 + 1
            recs += spans(op, ln)
            ip += 1 + extra + ln
            op += ln
        else:
            if kind == 1:
                ln = 4 + (hi6 & 7)
                off = ((hi6 >> 3) & 7) << 8 | int(buf[ip + 1])
                ip += 2
            elif kind == 2:
                ln = hi6 + 1
                off = int(buf[ip + 1]) | int(buf[ip + 2]) << 8
                ip += 3
            else:
                ln = hi6 + 1
                off = int.from_bytes(buf[ip + 1 : ip + 5].tobytes(), "little")
                ip += 5
            if off == 0:  # mirrors the kernel's f > 0 corruption check
                raise ValueError("corrupt stream: copy offset 0")
            if off < ln:  # RLE doubling sub-moves
                done = off
                recs += spans(op, off)
                while done < ln:
                    step = min(done, ln - done)
                    recs += spans(op + done, step)
                    done += step
            else:
                recs += spans(op, ln)
            op += ln
    return tags, recs


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    raw = corpus_stream(BATCH * BLOCK_SIZE)
    from snappy_tpu.cpu import oracle
    from snappy_tpu.native import runtime as nat

    host_enc = nat.compress if nat.available() else oracle.compress
    streams = []
    for i in range(BATCH):
        s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        streams.append(s[hdr:])

    tags = recs = 0
    for s in streams:
        t, r = tag_stats(s, BLOCK_SIZE)
        tags += t
        recs += r
    print(f"batch: {BATCH} blocks, {tags} tags, {recs} records "
          f"({tags/BATCH:.0f} tags/blk, {recs/tags:.2f} rec/tag)", flush=True)

    cmax = -(-(max(len(s) for s in streams) + COMP_PAD) // 512) * 512
    comp_np = np.zeros((BATCH, cmax), np.uint8)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = np.frombuffer(s, np.uint8)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(np.array([len(s) for s in streams], np.int32))
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

    # prepass alone
    ncp = -(-cmax // 128) * 128
    comp_pp = jax.device_put(np.pad(comp_np, ((0, 0), (0, ncp - comp_np.shape[1]))))
    pp = jax.jit(lambda c, l: pallas_decode.parse_cmds(c, l))
    tmin, tmed = time_meta(pp, (comp_pp, dclens))
    print(f"parse_cmds prepass: {tmin*1e3:8.3f} / {tmed*1e3:8.3f} ms (min/med)", flush=True)

    prev = 0.0
    for name, mode in [("walkonly", 2), ("walk+lit", 3), ("full", 0)]:
        fn = jax.jit(_build(cmax, BLOCK_SIZE, False, debug_mode=mode))
        tmin, tmed = time_meta(fn, (dcomp, dclens, dulens))
        cyc_tag = tmin * CLOCK_GHZ * 1e9 / tags
        cyc_rec = tmin * CLOCK_GHZ * 1e9 / recs
        delta = (tmin - prev) * CLOCK_GHZ * 1e9
        print(
            f"{name:9s}: {tmin*1e3:8.3f} / {tmed*1e3:8.3f} ms  "
            f"{BATCH*BLOCK_SIZE/tmin/1e9:6.3f} GB/s  {cyc_tag:7.1f} cyc/tag "
            f"{cyc_rec:6.1f} cyc/rec  (+{delta/tags:6.1f} cyc/tag vs prev)",
            flush=True,
        )
        prev = tmin


if __name__ == "__main__":
    main()
