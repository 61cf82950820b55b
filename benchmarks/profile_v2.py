"""Measure the reworked copy drain (lean staging + one-shot hazard moves)
on the real chip: GROUP in {16, 8}, foreign (native-encoder) and own
(device-encoder) streams, with bit-exactness gating every timed config.

One compressed-width bucket is shared by all configs so each GROUP value
costs exactly one Mosaic compile. Diagnostic tool, not part of the suite.
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
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.ops import pallas_decode, pallas_encode
from snappy_tpu.ops.pallas_decode import COMP_PAD, _build
from bench import corpus_stream, time_dispatch

BATCH = int(os.environ.get("PROF_BATCH", "128"))
CLOCK_GHZ = float(os.environ.get("PROF_CLOCK_GHZ", "0.94"))


def tag_hazard_stats(streams, group):
    tags = copies = hz = 0
    for s in streams:
        buf = np.frombuffer(s, np.uint8)
        ip = op = 0
        n = len(buf)
        cps = []
        while ip < n:
            c = int(buf[ip])
            kind = c & 3
            hi6 = c >> 2
            tags += 1
            if kind == 0:
                extra = max(0, hi6 - 59)
                ln = (int.from_bytes(buf[ip + 1 : ip + 1 + extra].tobytes(), "little") + 1) if extra else hi6 + 1
                ip += 1 + extra + ln
                op += ln
            else:
                if kind == 1:
                    ln = 4 + (hi6 & 7)
                    f = ((hi6 >> 3) & 7) << 8 | int(buf[ip + 1])
                    ip += 2
                elif kind == 2:
                    ln = hi6 + 1
                    f = int(buf[ip + 1]) | int(buf[ip + 2]) << 8
                    ip += 3
                else:
                    ln = hi6 + 1
                    f = int.from_bytes(buf[ip + 1 : ip + 5].tobytes(), "little")
                    ip += 5
                cps.append((op, f, ln))
                op += ln
        copies += len(cps)
        for g in range(0, len(cps), group):
            lead = cps[g][0]
            for (o, f, ln) in cps[g : g + group]:
                if o - f + ln > lead:
                    hz += 1
    return tags, copies, hz


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev} ({dev.platform})", flush=True)
    raw = corpus_stream(BATCH * BLOCK_SIZE)
    inp = np.frombuffer(raw, np.uint8)

    # foreign streams (native host encoder)
    from snappy_tpu.cpu import oracle
    from snappy_tpu.native import runtime as nat

    host_enc = nat.compress if nat.available() else oracle.compress
    foreign = []
    for i in range(BATCH):
        s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        foreign.append(s[hdr:])

    # own streams (device encoder at prod min_profit)
    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, not on_tpu, DEFAULT_MIN_PROFIT)
    buf0 = np.zeros((BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
    for b in range(BATCH):
        buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
    t0 = time.perf_counter()
    out, olens = enc(jax.device_put(buf0), jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32)))
    out = np.asarray(out)
    olens = np.asarray(olens)
    print(f"device encode (incl compile on first call): {time.perf_counter()-t0:.1f}s, "
          f"ratio {olens.sum()/(BATCH*BLOCK_SIZE):.4f}", flush=True)
    own = [out[i, : olens[i]].tobytes() for i in range(BATCH)]

    for name, streams in [("own", own), ("foreign", foreign)]:
        t, c, h = tag_hazard_stats(streams, pallas_decode.GROUP)
        print(f"{name}: {t/BATCH:.0f} tags/blk, {c/BATCH:.0f} copies/blk, "
              f"hazards {100*h/max(c,1):.1f}% of copies", flush=True)

    cmax = -(-(max(len(s) for s in own + foreign) + COMP_PAD) // 512) * 512
    def pack(streams):
        comp = np.zeros((BATCH, cmax), np.uint8)
        for i, s in enumerate(streams):
            comp[i, : len(s)] = np.frombuffer(s, np.uint8)
        clens = np.array([len(s) for s in streams], np.int32)
        return jax.device_put(comp), jax.device_put(clens)

    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
    for group in [16, 8]:
        dec = jax.jit(_build(cmax, BLOCK_SIZE, not on_tpu, group=group))
        for name, streams in [("own", own), ("foreign", foreign)]:
            dcomp, dclens = pack(streams)
            o, ok, tot = dec(dcomp, dclens, dulens)
            assert bool(np.asarray(ok).all()), f"decode flagged corrupt ({name}, g{group})"
            assert np.asarray(o).tobytes() == raw, f"decode mismatch ({name}, g{group})"
            t = time_dispatch(dec, (dcomp, dclens, dulens))
            tags, _, _ = tag_hazard_stats(streams, group)
            print(f"g{group} {name}: {t*1e3:8.3f} ms  {BATCH*BLOCK_SIZE/t/1e9:6.3f} GB/s  "
                  f"{t*CLOCK_GHZ*1e9/tags:5.1f} cyc/tag", flush=True)


if __name__ == "__main__":
    main()
