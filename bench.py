"""Benchmark harness: device codec throughput on the snappy corpus.

Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: device decompress throughput (GB/s of uncompressed bytes per
chip) on a corpus-derived stream, vs the reference's published large-stream
uncompress rate (247 MB/s, reference README.md:45 / BASELINE.md). A fuller
report (encode, ratios) is written to benchmarks/report_last.json.

Timing notes (hard-won on the tunnelled TPU): `block_until_ready` does not
fence device work here and host<->device transfers run ~40MB/s, so each
measurement is one LARGE dispatch (>=8 MiB) fenced by a device-side
1-element slice pulled to host; the fence cost (~25ms) is measured and
subtracted via a zero-work calibration call.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax

try:  # persistent compile cache: Mosaic/XLA compiles are remote and slow
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import decode_xla, encode_xla, pallas_decode
from snappy_tpu.utils.metrics import Metrics

# Reference baseline: Snappy.jl uncompress on the 644MB stream (README.md:45).
BASELINE_DECODE_GBPS = 0.247
BATCH = 128  # blocks per dispatch (8 MiB uncompressed): compute >> fence cost


def corpus_stream(target_bytes: int) -> bytes:
    td = os.path.join(REPO, "testdata")
    names = [
        "alice29.txt", "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf",
        "lcet10.txt", "plrabn12.txt", "geo.protodata", "kppkn.gtb", "sample-tweet.json",
    ]
    bufs = [open(os.path.join(td, n), "rb").read() for n in names]
    out = []
    total = 0
    i = 0
    while total < target_bytes:
        out.append(bufs[i % len(bufs)])
        total += len(bufs[i % len(bufs)])
        i += 1
    return b"".join(out)[:target_bytes]


def fence(x) -> None:
    """True device fence: device-side 1-element slice -> host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.reshape(-1)[:1])


def time_dispatch(fn, args, iters: int = 5) -> float:
    """Min seconds of one large dispatch, fence cost subtracted."""
    out = fn(*args)
    fence(out)
    # fence-only calibration: re-fence the ready result
    t0 = time.perf_counter()
    fence(out)
    fence_cost = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        times.append(time.perf_counter() - t0 - fence_cost)
    return max(min(times), 1e-9)


def main() -> None:
    metrics = Metrics()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    metrics.run = {"device": str(dev), "platform": dev.platform, "batch": BATCH}

    stream_bytes = int(os.environ.get("BENCH_BYTES", BATCH * BLOCK_SIZE))
    raw = corpus_stream(stream_bytes)
    inp = np.frombuffer(raw, np.uint8)
    n_blocks = len(raw) // BLOCK_SIZE
    assert n_blocks >= BATCH, "BENCH_BYTES too small for one batch"

    # ---- block streams from the native host codec (single source of truth
    # for the decode bench; device-encode timing is a separate stage).
    from snappy_tpu.cpu import oracle
    from snappy_tpu.native import runtime as nat

    host_enc = nat.compress if nat.available() else oracle.compress

    streams = []
    for i in range(BATCH):
        s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        streams.append(s[hdr:])
    ratio = sum(len(s) for s in streams) / (BATCH * BLOCK_SIZE)
    metrics.add(stage="ratio_native", compressed_ratio=ratio)

    cmax = -(-(max(len(s) for s in streams) + pallas_decode.COMP_PAD) // 512) * 512
    comp_np = np.zeros((BATCH, cmax), np.uint8)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = np.frombuffer(s, np.uint8)
    clens_np = np.array([len(s) for s in streams], np.int32)

    # ---- decode throughput: Pallas sequential-tag kernel on TPU.
    if on_tpu:
        dec = pallas_decode.decode_blocks_jit(cmax, BLOCK_SIZE)
    else:
        dec = decode_xla.decode_blocks_jit(cmax, BLOCK_SIZE)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(clens_np)
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

    # correctness gate on the timed path
    out, ok, _ = dec(dcomp, dclens, dulens)
    assert bool(np.asarray(ok).all()), "bench decode failed"
    assert np.asarray(out).tobytes() == raw[: BATCH * BLOCK_SIZE], "bench decode mismatch"

    t_dec = time_dispatch(dec, (dcomp, dclens, dulens))
    dec_gbps = BATCH * BLOCK_SIZE / t_dec / 1e9
    metrics.add(stage="decode", gbps_per_chip=dec_gbps, seconds_per_batch=t_dec, kernel="pallas" if on_tpu else "xla")

    print(
        json.dumps(
            {
                "metric": "device_decompress_throughput",
                "value": round(dec_gbps, 4),
                "unit": "GB/s/chip",
                "vs_baseline": round(dec_gbps / BASELINE_DECODE_GBPS, 2),
            }
        ),
        flush=True,
    )

    # ---- device-encode stage (after the headline print so a slow compile
    # can never cost the decode number).
    if os.environ.get("BENCH_ENCODE", "1") != "0":
        try:
            from snappy_tpu.ops import pallas_encode

            enc_blocks = pallas_encode.encode_blocks_jit(BLOCK_SIZE)
            enc_pad = pallas_encode.ENC_PAD
            kernel = "pallas"
        except Exception:
            enc_blocks = encode_xla.encode_blocks_jit(BATCH)
            enc_pad = encode_xla.ENC_PAD
            kernel = "xla"
        buf0 = np.zeros((BATCH, BLOCK_SIZE + enc_pad), np.uint8)
        for b in range(BATCH):
            buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
        dbuf0 = jax.device_put(buf0)
        dlens0 = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
        t_enc = time_dispatch(enc_blocks, (dbuf0, dlens0), iters=3)
        enc_gbps = BATCH * BLOCK_SIZE / t_enc / 1e9
        metrics.add(stage="encode", gbps_per_chip=enc_gbps, seconds_per_batch=t_enc, kernel=kernel)
        out, olens = enc_blocks(dbuf0, dlens0)[:2]
        dev_ratio = float(np.asarray(olens).sum()) / (BATCH * BLOCK_SIZE)
        metrics.add(stage="ratio_device", compressed_ratio=dev_ratio)

    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    metrics.dump(os.path.join(REPO, "benchmarks", "report_last.json"))


if __name__ == "__main__":
    main()
