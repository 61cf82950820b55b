"""Benchmark harness: device codec throughput on the snappy corpus.

Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: device decompress throughput (GB/s of uncompressed bytes per
chip) on a corpus-derived stream, vs the reference's published large-stream
uncompress rate (247 MB/s, reference README.md:45 / BASELINE.md). A fuller
report (encode, per-file, ratios) is written to benchmarks/report_last.json.

Runs on whatever backend JAX_PLATFORMS selects (the real TPU under the
driver). Uses ONE compiled shape (fixed block batch) to bound remote
compile time.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import decode_xla, encode_xla
from snappy_tpu.utils.metrics import Metrics, time_device_fn

# Reference baseline: Snappy.jl uncompress on the 644MB stream (README.md:45).
BASELINE_DECODE_GBPS = 0.247
BATCH = 32  # blocks per dispatch (2 MiB uncompressed)


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


def main() -> None:
    metrics = Metrics()
    dev = jax.devices()[0]
    metrics.run = {"device": str(dev), "platform": dev.platform, "batch": BATCH}

    stream_bytes = int(os.environ.get("BENCH_BYTES", 16 << 20))
    raw = corpus_stream(stream_bytes)
    inp = np.frombuffer(raw, np.uint8)
    n_blocks = -(-len(raw) // BLOCK_SIZE)
    n_batches = n_blocks // BATCH  # drop the ragged tail for steady-state timing
    assert n_batches >= 1

    # ---- block streams from the native host codec (single source of truth
    # for the decode bench; device-encode timing is a separate, env-gated
    # stage because its compile is much heavier).
    from snappy_tpu.cpu import oracle
    from snappy_tpu.native import runtime as nat

    host_enc = nat.compress if nat.available() else oracle.compress

    def block_stream(i: int) -> bytes:
        chunk = raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        s = host_enc(chunk)
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        return s[hdr:]

    streams = [block_stream(i) for i in range(n_batches * BATCH)]
    ratio = sum(len(s) for s in streams) / (n_batches * BATCH * BLOCK_SIZE)
    metrics.add(stage="ratio_native", compressed_ratio=ratio)

    comp_np = np.zeros((n_batches * BATCH, encode_xla.BLOCK_MAX_OUT), np.uint8)
    olens_np = np.zeros(n_batches * BATCH, np.int32)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = np.frombuffer(s, np.uint8)
        olens_np[i] = len(s)

    # ---- decode throughput: fixed-shape batched device decode.
    cmax = encode_xla.BLOCK_MAX_OUT
    dec = decode_xla.decode_blocks_jit(cmax + decode_xla.COMP_PAD, BLOCK_SIZE)
    comp_pad = np.zeros((BATCH, cmax + decode_xla.COMP_PAD), np.uint8)
    comp_pad[:, :cmax] = comp_np[:BATCH]
    dcomp = jax.device_put(comp_pad)
    dclens = jax.device_put(olens_np[:BATCH].astype(np.int32))
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

    # correctness gate on the timed path
    out, ok, _ = dec(dcomp, dclens, dulens)
    assert bool(np.asarray(ok).all()), "bench decode failed"
    assert np.asarray(out).tobytes() == raw[: BATCH * BLOCK_SIZE], "bench decode mismatch"

    t_dec = time_device_fn(dec, (dcomp, dclens, dulens), iters=10, warmup=3)
    dec_gbps = BATCH * BLOCK_SIZE / t_dec / 1e9
    metrics.add(stage="decode", gbps_per_chip=dec_gbps, seconds_per_batch=t_dec)

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

    # ---- device-encode stage (heavier compile; after the headline print so
    # a slow compile can never cost the decode number).
    if os.environ.get("BENCH_ENCODE", "1") != "0":
        enc = encode_xla.encode_blocks_jit(BATCH)
        buf0 = np.zeros((BATCH, BLOCK_SIZE + encode_xla.ENC_PAD), np.uint8)
        for b in range(BATCH):
            buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
        dbuf0 = jax.device_put(buf0)
        dlens0 = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
        t_enc = time_device_fn(enc, (dbuf0, dlens0), iters=10, warmup=3)
        enc_gbps = BATCH * BLOCK_SIZE / t_enc / 1e9
        metrics.add(stage="encode", gbps_per_chip=enc_gbps, seconds_per_batch=t_enc)
        out, olens = enc(dbuf0, dlens0)
        dev_ratio = float(np.asarray(olens).sum()) / (BATCH * BLOCK_SIZE)
        metrics.add(stage="ratio_device", compressed_ratio=dev_ratio)

    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    metrics.dump(os.path.join(REPO, "benchmarks", "report_last.json"))


if __name__ == "__main__":
    main()
