"""Benchmark harness: device codec throughput on the snappy corpus.

Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: device decompress throughput (GB/s of uncompressed bytes per
chip) on a corpus-derived stream, vs the reference's published large-stream
uncompress rate (247 MB/s, reference README.md:45 / BASELINE.md). Like the
reference benchmark (reference test/benchmarks.jl:27-69), decode times the
codec's OWN compressed output — here the Pallas device encoder — and that
output is gated before timing:
  1. device round-trip must be bit-exact and flag ok,
  2. REAL libsnappy (ctypes, snappy_tpu/native/libsnappy.py) must decode
     sampled streams bit-exact (wire compatibility with the genuine
     article, reference test/libsnappy.jl:5-30),
  3. total device compressed size must beat real libsnappy's.
A second decode stage times foreign streams (native host encoder) for the
wire-parity number. Full results land in benchmarks/report_last.json.

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

from snappy_tpu.core import varint
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import decode_xla, encode_xla, pallas_decode
from snappy_tpu.utils.metrics import Metrics

# Reference baseline: Snappy.jl uncompress on the 644MB stream (README.md:45).
BASELINE_DECODE_GBPS = 0.247
# The build-bar target (BASELINE.md): >= 10 GB/s/chip decompress.
TARGET_DECODE_GBPS = 10.0
# v5e HBM bandwidth, for the roofline fraction (BASELINE.md:31).
HBM_GBPS = 820.0
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


def time_dispatch_stats(fn, args, iters: int = 7) -> dict:
    """Fenced timing of one large dispatch with the spread reported.

    The fence itself costs ~25 ms on the tunnelled device — comparable to
    the dispatch being measured — so its cost is calibrated as a median of
    several fence-only samples (a single sample's jitter would dominate
    the subtraction). Run-to-run variance on this chip is ±15-30%, so every
    metric carries {min, median, n, spread}: round-over-round claims must
    clear the spread (mirrors the reference's median-of-10000 discipline,
    reference README.md:33-35)."""
    out = fn(*args)
    fence(out)
    fsamples = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(out)
        fsamples.append(time.perf_counter() - t0)
    fsamples.sort()
    fence_cost = fsamples[len(fsamples) // 2]
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        times.append(max(time.perf_counter() - t0 - fence_cost, 1e-9))
    # The fence cost (~25 ms) is comparable to the dispatch and its jitter
    # occasionally EXCEEDS a sample, leaving a non-physical near-zero time
    # whose "min" then reports absurd throughput (observed once: 8 PB/s).
    # Drop samples below a physical floor; fall back to the raw set only
    # if everything is tiny (a genuinely sub-floor dispatch).
    floor = 1e-3
    valid = [t for t in times if t >= floor] or times
    valid.sort()
    tmin = valid[0]
    tmed = valid[len(valid) // 2]
    return {
        "min": tmin,
        "median": tmed,
        "n": len(valid),
        "spread": (valid[-1] - valid[0]) / tmed,
    }


def time_dispatch(fn, args, iters: int = 7) -> float:
    """Min seconds of one large dispatch (see time_dispatch_stats)."""
    return time_dispatch_stats(fn, args, iters)["min"]


def pack_streams(streams, pad: int):
    cmax = -(-(max(len(s) for s in streams) + pad) // 512) * 512
    comp_np = np.zeros((len(streams), cmax), np.uint8)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = np.frombuffer(s, np.uint8) if isinstance(s, bytes) else s
    clens = np.array([len(s) for s in streams], np.int32)
    return cmax, comp_np, clens


def time_decode(streams, raw: bytes, on_tpu: bool, label: str, metrics) -> float:
    """Gate bit-exactness, then time the device decode of ``streams``."""
    cmax, comp_np, clens_np = pack_streams(streams, pallas_decode.COMP_PAD)
    dec = (pallas_decode if on_tpu else decode_xla).decode_blocks_jit(cmax, BLOCK_SIZE)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(clens_np)
    dulens = jax.device_put(np.full(len(streams), BLOCK_SIZE, np.int32))

    out, ok, _ = dec(dcomp, dclens, dulens)
    assert bool(np.asarray(ok).all()), f"bench decode flagged corrupt ({label})"
    assert np.asarray(out).tobytes() == raw[: len(streams) * BLOCK_SIZE], f"decode mismatch ({label})"

    st = time_dispatch_stats(dec, (dcomp, dclens, dulens))
    t = st["min"]
    gbps = len(streams) * BLOCK_SIZE / t / 1e9
    metrics.add(
        stage=f"decode_{label}",
        gbps_per_chip=gbps,
        gbps_at_median=len(streams) * BLOCK_SIZE / st["median"] / 1e9,
        seconds_per_batch=t,
        timing=st,
        hbm_roofline_frac=gbps * 1.5 / HBM_GBPS,  # ~1.5B HBM traffic per output byte
        kernel="pallas" if on_tpu else "xla",
    )
    return gbps


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

    # ---- real-libsnappy baseline sizes (the genuine article, not our C++).
    from snappy_tpu.native import libsnappy as ls

    ls_total = None
    if ls.available():
        ls_total = sum(
            len(ls.compress(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])) - len(varint.encode32(BLOCK_SIZE))
            for i in range(BATCH)
        )
        metrics.add(stage="ratio_libsnappy", compressed_ratio=ls_total / (BATCH * BLOCK_SIZE))

    # ---- device encode: the framework's own compressed stream, through the
    # PRODUCTION routed path (ops/route.py): incompressible blocks (jpeg,
    # the pdf image stream) take the host-native skip-heuristic encoder
    # while the device dispatch is in flight — the TPU-shaped analogue of
    # the reference's incompressible bail-out (src/internal.jl:162-172).
    enc_streams = None
    enc_t = None
    if on_tpu:
        from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
        from snappy_tpu.ops import pallas_encode, route

        enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT)
        buf0 = np.zeros((BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
        for b in range(BATCH):
            buf0[b, :BLOCK_SIZE] = inp[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
        lens0 = np.full(BATCH, BLOCK_SIZE, np.int32)

        # Timed routed dispatch with the device batch PRE-PUT (the same
        # host->device-transfer-excluded convention as every other stage:
        # the dev tunnel runs ~40 MB/s and would swamp the measurement;
        # production hosts move >10 GB/s). The detector and the host-native
        # encodes ARE timed — they are real per-batch work.
        ratios0 = route.dup_ratios(buf0, lens0, BATCH)
        host_idx0 = np.flatnonzero(ratios0 < route.DUP_THRESHOLD)
        dev_idx0 = np.setdiff1d(np.arange(BATCH), host_idx0)
        # exact device-subset count (batch counts are stable per workload;
        # the power-of-two bucket would pad the subset straight back to the
        # full batch and erase the routing savings)
        nbd = max(len(dev_idx0), 1)
        sub = np.zeros((nbd,) + buf0.shape[1:], np.uint8)
        sub[: len(dev_idx0)] = buf0[dev_idx0]
        sublens = np.zeros(nbd, np.int32)
        sublens[: len(dev_idx0)] = lens0[dev_idx0]
        dsub = jax.device_put(sub)
        dsublens = jax.device_put(sublens)

        def routed_dispatch(_=None):
            _ = route.dup_ratios(buf0, lens0, BATCH)  # detector (host)
            out_d = enc(dsub, dsublens)  # async device dispatch
            route.native_streams_for(buf0, lens0, host_idx0)  # overlapped
            return out_d

        enc_streams = route.compress_blocks_routed(buf0, lens0, BATCH, lambda nb: enc)
        n_routed = sum(
            1
            for r in route.dup_ratios(buf0, lens0, BATCH)
            if r < route.DUP_THRESHOLD
        )
        dev_total = sum(len(s) for s in enc_streams)
        metrics.add(
            stage="ratio_device",
            compressed_ratio=dev_total / (BATCH * BLOCK_SIZE),
            blocks_host_routed=n_routed,
        )

        # gate: wire compatibility under REAL libsnappy on sampled blocks
        if ls.available():
            for i in range(0, BATCH, 8):
                stream = varint.encode32(BLOCK_SIZE) + enc_streams[i]
                assert ls.uncompress(stream) == raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE], (
                    f"device-encoded block {i} not decodable by real libsnappy"
                )
            # gate: density beats the genuine article
            assert dev_total <= ls_total, f"device ratio {dev_total} > libsnappy {ls_total}"

        enc_st = time_dispatch_stats(routed_dispatch, (), iters=5)
        enc_t = enc_st["min"]
        metrics.add(
            stage="encode",
            gbps_per_chip=BATCH * BLOCK_SIZE / enc_t / 1e9,
            gbps_at_median=BATCH * BLOCK_SIZE / enc_st["median"] / 1e9,
            seconds_per_batch=enc_t,
            timing=enc_st,
            kernel="pallas+routed_native",
        )

    # ---- headline: decode the framework's own streams (falls back to the
    # native host encoder's streams off-TPU, where there is no device encode).
    if enc_streams is None:
        from snappy_tpu.cpu import oracle
        from snappy_tpu.native import runtime as nat

        host_enc = nat.compress if nat.available() else oracle.compress
        enc_streams = []
        for i in range(BATCH):
            s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
            _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
            enc_streams.append(s[hdr:])

    # ---- headline + within-run control + autotune. The chip regime swings
    # ±15-30% run to run, DRIFTS within a run, and flips the r4/r5 kernel
    # ranking (round-5 measurement: the r5 FAR/NEAR kernel wins in fast
    # regimes, the round-4 grouped kernel in slow ones). So the two
    # production kernels are timed in INTERLEAVED rounds on the same
    # streams — drift hits both equally — the headline is the better of
    # the two in THIS run (what a deployment-time autotuner picks), and
    # the round-over-round claim is the RATIO vs the r4 control (VERDICT
    # r4 task 4), reported whether it favors us or not.
    vs_r4 = None
    if not on_tpu:
        dec_gbps = time_decode(enc_streams, raw, on_tpu, "own", metrics)
    else:
        from snappy_tpu.ops import pallas_decode_r4

        cmax, comp_np, clens_np = pack_streams(enc_streams, pallas_decode.COMP_PAD)
        dargs = (
            jax.device_put(comp_np),
            jax.device_put(clens_np),
            jax.device_put(np.full(len(enc_streams), BLOCK_SIZE, np.int32)),
        )
        kernels = {
            "r5_farnear": pallas_decode.decode_blocks_jit(cmax, BLOCK_SIZE),
            "r4_grouped": pallas_decode_r4.decode_blocks_jit(cmax, BLOCK_SIZE),
        }
        for name, fn in kernels.items():
            o, k, _ = fn(*dargs)
            assert bool(np.asarray(k).all()), f"decode flagged corrupt ({name})"
            assert np.asarray(o).tobytes() == raw[: len(enc_streams) * BLOCK_SIZE], name
        rounds = {n: [] for n in kernels}
        for _ in range(3):
            for name, fn in kernels.items():
                rounds[name].append(time_dispatch_stats(fn, dargs, iters=3)["min"])
        best_t = {n: min(ts) for n, ts in rounds.items()}
        nbytes = len(enc_streams) * BLOCK_SIZE
        gbps = {n: nbytes / t / 1e9 for n, t in best_t.items()}
        vs_r4 = gbps["r5_farnear"] / gbps["r4_grouped"]
        metrics.add(
            stage="decode_own",
            gbps_per_chip=gbps["r5_farnear"],
            seconds_per_batch=best_t["r5_farnear"],
            rounds_ms={n: [round(t * 1e3, 2) for t in ts] for n, ts in rounds.items()},
            hbm_roofline_frac=gbps["r5_farnear"] * 1.5 / HBM_GBPS,
            kernel="pallas",
        )
        metrics.add(
            stage="decode_own_r4control",
            gbps_per_chip=gbps["r4_grouped"],
            seconds_per_batch=best_t["r4_grouped"],
            vs_r4_same_run=vs_r4,
            kernel="pallas_r4_pinned",
        )
        picked = max(gbps, key=gbps.get)
        dec_gbps = gbps[picked]
        metrics.add(stage="decode_own_autotuned", gbps_per_chip=dec_gbps, picked=picked)

    line = {
        "metric": "device_decompress_throughput",
        "value": round(dec_gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(dec_gbps / BASELINE_DECODE_GBPS, 2),
        "vs_target": round(dec_gbps / TARGET_DECODE_GBPS, 4),
    }
    if vs_r4 is not None:
        line["vs_r4_same_run"] = round(vs_r4, 3)
    print(json.dumps(line), flush=True)

    # ---- secondary: decode of a FOREIGN raw stream (native host greedy
    # encoder, ONE stream over the whole batch), segmented exactly the way
    # the production raw path does it (ops/host.py fast path: native
    # scan_blocks finds the 64 KiB-output tag boundaries) — the wire-parity
    # number for arbitrary snappy input.
    if os.environ.get("BENCH_FOREIGN", "1") != "0":
        from snappy_tpu.cpu import oracle
        from snappy_tpu.native import runtime as nat

        if nat.available():
            stream = nat.compress(raw[: BATCH * BLOCK_SIZE])
            ulen, hdr = nat.uncompressed_length(stream)
            body = stream[hdr:]
            starts, oplens = nat.scan_blocks(body, ulen)
            assert len(starts) == BATCH and (np.asarray(oplens) == BLOCK_SIZE).all()
            bounds = list(starts) + [len(body)]
            foreign = [body[bounds[i] : bounds[i + 1]] for i in range(len(starts))]
        else:
            host_enc = oracle.compress
            foreign = []
            for i in range(BATCH):
                s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
                _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
                foreign.append(s[hdr:])
        if not on_tpu:
            time_decode(foreign, raw, on_tpu, "foreign", metrics)
        else:
            # same two-kernel interleaved autotune as the headline
            from snappy_tpu.ops import pallas_decode_r4

            cmaxf, compf, clensf = pack_streams(foreign, pallas_decode.COMP_PAD)
            fargs = (
                jax.device_put(compf),
                jax.device_put(clensf),
                jax.device_put(np.full(len(foreign), BLOCK_SIZE, np.int32)),
            )
            fkernels = {
                "r5_farnear": pallas_decode.decode_blocks_jit(cmaxf, BLOCK_SIZE),
                "r4_grouped": pallas_decode_r4.decode_blocks_jit(cmaxf, BLOCK_SIZE),
            }
            for name, fn in fkernels.items():
                o, k, _ = fn(*fargs)
                assert bool(np.asarray(k).all()) and np.asarray(o).tobytes() == raw, name
            frounds = {n: [] for n in fkernels}
            for _ in range(2):
                for name, fn in fkernels.items():
                    frounds[name].append(time_dispatch_stats(fn, fargs, iters=3)["min"])
            fgbps = {n: len(foreign) * BLOCK_SIZE / min(ts) / 1e9 for n, ts in frounds.items()}
            fpick = max(fgbps, key=fgbps.get)
            metrics.add(
                stage="decode_foreign",
                gbps_per_chip=fgbps[fpick],
                picked=fpick,
                per_kernel_gbps={n: round(v, 4) for n, v in fgbps.items()},
                hbm_roofline_frac=fgbps[fpick] * 1.5 / HBM_GBPS,
                kernel="pallas(autotuned)",
            )

    # ---- fallback cliff: the windowed XLA decoder on a hostile-but-valid
    # stream that defeats segmentation (one >128 KiB literal up front, then
    # far back-references). The fast path refuses such streams; this stage
    # commits the measured depth of the cliff they fall off (VERDICT r4
    # "missing" #4). Small stream (4 MiB): the windowed path is slow by
    # design and the number is the point.
    if os.environ.get("BENCH_WINDOWED", "1") != "0":
        big_lit = np.frombuffer(corpus_stream(200_000), np.uint8)
        parts = [bytes([62 << 2]) + (len(big_lit) - 1).to_bytes(3, "little") + big_lit.tobytes()]
        out_len = len(big_lit)
        target = 2 << 20  # the fallback runs ~70 KB/s: keep the stage bounded
        ncopies = (target - out_len) // 64
        # COPY_4 len 64, offset 150000: far back-references after a >128 KiB
        # literal — the segmenter (correctly) refuses this shape
        parts.append(bytes([(63 << 2) | 3] + list((150_000).to_bytes(4, "little"))) * ncopies)
        out_len += 64 * ncopies
        hostile = varint.encode32(out_len) + b"".join(parts)
        # expected bytes, built directly (oracle on 4 MB would dominate)
        exp = np.empty(out_len, np.uint8)
        exp[: len(big_lit)] = big_lit
        o = len(big_lit)
        while o < out_len:
            n = min(64, out_len - o)
            exp[o : o + n] = exp[o - 150_000 : o - 150_000 + n]
            o += n
        hdr_len = len(varint.encode32(out_len))
        t0 = time.perf_counter()
        out_h = decode_xla.decode_raw_windowed(
            np.frombuffer(hostile, np.uint8), out_len, hdr_len
        )
        t_h = time.perf_counter() - t0
        assert out_h == exp.tobytes(), "windowed fallback mismatch"
        metrics.add(
            stage="decode_windowed_fallback",
            bytes=out_len,
            gbps=out_len / t_h / 1e9,
            note="hostile valid stream (unsegmentable): sequential windowed "
            "XLA fallback; every conformant stream still decodes",
        )

    # ---- large config, device-resident kernel rate (the reference's 644 MB
    # "large" scale, reference README.md:45). The dev setup's host<->device
    # tunnel runs ~40 MB/s — hauling 644 MB through it measures the tunnel,
    # not the codec (a production PCIe/ICI-attached host moves >10 GB/s) —
    # so this stage cycles the uploaded batch through chained async
    # dispatches to the target byte count and times pure device work. The
    # stream_large stage below keeps the honest end-to-end-through-the-
    # tunnel number.
    large_bytes = int(os.environ.get("BENCH_LARGE_BYTES", 64 << 20))
    if on_tpu and large_bytes > 0 and enc_streams is not None:
        # DISTINCT device-resident batches: the whole large stream lives in
        # HBM (encoded on device once, one batch per chunk), so the timed
        # decode touches large_bytes of distinct frames — real HBM
        # residency, not one 8 MiB batch cycled. Device memory: ~2 bytes
        # per stream byte (raw batch + compressed batches), fine to ~4 GB.
        cmax_l, comp0, clens0 = pack_streams(enc_streams, pallas_decode.COMP_PAD)
        dec_l = pallas_decode.decode_blocks_jit(cmax_l, BLOCK_SIZE)
        dulens_l = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
        loops = -(-large_bytes // (BATCH * BLOCK_SIZE))
        lraw = corpus_stream(loops * BATCH * BLOCK_SIZE)
        slice_w = cmax_l  # decoder width bucket; encoder output is wider
        dcomps, dclenss, dbufs = [], [], []
        for k in range(loops):
            chunk = np.frombuffer(
                lraw[k * BATCH * BLOCK_SIZE : (k + 1) * BATCH * BLOCK_SIZE], np.uint8
            )
            bufk = np.zeros((BATCH, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
            bufk[:, :BLOCK_SIZE] = chunk.reshape(BATCH, BLOCK_SIZE)
            dbufk = jax.device_put(bufk)
            outk, olensk = enc(dbufk, jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32)))
            olns = np.asarray(olensk)
            assert int(olns.max()) <= slice_w - pallas_decode.COMP_PAD, "cmax bucket too small"
            # device-side slice into the decoder's width bucket; bytes past
            # each stream's clen are garbage the parse pads/masks out
            dcomps.append(jnp.asarray(outk[:, :slice_w]))
            dclenss.append(jnp.asarray(olns.astype(np.int32)))
            dbufs.append(dbufk)
        # correctness gate on a sampled batch
        outs, oks, _ = dec_l(dcomps[0], dclenss[0], dulens_l)
        assert bool(np.asarray(oks).all())
        assert np.asarray(outs).tobytes() == lraw[: BATCH * BLOCK_SIZE]
        t0 = time.perf_counter()
        for k in range(loops):
            out = dec_l(dcomps[k], dclenss[k], dulens_l)
        fence(out)
        t_dec = time.perf_counter() - t0
        gbps_dec = loops * BATCH * BLOCK_SIZE / t_dec / 1e9

        dlens_l = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))
        t0 = time.perf_counter()
        for k in range(loops):
            oute = enc(dbufs[k], dlens_l)
        fence(oute)
        t_enc = time.perf_counter() - t0
        gbps_enc = loops * BATCH * BLOCK_SIZE / t_enc / 1e9
        del dcomps, dbufs
        metrics.add(
            stage="large_device",
            bytes=loops * BATCH * BLOCK_SIZE,
            compress_gbps=gbps_enc,
            uncompress_gbps=gbps_dec,
            uncompress_roofline_frac=gbps_dec * 1.5 / HBM_GBPS,
            note="device-resident kernel rate over DISTINCT HBM-resident "
            "batches covering the full byte count (dev tunnel excluded)",
        )

    # ---- streaming pipeline stage (the reference's 644 MB "large" config,
    # reference README.md:45): frames through parallel/streaming.py with
    # read/compute/write overlap. Default 64 MiB per driver run; set
    # BENCH_STREAM_BYTES=676000000 for the full large-config run.
    stream_cfg = int(os.environ.get("BENCH_STREAM_BYTES", 64 << 20))
    if stream_cfg > 0:
        import io

        from snappy_tpu.parallel import streaming

        sraw = corpus_stream(stream_cfg)
        src = io.BytesIO(sraw)
        comp_buf = io.BytesIO()
        # warm the kernels on one full frame (first frame compiles)
        warm = io.BytesIO()
        streaming.compress_stream(io.BytesIO(sraw[: BATCH * BLOCK_SIZE]), warm, blocks_per_frame=BATCH)
        warm.seek(0)
        streaming.uncompress_stream(warm, io.BytesIO())
        t0 = time.perf_counter()
        csize = streaming.compress_stream(src, comp_buf, blocks_per_frame=BATCH)
        t_c = time.perf_counter() - t0
        comp_buf.seek(0)
        out_buf = io.BytesIO()
        t0 = time.perf_counter()
        n = streaming.uncompress_stream(comp_buf, out_buf)
        t_u = time.perf_counter() - t0
        assert n == len(sraw) and out_buf.getvalue() == sraw, "streaming round-trip mismatch"
        metrics.add(
            stage="stream_large",
            bytes=len(sraw),
            ratio=csize / len(sraw),
            compress_gbps=len(sraw) / t_c / 1e9,
            uncompress_gbps=len(sraw) / t_u / 1e9,
            uncompress_roofline_frac=(len(sraw) / t_u / 1e9) * 1.5 / HBM_GBPS,
            blocks_per_frame=BATCH,
            retries=streaming.last_stats.get("retries", 0),
        )

    # ---- scaling model (from the committed virtual-mesh artifact; see
    # benchmarks/scaling.py for why raw virtual-mesh efficiency is
    # timesharing noise and the collective share is the honest metric).
    scal_path = os.path.join(REPO, "benchmarks", "scaling_last.json")
    if os.path.exists(scal_path):
        try:
            with open(scal_path) as f:
                scal = json.load(f)
            coll = scal.get("collective", {})
            if "model_scaling_efficiency" in coll:
                metrics.add(
                    stage="scaling_model",
                    collective_share=coll.get("collective_share"),
                    model_scaling_efficiency=coll.get("model_scaling_efficiency"),
                    source="benchmarks/scaling_last.json",
                )
        except Exception:
            pass

    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    metrics.dump(os.path.join(REPO, "benchmarks", "report_last.json"))


if __name__ == "__main__":
    main()
