"""Decode-kernel variant microbenchmark (diagnostic, not in the suite).

Variants:
  full      current pallas_decode kernel
  walk      tag walk only: scalar chain + corruption checks, no byte moves
  walklit   walk + literal moves (copies counted but not materialized)

Numbers guide kernel optimization: the gap full-walk is the vector-move
cost; walk alone is the scalar-core floor of the sequential design.
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import pallas_decode
from snappy_tpu.ops.pallas_decode import COMP_PAD, F_MASK, LANES, parse_packed
from bench import corpus_stream, fence, time_dispatch


def time_meta(fn, args, iters: int = 7):
    """Robust dispatch timing: fence on the LAST tree leaf (meta, written at
    kernel end), report (min, median) seconds over iters."""
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = np.asarray(leaf.reshape(-1)[-1:])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = np.asarray(leaf.reshape(-1)[-1:])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], times[len(times) // 2]

BATCH = int(os.environ.get("PROF_BATCH", "128"))


def _variant_kernel(clen_ref, ulen_ref, px_ref, comp_ref, out_ref, meta_ref, *, nrc, nru, moves):
    clen = clen_ref[0, 0, 0]
    ulen = ulen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def make_move(ref, nrows):
        def span(q, ph, shift):
            qr = q >> 7
            a = ref[0, jnp.clip(qr, 0, nrows - 1), :].reshape(1, LANES)
            b = ref[0, jnp.clip(qr + 1, 0, nrows - 1), :].reshape(1, LANES)
            return pltpu.roll(jnp.where(lane >= ph, a, b), shift, 1)

        def move(s, o, length):
            d = o - s
            ph = (-d) & 127
            shift = (LANES - ph) & 127
            r0 = o >> 7
            r1 = (o + length - 1) >> 7
            lo = o & 127
            hi = (o + length - 1) & 127

            def edge_row(dr, lane_lo, lane_hi):
                m = span(dr * LANES - d, ph, shift)
                drc = jnp.clip(dr, 0, nru - 1)
                cur = out_ref[0, drc, :].reshape(1, LANES)
                keep = (lane >= lane_lo) & (lane <= lane_hi)
                out_ref[0, drc, :] = jnp.where(keep, m, cur).reshape(LANES)

            def one_row(_):
                edge_row(r0, lo, hi)

            def multi_row(_):
                edge_row(r0, lo, LANES - 1)

                def mid(r, _):
                    dr = r0 + r
                    out_ref[0, jnp.clip(dr, 0, nru - 1), :] = span(dr * LANES - d, ph, shift).reshape(LANES)
                    return 0

                jax.lax.fori_loop(1, r1 - r0, mid, 0, unroll=False)
                edge_row(r1, 0, hi)

            jax.lax.cond(r1 == r0, one_row, multi_row, 0)

        return move

    move_lit = make_move(comp_ref, nrc)
    move_out = make_move(out_ref, nru)

    def tag_step(state):
        ip, op, ok = state
        px = px_ref[0, 0, ip]
        is_copy = px >= (1 << 30)
        taglen = (px >> 27) & 7
        f = px & F_MASK
        cp_len = ((px >> 17) & 0x7F) + 1

        length = jnp.where(is_copy, cp_len, f)
        consumed = 1 + taglen + jnp.where(is_copy, 0, f)
        ok_lit = ip + consumed <= clen
        ok_copy = (f > 0) & (f <= op) & (ip + 1 + taglen <= clen)
        tag_ok = jnp.where(is_copy, ok_copy, ok_lit) & (op + length <= ulen)

        if moves == 3:
            # timing-only variant: same vector op count/shape per tag as a
            # one-row move, but write row rotates (no same-row RAW hazard)
            # and source is comp (never freshly written).
            @pl.when(tag_ok)
            def _():
                dr = (ip * 7) & 255
                q = ip
                d = op - q
                ph = (-d) & 127
                shift = (LANES - ph) & 127
                qr = q >> 7
                a = comp_ref[0, jnp.clip(qr, 0, nrc - 1), :].reshape(1, LANES)
                b2 = comp_ref[0, jnp.clip(qr + 1, 0, nrc - 1), :].reshape(1, LANES)
                m = pltpu.roll(jnp.where(lane >= ph, a, b2), shift, 1)
                drc = jnp.clip(dr, 0, nru - 1)
                cur = out_ref[0, drc, :].reshape(1, LANES)
                keep = (lane >= (op & 127)) & (lane <= ((op + length - 1) & 127))
                out_ref[0, drc, :] = jnp.where(keep, m, cur).reshape(LANES)

        if moves == 4:
            # same as 3 but a FIXED row and accumulate-in-place: isolates
            # the same-row RAW hazard cost.
            @pl.when(tag_ok)
            def _():
                q = ip
                d = op - q
                ph = (-d) & 127
                shift = (LANES - ph) & 127
                qr = q >> 7
                a = comp_ref[0, jnp.clip(qr, 0, nrc - 1), :].reshape(1, LANES)
                b2 = comp_ref[0, jnp.clip(qr + 1, 0, nrc - 1), :].reshape(1, LANES)
                m = pltpu.roll(jnp.where(lane >= ph, a, b2), shift, 1)
                cur = out_ref[0, 0, :].reshape(1, LANES)
                keep = (lane >= (op & 127)) & (lane <= ((op + length - 1) & 127))
                out_ref[0, 0, :] = jnp.where(keep, m, cur).reshape(LANES)

        if moves == 1 or moves == 2:
            @pl.when(tag_ok & ~is_copy)
            def _():
                move_lit(ip + 1 + taglen, op, f)

        if moves >= 2 and moves != 3 and moves != 4:
            @pl.when(tag_ok & is_copy)
            def _():
                n0 = jnp.minimum(f, cp_len)
                move_out(op - f, op, n0)

                def dbl(done):
                    n = jnp.minimum(done, cp_len - done)
                    move_out(op, op + done, n)
                    return done + n

                jax.lax.while_loop(lambda done: done < cp_len, dbl, n0)

        return ip + consumed, op + length, ok & tag_ok

    ip, op, ok = jax.lax.while_loop(
        lambda s: (s[0] < clen) & s[2], tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    )
    meta_ref[0, 0, 0] = (ok & (op == ulen)).astype(jnp.int32)
    meta_ref[0, 0, 1] = op


def build_variant(cmax_padded, out_size, moves):
    nru = out_size // LANES
    nrc = -(-cmax_padded // LANES) + 1
    nc = cmax_padded - COMP_PAD
    kernel = functools.partial(_variant_kernel, nrc=nrc, nru=nru, moves=moves)

    @jax.jit
    def fn(comp_u8, clens, ulens):
        b = comp_u8.shape[0]
        px = parse_packed(comp_u8).reshape(b, 1, nc)
        pad = nrc * LANES - comp_u8.shape[1]
        comp_i32 = jnp.pad(comp_u8, ((0, 0), (0, pad))).astype(jnp.int32).reshape(b, nrc, LANES)
        out_rows, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nrc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, nru, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, nru, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
        )(clens.reshape(b, 1, 1), ulens.reshape(b, 1, 1), px, comp_i32)
        return out_rows, meta

    return fn


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
    cmax = -(-(max(len(s) for s in streams) + COMP_PAD) // 512) * 512
    comp_np = np.zeros((BATCH, cmax), np.uint8)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = np.frombuffer(s, np.uint8)
    dcomp = jax.device_put(comp_np)
    dclens = jax.device_put(np.array([len(s) for s in streams], np.int32))
    dulens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

    # XLA prepass alone (parse_packed)
    pp = jax.jit(lambda c: parse_packed(c))
    tmin, tmed = time_meta(pp, (dcomp,))
    print(f"parse_packed prepass: {tmin*1e3:8.3f} / {tmed*1e3:8.3f} ms (min/med)", flush=True)

    for name, moves in [("walk", 0), ("walklit", 1), ("full", 2), ("rotrow", 3), ("fixrow", 4)]:
        fn = build_variant(cmax, BLOCK_SIZE, moves)
        tmin, tmed = time_meta(fn, (dcomp, dclens, dulens))
        gbps = BATCH * BLOCK_SIZE / tmed / 1e9
        print(
            f"{name:8s}: {tmin*1e3:8.3f} / {tmed*1e3:8.3f} ms  {gbps:6.3f} GB/s  ({tmed/BATCH*1e6:7.1f} us/block)",
            flush=True,
        )

    # library kernel end-to-end for reference
    dec = pallas_decode.decode_blocks_jit(cmax, BLOCK_SIZE)
    tmin, tmed = time_meta(dec, (dcomp, dclens, dulens))
    print(f"library : {tmin*1e3:8.3f} / {tmed*1e3:8.3f} ms  {BATCH*BLOCK_SIZE/tmed/1e9:6.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
