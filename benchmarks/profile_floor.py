"""Floor experiments for the decode redesign (diagnostic only).

  minwalk  — tag walk with a minimal body: 2 SMEM loads (consumed, length),
             2 SMEM record stores, 2 adds. Floor of phase-1.
  recmoves — loop over host-precomputed tag records, one-row move each to a
             rotating row (timing-only), unrolled x4. Floor of phase-2 when
             addresses are all known upfront (pipelinable).
  recmoves1 — same, no unroll (overlap attribution).
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
from snappy_tpu.ops.pallas_decode import COMP_PAD, LANES
from bench import corpus_stream, time_dispatch

BATCH = int(os.environ.get("PROF_BATCH", "128"))


# ---------------------------------------------------------------- minwalk
def _minwalk_kernel(clen_ref, cl_ref, rec_ref, meta_ref, *, nrec):
    clen = clen_ref[0, 0, 0]

    def step(state):
        ip, op, t = state
        v = cl_ref[0, 0, ip]
        rec_ref[0, 0, t] = ip
        return ip + (v & 0xFFFF), op + (v >> 16), t + 1

    ip, op, t = jax.lax.while_loop(
        lambda s: s[0] < clen, step, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    meta_ref[0, 0, 0] = t
    meta_ref[0, 0, 1] = op


def build_minwalk(nc, nrec):
    kernel = functools.partial(_minwalk_kernel, nrec=nrec)

    @jax.jit
    def fn(cl, clens):
        b = cl.shape[0]
        rec, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, nrec), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 1, nrec), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
        )(clens.reshape(b, 1, 1), cl.reshape(b, 1, nc))
        return rec, meta

    return fn


# ---------------------------------------------------------------- recmoves
def _recmoves_kernel(nt_ref, s_ref, o_ref, comp_ref, out_ref, meta_ref, *, nrc, nru, unroll):
    nt = nt_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def one(t):
        so = s_ref[0, 0, t]
        o = o_ref[0, 0, t]
        s = so & 0x3FFFF
        ln = so >> 18
        d = o - s
        ph = (-d) & 127
        shift = (LANES - ph) & 127
        q = s
        qr = q >> 7
        a = comp_ref[0, jnp.clip(qr, 0, nrc - 1), :].reshape(1, LANES)
        b2 = comp_ref[0, jnp.clip(qr + 1, 0, nrc - 1), :].reshape(1, LANES)
        m = pltpu.roll(jnp.where(lane >= ph, a, b2), shift, 1)
        dr = jnp.clip((t * 7) & 255, 0, nru - 1)
        cur = out_ref[0, dr, :].reshape(1, LANES)
        keep = (lane >= (o & 127)) & (lane <= ((o + ln - 1) & 127))
        out_ref[0, dr, :] = jnp.where(keep, m, cur).reshape(LANES)

    nchunk = pl.cdiv(nt, unroll)

    def body(i, _):
        base = i * unroll
        for k in range(unroll):
            one(jnp.minimum(base + k, nt - 1))
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0, unroll=False)
    meta_ref[0, 0, 0] = nt


def build_recmoves(nc, nrc, nrec, unroll):
    kernel = functools.partial(_recmoves_kernel, nrc=nrc, nru=256, unroll=unroll)

    @jax.jit
    def fn(nts, s, o, comp_i32):
        b = s.shape[0]
        out, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nrec), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nrec), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nrc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 256, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 256, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
        )(nts.reshape(b, 1, 1), s.reshape(b, 1, nrec), o.reshape(b, 1, nrec), comp_i32)
        return out, meta

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
        sb = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
        _, hdr = oracle.uncompressed_length(np.frombuffer(sb, np.uint8))
        streams.append(np.frombuffer(sb[hdr:], np.uint8))
    cmax = -(-(max(len(s) for s in streams) + COMP_PAD) // 512) * 512
    nc = cmax - COMP_PAD
    nrc = -(-cmax // LANES) + 1

    # host-side tag parse -> per-position packed consumed|length<<16 (both
    # saturated to 16 bits: timing experiment only) + per-tag records
    cl_np = np.ones((BATCH, nc), np.int32)
    recs_s = []
    recs_o = []
    ntags = np.zeros(BATCH, np.int32)
    for i, b in enumerate(streams):
        ip = 0
        op = 0
        rs, ro = [], []
        n = len(b)
        while ip < n:
            c = int(b[ip])
            kind = c & 3
            hi6 = c >> 2
            if kind == 0:
                extra = max(0, hi6 - 59)
                ln = (int.from_bytes(b[ip + 1 : ip + 1 + extra].tobytes(), "little") + 1) if extra else hi6 + 1
                consumed = 1 + extra + ln
                src = ip + 1 + extra
            elif kind == 1:
                ln = 4 + (hi6 & 7)
                consumed = 2
                src = max(0, ip - 64)
            elif kind == 2:
                ln = hi6 + 1
                consumed = 3
                src = max(0, ip - 64)
            else:
                ln = hi6 + 1
                consumed = 5
                src = max(0, ip - 64)
            cl_np[i, ip] = min(consumed, 0xFFFF) | (min(ln, 0x7FFF) << 16)
            rs.append(min(src, nc - 1) | (min(ln, 8000) << 18))
            ro.append(op)
            ip += consumed
            op += ln
        ntags[i] = len(rs)
        recs_s.append(rs)
        recs_o.append(ro)
    nrec = -(-int(ntags.max()) // 512) * 512
    s_np = np.zeros((BATCH, nrec), np.int32)
    o_np = np.zeros((BATCH, nrec), np.int32)
    for i in range(BATCH):
        s_np[i, : ntags[i]] = recs_s[i]
        o_np[i, : ntags[i]] = recs_o[i]
    comp_np = np.zeros((BATCH, nrc * LANES), np.uint8)
    for i, s in enumerate(streams):
        comp_np[i, : len(s)] = s
    comp_i32 = jax.device_put(comp_np.astype(np.int32).reshape(BATCH, nrc, LANES))
    clens = jax.device_put(np.array([len(s) for s in streams], np.int32))
    dcl = jax.device_put(cl_np)
    dnt = jax.device_put(ntags)
    ds = jax.device_put(s_np)
    do = jax.device_put(o_np)

    tags_total = int(ntags.sum())
    print(f"tags/block avg: {tags_total/BATCH:.0f}  nrec={nrec}", flush=True)

    fn = build_minwalk(nc, nrec)
    t = time_dispatch(fn, (dcl, clens))
    print(f"minwalk  : {t*1e3:8.3f} ms  ({t/tags_total*0.94e9*1e0:6.1f} cyc/tag  {BATCH*BLOCK_SIZE/t/1e9:.3f} GB/s-equiv)", flush=True)

    for unroll in (1, 4, 8):
        fn = build_recmoves(nc, nrc, nrec, unroll)
        t = time_dispatch(fn, (dnt, ds, do, comp_i32))
        print(
            f"recmove{unroll:<2d}: {t*1e3:8.3f} ms  ({t/tags_total*0.94e9:6.1f} cyc/tag  {BATCH*BLOCK_SIZE/t/1e9:.3f} GB/s-equiv)",
            flush=True,
        )


if __name__ == "__main__":
    main()
