"""Prototype: dual-stream interleaved copy drain.

Hypothesis: the copy drain's per-group cost is dominated by (a) the
load-after-store ordering stall on the single out ref and (b) the scalar
dependency chains of field math + dynamic row addressing. Interleaving
the group loop of TWO blocks whose outputs live in SEPARATE refs should
hide A's stall under B's work (Mosaic orders loads only against stores
to the SAME ref) and double the independent scalar chains.

Variants:
  batch16  — single-stream groups of 16 (the shipped design), baseline.
  dual16   — two streams, alternating groups of 16 between them.

Timing-only (hazards unhandled), on real corpus record geometry.
"""

from __future__ import annotations

import functools
import os
import sys

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
from bench import time_dispatch
from profile_drains import host_records

LANES = 128
BATCH = int(os.environ.get("PROF_BATCH", "128"))
NRU = BLOCK_SIZE // LANES
CLOCK_GHZ = float(os.environ.get("PROF_CLOCK_GHZ", "0.94"))
GROUP = 16


def _stream_ops(s_ref, o_ref, n_ref, out_ref, lane):
    def fields(t):
        s = s_ref[0, 0, t]
        o = o_ref[0, 0, t]
        n = n_ref[0, 0, t]
        d = o - s
        ph = (-d) & 127
        shift = (LANES - ph) & 127
        return o, n, d, ph, shift

    def make_m(d, ph, shift, r):
        qr = (r * LANES - d) >> 7
        a = out_ref[0, jnp.clip(qr, 0, NRU - 1), :].reshape(1, LANES)
        b = out_ref[0, jnp.clip(qr + 1, 0, NRU - 1), :].reshape(1, LANES)
        return pltpu.roll(jnp.where(lane >= ph, a, b), shift, 1)

    def store(r, m, keep):
        pltpu.store(out_ref.at[0, jnp.clip(r, 0, NRU - 1), :], m.reshape(LANES), mask=keep.reshape(LANES))

    def group(base, nt):
        ms = []
        for k in range(GROUP):
            t = jnp.minimum(base + k, nt - 1)
            o, n, d, ph, shift = fields(t)
            r = o >> 7
            lo = o & 127
            m = make_m(d, ph, shift, r)
            keep = (lane >= lo) & (lane < lo + n)
            m2 = make_m(d, ph, shift, r + 1)
            keep2 = lane < lo + n - LANES
            ms.append((r, m, keep, m2, keep2))
        for r, m, keep, m2, keep2 in ms:
            store(r, m, keep)
            store(r + 1, m2, keep2)

    return group


def _kernel(ntA_ref, sA, oA, nA, preA, ntB, sB, oB, nB, preB, outA, outB, meta, *, dual):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    nta = ntA_ref[0, 0, 0]
    ntb = ntB[0, 0, 0]

    def cp(i, _):
        outA[0, i, :] = preA[0, i, :]
        outB[0, i, :] = preB[0, i, :]
        return 0

    jax.lax.fori_loop(0, NRU, cp, 0, unroll=False)

    ga = _stream_ops(sA, oA, nA, outA, lane)
    gb = _stream_ops(sB, oB, nB, outB, lane)

    if dual:
        def body(g, _):
            base = g * GROUP
            ga(base, nta)
            gb(base, ntb)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(jnp.maximum(nta, ntb), GROUP), body, 0, unroll=False)
    else:
        def bodyA(g, _):
            ga(g * GROUP, nta)
            return 0

        def bodyB(g, _):
            gb(g * GROUP, ntb)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(nta, GROUP), bodyA, 0, unroll=False)
        jax.lax.fori_loop(0, pl.cdiv(ntb, GROUP), bodyB, 0, unroll=False)

    meta[0, 0, 0] = nta + ntb


def build(nrec, dual):
    kernel = functools.partial(_kernel, dual=dual)

    @jax.jit
    def fn(ntA, sA, oA, nA, preA, ntB, sB, oB, nB, preB):
        b = ntA.shape[0]
        smem1 = lambda: pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
        smemr = lambda: pl.BlockSpec((1, 1, nrec), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
        vmem = lambda: pl.BlockSpec((1, NRU, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        outA, outB, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[smem1(), smemr(), smemr(), smemr(), vmem(),
                      smem1(), smemr(), smemr(), smemr(), vmem()],
            out_specs=(vmem(), vmem(), pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((b, NRU, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, NRU, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
        )(ntA, sA, oA, nA, preA, ntB, sB, oB, nB, preB)
        return outA, outB, meta

    return fn


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    pre, ref, recs = host_records()
    ncpy = np.array([len(r) for r in recs], np.int32)
    total = int(ncpy.sum())
    nrec = -(-int(ncpy.max()) // 512) * 512
    s_np = np.zeros((BATCH, nrec), np.int32)
    o_np = np.zeros((BATCH, nrec), np.int32)
    n_np = np.zeros((BATCH, nrec), np.int32)
    for i, r in enumerate(recs):
        if r:
            a = np.array(r, np.int32)
            s_np[i, : len(r)] = a[:, 0]
            o_np[i, : len(r)] = a[:, 1]
            n_np[i, : len(r)] = a[:, 2]
    print(f"copy recs/block avg {total/BATCH:.0f}, nrec={nrec}", flush=True)
    h = BATCH // 2

    def half(x, lo, hi):
        return jax.device_put(x[lo:hi])

    args = (
        half(ncpy.reshape(BATCH, 1, 1), 0, h),
        half(s_np.reshape(BATCH, 1, nrec), 0, h),
        half(o_np.reshape(BATCH, 1, nrec), 0, h),
        half(n_np.reshape(BATCH, 1, nrec), 0, h),
        half(pre.astype(np.int32).reshape(BATCH, NRU, LANES), 0, h),
        half(ncpy.reshape(BATCH, 1, 1), h, BATCH),
        half(s_np.reshape(BATCH, 1, nrec), h, BATCH),
        half(o_np.reshape(BATCH, 1, nrec), h, BATCH),
        half(n_np.reshape(BATCH, 1, nrec), h, BATCH),
        half(pre.astype(np.int32).reshape(BATCH, NRU, LANES), h, BATCH),
    )
    for name, dual in (("batch16", False), ("dual16", True)):
        fn = build(nrec, dual)
        fn(*args)  # warm
        t = time_dispatch(fn, args)
        print(
            f"{name:8s}: {t*1e3:8.3f} ms  {t/total*CLOCK_GHZ*1e9:6.1f} cyc/rec  "
            f"{BATCH*BLOCK_SIZE/t/1e9:.3f} GB/s-equiv",
            flush=True,
        )


if __name__ == "__main__":
    main()
