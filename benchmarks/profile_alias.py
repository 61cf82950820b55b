"""Does Mosaic serialize VMEM loads against earlier stores to the same ref?

Variants of the recmove8 floor loop (benchmarks/profile_floor.py):
  sep      — loads from comp_ref, RMW store to out_ref (different refs; floor)
  same     — loads from out_ref rows far from the store rows (same ref,
             provably disjoint dynamic rows)
  sepmask  — like sep but masked store (pltpu.store), no current-row read
  samemask — like same but masked store
If `same` is much slower than `sep`, Mosaic orders load-after-store on a
ref regardless of actual overlap — which dictates the drain design
(partition literal/copy records; keep hot rows in registers).
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

from bench import time_dispatch

LANES = 128
BATCH = int(os.environ.get("PROF_BATCH", "128"))
NREC = 8192
NRC = 256
NRU = 256
CLOCK_GHZ = float(os.environ.get("PROF_CLOCK_GHZ", "0.94"))


def _kernel(s_ref, o_ref, comp_ref, out_ref, meta_ref, *, variant, unroll):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def one(t):
        so = s_ref[0, 0, t]
        o = o_ref[0, 0, t]
        s = so & 0x3FFFF
        ln = so >> 18
        d = o - s
        ph = (-d) & 127
        shift = (LANES - ph) & 127
        qr = s >> 7
        if variant.startswith("same"):
            # rows [0, 128) of out_ref; stores land in [128, 256)
            a = out_ref[0, jnp.clip(qr, 0, 127), :].reshape(1, LANES)
            b2 = out_ref[0, jnp.clip(qr + 1, 0, 127), :].reshape(1, LANES)
        else:
            a = comp_ref[0, jnp.clip(qr, 0, NRC - 1), :].reshape(1, LANES)
            b2 = comp_ref[0, jnp.clip(qr + 1, 0, NRC - 1), :].reshape(1, LANES)
        m = pltpu.roll(jnp.where(lane >= ph, a, b2), shift, 1)
        dr = 128 + ((t * 7) & 127)
        keep = (lane >= (o & 127)) & (lane <= ((o + ln - 1) & 127))
        if variant.endswith("mask"):
            pltpu.store(out_ref.at[0, dr, :], m.reshape(LANES), mask=keep.reshape(LANES))
        else:
            cur = out_ref[0, dr, :].reshape(1, LANES)
            out_ref[0, dr, :] = jnp.where(keep, m, cur).reshape(LANES)

    def body(i, _):
        base = i * unroll
        for k in range(unroll):
            one(base + k)
        return 0

    jax.lax.fori_loop(0, NREC // unroll, body, 0, unroll=False)
    meta_ref[0, 0, 0] = 1


def build(variant, unroll=8):
    kernel = functools.partial(_kernel, variant=variant, unroll=unroll)

    @jax.jit
    def fn(s, o, comp):
        b = s.shape[0]
        out, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, NREC), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, NREC), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NRC, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, NRU, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, NRU, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
        )(s, o, comp)
        return out, meta

    return fn


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)
    s_np = (rng.integers(0, 120 * 128, (BATCH, 1, NREC)) | (rng.integers(1, 64, (BATCH, 1, NREC)) << 18)).astype(np.int32)
    o_np = rng.integers(0, 127 * 128, (BATCH, 1, NREC)).astype(np.int32)
    comp_np = rng.integers(0, 255, (BATCH, NRC, LANES)).astype(np.int32)
    ds = jax.device_put(s_np)
    do = jax.device_put(o_np)
    dc = jax.device_put(comp_np)
    nrec_total = BATCH * NREC
    for variant in ("sep", "same", "sepmask", "samemask"):
        fn = build(variant)
        t = time_dispatch(fn, (ds, do, dc))
        print(
            f"{variant:9s}: {t*1e3:8.3f} ms  {t/nrec_total*CLOCK_GHZ*1e9:6.1f} cyc/rec",
            flush=True,
        )


if __name__ == "__main__":
    main()
