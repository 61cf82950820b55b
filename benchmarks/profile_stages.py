"""Microbenchmark: primitive throughputs + decoder stage timings on the
current device. Diagnostic tool, not part of the test suite."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.ops import decode_xla, encode_xla


def timeit(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    B, N = 32, 65536
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, N), 0, N, jnp.int32)
    idx = jax.random.randint(key, (B, N), 0, N, jnp.int32)

    gather2d = jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=-1))
    t = timeit(gather2d, (x, idx))
    print(f"take_along_axis [{B},{N}] i32: {t*1e3:.3f} ms  ({B*N/t/1e9:.2f} Gelem/s)", flush=True)

    sortfn = jax.jit(lambda a: jnp.sort(a, axis=-1))
    t = timeit(sortfn, (x,))
    print(f"sort [{B},{N}] i32: {t*1e3:.3f} ms  ({B*N/t/1e9:.2f} Gelem/s)", flush=True)

    cumsumfn = jax.jit(lambda a: jnp.cumsum(a, axis=-1))
    t = timeit(cumsumfn, (x,))
    print(f"cumsum [{B},{N}] i32: {t*1e3:.3f} ms  ({B*N/t/1e9:.2f} Gelem/s)", flush=True)

    ssfn = jax.jit(
        lambda k, q: jax.vmap(lambda kk, qq: jnp.searchsorted(kk, qq, side="right"))(k, q)
    )
    keys = jnp.sort(x, axis=-1)
    t = timeit(ssfn, (keys, idx))
    print(f"vmap searchsorted [{B},{N}] i32: {t*1e3:.3f} ms  ({B*N/t/1e9:.2f} Gelem/s)", flush=True)

    # fori_loop of 17 chained gathers (the fixpoint loop shape)
    def fix(s):
        def body(_, ss):
            return jnp.take_along_axis(ss, ss, axis=-1)
        return jax.lax.fori_loop(0, 17, body, s)

    fixj = jax.jit(fix)
    src = jnp.minimum(idx, jnp.arange(N, dtype=jnp.int32)[None, :])
    t = timeit(fixj, (src,))
    print(f"17x chained gather loop [{B},{N}]: {t*1e3:.3f} ms", flush=True)

    # ---- decoder stage timings on real compressed data
    from snappy_tpu.cpu import oracle
    from snappy_tpu.native import runtime as nat

    td = os.path.join(REPO, "testdata")
    raw = b""
    for n in ["alice29.txt", "html", "urls.10K", "lcet10.txt"]:
        raw += open(os.path.join(td, n), "rb").read()
    raw = (raw * 4)[: B * BLOCK_SIZE]
    host_enc = nat.compress if nat.available() else oracle.compress
    cmax = encode_xla.BLOCK_MAX_OUT
    comp_np = np.zeros((B, cmax + decode_xla.COMP_PAD), np.uint8)
    clens_np = np.zeros(B, np.int32)
    for i in range(B):
        s = host_enc(raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE])
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        body = s[hdr:]
        comp_np[i, : len(body)] = np.frombuffer(body, np.uint8)
        clens_np[i] = len(body)
    comp = jax.device_put(comp_np)
    clens = jax.device_put(clens_np)
    ulens = jax.device_put(np.full(B, BLOCK_SIZE, np.int32))
    starts = jnp.zeros_like(clens)
    nc = cmax
    nu = BLOCK_SIZE
    limit = nc + nu + 16

    # stage 1: parse_all_positions
    parse = jax.jit(lambda c: decode_xla.parse_all_positions(c, limit))
    t = timeit(parse, (comp,))
    print(f"parse_all_positions: {t*1e3:.3f} ms", flush=True)

    tt = parse(comp)
    pos = jnp.arange(nc, dtype=jnp.int32)[None, :]
    nxt = jnp.minimum(pos + tt["consumed"], nc)
    nxt = jax.block_until_ready(nxt)

    # stage 2: tag_orbit
    orbitfn = jax.jit(lambda s, nx: decode_xla.tag_orbit(s, nx, nc // 2 + 2))
    t = timeit(orbitfn, (starts, nxt))
    print(f"tag_orbit (incl sort): {t*1e3:.3f} ms", flush=True)

    # stage 3: full decode for reference
    dec = decode_xla.decode_blocks_jit(cmax + decode_xla.COMP_PAD, BLOCK_SIZE)
    t = timeit(dec, (comp, clens, ulens))
    print(f"full decode: {t*1e3:.3f} ms  ({B*BLOCK_SIZE/t/1e9:.4f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
