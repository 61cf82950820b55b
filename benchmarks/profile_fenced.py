"""Fenced microbenchmark of the XLA primitives the decode/encode prepasses
lean on. `block_until_ready` does not fence device work on the tunnelled
TPU (see bench.py), so every measurement here is fenced by pulling one
device-side element to host, with the fence cost calibrated out.

Diagnostic tool, not part of the test suite.
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


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, args, iters=5):
    out = fn(*args)
    fence(out)
    fs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(out)
        fs.append(time.perf_counter() - t0)
    fs.sort()
    fcost = fs[len(fs) // 2]
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        times.append(time.perf_counter() - t0 - fcost)
    return max(min(times), 1e-9)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    B, N = 128, 65536
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, N), 0, N, jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, N, jnp.int32)

    def report(name, t, elems):
        print(f"{name}: {t*1e3:.3f} ms  ({elems/t/1e9:.2f} Gelem/s)", flush=True)

    g = jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=-1))
    report(f"take_along_axis [{B},{N}]", timeit(g, (x, idx)), B * N)

    s1 = jax.jit(lambda a: jnp.sort(a, axis=-1))
    report(f"sort1 [{B},{N}]", timeit(s1, (x,)), B * N)

    s3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=-1, num_keys=2))
    report(f"sort3/2keys [{B},{N}]", timeit(s3, (x, idx, x)), B * N)

    cs = jax.jit(lambda a: jnp.cumsum(a, axis=-1))
    report(f"cumsum [{B},{N}]", timeit(cs, (x,)), B * N)

    ss = jax.jit(lambda k, q: jax.vmap(lambda kk, qq: jnp.searchsorted(kk, qq, side="right"))(k, q))
    keys = jnp.sort(x, axis=-1)
    report(f"searchsorted [{B},{N}]", timeit(ss, (keys, idx)), B * N)

    def fix(s):
        def body(_, ss):
            return jnp.take_along_axis(ss, ss, axis=-1)
        return jax.lax.fori_loop(0, 17, body, s)

    src = jnp.minimum(idx, jnp.arange(N, dtype=jnp.int32)[None, :])
    report(f"17x chained gather [{B},{N}]", timeit(jax.jit(fix), (src,)), 17 * B * N)

    # the isolate()-fenced gather the decode path actually uses
    from snappy_tpu.ops.primitives import isolate

    def giso(a, i):
        a, i = isolate(a, i)
        return isolate(jnp.take_along_axis(a, i, axis=-1))

    report(f"isolated gather [{B},{N}]", timeit(jax.jit(giso), (x, idx)), B * N)

    # orbit-shaped: gather jump at doubling orbit widths + jump squaring
    def orbit_like(jump):
        b, n = jump.shape
        orbit = jnp.zeros((b, 1), jnp.int32)
        for _ in range(16):
            orbit = jnp.concatenate([orbit, jnp.take_along_axis(jump, jnp.minimum(orbit, n - 1), axis=-1)], axis=-1)
            jump = jnp.take_along_axis(jump, jnp.minimum(jump, n - 1), axis=-1)
        return orbit

    jump = jnp.minimum(idx + 2, N - 1)
    report(f"orbit16 [{B},{N}]", timeit(jax.jit(orbit_like), (jump,)), 16 * B * N)


if __name__ == "__main__":
    main()
