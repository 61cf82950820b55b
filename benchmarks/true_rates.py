"""TRUE device-rate microbenchmarks (slope method).

Host-side timing through the axon tunnel is unreliable: per-call latency is
~24ms, D2H bandwidth ~40MB/s, and `block_until_ready` does not actually
fence device work, so naive timings can be off by 1000x in either
direction. This harness chains K data-dependent iterations of an op inside
ONE jitted call and reports (t(K_hi) - t(K_lo)) / (K_hi - K_lo): pure
device time per op, immune to dispatch/transfer noise.

Run:  python benchmarks/true_rates.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

B, N = 32, 65536
K_LO, K_HI = 1, 33


def sync_time(f, args, reps=3):
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(body, x, elems, label):
    """body: x -> x-like (data-dependent so iterations serialize)."""

    def chain(k):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, k, lambda i, a: body(a), x)

        return f

    t_lo = sync_time(chain(K_LO), (x,))
    t_hi = sync_time(chain(K_HI), (x,))
    per = (t_hi - t_lo) / (K_HI - K_LO)
    per = max(per, 1e-9)
    print(f"{label:44s} {per*1e3:9.3f} ms/op  ({elems/per/1e9:7.2f} Gelem/s)", flush=True)
    return per


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})  shape [{B},{N}]", flush=True)
    key = jax.random.PRNGKey(0)
    xi = jax.random.randint(key, (B, N), 0, N, jnp.int32)
    xf = jax.random.normal(key, (B, N), jnp.float32)
    el = B * N

    # --- elementwise baseline
    slope(lambda a: (a * 5 + 3) ^ (a >> 7), xi, el, "elementwise i32 (3 ops)")

    # --- cumsum / scan
    slope(lambda a: jnp.cumsum(a, axis=-1) & 0xFFFF, xi, el, "cumsum minor axis i32")
    slope(
        lambda a: jax.lax.associative_scan(jnp.add, a, axis=-1) & 0xFFFF,
        xi,
        el,
        "associative_scan add minor i32",
    )

    # --- static shifts on minor dim
    slope(
        lambda a: jnp.concatenate([a[..., 1:], a[..., :1]], axis=-1) + 1,
        xi,
        el,
        "shift-by-1 minor (concat)",
    )
    slope(lambda a: jnp.roll(a, 1, axis=-1) + 1, xi, el, "roll-by-1 minor")
    slope(lambda a: jnp.roll(a, 128, axis=-1) + 1, xi, el, "roll-by-128 minor")

    # --- gathers
    slope(
        lambda a: jnp.take_along_axis(a, a & (N - 1), axis=-1) | 1,
        xi,
        el,
        "gather [B,N]<-[B,N] tala i32",
    )
    tbl256 = jax.random.randint(key, (B, 256), 0, N, jnp.int32)

    def g256(a):
        return jnp.take_along_axis(
            jax.lax.optimization_barrier(jnp.broadcast_to(tbl256[0], (B, 256))), a & 255, axis=-1
        )

    slope(g256, xi, el, "gather [B,N]<-[B,256]")

    t1d = jax.random.randint(key, (B * N,), 0, B * N, jnp.int32)
    slope(lambda a: a[a & (B * N - 1)] | 1, t1d, el, "gather 1-D [BN]<-[BN]")

    # gather rows: x[T,128] idx[M] -> [M,128]
    rows = jax.random.normal(key, (4096, 128), jnp.float32)

    def growst(a):
        idx = (a[:, 0] & 4095).astype(jnp.int32)
        out = rows[idx]  # [B,128]
        return a.at[:, :128].add(out.astype(jnp.int32))

    slope(growst, xi, B * 128, "gather rows [B]<-[4096,128] (row DMA)")

    # --- scatter
    slope(
        lambda a: a.at[jnp.arange(B)[:, None], a & (N - 1)].max(a, mode="drop") | 1,
        xi,
        el,
        "scatter-max [B,N]",
    )

    # --- sort
    slope(lambda a: jnp.sort(a ^ 12345, axis=-1), xi, el, "sort minor i32")
    slope(
        lambda a: jax.lax.sort((a ^ 999, a), dimension=-1, num_keys=1)[1],
        xi,
        el,
        "key-value sort minor i32",
    )

    # --- searchsorted (vmapped)
    keys = jnp.sort(xi, axis=-1)

    def ss(a):
        r = jax.vmap(lambda kk, qq: jnp.searchsorted(kk, qq, side="right"))(keys, a & (N - 1))
        return r.astype(jnp.int32) | 1

    slope(ss, xi, el, "vmap searchsorted [B,N] in [B,N]")

    # --- one-hot matmul LUT (MXU): idx&255 -> onehot[N,256] @ tbl[256]
    tblf = jax.random.normal(key, (256, 8), jnp.float32)

    def onehot_mm(a):
        oh = jax.nn.one_hot((a & 255).reshape(B * N // 128, 128), 256, dtype=jnp.bfloat16)
        r = jax.lax.dot_general(
            oh,
            tblf.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return a + r[..., 0].reshape(B, N).astype(jnp.int32)

    slope(onehot_mm, xi, el, "one-hot(256) matmul LUT via MXU")

    # --- uint8 elementwise + cast
    xu8 = (xi & 255).astype(jnp.uint8)
    slope(lambda a: a + jnp.uint8(3), xu8, el, "elementwise u8 add")
    slope(lambda a: (a.astype(jnp.int32) * 2 + 1).astype(jnp.uint8), xu8, el, "u8->i32->u8 roundtrip")

    # --- reduction
    slope(lambda a: a + jnp.sum(a, axis=-1, keepdims=True), xi, el, "row-sum reduce + bcast add")

    # --- matmul roofline check
    m = jax.random.normal(key, (1024, 1024), jnp.bfloat16)

    def mm(a):
        return jnp.dot(a, m, preferred_element_type=jnp.bfloat16)

    per = slope(mm, m, 2 * 1024**3, "matmul 1024^3 bf16 (flops col)")
    print(f"  -> {2*1024**3/per/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
