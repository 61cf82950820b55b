"""Round-4 go/no-go experiments: vectorized (gather-based) walk + drains.

The round-3 decoder spends ~36 cyc/tag on one scalar core (walk 9, drains
~19, overheads). `tpu.dynamic_gather` (jnp.take_along_axis inside Pallas)
permits per-sublane dynamic lane gathers, which could vectorize the tag
walk 8-blocks-wide (one gather serves 8 chains) and the drains 8-records-
wide. This script measures, within ONE run (the tunnelled chip has
±15-30% run-to-run variance):

  E5  select-primitive chains (gather / one-hot+reduce), G interleaved
      independent chains                             -> cyc latency/issue
  E4  8-wide drain skeletons (gather / log-roll align) -> cyc/record
  E3  row-lockstep 8-block walk skeleton (arg "walks" ONLY: faults the
      TPU worker)                                    -> cyc/tag
  E7  scalar-core cost model: backedge / lax.cond / SMEM-chain costs
  E8  drain second-store strategies (always / pl.when / none)

Results live in NEGATIVE_RESULTS.md and the kernel docstrings; headline
findings: SMEM loads ~6 cyc with non-overlappable serial chains, conds
~5 cyc, backedges free, all per-sublane lane-permute primitives 20-85
cyc, and data-dependent pl.when regions serialize pipelined loops.

All kernels take an iteration/scale knob from SMEM so each compiles once;
rates come from the slope between two knob values (cancels dispatch and
fence costs). Synthetic command streams mimic the real tag distribution
(~5.2 B/tag).
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

LANES = 128
CLOCK_GHZ = float(os.environ.get("PROF_CLOCK_GHZ", "0.94"))


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.reshape(-1)[:1])


def sync_time(f, args, reps=5):
    out = f(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------------------------------------------------------- E1/E2
def _chain_kernel(reps_ref, x_ref, o_ref, *, axis):
    x = x_ref[...]
    mod = 127 if axis == 1 else 7

    def body(i, x):
        idx = x & mod
        return jnp.take_along_axis(x, idx, axis=axis) + 1

    o_ref[...] = jax.lax.fori_loop(0, reps_ref[0], body, x)


def _alu_chain_kernel(reps_ref, x_ref, o_ref):
    x = x_ref[...]

    def body(i, x):
        return ((x & 127) ^ x) + 1

    o_ref[...] = jax.lax.fori_loop(0, reps_ref[0], body, x)


def build_chain(kernel, G=1):
    return jax.jit(
        pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 8, LANES), jnp.int32),
        )
    )


def _multi_chain_kernel(reps_ref, x_ref, o_ref, *, G, mode):
    """G independent chains interleaved: separates issue throughput from
    chain latency. mode 'gather' = lane dynamic_gather select; 'reduce' =
    one-hot multiply + lane-sum select (broadcast per-sublane scalar)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    window = x_ref[0]  # (8,128) static content
    xs = [x_ref[...][g] for g in range(G)]

    def body(i, xs):
        out = []
        for x in xs:
            idx = x & 127
            if mode == "gather":
                w = jnp.take_along_axis(window, idx, axis=1)
            else:
                oh = jnp.where(lane == idx, window, 0)
                w = jnp.sum(oh, axis=1, keepdims=True)  # (8,1) per-sublane
            out.append(x + (w & 7) + 1)
        return out

    xs = jax.lax.fori_loop(0, reps_ref[0], body, xs)
    for g in range(G):
        o_ref[g] = xs[g]


def run_chains():
    lo, hi = 200_000, 1_000_000
    jobs = []
    for G in (1, 4):
        for mode in ("gather", "reduce"):
            jobs.append(
                (
                    f"E5 {mode}-select chain G={G}",
                    functools.partial(_multi_chain_kernel, G=G, mode=mode),
                    G,
                )
            )
    for name, k, G in jobs:
        f = build_chain(k, G)
        x = jnp.asarray(np.random.randint(0, 1 << 20, (G, 8, LANES)), jnp.int32)
        t_lo = sync_time(f, (jnp.array([lo], jnp.int32), x))
        t_hi = sync_time(f, (jnp.array([hi], jnp.int32), x))
        per = max((t_hi - t_lo) / (hi - lo), 1e-12)
        print(
            f"{name:44s} {per*1e9:8.2f} ns/iter = {per*CLOCK_GHZ*1e9:6.2f} cyc/iter"
            f"  ({per*CLOCK_GHZ*1e9/G:6.2f} cyc/chain-step)",
            flush=True,
        )


# ---------------------------------------------------------------- E3
# Row-lockstep 8-block walk skeleton. cmds: (8, R, 128) int32; word layout
# (synthetic): bits0-2 advance-extra cx (1..5), bit3 lit, bits4-10 length
# (lit body length or copy length), bit30 valid, bit31 real. ip advances
# cx + lit*len like the real decoder. Records (ip|class) append into an
# (8,128) register accumulator with per-sublane cursors, flushed to VMEM
# whenever any sublane cursor crosses 96 (static flush row ladder).
R_ROWS = 320  # ~41 KB of command positions per block
T_TILES = 96  # record tile capacity per block


def _walk8_kernel(nrow_ref, clen_ref, cmd_ref, rec_ref, meta_ref, acc_ref, *, burst=4):
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    clen = clen_ref[...].reshape(8, LANES)  # broadcast tiles
    zero = jnp.zeros((8, LANES), jnp.int32)

    def row_body(r, state):
        ip, op, okacc, cur, acc, tile = state
        window = cmd_ref[0, r, :, :].reshape(8, LANES)

        def active_of(ip):
            return jnp.where((jax.lax.shift_right_logical(ip, 7) == r) & (ip < clen), 1, 0)

        def burst_body(state):
            ip, op, okacc, cur, acc, tile = state
            for _ in range(burst):
                act = active_of(ip)
                idx = ip & 127
                # reduce-select (lane dynamic_gather measured ~85 cyc on
                # v5e; one-hot multiply + lane-sum is the fast alternative)
                w = jnp.sum(jnp.where(lane == idx, window, 0), axis=1, keepdims=True)
                cx = w & 7
                lit = (w >> 3) & 1
                ln = (w >> 4) & 0x7F
                okacc |= jnp.where(act == 1, ~w, 0)  # valid-bit accumulate (cheap stand-in)
                rec = ip | (lit << 31)
                ins = (lane == cur) & (act == 1)
                acc = jnp.where(ins, rec, acc)
                cur = cur + act
                ip = ip + jnp.where(act == 1, cx + lit * ln, 0)
                op = op + jnp.where(act == 1, ln, 0)
            return ip, op, okacc, cur, acc, tile

        def burst_cond(state):
            ip = state[0]
            return jnp.max(active_of(ip)) > 0

        ip, op, okacc, cur, acc, tile = jax.lax.while_loop(
            burst_cond, burst_body, (ip, op, okacc, cur, acc, tile)
        )

        # flush when any sublane cursor crossed 96 (96+64 max tags/row < 256
        # would overflow; skeleton uses the same ladder the real kernel
        # needs). pl.when, NOT lax.cond: ref stores inside lax.cond fault.
        full = jnp.max(cur) >= 96

        @pl.when(full)
        def _():
            rec_ref[0, jnp.minimum(tile, T_TILES - 1), :, :] = acc

        fi = full.astype(jnp.int32)
        acc = jnp.where(full, 0, acc)
        cur = cur * (1 - fi)
        tile = tile + fi
        return ip, op, okacc, cur, acc, tile

    state = (zero, zero, zero, zero, zero, jnp.int32(0))
    ip, op, okacc, cur, acc, tile = jax.lax.fori_loop(0, nrow_ref[0], row_body, state)
    rec_ref[0, jnp.minimum(tile, T_TILES - 1), :, :] = acc
    meta_ref[0, 0, 0] = jnp.max(op)
    meta_ref[0, 0, 1] = jnp.max(cur)


def build_walk8(groups):
    kernel = _walk8_kernel
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(groups,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # nrow knob (whole array)
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_ROWS, 8, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, T_TILES, 8, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((groups, T_TILES, 8, LANES), jnp.int32),
                jax.ShapeDtypeStruct((groups, 1, 2), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        )
    )


def _walk_scalar_kernel(nrow_ref, clen_ref, cmd_ref, meta_ref, rec_ref, *, unroll=16):
    """Old-style scalar chain on the same synthetic words (SMEM cmds)."""
    clen = clen_ref[0, 0, 0]

    def step(state):
        ip, op, t = state
        w = cmd_ref[0, 0, ip]
        cx = w & 7
        lit = (w >> 3) & 1
        ln = (w >> 4) & 0x7F
        live = jnp.where(ip < clen, 1, 0)
        rec_ref[jnp.minimum(t, T_TILES * LANES - 1)] = ip | (lit << 31)
        ip = ip + live * (cx + lit * ln)
        op = op + live * ln
        return ip, op, t + live

    def body(i, state):
        for _ in range(unroll):
            state = step(state)
        return state

    nsteps = nrow_ref[0] * R_ROWS * LANES // 5 // unroll + 1
    ip, op, t = jax.lax.fori_loop(0, nsteps, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    meta_ref[0, 0, 0] = op
    meta_ref[0, 0, 1] = t


def build_walk_scalar(nblocks):
    ncp = R_ROWS * LANES
    return jax.jit(
        pl.pallas_call(
            _walk_scalar_kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, ncp), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, 1, 2), jnp.int32),
            scratch_shapes=[pltpu.SMEM((T_TILES * LANES,), jnp.int32)],
        )
    )


def synth_cmds(nblocks, seed=0):
    """Synthetic tag chains: advance 2..8 (~5.2 B/tag high bits random)."""
    rng = np.random.default_rng(seed)
    ncp = R_ROWS * LANES
    cmds = rng.integers(0, 1 << 11, (nblocks, ncp), np.int64)
    # overwrite the chain positions with consistent advances
    tags = np.zeros(nblocks, np.int64)
    for b in range(nblocks):
        ip = 0
        n = 0
        # vector-ish host build: draw advances in bulk
        adv = rng.integers(2, 9, ncp // 2)
        lit = rng.integers(0, 2, ncp // 2)
        w = np.zeros(ncp, np.int64)
        pos = []
        i = 0
        while ip < ncp:
            a = int(adv[i])
            l = int(lit[i])
            if l:
                cx = max(a - 4, 1)
                ln = a - cx
            else:
                cx = a
                ln = int(rng.integers(4, 65))
            pos.append(ip)
            w[ip] = cx | (l << 3) | (ln << 4)
            ip += cx + (ln if l else 0)
            i += 1
            n += 1
        cmds[b, np.array(pos, np.int64)] = w[np.array(pos, np.int64)]
        tags[b] = n
    return cmds.astype(np.int32), tags


def run_walks():
    groups = 8  # 64 blocks
    nblocks = groups * 8
    cmds_np, tags = synth_cmds(nblocks)
    total_tags = int(tags.sum())
    ncp = R_ROWS * LANES
    cmds_g = jnp.asarray(
        cmds_np.reshape(groups, 8, R_ROWS, LANES).transpose(0, 2, 1, 3).copy()
    )
    clen_g = jnp.asarray(np.full((groups, 8, LANES), ncp, np.int32))

    f8 = build_walk8(groups)
    # knob: number of rows walked (R vs R/2 slope cancels fixed costs)
    t_hi = sync_time(f8, (jnp.array([R_ROWS], jnp.int32), clen_g, cmds_g))
    t_lo = sync_time(f8, (jnp.array([R_ROWS // 2], jnp.int32), clen_g, cmds_g))
    per_tag = (t_hi - t_lo) / (total_tags / 2)
    print(
        f"E3 walk8 row-lockstep: full {t_hi*1e3:.2f} ms  slope {per_tag*1e9:.2f} ns/tag"
        f" = {per_tag*CLOCK_GHZ*1e9:.2f} cyc/tag  ({total_tags} tags)",
        flush=True,
    )

    fs = build_walk_scalar(nblocks)
    cmds_b = jnp.asarray(cmds_np.reshape(nblocks, 1, ncp))
    clens_b = jnp.asarray(np.full((nblocks, 1, 1), ncp, np.int32))
    t_hi = sync_time(fs, (jnp.array([1], jnp.int32), clens_b, cmds_b))
    t_lo = sync_time(fs, (jnp.array([0], jnp.int32), clens_b, cmds_b))
    # knob 1 walks ~ncp/5/unroll*unroll steps ~= all tags; knob 0 walks ~1 step
    per_tag_s = (t_hi - t_lo) / total_tags
    print(
        f"E3s scalar walk:      full {t_hi*1e3:.2f} ms  slope {per_tag_s*1e9:.2f} ns/tag"
        f" = {per_tag_s*CLOCK_GHZ*1e9:.2f} cyc/tag",
        flush=True,
    )


# ---------------------------------------------------------------- E4
# 8-wide drain skeleton: per 8 records, 8 dynamic-row loads staged into a
# scratch tile, one 2D permute (two gathers), mask build, and 8 masked
# dynamic-row stores. Compares against the per-record serial pattern
# (3 loads + roll + 2 masked stores each) from the round-3 drains.
NREC = 4096
NSRC = 512


def _var_roll(tile, shift_vec):
    """Per-sublane variable right-rotate via 7 static-roll stages (lane
    dynamic_gather is ~85 cyc on v5e; static rolls + selects are cheap).
    shift_vec: (8,1) or broadcast (8,128) per-sublane rotate amounts."""
    x = tile
    for k in range(7):
        rolled = pltpu.roll(x, 1 << k, 1)
        x = jnp.where((shift_vec >> k) & 1 == 1, rolled, x)
    return x


def _drain8_kernel(nrec_ref, q0_ref, r_ref, fld_ref, src_ref, out_ref, stage_ref, *, mode):
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

    def grp(g, _):
        base = g * 8
        # stage 8 source rows (dynamic rows, scalar indices from SMEM)
        for k in range(8):
            stage_ref[k, :] = src_ref[q0_ref[base + k], :]
        tile = stage_ref[...]
        fld = fld_ref[g, :, :]  # (8,128): per-record [shift, ph, lo, n] broadcast rows
        shift = fld & 127
        ph = (fld >> 7) & 127
        lo = (fld >> 14) & 127
        n = (fld >> 21) & 0x7F
        if mode == "gather":
            L = (lane + shift) & 127
            z = jnp.take_along_axis(tile, L, axis=1)
        else:
            z = _var_roll(tile, shift)
        keep = (lane >= lo) & (lane < lo + n)
        z = jnp.where(keep, z + ph, 0)
        for k in range(8):
            pltpu.store(
                out_ref.at[r_ref[base + k], :],
                z[k, :].reshape(LANES),
                mask=keep[k, :].reshape(LANES),
            )
        return 0

    jax.lax.fori_loop(0, nrec_ref[0] // 8, grp, 0, unroll=False)


def _drain_serial_kernel(nrec_ref, q0_ref, r_ref, fld_ref, src_ref, out_ref, stage_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def one(t, _):
        q0 = q0_ref[t]
        f = fld_ref[t // 8, t % 8, 0]
        shift = f & 127
        ph = (f >> 7) & 127
        lo = (f >> 14) & 127
        n = (f >> 21) & 0x7F
        a = src_ref[q0, :].reshape(1, LANES)
        b = src_ref[q0 + 1, :].reshape(1, LANES)
        c = src_ref[q0 + 2, :].reshape(1, LANES)
        sel = lane >= ph
        m = pltpu.roll(jnp.where(sel, a, b), shift, 1)
        m2 = pltpu.roll(jnp.where(sel, b, c), shift, 1)
        keep = (lane >= lo) & (lane < lo + n)
        k2 = lane < lo + n - LANES
        pltpu.store(out_ref.at[r_ref[t], :], m.reshape(LANES), mask=keep.reshape(LANES))
        pltpu.store(out_ref.at[r_ref[t] + 1, :], m2.reshape(LANES), mask=k2.reshape(LANES))
        return 0

    jax.lax.fori_loop(0, nrec_ref[0], one, 0, unroll=False)


def build_drain(kernel):
    return jax.jit(
        pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NSRC + 8, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        )
    )


def run_drains():
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.integers(0, NSRC - 4, NREC), jnp.int32)
    r = jnp.asarray(rng.integers(0, NSRC - 4, NREC), jnp.int32)
    shift = rng.integers(0, 128, NREC)
    ph = (-shift) % 128
    lo = rng.integers(0, 128, NREC)
    n = rng.integers(1, 65, NREC)
    fldw = (shift | (ph << 7) | (lo << 14) | (n << 21)).astype(np.int32)
    fld = jnp.asarray(np.broadcast_to(fldw.reshape(NREC // 8, 8, 1), (NREC // 8, 8, LANES)).copy())
    src = jnp.asarray(rng.integers(0, 255, (NSRC, LANES)), jnp.int32)

    for name, k in [
        ("E4 drain8 gather", functools.partial(_drain8_kernel, mode="gather")),
        ("E4 drain8 logroll", functools.partial(_drain8_kernel, mode="logroll")),
        ("E4s drain serial", _drain_serial_kernel),
    ]:
        f = build_drain(k)
        t_hi = sync_time(f, (jnp.array([NREC], jnp.int32), q0, r, fld, src))
        t_lo = sync_time(f, (jnp.array([NREC // 4], jnp.int32), q0, r, fld, src))
        per = (t_hi - t_lo) / (NREC * 3 // 4)
        print(
            f"{name:24s} {per*1e9:8.2f} ns/rec = {per*CLOCK_GHZ*1e9:6.2f} cyc/rec",
            flush=True,
        )


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})  clock {CLOCK_GHZ} GHz", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "chains"):
        run_chains()
    if which in ("all", "drains"):
        run_drains()
    if which == "walks":
        # NOT in "all": the walk8 skeleton kernel FAULTS the TPU worker
        # (kernel fault, undiagnosed — dynamic tile stores under a vector
        # while loop suspected) and needs a worker restart afterwards.
        run_walks()
    if which in ("all", "scalar"):
        run_scalar_costs()
    print("DONE", flush=True)


# ---------------------------------------------------------------- E7
# Scalar-core cost model: loop backedge, lax.cond, and SMEM load-chain
# costs. The encode walk pays one while-backedge + several conds per take
# (un-unrollable, data-dependent trip count) where the decode walk
# amortizes its backedge over 16 unrolled steps — if backedges/conds cost
# tens of cycles, that alone explains encode's ~90 unexplained cyc/take.
def _scalar_loop_kernel(n_ref, x_ref, o_ref, *, work, unroll, cond, chain):
    n = n_ref[0]

    def one(s):
        ip, acc = s
        if chain:
            # 3 serially dependent SMEM loads (address <- previous value)
            v1 = x_ref[ip & 1023]
            v2 = x_ref[(ip + v1) & 1023]
            v3 = x_ref[(ip + v2) & 1023]
            acc = acc + v3
        for _ in range(work):
            acc = (acc ^ (acc >> 1)) + 1
        if cond:
            acc = jax.lax.cond(acc & 1 == 0, lambda a: a + 2, lambda a: a + 3, acc)
        return ip + 1, acc

    def body(s):
        for _ in range(unroll):
            s = one(s)
        return s

    ip, acc = jax.lax.while_loop(lambda s: s[0] < n, body, (jnp.int32(0), jnp.int32(0)))
    o_ref[0] = acc


def run_scalar_costs():
    x = jnp.asarray(np.arange(1024) % 7, jnp.int32)

    def build(work, unroll, cond=False, chain=False):
        k = functools.partial(
            _scalar_loop_kernel, work=work, unroll=unroll, cond=cond, chain=chain
        )
        return jax.jit(
            pl.pallas_call(
                k,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            )
        )

    lo, hi = 100_000, 900_000
    for label, kw in [
        ("work4 U=1", dict(work=4, unroll=1)),
        ("work4 U=8", dict(work=4, unroll=8)),
        ("work16 U=1", dict(work=16, unroll=1)),
        ("work16 U=8", dict(work=16, unroll=8)),
        ("work4+cond U=1", dict(work=4, unroll=1, cond=True)),
        ("work4+cond U=8", dict(work=4, unroll=8, cond=True)),
        ("work4+chain U=8", dict(work=4, unroll=8, chain=True)),
        ("work4+chain U=1", dict(work=4, unroll=1, chain=True)),
    ]:
        f = build(**kw)
        t_lo = sync_time(f, (jnp.array([lo], jnp.int32), x))
        t_hi = sync_time(f, (jnp.array([hi], jnp.int32), x))
        per = max((t_hi - t_lo) / (hi - lo), 1e-12)
        print(
            f"E7 {label:18s} {per*1e9:8.2f} ns/step = {per*CLOCK_GHZ*1e9:6.2f} cyc/step",
            flush=True,
        )


def _main2():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})  clock {CLOCK_GHZ} GHz", flush=True)
    run_scalar_costs()
    print("DONE", flush=True)


if os.environ.get("EXP_SCALAR") == "1" and __name__ == "__main__":
    _main2()
    sys.exit(0)


# ---------------------------------------------------------------- E8
# pl.when cost inside a pipelined drain-style loop: the decode drains
# always issue their second-row (usually empty-mask) stores branch-free;
# if a predicated region is cheap, ~5 vector ops/record drop out.
def _when_drain_kernel(n_ref, q_ref, r_ref, src_ref, out_ref, *, mode):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def one(t, _):
        q0 = q_ref[t]
        rr = r_ref[t]
        lo = q0 & 127
        n = (q0 >> 7) & 63
        a = src_ref[q0 & 255, :].reshape(1, LANES)
        b = src_ref[(q0 & 255) + 1, :].reshape(1, LANES)
        m = pltpu.roll(jnp.where(lane >= lo, a, b), lo, 1)
        keep = (lane >= lo) & (lane < lo + n)
        pltpu.store(out_ref.at[rr, :], m.reshape(LANES), mask=keep.reshape(LANES))
        if mode == "always":
            m2 = pltpu.roll(jnp.where(lane >= lo, b, a), lo, 1)
            pltpu.store(out_ref.at[rr + 1, :], m2.reshape(LANES), mask=(lane < lo + n - LANES).reshape(LANES))
        elif mode == "when":
            @pl.when(lo + n > LANES)
            def _():
                m2 = pltpu.roll(jnp.where(lane >= lo, b, a), lo, 1)
                pltpu.store(out_ref.at[rr + 1, :], m2.reshape(LANES), mask=(lane < lo + n - LANES).reshape(LANES))
        return 0

    def body(g, _):
        for k in range(8):
            one((g % 512) * 8 + k, 0)
        return 0

    jax.lax.fori_loop(0, n_ref[0] // 8, body, 0, unroll=False)


def run_when():
    rng = np.random.default_rng(3)
    NR = 4096
    # lo+n > 128 for ~15% of records (drain-realistic crossing rate)
    lo = rng.integers(0, 128, NR)
    n = np.where(rng.random(NR) < 0.15, 127 - np.minimum(lo, 63), rng.integers(1, 40, NR))
    q = (lo | (np.minimum(n, 63) << 7)).astype(np.int32)
    r = rng.integers(0, 500, NR).astype(np.int32)
    src = jnp.asarray(rng.integers(0, 255, (260, LANES)), jnp.int32)

    for mode in ("always", "when", "none"):
        k = functools.partial(_when_drain_kernel, mode=mode)
        f = jax.jit(
            pl.pallas_call(
                k,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((504, LANES), jnp.int32),
            )
        )
        hi_n, lo_n = NR * 64, NR * 8
        t_hi = sync_time(f, (jnp.array([hi_n], jnp.int32), jnp.asarray(q), r, src))
        t_lo = sync_time(f, (jnp.array([lo_n], jnp.int32), jnp.asarray(q), r, src))
        per = (t_hi - t_lo) / (hi_n - lo_n)
        print(f"E8 drain2nd {mode:7s} {per*1e9:8.2f} ns/rec = {per*CLOCK_GHZ*1e9:6.2f} cyc/rec", flush=True)

if os.environ.get("EXP_WHEN") == "1" and __name__ == "__main__":
    run_when()
    sys.exit(0)
