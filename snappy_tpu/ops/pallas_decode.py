"""Pallas TPU decoder: two-phase record kernel, one grid step per block.

Why this shape (v2 — measured on v5e): the v1 kernel fused the tag walk
with per-tag byte moves; each move's scalar->vector->VMEM latency chain
(~74 cycles) serialized behind the walk. Microbenchmarks
(benchmarks/profile_floor.py) show the two halves are individually fast
when decoupled:

  - a MINIMAL tag walk (one SMEM load per tag, two adds) runs at ~8
    cycles/tag — the only truly sequential dependence in the format
    (reference src/internal.jl:411-466 is this chain plus byte fiddling);
  - independent, branch-free one-row moves pipeline at ~14 cycles each
    when unrolled (vs ~74 serialized).

So the kernel splits decode into chunked phases over SMEM record scratch:

  PHASE 1 (scalar core): walk the tag chain over a packed per-position
  command word (CMD, built by an elementwise XLA prepass — the CHAR_TABLE
  of the reference, src/internal.jl:47-80, evaluated arithmetically at
  every byte position on the VPU). Each tag is validated (all reference
  corruption checks: src/internal.jl:493-518, src/Snappy.jl:50) and
  expanded into ROW-ALIGNED move records (dst span within one 128-lane
  row): literals split at row boundaries; self-overlapping copies (RLE,
  reference src/internal.jl:469-509) expand into chunk-doubling
  sub-moves, so phase 2 needs no special cases.

  PHASE 2 (VPU, unrolled x4): execute records over a unified VMEM buffer
  holding [compressed bytes | output bytes] — a literal is just a move
  whose source lies in the comp region. Each record is one masked-merge
  into a row ACCUMULATOR register carried across records; the accumulator
  is flushed to VMEM only on row advance, and sources that touch the
  in-flight row read the accumulator directly — so there is no VMEM
  read-modify-write hazard chain, and the unrolled records pipeline.

Blocks are independent (reference src/Snappy.jl:29-33): grid = one step
per block, Pallas double-buffers the HBM<->VMEM block DMAs. Output
equality is bit-exact vs the CPU oracle on the full corpus
(tests/test_pallas_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane width of one VMEM row (bytes held one-per-lane as int32).
LANES = 128
# Slack appended to the compressed buffer so blind trailer loads stay in
# bounds (mirrors the reference's padded 4-byte trailer read,
# src/internal.jl:421-430).
COMP_PAD = 4

# Record scratch: max records buffered before a phase-2 drain. One tag can
# emit at most 513 records (a 64 KiB literal split into 128-byte rows), so
# phase 1 yields to phase 2 while at least MARGIN slots remain.
NREC = 16384
MARGIN = 516
F_SAT = 0x1FFFF  # 17-bit saturation for copy offsets (any real offset
#                  above this is necessarily corrupt inside a 64 KiB block)

# --- CMD: packed per-position candidate-tag parse -------------------------
# bit  0        is_copy
# bits 1..3     taglen = number of extra tag bytes after the opcode (0..4)
# literals:  bits 4..19 length-1 (16b);  bit 20 poison (true length-1
#            overflows 16 bits — cannot be valid for block-sized outputs)
# copies:    bits 4..9  length-1 (<=63 by the format);
#            bits 10..26 offset, saturated at F_SAT


def parse_cmd(comp_u8_padded: jnp.ndarray) -> jnp.ndarray:
    """Elementwise candidate-tag parse at every byte position.

    comp_u8_padded: uint8[B, NC + COMP_PAD] (zero slack). Returns
    int32[B, NC] of CMD words. Pure VPU work — no gathers.
    """
    nc = comp_u8_padded.shape[-1] - COMP_PAD
    cu = comp_u8_padded.astype(jnp.uint32)
    c = cu[..., :nc]
    b1 = cu[..., 1 : nc + 1]
    b2 = cu[..., 2 : nc + 2]
    b3 = cu[..., 3 : nc + 3]
    b4 = cu[..., 4 : nc + 4]

    kind = c & 3
    hi6 = (c >> 2).astype(jnp.int32)
    is_copy = kind != 0
    lit_extra = jnp.clip(hi6 - 59, 0, 4)
    taglen = jnp.where(
        is_copy,
        jnp.where(kind == 1, 1, jnp.where(kind == 2, 2, 4)),
        lit_extra,
    )

    # Literal length-1: LE trailer of lit_extra bytes (computed in uint32;
    # poison marks >16-bit values instead of silently truncating).
    tl = (
        jnp.where(lit_extra >= 1, b1, 0)
        | jnp.where(lit_extra >= 2, b2 << 8, 0)
        | jnp.where(lit_extra >= 3, b3 << 16, 0)
        | jnp.where(lit_extra >= 4, b4 << 24, 0)
    )
    lit_m1 = jnp.where(lit_extra > 0, tl, hi6.astype(jnp.uint32))
    poison = (lit_m1 > 0xFFFF).astype(jnp.int32)

    # Copy length-1 and offset per tag kind (reference src/internal.jl:47-85).
    cp_m1 = jnp.where(kind == 1, 3 + (hi6 & 7), hi6)
    off = jnp.where(
        kind == 1,
        (((hi6 >> 3) & 7).astype(jnp.uint32) << 8) | b1,
        jnp.where(kind == 2, b1 | (b2 << 8), jnp.minimum(b1 | (b2 << 8) | (b3 << 16) | (b4 << 24), jnp.uint32(F_SAT))),
    ).astype(jnp.int32)

    payload = jnp.where(
        is_copy,
        (cp_m1 << 4) | (off << 10),
        ((lit_m1.astype(jnp.int32) & 0xFFFF) << 4) | (poison << 20),
    )
    return is_copy.astype(jnp.int32) | (taglen << 1) | payload


def _roll(vec, shift, *, interpret: bool):
    """Circular right-shift of a (1, LANES) row by a dynamic amount."""
    if interpret:
        return jnp.roll(vec, shift, axis=1)
    return pltpu.roll(vec, shift, 1)


def _decode_kernel(
    clen_ref,  # SMEM (1, 1, 1) int32
    ulen_ref,  # SMEM (1, 1, 1) int32
    cmd_ref,  # SMEM (1, 1, NC) int32: packed per-position parse
    comp_ref,  # VMEM (1, NRC, LANES) int32: compressed bytes one-per-lane
    out_ref,  # VMEM (1, NRU, LANES) int32: output bytes one-per-lane
    meta_ref,  # SMEM (1, 1, 2) int32: [ok, produced]
    buf_ref,  # VMEM scratch (NRC + NRU + 2, LANES) int32: [comp | out] bytes
    rec_s_ref,  # SMEM scratch (NREC,) int32: src | (n-1) << 18
    rec_o_ref,  # SMEM scratch (NREC,) int32: dst byte address
    *,
    nrc: int,
    nru: int,
    interpret: bool,
    debug_mode: int = 0,  # 0=full, 1=skip drain, 2=skip record emission too
):
    clen = clen_ref[0, 0, 0]
    ulen = ulen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ob = nrc * LANES  # output region base byte address in buf
    zero_row = jnp.zeros((1, LANES), jnp.int32)

    # Prologue: comp bytes into the unified buffer's head rows.
    def copy_in(i, _):
        buf_ref[i, :] = comp_ref[0, i, :]
        return 0

    jax.lax.fori_loop(0, nrc, copy_in, 0, unroll=False)

    # ---- phase 1: one tag -> validated row-aligned records ----------------
    def emit_span(s, o, length, t):
        """Split a move of `length` bytes (src byte s -> dst byte o, both
        buf-absolute) into records whose dst lies within one row."""

        def body(st):
            s_, o_, l_, t_ = st
            n = jnp.minimum(l_, LANES - (o_ & 127))
            rec_s_ref[t_] = s_ | ((n - 1) << 18)
            rec_o_ref[t_] = o_
            return s_ + n, o_ + n, l_ - n, t_ + 1

        s, o, length, t = jax.lax.while_loop(lambda st: st[2] > 0, body, (s, o, length, t))
        return t

    def tag_step(state):
        ip, op, ok, t = state
        a = cmd_ref[0, 0, ip]
        is_copy = (a & 1) == 1
        taglen = (a >> 1) & 7
        lit_len = ((a >> 4) & 0xFFFF) + 1
        poison = ((a >> 20) & 1) == 1
        cp_len = ((a >> 4) & 63) + 1
        f = (a >> 10) & F_SAT

        length = jnp.where(is_copy, cp_len, lit_len)
        consumed = 1 + taglen + jnp.where(is_copy, 0, lit_len)

        # Corruption checks (reference src/internal.jl:493-518).
        ok_lit = (ip + consumed <= clen) & ~poison
        ok_copy = (f > 0) & (f <= op) & (ip + 1 + taglen <= clen)
        tag_ok = jnp.where(is_copy, ok_copy, ok_lit) & (op + length <= ulen)

        src = jnp.where(is_copy, ob + op - f, ip + 1 + taglen)
        o0 = ob + op
        # Self-overlapping copy (f < length): first move f bytes, then
        # chunk-double the materialized span (reference src/internal.jl:
        # 469-509). Non-RLE tags take n0 = length and skip the loop.
        rle = is_copy & (f < length) & tag_ok
        n0 = jnp.where(rle, f, jnp.where(tag_ok, length, 0))
        if debug_mode >= 2:
            n0 = jnp.int32(0)
            rle = jnp.bool_(False)
        t = emit_span(src, o0, n0, t)

        def dbl(st):
            done, t_ = st
            n = jnp.minimum(done, length - done)
            t_ = emit_span(o0, o0 + done, n, t_)
            return done + n, t_

        done0 = jnp.where(rle, n0, length)
        _, t = jax.lax.while_loop(lambda st: st[0] < length, dbl, (done0, t))

        return ip + consumed, op + length, ok & tag_ok, t

    # ---- phase 2: drain records into a register row-window ----------------
    #
    # Measured pathology (v5e): any loop whose body both stores to and
    # loads from the row buffer serializes at ~90 cycles/record — the
    # store->load round trip lands on the critical path every iteration.
    # So the steady state of this loop NEVER stores: completed rows
    # accumulate in a 16-row register window (`win`), and once >= 8 rows
    # are pending they flush to VMEM in one 8-store burst per group —
    # the store barrier amortizes over ~150 records.
    #
    # Source rows for a move therefore come from three places, selected
    # branch-free per row: the in-flight accumulator (q == cur), the
    # register window (q >= flush base), or VMEM (already flushed).
    # Window slots are addressed (q - nrc) & 15, so the 8-row burst hits
    # statically known slots (alternating halves).
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def make_drain(nrows):
        def source(q, acc, cur, fb, win):
            vm = buf_ref[jnp.clip(q, 0, nrows - 1), :].reshape(1, LANES)
            slot = (q - nrc) & 15
            t8 = jnp.where(slot >= 8, win[8:16], win[0:8])
            t4 = jnp.where((slot & 4) != 0, t8[4:8], t8[0:4])
            t2 = jnp.where((slot & 2) != 0, t4[2:4], t4[0:2])
            t1 = jnp.where((slot & 1) != 0, t2[1:2], t2[0:1])
            row = jnp.where(q >= fb, t1, vm)
            return jnp.where(q == cur, acc, row)

        def one_rec(t, acc, cur, fb, win):
            rs = rec_s_ref[t]
            o = rec_o_ref[t]
            s = rs & 0x3FFFF
            n = ((rs >> 18) & 0x7F) + 1
            r = o >> 7
            adv = r != cur

            # Retire the completed row into its window slot (branch-free).
            ins = jnp.where(sub16 == ((cur - nrc) & 15), jnp.broadcast_to(acc, (16, LANES)), win)
            win = jnp.where(adv, ins, win)
            acc = jnp.where(adv, zero_row, acc)
            cur = jnp.where(adv, r, cur)

            d = o - s
            ph = (-d) & 127
            shift = (LANES - ph) & 127
            qr = (r * LANES - d) >> 7
            a_row = source(qr, acc, cur, fb, win)
            b_row = source(qr + 1, acc, cur, fb, win)
            m = _roll(jnp.where(lane >= ph, a_row, b_row), shift, interpret=interpret)
            lo = o & 127
            keep = (lane >= lo) & (lane < lo + n)
            return jnp.where(keep, m, acc), cur, win

        def one_rec_rmw(t):
            """Accumulator-free record: read-modify-write the destination
            row directly. buf is always current, so sources need no
            special-casing; records chain only through genuine byte
            dependencies, which the hardware resolves."""
            rs = rec_s_ref[t]
            o = rec_o_ref[t]
            s = rs & 0x3FFFF
            n = ((rs >> 18) & 0x7F) + 1
            r = o >> 7
            d = o - s
            ph = (-d) & 127
            shift = (LANES - ph) & 127
            qr = (r * LANES - d) >> 7
            a_row = buf_ref[jnp.clip(qr, 0, nrows - 1), :].reshape(1, LANES)
            b_row = buf_ref[jnp.clip(qr + 1, 0, nrows - 1), :].reshape(1, LANES)
            m = _roll(jnp.where(lane >= ph, a_row, b_row), shift, interpret=interpret)
            lo = o & 127
            keep = (lane >= lo) & (lane < lo + n)
            curr = buf_ref[r, :].reshape(1, LANES)
            buf_ref[r, :] = jnp.where(keep, m, curr).reshape(LANES)

        def drain_rmw(t_hi):
            def group(g, _):
                base = g * 4
                for k in range(4):
                    one_rec_rmw(jnp.minimum(base + k, t_hi - 1))
                return 0

            jax.lax.fori_loop(0, pl.cdiv(t_hi, 4), group, 0)

        def drain(t_hi, acc, cur, fb, win):
            def group(g, carry):
                acc, cur, fb, win = carry
                base = g * 4
                for k in range(4):
                    acc, cur, win = one_rec(jnp.minimum(base + k, t_hi - 1), acc, cur, fb, win)
                # Burst-flush the 8 oldest pending rows (static slots: fb
                # stays nrc + a multiple of 8, so the octave alternates).
                need = cur - fb >= 8
                odd = ((fb - nrc) >> 3) & 1

                @pl.when(need & (odd == 0))
                def _():
                    for i in range(8):
                        buf_ref[fb + i, :] = win[i, :]

                @pl.when(need & (odd == 1))
                def _():
                    for i in range(8):
                        buf_ref[fb + i, :] = win[8 + i, :]

                fb = jnp.where(need, fb + 8, fb)
                return acc, cur, fb, win

            return jax.lax.fori_loop(0, pl.cdiv(t_hi, 4), group, (acc, cur, fb, win))

        return drain, drain_rmw

    drain, drain_rmw = make_drain(nrc + nru + 2)

    # ---- chunked outer loop: fill records, drain, repeat ------------------
    def chunk(state):
        ip, op, ok, acc, cur, fb, win = state
        ip, op, ok, t = jax.lax.while_loop(
            lambda s: (s[0] < clen) & s[2] & (s[3] <= NREC - MARGIN),
            tag_step,
            (ip, op, ok, jnp.int32(0)),
        )
        if debug_mode == 9:
            drain_rmw(t)
        elif debug_mode == 0:
            acc, cur, fb, win = drain(t, acc, cur, fb, win)
        return ip, op, ok, acc, cur, fb, win

    ip, op, ok, acc, cur, fb, win = jax.lax.while_loop(
        lambda s: (s[0] < clen) & s[2],
        chunk,
        (
            jnp.int32(0),
            jnp.int32(0),
            jnp.bool_(True),
            zero_row,
            jnp.int32(nrc),
            jnp.int32(nrc),
            jnp.zeros((16, LANES), jnp.int32),
        ),
    )
    if debug_mode != 9:
        # Final flush: pending window rows [fb, cur), then the in-flight
        # row. (The RMW drain keeps buf current; nothing to flush.)
        for i in range(16):
            q = fb + i
            slot = (q - nrc) & 15
            t8 = jnp.where(slot >= 8, win[8:16], win[0:8])
            t4 = jnp.where((slot & 4) != 0, t8[4:8], t8[0:4])
            t2 = jnp.where((slot & 2) != 0, t4[2:4], t4[0:2])
            t1 = jnp.where((slot & 1) != 0, t2[1:2], t2[0:1])

            @pl.when(q < cur)
            def _(q=q, t1=t1):
                buf_ref[q, :] = t1.reshape(LANES)

        buf_ref[cur, :] = acc.reshape(LANES)

    # Epilogue: output region of the unified buffer -> out block.
    def copy_out(i, _):
        out_ref[0, i, :] = buf_ref[nrc + i, :]
        return 0

    jax.lax.fori_loop(0, nru, copy_out, 0, unroll=False)

    meta_ref[0, 0, 0] = (ok & (op == ulen)).astype(jnp.int32)
    meta_ref[0, 0, 1] = op


def _build(cmax_padded: int, out_size: int, interpret: bool, debug_mode: int = 0):
    if out_size % LANES:
        raise ValueError(f"out_size must be a multiple of {LANES}")
    cmax_padded = max(cmax_padded, COMP_PAD + 1)  # degenerate empty streams
    nru = out_size // LANES
    # One spare row so phase 2's second source-row read stays in bounds.
    nrc = -(-cmax_padded // LANES) + 1
    nc = cmax_padded - COMP_PAD

    kernel = functools.partial(
        _decode_kernel, nrc=nrc, nru=nru, interpret=interpret, debug_mode=debug_mode
    )

    def fn(comp_u8: jnp.ndarray, clens: jnp.ndarray, ulens: jnp.ndarray):
        b = comp_u8.shape[0]
        if comp_u8.shape[1] < cmax_padded:
            comp_u8 = jnp.pad(comp_u8, ((0, 0), (0, cmax_padded - comp_u8.shape[1])))
        cmd = parse_cmd(comp_u8).reshape(b, 1, nc)
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
            scratch_shapes=[
                pltpu.VMEM((nrc + nru + 2, LANES), jnp.int32),
                pltpu.SMEM((NREC,), jnp.int32),
                pltpu.SMEM((NREC,), jnp.int32),
            ],
            interpret=interpret,
        )(clens.reshape(b, 1, 1), ulens.reshape(b, 1, 1), cmd, comp_i32)
        out = out_rows.reshape(b, out_size).astype(jnp.uint8)
        meta = meta.reshape(b, 2)
        return out, meta[:, 0] > 0, meta[:, 1]

    return fn


@functools.lru_cache(maxsize=16)
def decode_blocks_jit(cmax_padded: int, out_size: int, interpret: bool = False):
    """jit-compiled Pallas block decoder.

    Contract matches decode_xla.decode_blocks_jit: inputs are headerless
    per-block tag streams, zero-padded to ``cmax_padded`` (which includes
    COMP_PAD slack); returns (out u8[B, out_size], ok bool[B], total i32[B]).
    """
    return jax.jit(_build(cmax_padded, out_size, interpret))


def default_interpret() -> bool:
    """Interpret mode unless running on a real TPU."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True
