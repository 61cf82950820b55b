"""Pallas TPU encoder: sequential greedy parse, one grid step per block.

Counterpart of pallas_decode.py, replacing the reference's scalar scan
(reference src/internal.jl:127-250) with a hardware-affine split:

  - MATCH CANDIDATES are exact and data-parallel: a key-value sort groups
    equal 4-byte values, adjacent-rank deltas give each position its two
    most recent prior occurrences, and a second kv-sort returns them to
    position order. Sorts run at vector rate on TPU (~1 Gelem/s measured)
    where gathers/scatters run at scalar rate — and exact candidates
    strictly dominate the reference's collision-prone 16K hash table
    (reference src/internal.jl:94-113), so parse density >= libsnappy's.
  - the GREEDY PARSE walks positions on the scalar core: one SMEM load
    per probe (the packed candidate pair), match extension by 4-byte word
    compares from SMEM, profit-based candidate choice mirroring the
    reference's emit cost model (reference src/internal.jl:289-329).
  - EMISSION writes tag bytes as masked row blends and literal bodies as
    128-lane row moves with one dynamic lane roll (same mover as the
    decoder), into a VMEM-resident output block.

Blocks are independent (reference src/Snappy.jl:29-33): grid = one step
per 64 KiB block, inputs/outputs double-buffered by Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import BLOCK_SIZE, max_compressed_length

LANES = 128
# Slack past the block so 4-byte loads at any position < blen stay in bounds.
ENC_PAD = 8
# Worst-case tag-stream bytes for one 64 KiB block (no varint header),
# reference src/Snappy.jl:80-82 minus the 32-byte header allowance.
BLOCK_MAX_OUT = max_compressed_length(BLOCK_SIZE)


# --------------------------------------------------------------------------
# XLA prepass: exact candidate distances via kv-sorts (no gathers).
# --------------------------------------------------------------------------


def candidate_dists(blocks_u8: jnp.ndarray, blens: jnp.ndarray) -> jnp.ndarray:
    """Packed candidate distances per position.

    blocks_u8: uint8[B, N + ENC_PAD]; blens: int32[B]. Returns
    int32[B, N]: d1 | (d2 << 16), where d1/d2 are the distances to the two
    most recent prior positions with an identical 4-byte group (0 = none).
    Distances >= 2^16 are dropped: the encoder never emits offsets that
    wide inside a 64 KiB block (reference src/internal.jl:24-31).
    """
    n = blocks_u8.shape[-1] - ENC_PAD
    b = blocks_u8.shape[0]
    ci = blocks_u8.astype(jnp.uint32)
    u32 = (
        ci[..., :n]
        | (ci[..., 1 : n + 1] << 8)
        | (ci[..., 2 : n + 2] << 16)
        | (ci[..., 3 : n + 3] << 24)
    )
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    # Positions whose 4-byte group straddles the block end would match via
    # padding bytes; push them to a unique key so they pair with nothing.
    usable = pos <= blens[:, None] - 4
    key = jnp.where(usable, u32, jnp.uint32(0xFFFFFFFF))
    sv, sp = jax.lax.sort((key, pos), dimension=-1, num_keys=2)

    def prev_k(k: int):
        same = jnp.concatenate(
            [jnp.zeros((b, k), jnp.bool_), sv[..., k:] == sv[..., :-k]], axis=-1
        )
        dist = sp - jnp.concatenate([jnp.zeros((b, k), jnp.int32), sp[..., :-k]], axis=-1)
        return jnp.where(same & (dist < (1 << 16)), dist, 0)

    d1s, d2s = prev_k(1), prev_k(2)
    _, d1, d2 = jax.lax.sort((sp, d1s, d2s), dimension=-1, num_keys=1)
    return d1 | (d2 << 16)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _roll(vec, shift, *, interpret: bool):
    if interpret:
        return jnp.roll(vec, shift, axis=1)
    return pltpu.roll(vec, shift, 1)


def _copy_cost(m, d):
    """Emitted bytes for a copy of length m at offset d (scalar), mirroring
    the reference's chunked emitter (reference src/internal.jl:306-329)."""
    k64 = jnp.where(m >= 68, (m - 4) // 64, 0)
    m2 = m - 64 * k64
    has60 = jnp.where(m2 > 64, 1, 0)
    rem = m2 - 60 * has60
    two = (rem < 12) & (d < 2048)
    return 3 * (k64 + has60) + jnp.where(two, 2, 3)


def _encode_kernel(
    blen_ref,  # SMEM (1, 1, 1) int32
    words_ref,  # SMEM (1, 1, NW) int32: input bytes packed LE 4-per-word
    dists_ref,  # SMEM (1, 1, N) int32: d1 | d2<<16 per position
    inp_ref,  # VMEM (1, NRI, LANES) int32: input bytes one-per-lane
    out_ref,  # VMEM (1, NRO, LANES) int32: output bytes one-per-lane
    meta_ref,  # SMEM (1, 1, 1) int32: emitted length
    *,
    nri: int,
    nro: int,
    interpret: bool,
    min_profit: int = 1,
):
    blen = blen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def load32(p):
        """LE uint32 at byte p (bit-identical in int32 arithmetic)."""
        w0 = words_ref[0, 0, p >> 2]
        w1 = words_ref[0, 0, (p >> 2) + 1]
        sh = (p & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jnp.where(sh == 0, 0, jax.lax.shift_left(w1, (32 - sh) & 31))
        return lo | hi

    def match_len(a, b_):
        """Length of the common prefix of input[a:] and input[b_:], where
        the first 4 bytes are known equal; bounded so a+len <= blen."""
        limit = blen - a  # > 4 guaranteed by caller's probe bound

        def step(state):
            m, go = state
            xa = load32(a + m)
            xb = load32(b_ + m)
            x = xa ^ xb
            eq4 = x == 0
            # trailing-zero bytes of the xor word
            tzb = jnp.where(
                (x & 0xFF) != 0,
                0,
                jnp.where((x & 0xFFFF) != 0, 1, jnp.where((x & 0xFFFFFF) != 0, 2, 3)),
            )
            add = jnp.where(eq4, 4, tzb)
            add = jnp.minimum(add, limit - m)
            return m + add, eq4 & (m + add < limit) & (add == 4)

        m, _ = jax.lax.while_loop(lambda s: s[1], step, (jnp.int32(4), jnp.bool_(True)))
        return jnp.minimum(m, limit)

    # ---- emission helpers. op is threaded explicitly (refs close over).
    def emit3(op, b0, b1, b2, cnt):
        """Write cnt (1..3) tag bytes at output byte op."""
        l0 = op & 127
        r = op >> 7
        patch = jnp.where(
            lane == l0, b0, jnp.where(lane == l0 + 1, b1, jnp.where(lane == l0 + 2, b2, 0))
        )
        keep = (lane >= l0) & (lane < l0 + cnt)
        rc = jnp.clip(r, 0, nro - 1)
        cur = out_ref[0, rc, :].reshape(1, LANES)
        out_ref[0, rc, :] = jnp.where(keep, patch, cur).reshape(LANES)

        @pl.when(l0 + cnt > LANES)
        def _():
            patch2 = jnp.where(lane == l0 + 1 - LANES, b1, jnp.where(lane == l0 + 2 - LANES, b2, 0))
            keep2 = lane < l0 + cnt - LANES
            rc2 = jnp.clip(r + 1, 0, nro - 1)
            cur2 = out_ref[0, rc2, :].reshape(1, LANES)
            out_ref[0, rc2, :] = jnp.where(keep2, patch2, cur2).reshape(LANES)

        return op + cnt

    def move_body(s, o, length):
        """Copy length (>=1) input bytes [s, s+length) to output bytes at o
        (the literal body mover; same row/roll scheme as the decoder)."""
        d = o - s
        ph = (-d) & 127
        shift = (LANES - ph) & 127
        r0 = o >> 7
        r1 = (o + length - 1) >> 7
        lo = o & 127
        hi = (o + length - 1) & 127

        def span(q):
            qr = q >> 7
            a = inp_ref[0, jnp.clip(qr, 0, nri - 1), :].reshape(1, LANES)
            b_ = inp_ref[0, jnp.clip(qr + 1, 0, nri - 1), :].reshape(1, LANES)
            return _roll(jnp.where(lane >= ph, a, b_), shift, interpret=interpret)

        def edge(dr, lane_lo, lane_hi):
            m = span(dr * LANES - d)
            drc = jnp.clip(dr, 0, nro - 1)
            cur = out_ref[0, drc, :].reshape(1, LANES)
            keep = (lane >= lane_lo) & (lane <= lane_hi)
            out_ref[0, drc, :] = jnp.where(keep, m, cur).reshape(LANES)

        def one_row(_):
            edge(r0, lo, hi)

        def multi_row(_):
            edge(r0, lo, LANES - 1)

            def mid(r, _):
                dr = r0 + r
                out_ref[0, jnp.clip(dr, 0, nro - 1), :] = span(dr * LANES - d).reshape(LANES)
                return 0

            jax.lax.fori_loop(1, r1 - r0, mid, 0, unroll=False)
            edge(r1, 0, hi)

        jax.lax.cond(r1 == r0, one_row, multi_row, 0)

    def emit_literal(op, src, length):
        """Literal tag (reference src/internal.jl:252-287) + body move."""
        nm1 = length - 1
        hl = jnp.where(nm1 < 60, 1, jnp.where(nm1 < 256, 2, 3))
        b0 = jnp.where(nm1 < 60, nm1 << 2, jnp.where(nm1 < 256, 60 << 2, 61 << 2))
        op = emit3(op, b0, nm1 & 0xFF, nm1 >> 8, hl)
        move_body(src, op, length)
        return op + length

    def emit_copy(op, d, m):
        """Chunked copy emitter (reference src/internal.jl:289-329)."""

        def chunk64(state):
            m_, op_ = state
            op_ = emit3(op_, 0x02 | (63 << 2), d & 0xFF, d >> 8, 3)
            return m_ - 64, op_

        m, op = jax.lax.while_loop(lambda s: s[0] >= 68, chunk64, (m, op))

        def chunk60(state):
            m_, op_ = state
            op_ = emit3(op_, 0x02 | (59 << 2), d & 0xFF, d >> 8, 3)
            return m_ - 60, op_

        m, op = jax.lax.cond(m > 64, chunk60, lambda s: s, (m, op))
        two = (m < 12) & (d < 2048)
        b0 = jnp.where(
            two, 0x01 | ((m - 4) << 2) | ((d >> 8) << 5), 0x02 | ((m - 1) << 2)
        )
        b1 = jnp.where(two, d & 0xFF, d & 0xFF)
        b2 = d >> 8
        return emit3(op, b0, b1, b2, jnp.where(two, 2, 3))

    # ---- main greedy scan (reference src/internal.jl:127-250).
    def probe(state):
        ip, anchor, op = state
        cd = dists_ref[0, 0, ip]
        d1 = cd & 0xFFFF
        d2 = jax.lax.shift_right_logical(cd, 16) & 0xFFFF

        def no_match(_):
            return ip + 1, anchor, op

        def with_cand(_):
            # cond (not where): match_len must not run for an absent
            # candidate — it would scan from ip to the block end.
            m1 = jax.lax.cond(d1 > 0, lambda _: match_len(ip, ip - d1), lambda _: jnp.int32(0), 0)
            m2 = jax.lax.cond(d2 > 0, lambda _: match_len(ip, ip - d2), lambda _: jnp.int32(0), 0)
            p1 = jnp.where(m1 >= 4, m1 - _copy_cost(m1, d1), -1)
            p2 = jnp.where(m2 >= 4, m2 - _copy_cost(m2, d2), -1)
            use2 = p2 > p1
            m = jnp.where(use2, m2, m1)
            d = jnp.where(use2, d2, d1)
            prof = jnp.maximum(p1, p2)

            def take(_):
                lit = ip - anchor
                op2 = jax.lax.cond(
                    lit > 0, lambda o: emit_literal(o, anchor, lit), lambda o: o, op
                )
                op3 = emit_copy(op2, d, m)
                return ip + m, ip + m, op3

            # min_profit > 1 thins the parse: marginal short copies cost a
            # decoder tag for 1-2 saved bytes; skipping them trades a little
            # density for decode throughput (the TPU decoder is tag-bound).
            return jax.lax.cond(prof >= min_profit, take, lambda _: (ip + 1, anchor, op), 0)

        return jax.lax.cond(cd != 0, with_cand, no_match, 0)

    ip, anchor, op = jax.lax.while_loop(
        lambda s: s[0] <= blen - 4, probe, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )

    # tail literal (reference src/internal.jl:242-248)
    op = jax.lax.cond(
        anchor < blen, lambda o: emit_literal(o, anchor, blen - anchor), lambda o: o, op
    )
    meta_ref[0, 0, 0] = op


def _build(block_size: int, interpret: bool, min_profit: int = 1):
    if block_size % LANES:
        raise ValueError(f"block_size must be a multiple of {LANES}")
    n = block_size
    nri = -(-(n + ENC_PAD) // LANES) + 1
    nro = -(-BLOCK_MAX_OUT // LANES) + 1
    nw = (n + ENC_PAD) // 4

    kernel = functools.partial(
        _encode_kernel, nri=nri, nro=nro, interpret=interpret, min_profit=min_profit
    )

    def fn(blocks_u8: jnp.ndarray, blens: jnp.ndarray):
        b = blocks_u8.shape[0]
        assert blocks_u8.shape[1] == n + ENC_PAD
        dists = candidate_dists(blocks_u8, blens).reshape(b, 1, n)
        words = jax.lax.bitcast_convert_type(
            blocks_u8.reshape(b, nw, 4), jnp.int32
        ).reshape(b, 1, nw)
        pad = nri * LANES - blocks_u8.shape[1]
        inp_i32 = jnp.pad(blocks_u8, ((0, 0), (0, pad))).astype(jnp.int32).reshape(b, nri, LANES)
        out_rows, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nri, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, nro, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, nro, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
            ),
            interpret=interpret,
        )(blens.reshape(b, 1, 1), words, dists, inp_i32)
        out = out_rows.reshape(b, nro * LANES)[:, :BLOCK_MAX_OUT].astype(jnp.uint8)
        return out, meta.reshape(b)

    return fn


@functools.lru_cache(maxsize=8)
def encode_blocks_jit(block_size: int = BLOCK_SIZE, interpret: bool = False, min_profit: int = 1):
    """jit-compiled Pallas block encoder.

    (uint8[B, block_size + ENC_PAD], int32[B] lengths) ->
    (uint8[B, BLOCK_MAX_OUT] tag streams, int32[B] emitted lengths).
    Output contract matches encode_xla.encode_blocks_jit. ``min_profit``
    sets the greedy take threshold (1 = densest, reference-equivalent;
    higher values thin tags for decode speed at a small density cost).
    """
    return jax.jit(_build(block_size, interpret, min_profit))
