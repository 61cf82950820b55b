"""Pallas TPU decoder: sequential-tag kernel, one grid step per 64 KiB block.

Why this shape: XLA:TPU executes data-dependent gathers/scatters at scalar
rate (~0.1 Gelem/s measured on v5e), so the log-round data-parallel decoder
in decode_xla.py is memory-op bound ~100x below the reference CPU baseline.
This kernel instead embraces the tag stream's sequential structure
(reference src/internal.jl:411-466) but splits it at the RIGHT
granularity for the hardware:

  - tag PARSING is data-parallel: an XLA elementwise prepass decodes a
    candidate tag at EVERY byte position into one packed int32 (PX) —
    replacing the reference's per-tag byte fiddling with ~25 vector ops
    over the whole buffer (~100 Gelem/s on the VPU);
  - the tag WALK runs on the scalar core over the SMEM-resident PX array:
    one load + a dozen scalar ops per tag (the chain ip -> ip+consumed is
    the only truly sequential dependence in the format);
  - byte MOVEMENT runs on the VPU as full-row (128-lane) operations: any
    span copy is "load two source rows, merge, one dynamic lane roll,
    masked row write" — ~6 vector ops per 128 output bytes;
  - self-overlapping copies (RLE, reference src/internal.jl:469-509) use
    chunk doubling: copy min(offset, len) bytes, then double the
    materialized span (log2(len/offset) generic moves);
  - blocks are independent (reference src/Snappy.jl:29-33), so the grid
    walks blocks and Pallas double-buffers the HBM->VMEM/SMEM block DMAs
    behind the previous block's decode.

All reference corruption checks are enforced per tag; a failed check stops
the tag loop and clears the block's ok flag (reference src/internal.jl:
493-518, src/Snappy.jl:50). Output equality is bit-exact vs the CPU
oracle on the full corpus (tests/test_pallas_decode.py).
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

# --- PX: packed per-position candidate-tag parse -------------------------
# bits 0..16   f      = literal length (literals) / copy offset (copies),
#                       saturated at 0x1FFFF (any real value above is
#                       necessarily corrupt for block-sized outputs, and
#                       saturation preserves every ">" comparison)
# bits 17..23  cp_len - 1 (copies; <= 63 by the format)
# bits 27..29  taglen = number of extra tag bytes after the opcode
# bit  30      is_copy
F_MASK = 0x1FFFF
F_SAT = 0x1FFFF


def parse_packed(comp_u8_padded: jnp.ndarray) -> jnp.ndarray:
    """Elementwise candidate-tag parse at every byte position.

    comp_u8_padded: uint8[B, NC + COMP_PAD] (zero slack). Returns
    int32[B, NC] of PX words. Pure VPU work: no gathers — the 256-entry
    CHAR_TABLE of the reference (src/internal.jl:47-80) is evaluated
    arithmetically from the tag byte.
    """
    nc = comp_u8_padded.shape[-1] - COMP_PAD
    ci = comp_u8_padded.astype(jnp.int32)
    c = ci[..., :nc]
    b1 = ci[..., 1 : nc + 1]
    b2 = ci[..., 2 : nc + 2]
    b3 = ci[..., 3 : nc + 3]
    b4 = ci[..., 4 : nc + 4]

    kind = c & 3
    hi6 = c >> 2
    is_copy = kind != 0
    lit_extra = jnp.clip(hi6 - 59, 0, 4)
    taglen = jnp.where(is_copy, jnp.where(kind == 1, 1, jnp.where(kind == 2, 2, 4)), lit_extra)

    tr2 = jnp.where(taglen >= 2, b2, 0)
    tr3 = jnp.where(taglen >= 3, b3, 0)
    tr4 = jnp.where(taglen >= 4, b4, 0)
    # Saturating LE combine: tr3 contributes exactly for values <= 2^17
    # (covers every valid block-path length/offset incl. 65536); any
    # larger contribution pins the trailer at the saturation point.
    trailer = jnp.where(taglen >= 1, b1, 0) + (tr2 << 8) + (tr3 << 16) + tr4 * F_SAT
    trailer = jnp.minimum(trailer, F_SAT - 1)

    lit_len = jnp.where(lit_extra > 0, trailer + 1, hi6 + 1)
    cp_len = jnp.where(kind == 1, 4 + (hi6 & 7), hi6 + 1)
    offset = jnp.minimum(jnp.where(kind == 1, ((c >> 5) & 7) << 8, 0) + trailer, F_SAT)

    f = jnp.where(is_copy, offset, lit_len)
    return f | ((cp_len - 1) << 17) | (taglen << 27) | (is_copy.astype(jnp.int32) << 30)


def _roll(vec, shift, *, interpret: bool):
    """Circular right-shift of a (1, LANES) row by a dynamic amount."""
    if interpret:
        return jnp.roll(vec, shift, axis=1)
    return pltpu.roll(vec, shift, 1)


def _decode_kernel(
    clen_ref,  # SMEM (1, 1, 1) int32
    ulen_ref,  # SMEM (1, 1, 1) int32
    px_ref,  # SMEM (1, 1, NC) int32: packed per-position parse
    comp_ref,  # VMEM (1, NRC, LANES) int32: compressed bytes one-per-lane
    out_ref,  # VMEM (1, NRU, LANES) int32: output bytes one-per-lane
    meta_ref,  # SMEM (1, 1, 2) int32: [ok, produced]
    *,
    nrc: int,
    nru: int,
    interpret: bool,
):
    clen = clen_ref[0, 0, 0]
    ulen = ulen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def make_move(ref, nrows):
        """Span mover reading from ``ref`` (comp for literals, out for
        back-references) and writing to out. One dynamic roll per row:
        with ph = q & 127, the merged row for bytes [q, q+128) is
        roll(where(lane >= ph, rows[qr], rows[qr+1]), 128-ph): element
        (l+ph) mod 128 of the pre-roll select picks rows[qr][l+ph] for
        l < 128-ph and rows[qr+1][l+ph-128] otherwise."""

        def span(q, ph, shift):
            qr = q >> 7
            a = ref[0, jnp.clip(qr, 0, nrows - 1), :].reshape(1, LANES)
            b = ref[0, jnp.clip(qr + 1, 0, nrows - 1), :].reshape(1, LANES)
            return _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)

        def move(s, o, length):
            """Copy ``length`` (>=1) bytes from byte addr ``s`` in ``ref``
            to output byte addr ``o``. For ref==out the caller guarantees
            the source span is materialized and ends at/before ``o``."""
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
                    out_ref[0, jnp.clip(dr, 0, nru - 1), :] = span(
                        dr * LANES - d, ph, shift
                    ).reshape(LANES)
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

        # --- corruption checks (reference src/internal.jl:493-518).
        ok_lit = ip + consumed <= clen
        ok_copy = (f > 0) & (f <= op) & (ip + 1 + taglen <= clen)
        tag_ok = jnp.where(is_copy, ok_copy, ok_lit) & (op + length <= ulen)

        @pl.when(tag_ok & ~is_copy)
        def _():
            move_lit(ip + 1 + taglen, op, f)

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
        lambda s: (s[0] < clen) & s[2],
        tag_step,
        (jnp.int32(0), jnp.int32(0), jnp.bool_(True)),
    )
    meta_ref[0, 0, 0] = (ok & (op == ulen)).astype(jnp.int32)
    meta_ref[0, 0, 1] = op


def _build(cmax_padded: int, out_size: int, interpret: bool):
    if out_size % LANES:
        raise ValueError(f"out_size must be a multiple of {LANES}")
    cmax_padded = max(cmax_padded, COMP_PAD + 1)  # degenerate empty streams
    nru = out_size // LANES
    # One spare row so span()'s second row read stays in bounds.
    nrc = -(-cmax_padded // LANES) + 1
    nc = cmax_padded - COMP_PAD

    kernel = functools.partial(_decode_kernel, nrc=nrc, nru=nru, interpret=interpret)

    def fn(comp_u8: jnp.ndarray, clens: jnp.ndarray, ulens: jnp.ndarray):
        b = comp_u8.shape[0]
        if comp_u8.shape[1] < cmax_padded:
            comp_u8 = jnp.pad(comp_u8, ((0, 0), (0, cmax_padded - comp_u8.shape[1])))
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
            interpret=interpret,
        )(clens.reshape(b, 1, 1), ulens.reshape(b, 1, 1), px, comp_i32)
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
