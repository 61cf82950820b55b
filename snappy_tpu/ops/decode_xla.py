"""Two-pass parallel Snappy decoder as an XLA array program.

This is the TPU-native replacement for the reference's sequential tag loop
(reference src/internal.jl:411-466), which is fundamentally serial: each
tag's position depends on the previous tag's length, and each copy reads
output produced by earlier tags. Both chains are broken here (SURVEY.md §7
step 3):

  pass 1  parse a candidate tag at EVERY byte position (vectorized LUT
          decode), giving a strictly-increasing successor map ``next``;
          the true tag boundaries are the ORBIT of the header end under
          ``next``, enumerated by pointer-doubling list growth
          (L <- L ++ J(L); J <- J∘J) and then sorted into tag order.

  pass 2  per-tag output offsets via a prefix sum over the sorted tag
          list; each output byte finds its producing tag by binary search
          (searchsorted) over the tag output offsets; literals resolve to
          input gathers; copy positions form a source chain
          src[o] = o - offset chased to its literal fixpoint in O(log n)
          gather rounds — overlapping RLE copies resolve naturally since
          the chain unrolls the sequential byte-by-byte semantics.

All corruption checks of the reference are enforced branch-free and reduced
to a per-block ``ok`` flag (offset==0, out-of-range offsets/lengths,
literal overruns, output-length mismatch: reference src/internal.jl:493-518,
src/Snappy.jl:50).

TPU lowering notes (measured on v5e): the program is written natively
batched (B, N) and SCATTER-FREE — XLA TPU executes scatters (and vmapped
1-D gathers) at scalar rate, while batched 2-D ``take_along_axis``,
``sort``, ``cumsum`` and ``searchsorted`` all run at tens of Gelem/s. The
single-stream raw path is the B=1 case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .primitives import (
    CHAR_TABLE_I32,
    WORDMASK_U32,
    ceil_log2,
    exclusive_cumsum,
    isolate,
    le32_at_every_position,
)

# Slack bytes appended to the compressed buffer so the blind 4-byte trailer
# load at the last positions stays in bounds (reference src/internal.jl:421-430).
COMP_PAD = 4


def _take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather on the fast TPU path (plain 2-D take_along_axis).

    Operands and result are fenced with optimization barriers: XLA:TPU's
    fast gather emitter applies only to STANDALONE gathers — fused with
    elementwise neighbors the whole fusion lowers to a scalar loop
    (measured here: parse stage 48.7ms -> sub-ms once fenced).
    """
    x, idx = isolate(x, idx)
    return isolate(jnp.take_along_axis(x, idx, axis=-1))


def parse_all_positions(comp_padded: jnp.ndarray, limit: int):
    """Decode a candidate tag at every byte position (batched).

    comp_padded: uint8[B, Nc + COMP_PAD]. Returns per-position arrays over
    [B, Nc): entry fields, output length, bytes consumed, copy offset.
    ``limit`` is a static clamp (> any valid length) keeping corrupt-stream
    arithmetic in int32 without losing the corruptness of the values.
    """
    nc = comp_padded.shape[-1] - COMP_PAD
    b = comp_padded.shape[0]
    c = comp_padded[..., :nc].astype(jnp.int32)
    entry = _take(jnp.broadcast_to(CHAR_TABLE_I32, (b, 256)), c)
    taglen = entry >> 11
    tag32 = le32_at_every_position(comp_padded)
    trailer_u = tag32[..., 1 : nc + 1] & _take(jnp.broadcast_to(WORDMASK_U32, (b, 5)), taglen)
    trailer = jnp.minimum(trailer_u, jnp.uint32(limit)).astype(jnp.int32)
    is_copy = (c & 3) != 0
    length = entry & 0xFF
    lit_len = length + trailer
    out_len = jnp.where(is_copy, length, lit_len)
    consumed = 1 + taglen + jnp.where(is_copy, 0, lit_len)
    offset = (entry & 0x700) + trailer
    return {
        "is_copy": is_copy,
        "taglen": taglen,
        "out_len": out_len,
        "consumed": consumed,
        "offset": offset,
        "lit_len": lit_len,
    }


def tag_orbit(starts: jnp.ndarray, nxt: jnp.ndarray, max_tags: int) -> jnp.ndarray:
    """Sorted tag positions: the orbit of starts[b] under i -> nxt[b, i].

    nxt: int32[B, N], strictly increasing per row, values in [0, N] with N
    the absorbing sentinel. Returns int32[B, CAP] ascending, where CAP is
    max_tags rounded up to a power of two; slots past the orbit hold N.

    Doubling list growth: L holds the first len(L) chain elements and J is
    the len(L)-step map, so L ++ J(L) doubles coverage per round — gathers
    only, no scatter (TPU scatters run at scalar rate).
    """
    b, n = nxt.shape
    jump = jnp.concatenate([nxt.astype(jnp.int32), jnp.full((b, 1), n, jnp.int32)], axis=-1)
    orbit = starts.astype(jnp.int32)[:, None]
    rounds = ceil_log2(max_tags)
    for _ in range(rounds):
        orbit = jnp.concatenate([orbit, _take(jump, orbit)], axis=-1)
        jump = _take(jump, jump)
    # Entries at/past the sentinel are not tags; sort pushes them to the end.
    orbit = jnp.where(orbit >= n, n, orbit)
    return jnp.sort(orbit, axis=-1)


def decode_blocks_impl(comp: jnp.ndarray, clens, ulens, starts, out_size: int):
    """Decode B independent tag streams.

    comp: uint8[B, Nc + COMP_PAD] (zero slack past each clen)
    clens, ulens, starts: int32[B] — compressed lengths, claimed output
        lengths (<= out_size), first tag positions (0 for headerless
        framed blocks, the varint header length for raw streams).
    Returns (out: uint8[B, out_size], ok: bool[B], total: int32[B]).
    """
    b = comp.shape[0]
    nc = comp.shape[-1] - COMP_PAD
    nu = out_size
    limit = nc + nu + 16
    pos = jnp.arange(nc, dtype=jnp.int32)[None, :]
    clens_c = clens[:, None]

    t = parse_all_positions(comp, limit)

    # --- pass 1: tag boundaries = sorted orbit of the successor map.
    nxt = jnp.minimum(pos + t["consumed"], nc)
    # Every tag consumes >= 2 bytes, so a chain holds at most nc/2+2 tags.
    tags = tag_orbit(starts, nxt, nc // 2 + 2)  # int32[B, CAP] ascending
    # A tag never starts at the final byte (needs >= 2 bytes;
    # reference src/internal.jl:416).
    valid = (tags < clens_c - 1) & (tags >= starts[:, None])
    tags_c = jnp.minimum(tags, nc - 1)

    def tag_field(arr, fill=0):
        v = _take(arr, tags_c)
        return jnp.where(valid, v, fill)

    t_out_len = tag_field(t["out_len"])
    t_is_copy = tag_field(t["is_copy"].astype(jnp.int32)) > 0
    t_offset = tag_field(t["offset"])
    t_taglen = tag_field(t["taglen"])
    t_lit_len = tag_field(t["lit_len"])

    # --- pass 2: output offsets per tag.
    topos = exclusive_cumsum(t_out_len)
    total = jnp.sum(t_out_len, axis=-1)
    ulens_c = ulens[:, None]

    # --- corruption checks (reference src/internal.jl:493-518, Snappy.jl:50).
    bad_copy = (t_offset == 0) | (topos < t_offset) | (topos + t_out_len > ulens_c)
    bad_lit = (tags + 1 + t_taglen + t_lit_len > clens_c) | (topos + t_lit_len > ulens_c)
    bad = valid & jnp.where(t_is_copy, bad_copy, bad_lit)
    ok = jnp.logical_not(jnp.any(bad, axis=-1)) & (total == ulens)

    # --- materialize: each output byte finds its tag by binary search over
    # the tag output offsets (no scatter).
    big = jnp.int32(nu + nc + 32)
    topos_key = jnp.where(valid, topos, big)
    out_iota = jnp.arange(nu, dtype=jnp.int32)[None, :]
    tagidx = jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="right"))(
        topos_key, jnp.broadcast_to(out_iota, (b, nu))
    ).astype(jnp.int32)
    tagidx = jnp.clip(tagidx - 1, 0, tags.shape[-1] - 1)

    o_tag = _take(tags_c, tagidx)  # input position of my tag
    o_opos = _take(topos, tagidx)
    o_iscopy = _take(t_is_copy.astype(jnp.int32), tagidx) > 0
    o_off = _take(t_offset, tagidx)
    o_litsrc = _take(tags_c + 1 + t_taglen, tagidx)
    delta = out_iota - o_opos

    lit_idx = jnp.clip(o_litsrc + delta, 0, nc + COMP_PAD - 1)
    # Gather bytes through an int32 copy: uint8 gathers run at scalar rate.
    comp_i32 = comp.astype(jnp.int32)
    lit_val = _take(comp_i32, lit_idx)
    src = jnp.where(o_iscopy, out_iota - o_off, out_iota)
    src = jnp.clip(src, 0, nu - 1)

    # --- resolve LZ back-reference chains to literal fixpoints
    # (gather-only pointer chasing; RLE-correct).
    def body(_, s):
        return _take(s, s)

    src_fix = jax.lax.fori_loop(0, ceil_log2(nu + 1), body, src)
    out = _take(lit_val, src_fix).astype(jnp.uint8)
    return out, ok, total


def decode_blocks(comp_blocks: jnp.ndarray, clens: jnp.ndarray, ulens: jnp.ndarray, out_size: int):
    """Decode a batch of independent headerless block tag streams
    (the framed fast path; this axis is what shards across chips)."""
    return decode_blocks_impl(comp_blocks, clens, ulens, jnp.zeros_like(clens), out_size)


def decode_padded(comp_padded: jnp.ndarray, clen, ulen, start, out_size: int):
    """Decode one raw tag stream (B=1 case of decode_blocks_impl)."""
    out, ok, total = decode_blocks_impl(
        comp_padded[None, :],
        jnp.asarray(clen, jnp.int32)[None],
        jnp.asarray(ulen, jnp.int32)[None],
        jnp.asarray(start, jnp.int32)[None],
        out_size,
    )
    return out[0], ok[0], total[0]


@functools.lru_cache(maxsize=64)
def decode_padded_jit(nc_padded: int, out_size: int):
    """jit-compiled decoder for a (compressed-bucket, output-bucket) pair."""

    @jax.jit
    def fn(comp_padded, clen, ulen, start):
        return decode_padded(comp_padded, clen, ulen, start, out_size)

    assert nc_padded >= COMP_PAD + 1
    return fn


@functools.lru_cache(maxsize=32)
def decode_blocks_jit(cmax_padded: int, out_size: int):
    @jax.jit
    def fn(comp_blocks, clens, ulens):
        return decode_blocks(comp_blocks, clens, ulens, out_size)

    return fn
