"""Two-pass parallel Snappy decoder as an XLA array program.

This is the TPU-native replacement for the reference's sequential tag loop
(reference src/internal.jl:411-466), which is fundamentally serial: each
tag's position depends on the previous tag's length, and each copy reads
output produced by earlier tags. Both chains are broken here (SURVEY.md §7
step 3):

  pass 1  parse a candidate tag at EVERY byte position (vectorized LUT
          decode), giving a strictly-increasing successor map ``next``;
          the true tag boundaries are the orbit of the header end under
          ``next``, computed by pointer-doubling in O(log n) gather/scatter
          rounds (`primitives.reach_from`).

  pass 2  per-tag output offsets via a masked prefix sum; literals resolve
          to input gathers; copy positions form a source chain
          src[o] = o - offset which is chased to its literal fixpoint in
          O(log n) rounds (`primitives.resolve_sources`) — overlapping RLE
          copies resolve naturally since the chain unrolls the sequential
          byte-by-byte semantics.

All corruption checks of the reference are enforced branch-free and reduced
to a single ``ok`` flag (offset==0, out-of-range offsets/lengths, literal
overruns, output-length mismatch: reference src/internal.jl:493-518,
src/Snappy.jl:50).

Shapes are static (jit-cached per padded-size bucket); actual lengths are
traced scalars. Works on any backend; the Pallas path reuses the same
structure with fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .primitives import (
    CHAR_TABLE_I32,
    WORDMASK_U32,
    exclusive_cumsum,
    le32_at_every_position,
    reach_from,
    resolve_sources,
)

# Slack bytes appended to the compressed buffer so the blind 4-byte trailer
# load at the last positions stays in bounds (reference src/internal.jl:421-430).
COMP_PAD = 4


def parse_all_positions(comp_padded: jnp.ndarray, limit: int):
    """Decode a candidate tag at every byte position.

    comp_padded: uint8[Nc + COMP_PAD]. Returns per-position arrays over
    [0, Nc): entry fields, output length, bytes consumed, copy offset.
    ``limit`` is a static clamp (> any valid length) keeping corrupt-stream
    arithmetic in int32 without losing the corruptness of the values.
    """
    nc = comp_padded.shape[-1] - COMP_PAD
    c = comp_padded[..., :nc].astype(jnp.int32)
    entry = CHAR_TABLE_I32[c]
    taglen = entry >> 11
    tag32 = le32_at_every_position(comp_padded)  # uint32[... , Nc+1]
    trailer_u = tag32[..., 1 : nc + 1] & WORDMASK_U32[taglen]
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


def decode_padded(comp_padded: jnp.ndarray, clen, ulen, start, out_size: int):
    """Decode one raw tag stream.

    comp_padded: uint8[Nc + COMP_PAD] (zero slack past clen)
    clen, ulen, start: traced int32 scalars — compressed length, claimed
        uncompressed length (<= out_size), first tag position.
    Returns (out: uint8[out_size], ok: bool, total_out: int32).
    """
    nc = comp_padded.shape[-1] - COMP_PAD
    nu = out_size
    limit = nc + nu + 16
    pos = jnp.arange(nc, dtype=jnp.int32)

    t = parse_all_positions(comp_padded, limit)

    # --- pass 1: tag boundaries.
    nxt = jnp.minimum(pos + t["consumed"], nc)
    reach = reach_from(start, nxt, nc)
    # The loop never starts a tag at the final byte (a tag needs >= 2 bytes;
    # reference src/internal.jl:416).
    is_tag = reach & (pos < clen - 1)

    # --- pass 2: output offsets.
    out_len_m = jnp.where(is_tag, t["out_len"], 0)
    opos = exclusive_cumsum(out_len_m)
    total = jnp.sum(out_len_m)

    # --- corruption checks (reference src/internal.jl:493-518, Snappy.jl:50).
    bad_copy = (t["offset"] == 0) | (opos < t["offset"]) | (opos + t["out_len"] > ulen)
    bad_lit = (pos + 1 + t["taglen"] + t["lit_len"] > clen) | (opos + t["lit_len"] > ulen)
    bad = is_tag & jnp.where(t["is_copy"], bad_copy, bad_lit)
    ok = jnp.logical_not(jnp.any(bad)) & (total == ulen)

    # --- materialize: scatter per-tag records to their output start.
    t_opos = jnp.where(is_tag, opos, nu)  # invalid -> dropped
    out_iota = jnp.arange(nu, dtype=jnp.int32)
    # int32 throughout: bool scatters/gathers lower to scalar loops on TPU.
    mark = jnp.zeros(nu, jnp.int32).at[t_opos].set(1, mode="drop") > 0
    seg_lit = jnp.zeros(nu, jnp.int32).at[t_opos].set(pos + 1 + t["taglen"], mode="drop")
    seg_off = jnp.zeros(nu, jnp.int32).at[t_opos].set(t["offset"], mode="drop")
    seg_iscopy = jnp.zeros(nu, jnp.int32).at[t_opos].set(t["is_copy"].astype(jnp.int32), mode="drop")

    # Segment-start position for every output byte, then per-byte delta.
    spos = jax.lax.cummax(jnp.where(mark, out_iota, 0))
    delta = out_iota - spos

    lit_idx = jnp.clip(seg_lit[spos] + delta, 0, nc + COMP_PAD - 1)
    # Gather bytes through an int32 copy: TPU XLA executes uint8 gathers at
    # scalar rate (~100x slower than int32 gathers, measured on v5e).
    comp_i32 = comp_padded.astype(jnp.int32)
    lit_val = comp_i32[lit_idx]
    src = jnp.where(seg_iscopy[spos] > 0, out_iota - seg_off[spos], out_iota)
    src = jnp.clip(src, 0, nu - 1)

    # --- resolve LZ back-reference chains to literal fixpoints.
    src_fix = resolve_sources(src)
    out = lit_val[src_fix].astype(jnp.uint8)
    return out, ok, total


@functools.lru_cache(maxsize=64)
def decode_padded_jit(nc_padded: int, out_size: int):
    """jit-compiled decoder for a (compressed-bucket, output-bucket) pair."""

    @jax.jit
    def fn(comp_padded, clen, ulen, start):
        return decode_padded(comp_padded, clen, ulen, start, out_size)

    assert nc_padded >= COMP_PAD + 1
    return fn


# ---------------------------------------------------------------------------
# Block-batched decode (framed container fast path): same program vmapped
# over independent blocks — this is what shards across chips (SURVEY.md §2
# "block data-parallelism").


def decode_blocks(comp_blocks: jnp.ndarray, clens: jnp.ndarray, ulens: jnp.ndarray, out_size: int):
    """Decode a batch of independent tag streams (no varint headers).

    comp_blocks: uint8[B, Cmax + COMP_PAD]; clens/ulens: int32[B].
    Returns (out: uint8[B, out_size], ok: bool[B], total: int32[B]).
    """
    starts = jnp.zeros_like(clens)
    # Block tag streams are headerless; a lone final byte can still not be a
    # tag, which decode_padded's (pos < clen-1) mask already enforces.
    fn = functools.partial(decode_padded, out_size=out_size)
    return jax.vmap(fn)(comp_blocks, clens, ulens, starts)


@functools.lru_cache(maxsize=32)
def decode_blocks_jit(cmax_padded: int, out_size: int):
    @jax.jit
    def fn(comp_blocks, clens, ulens):
        return decode_blocks(comp_blocks, clens, ulens, out_size)

    return fn
