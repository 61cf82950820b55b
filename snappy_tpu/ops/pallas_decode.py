"""Pallas TPU decoder: scalar tag walk + FAR/NEAR-partitioned record drains.

The snappy tag stream is a serial chain (reference src/internal.jl:411-466:
each tag's length determines where the next begins), so one scalar-core
walk per 64 KiB block is unavoidable. Everything else is arranged around
measured v5e facts (benchmarks/NEGATIVE_RESULTS.md):

  1. The walk's serial recurrence is one dependent SMEM load plus the
     address ALU (~9-13 cyc/tag with the record stores' issue load).
  2. Record drains are scalar-ISSUE bound at ~18-22 ops/record; Mosaic
     orders any VMEM load after prior stores to the same ref (~70-cycle
     stall), so loads must come from refs that are never stored to, or be
     batched ahead of stores.
  3. Every vectorization escape hatch (lane gathers, one-hot selects,
     multi-record tiles, XLA gathers/scans) measured 1-2 orders of
     magnitude off; the per-record scalar-issue architecture is the right
     one for this core.

Structure per block (grid step):

  PREPASS (XLA, vector): every byte position is decoded as a candidate
  tag into TWO packed words: a command word (f/n payloads, validity) and
  a walk word with the full input advance in the low bits, making the
  walk recurrence load -> and -> add and the output advance branch-free
  (olen = adv - cx + n). Same-offset 64-byte COPY_2 chains fold into
  single <= 128-byte records at vector cost.

  WALK (scalar, CHUNK=96 tags): per tag, stores a pre-digested record
  and classifies copies against the chunk's starting output position
  cop0: FAR copies (source entirely below cop0 — ~80% of corpus copies
  at CHUNK=96) vs NEAR (source reaches into this chunk's output).
  Positions past the stream parse as valid no-ops; invalid positions
  parse as zero-advance, pinning the walk so the chunk ends with ok=0.

  SNAPSHOT: outa_ref holds a copy of all output below cop0, refreshed
  once per chunk (the rows the previous chunk wrote, one ordering stall
  per chunk).

  LITERAL DRAIN: sources live in comp_ref (never written) — pipelines
  freely; one masked-store row move per record, row-crossing records
  queue branch-free into a cleanup pass.

  FAR DRAIN: the literal drain's twin reading outa_ref (never written
  during drains): no ordering stalls, no hazard tests, and no RLE
  machinery (far + self-overlap is impossible: f < n would imply
  src + n > op > cop0).

  NEAR DRAIN (ordered): staged groups over out_ref — all loads, then all
  masked stores, one ordering stall per group; hazards (source at-or-past
  the group leader's output: RLE self-overlap and within-group sources)
  and row-crossing records queue branch-free and re-run serially after
  the group's stores, RLE extending the reloaded period in-register by
  lane-doubling rolls.

Drain order per chunk — literals, FAR, NEAR — preserves the dependence
structure: FAR sources predate the chunk entirely; NEAR runs when all
literals and FAR output are materialized, with group hazards covering
intra-NEAR dependencies.

Blocks are independent (reference src/Snappy.jl:29-33): grid = one step
per block; Pallas double-buffers the HBM<->VMEM block DMAs. Bit-exactness
vs the CPU oracle across the corpus: tests/test_pallas_decode.py.

Round-5 honesty note: on-chip, this kernel and the pinned round-4 grouped
kernel (pallas_decode_r4.py) trade places with the chip's thermal regime
(ab_robust measurements: r5 ~0.87x r4 time in fast regimes, ~1.15x in
slow ones); bench.py times both in-process and autotunes the headline.
"""

from __future__ import annotations
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
# Walk chunk: tags per inner fixed-count loop; record arrays hold one
# chunk plus the no-op sentinel records appended for drain over-read.
# 128 (not 1024) because the FAR/NEAR copy split classifies against the
# chunk's starting output position: smaller chunks freeze the snapshot
# frontier closer to each copy, raising the stall-free FAR share
# (measured on the corpus: 48.7% at 1024, 70.7% at 256, 78.8% at 128;
# on-chip A/B: c128 27.1 ms vs c256 41.4 ms vs r4 31.5 ms on the
# 128-block batch — benchmarks/NEGATIVE_RESULTS.md round-5 addendum).
CHUNK = 96
WALK_UNROLL = 16  # tags per walk backedge
GROUP = 8  # NEAR-copy-drain batch width
# (round-5 in-regime sweep: c128/g16 50.5 ms -> c128/g8 46.3 -> c96/g8
# 45.3 on the 128-block batch; smaller NEAR groups shrink the hazard
# window faster than they add ordering stalls once FAR carries ~80% of
# copies)

# Unified per-position command word (ONE int32 per byte position — halves
# the per-block SMEM command DMA vs the old cmdA/cmdB pair). Class bits
# live at fixed positions; the payload layout is class-dependent:
#   literal: bits 0-16 output length (<= 131064: covers the <= 128 KiB
#            output segments non-blocking encoders produce)
#   copy:    bits 0-16 offset f (17 bits for the same reason; wider
#            offsets cannot satisfy f <= op in a supported segment and
#            parse as INVALID, keeping corrupt COPY_4 offsets detectably
#            bad); bits 20-28 copy length (<= 128 after same-offset chain
#            folding)
# shared:  bits 17-19 input advance minus the literal body (cx);
#          bit 29 is-literal; bit 30 statically-valid (or padding);
#          bit 31 real (a position inside the stream — pads clear it so
#          record counters freeze once a walk runs past its stream end).
A_LEN_BITS = 0x1FFFF  # literal: bits 0-16 output length (0 for pad/invalid)
C_F_BITS = 0x1FFFF  # copy: bits 0-16 offset (17 bits: segments from
# non-blocking encoders may span up to 128 KiB of output, so in-segment
# back-references reach offsets up to 131071 — reference
# src/internal.jl:28-30 requires accepting them)
A_CX_SHIFT = 17  # bits 17-19: input advance minus the literal body
C_N_SHIFT = 20  # copy: bits 20-28 length (<=128 folded; 0 for pad/invalid/literal)
A_LIT_SHIFT = 29  # bit 29: is-literal
A_VALID_SHIFT = 30  # bit 30: statically valid (or padding)
A_REAL_SHIFT = 31  # bit 31: real in-stream position


def parse_cmds(comp_u8: jnp.ndarray, clens: jnp.ndarray, fold: bool = True):
    """Candidate-tag parse at every byte position, word-aligned.

    comp_u8: uint8[B, C] with C % 4 == 0 and >= COMP_PAD zero slack after
    every stream; clens: int32[B]. Returns one unified command word per
    position, int32[B, C] (layout at the top of this module).

    All arithmetic is elementwise on the uint32 word view plus ONE
    shift-by-one-word concat; byte positions p = 4q + r are handled as four
    aligned planes interleaved back by a contiguous reshape. (A naive
    byte-shifted-slice formulation costs ~27 ms per 128-block batch on
    v5e from lane-unaligned relayouts; this runs at VPU speed.)
    """
    b, c = comp_u8.shape
    assert c % 4 == 0
    nw = c // 4
    w = jax.lax.bitcast_convert_type(comp_u8.reshape(b, nw, 4), jnp.uint32)
    w1 = jnp.concatenate([w[:, 1:], jnp.zeros((b, 1), jnp.uint32)], axis=1)

    def byte_at(k: int):
        """All bytes at position p+k for the four planes, as uint32[B, NW][r]."""
        return [
            ((w >> (8 * (r + k))) & 0xFF) if r + k <= 3 else ((w1 >> (8 * (r + k - 4))) & 0xFF)
            for r in range(4)
        ]

    c0 = byte_at(0)
    c1 = byte_at(1)
    c2 = byte_at(2)
    c3 = byte_at(3)
    c4 = byte_at(4)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (b, nw), 1) * 4
    clen = clens.astype(jnp.int32)[:, None]

    outs_a = []
    real_bit = jnp.int32(-(1 << 31))  # bit 31 as an int32 constant
    for r in range(4):
        cc, b1, b2, b3, b4 = c0[r], c1[r], c2[r], c3[r], c4[r]
        pos = qpos + r
        kind = (cc & 3).astype(jnp.int32)
        hi6 = (cc >> 2).astype(jnp.int32)
        is_copy = kind != 0

        # Literal: tag encodes len-1 directly (<60) or a 1-4 byte LE trailer
        # (reference src/internal.jl:252-287).
        extra = jnp.clip(hi6 - 59, 0, 4)
        trailer = (
            jnp.where(extra >= 1, b1, 0)
            | jnp.where(extra >= 2, b2 << 8, 0)
            | jnp.where(extra >= 3, b3 << 16, 0)
            | jnp.where(extra >= 4, b4 << 24, 0)
        )
        lit_m1 = jnp.where(extra > 0, trailer, hi6.astype(jnp.uint32))
        # literal lengths up to the 17-bit field (minus tag-byte headroom so
        # the walk word's input-advance field cannot overflow); segments
        # that would need more are declined by the native segmenter and
        # take the windowed XLA fallback
        poison = lit_m1 > jnp.uint32(A_LEN_BITS - 8)
        lit_len = (jnp.minimum(lit_m1, jnp.uint32(A_LEN_BITS - 8)) + 1).astype(jnp.int32)
        cons_lit = 1 + extra + lit_len

        # Copy: COPY_1/2/4 length and offset fields (reference
        # src/internal.jl:47-85, 289-329).
        taglen = jnp.where(kind == 1, 1, jnp.where(kind == 2, 2, 4))
        cp_len = jnp.where(kind == 1, 4 + (hi6 & 7), hi6 + 1)
        f_raw = jnp.where(
            kind == 1,
            (((hi6 >> 3) & 7).astype(jnp.uint32) << 8) | b1,
            jnp.where(kind == 2, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)),
        )
        f = jnp.minimum(f_raw, jnp.uint32(C_F_BITS)).astype(jnp.int32)

        valid_lit = (pos + cons_lit <= clen) & ~poison
        # Offsets above the 17-bit field can never satisfy f <= op in a
        # supported (<= 128 KiB output) segment: mark INVALID so corrupt
        # COPY_4 offsets stay detectably bad without carrying wide fields.
        valid_copy = (pos + 1 + taglen <= clen) & (f_raw > 0) & (f_raw <= jnp.uint32(C_F_BITS))
        valid = jnp.where(is_copy, valid_copy, valid_lit)

        cx = jnp.where(is_copy, 1 + taglen, 1 + extra)
        flags = (
            (cx << A_CX_SHIFT)
            | (jnp.where(is_copy, 0, 1) << A_LIT_SHIFT)
            | (1 << A_VALID_SHIFT)
        ) | real_bit
        word = jnp.where(is_copy, f | (cp_len << C_N_SHIFT), lit_len) | flags

        pad = pos >= clen
        outs_a.append(jnp.where(pad, 1 << A_VALID_SHIFT, jnp.where(valid, word, 0)))

    # ---- chain fold: merge a 64-byte COPY_2 with its same-offset copy
    # successor (the chunks emit_copy splits long matches into, reference
    # src/internal.jl:316-326) into ONE walk/drain record — halves the
    # record count on match-rich data at vector cost. Word-aligned plane
    # arithmetic: position p+3 (a COPY_2 is 3 bytes) lives in plane
    # (r+3)%4, shifted one word for r >= 1. Every position's word remains
    # a valid standalone parse (mid-chain entry and corrupt streams are
    # unaffected); alternating pairs fold, so a k-link chain walks in
    # ceil(k/2) records. Folded n <= 128 keeps the drains' two-row moves
    # and the hazard re-mover sufficient (lo + n <= 255).
    flags3 = jnp.int32(real_bit | (1 << A_VALID_SHIFT))  # real+valid, lit=0
    flagmask = jnp.int32(real_bit | (1 << A_VALID_SHIFT) | (1 << A_LIT_SHIFT))

    if not fold:
        folded = outs_a
    else:
        folded = []
    for r in range(4) if fold else []:
        a = outs_a[r]
        bw = outs_a[(r + 3) % 4]
        if r >= 1:
            bw = jnp.concatenate([bw[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        a_n = (a >> C_N_SHIFT) & 0x1FF
        a_cx = (a >> A_CX_SHIFT) & 7
        b_n = (bw >> C_N_SHIFT) & 0x1FF
        b_cx = (bw >> A_CX_SHIFT) & 7
        fold = (
            ((a & flagmask) == flags3)
            & (a_cx == 3)  # COPY_2: successor is exactly 3 bytes ahead
            & (a_n == 64)
            & ((bw & flagmask) == flags3)
            & (b_cx <= 3)  # COPY_1/2 successors only (cx_new fits 3 bits)
            & (b_n > 0)
            & (((a ^ bw) & C_F_BITS) == 0)  # same offset
        )
        merged = (
            (a & (C_F_BITS | flagmask))
            | ((64 + b_n) << C_N_SHIFT)
            | ((3 + b_cx) << A_CX_SHIFT)
        )
        folded.append(jnp.where(fold, merged, a))

    cmds = jnp.stack(folded, axis=-1).reshape(b, c)

    # ---- walk words: a SECOND per-position array holding exactly what the
    # scalar walk's recurrence needs, with the full input advance in the
    # LOW bits so the serial chain is load -> and -> add -> select (no
    # class select on the critical path):
    #   [31 real][30 valid][29 lit][28:20 n][19:17 cx][16:0 adv]
    # adv = total input advance (literal: 1+extra+len; copy: 1+taglen);
    # the output advance is branch-free: olen = adv - cx + n (literal:
    # n == 0, adv - cx == len; copy: adv == cx, olen == n). Derived
    # elementwise from the folded command words so the two arrays can
    # never disagree.
    lit_b = (cmds >> A_LIT_SHIFT) & 1
    cx_b = (cmds >> A_CX_SHIFT) & 7
    n_b = (cmds >> C_N_SHIFT) & 0x1FF
    adv = jnp.where(lit_b == 1, (cmds & A_LEN_BITS) + cx_b, cx_b)
    flags_b = cmds & jnp.int32((1 << A_LIT_SHIFT) | (1 << A_VALID_SHIFT) | -(1 << 31))
    walkw = adv | (cx_b << A_CX_SHIFT) | (n_b << C_N_SHIFT) | flags_b
    return walkw, cmds


def _roll(vec, shift, *, interpret: bool):
    """Circular right-shift of a (1, LANES) row by a dynamic amount."""
    if interpret:
        return jnp.roll(vec, shift, axis=1)
    return pltpu.roll(vec, shift, 1)


def _masked_store(ref, row_idx, m, keep, *, interpret: bool):
    """Store row m into ref[0, row_idx, :] under lane mask keep."""
    if interpret:
        cur = ref[0, row_idx, :].reshape(1, LANES)
        ref[0, row_idx, :] = jnp.where(keep, m, cur).reshape(LANES)
    else:
        pltpu.store(ref.at[0, row_idx, :], m.reshape(LANES), mask=keep.reshape(LANES))


def _decode_kernel(
    clen_ref,  # SMEM (1, 1, 1) int32
    ulen_ref,  # SMEM (1, 1, 1) int32
    walk_ref,  # SMEM (1, 1, NCP) int32: walk words (adv-low layout)
    cmd_ref,  # SMEM (1, 1, NCP) int32: unified command words (f/n payloads)
    comp_ref,  # VMEM (1, NRC+3, LANES) int32: bytes one-per-lane, row-offset 1
    out_ref,  # VMEM (1, NRU+8, LANES) int32: bytes one-per-lane, row-offset 1
    meta_ref,  # SMEM (1, 1, 2) int32: [ok, produced]
    lit_src_ref,  # SMEM scratch: literal body comp address
    lit_op_ref,  # SMEM scratch
    lit_n_ref,  # SMEM scratch: literal length
    far_op_ref,  # SMEM scratch: FAR-copy output position
    far_fn_ref,  # SMEM scratch: FAR-copy f/n payload (the cmd word)
    near_op_ref,  # SMEM scratch: NEAR-copy output position
    near_fn_ref,  # SMEM scratch: NEAR-copy f/n payload
    ovf_ref,  # SMEM scratch: row-crossing literal queue
    fovf_ref,  # SMEM scratch: row-crossing FAR-copy queue
    hzq_ref,  # SMEM scratch (NEAR_GROUP,) int32: per-group NEAR hazard queue
    outa_ref,  # VMEM scratch (NRU+8, LANES) int32: frozen output snapshot
    *,
    ncp: int,
    nrc: int,
    nru: int,
    interpret: bool,
    debug_mode: int = 0,  # 0=full, 2=walk only, 3=walk+literals, 4=+far copies
    chunk: int = CHUNK,
    near_group: int = GROUP,
):
    clen = clen_ref[0, 0, 0]
    ulen = ulen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # Both byte buffers carry one zero guard row below logical row 0 and two
    # above the last logical row (physical index = logical + 1). Valid
    # records index rows in [-1, nrows+1] by construction, so the drains
    # need ONE clamp per record (for corrupt streams whose garbage lengths
    # explode op before the chunk's ok check) instead of a jnp.clip at all
    # load/store sites — the drains are scalar-issue-bound, so every
    # removed address op is roughly a cycle per record.
    def row(ref, q):
        return ref[0, q + 1, :].reshape(1, LANES)

    def rowa(q):
        return outa_ref[q + 1, :].reshape(1, LANES)

    # Deterministic output (masked stores leave untouched lanes). 8-row
    # tiles: one store issue covers 8 rows, and the backedge count drops
    # 8x (nru+8 is a multiple of 8 by construction in _build).
    zero_tile = jnp.zeros((8, LANES), jnp.int32)

    def zrow(i, _):
        out_ref[0, pl.ds(i * 8, 8), :] = zero_tile
        return 0

    jax.lax.fori_loop(0, (nru + 8) // 8, zrow, 0, unroll=False)

    # ---- generic two-row source builder (blend three rows at phase ph,
    # roll by shift) --------------------------------------------------------
    def make_m2(src_ref, q0c, ph, shift):
        a = row(src_ref, q0c)
        b = row(src_ref, q0c + 1)
        c = row(src_ref, q0c + 2)
        sel = lane >= ph
        m = _roll(jnp.where(sel, a, b), shift, interpret=interpret)
        m2 = _roll(jnp.where(sel, b, c), shift, interpret=interpret)
        return m, m2

    # ---- the walk ----------------------------------------------------------
    # Serial recurrence: ONE dependent SMEM load (walk word) -> and -> add.
    # The command word load (f/n payload for copy classification + records)
    # is INDEPENDENT of the chain, so it pipelines underneath. Each copy is
    # classified here, where op is known: FAR copies source bytes entirely
    # below this chunk's starting output position (cop0) — their sources
    # are frozen in the snapshot buffer, so the FAR drain pipelines with no
    # load-after-store ordering stalls (the measured ~70-cycle Mosaic
    # hazard; benchmarks/NEGATIVE_RESULTS.md) and no self-overlap is
    # possible (f < n would imply src + n > op > cop0). NEAR copies take
    # the staged-group path. At CHUNK=256, ~71% of corpus copies are FAR
    # (benchmarks/farsweep, round 5).
    def walk_chunk(ip, op, okw, cop0):
        def step(state):
            ip, op, okw, tl, tf, tn = state
            v = walk_ref[0, 0, ip]
            fb = cmd_ref[0, 0, ip]  # independent load: pipelines under the chain
            adv = v & A_LEN_BITS
            cxv = (v >> A_CX_SHIFT) & 7
            nv = (v >> C_N_SHIFT) & 0x1FF
            olen = adv - cxv + nv
            rl = jax.lax.shift_right_logical(v, A_REAL_SHIFT)
            lit = (v >> A_LIT_SHIFT) & 1
            fa = (1 - lit) & (op - (fb & C_F_BITS) + nv <= cop0).astype(jnp.int32)
            ne = 1 - lit - fa
            lit_src_ref[tl] = ip + cxv
            lit_op_ref[tl] = op
            lit_n_ref[tl] = olen
            far_op_ref[tf] = op
            far_fn_ref[tf] = fb
            near_op_ref[tn] = op
            near_fn_ref[tn] = fb
            okw &= v
            ip = ip + adv
            op = op + olen
            # real-bit gate: past the stream end (pads) the counters freeze,
            # so drains never see dead records.
            return ip, op, okw, tl + (lit & rl), tf + (fa & rl), tn + (ne & rl)

        def body(i, state):
            for _ in range(WALK_UNROLL):
                state = step(state)
            return state

        z = jnp.int32(0)
        ip, op, okw, tl, tf, tn = jax.lax.fori_loop(
            0, chunk // WALK_UNROLL, body, (ip, op, okw, z, z, z)
        )
        # sentinels so drains may over-read a partial tail group (op=0,
        # fn=0 parses as n == 0: keeps nothing, never hazardous).
        sentinel = ncp - 1
        for j in range(8):
            lit_src_ref[tl + j] = sentinel
            lit_op_ref[tl + j] = 0
            lit_n_ref[tl + j] = 0
            far_op_ref[tf + j] = 0
            far_fn_ref[tf + j] = 0
        for j in range(near_group):
            near_op_ref[tn + j] = 0
            near_fn_ref[tn + j] = 0
        return ip, op, okw, tl, tf, tn

    # ---- literal drain -----------------------------------------------------
    # Sources live in comp_ref, which is never stored to, so these moves
    # pipeline freely. One row store per record in the hot loop; records
    # crossing an output row queue branch-free and finish in a cleanup
    # pass (a pl.when region inside the pipelined loop would serialize it:
    # E8, benchmarks/NEGATIVE_RESULTS.md).
    def drain_literals(tl):
        def one(t, nq):
            src = lit_src_ref[t]
            opv = lit_op_ref[t]
            n = lit_n_ref[t]
            d = opv - src
            shift = d & 127
            ph = (-shift) & 127
            r = jnp.minimum(opv >> 7, nru - 1)  # binds only on corrupt streams
            lo = opv & 127
            q0 = jnp.clip((r * LANES - d) >> 7, -1, nrc - 1)
            a = row(comp_ref, q0)
            b = row(comp_ref, q0 + 1)
            m = _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)
            keep = (lane >= lo) & (lane < lo + n)
            _masked_store(out_ref, r + 1, m, keep, interpret=interpret)
            long = lo + n > LANES
            ovf_ref[nq] = t
            return nq + long.astype(jnp.int32)

        def body(g, nq):
            base = g * 8
            for k in range(8):
                nq = one(base + k, nq)
            return nq

        nq = jax.lax.fori_loop(0, pl.cdiv(tl, 8), body, jnp.int32(0), unroll=False)

        def finish(j, _):
            t = ovf_ref[j]
            src = lit_src_ref[t]
            opv = lit_op_ref[t]
            n = lit_n_ref[t]
            d = opv - src
            shift = d & 127
            ph = (-shift) & 127
            r = jnp.minimum(opv >> 7, nru - 1)
            q0 = (r * LANES - d) >> 7

            def rowloop(q, _):
                qc = jnp.clip(q0 + (q - r), -1, nrc - 1)
                a = row(comp_ref, qc)
                b = row(comp_ref, qc + 1)
                mq = _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)
                gl = q * LANES + lane
                kq = (gl >= opv) & (gl < opv + n)
                _masked_store(out_ref, jnp.minimum(q, nru - 1) + 1, mq, kq, interpret=interpret)
                return 0

            jax.lax.fori_loop(r + 1, jnp.minimum(((opv + n - 1) >> 7) + 1, nru), rowloop, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, nq, finish, 0, unroll=False)

    # ---- FAR copy drain ----------------------------------------------------
    # Sources are frozen in the snapshot (outa_ref), which is only written
    # BETWEEN chunks, so this loop pipelines exactly like the literal
    # drain: no ordering stalls, no hazard tests, no self-overlap. Records
    # crossing an output row (folded copies, ~4% of FARs) queue and finish
    # with ONE extra store each — their source rows also live in the
    # snapshot, so the cleanup pass stays stall-free too.
    def drain_far(tf, okd):
        def one(t, st):
            fq, oks = st
            opv = far_op_ref[t]
            fn = far_fn_ref[t]
            f = fn & C_F_BITS
            n = (fn >> C_N_SHIFT) & 0x1FF
            oks |= opv - f  # src >= 0 validity (sign-bit accumulate)
            shift = f & 127
            ph = (-shift) & 127
            r = jnp.minimum(opv >> 7, nru - 1)
            lo = opv & 127
            # upper bound automatic (f >= 0 so q0 <= r <= nru-1)
            q0 = jnp.maximum((r * LANES - f) >> 7, -1)
            a = rowa(q0)
            b = rowa(q0 + 1)
            m = _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)
            keep = (lane >= lo) & (lane < lo + n)
            _masked_store(out_ref, r + 1, m, keep, interpret=interpret)
            fovf_ref[fq] = t
            return fq + (lo + n > LANES).astype(jnp.int32), oks

        def body(g, st):
            base = g * 8
            for k in range(8):
                st = one(base + k, st)
            return st

        fq, oks = jax.lax.fori_loop(
            0, pl.cdiv(tf, 8), body, (jnp.int32(0), jnp.int32(0)), unroll=False
        )

        def finish(j, _):
            t = fovf_ref[j]
            opv = far_op_ref[t]
            fn = far_fn_ref[t]
            f = fn & C_F_BITS
            n = (fn >> C_N_SHIFT) & 0x1FF
            shift = f & 127
            ph = (-shift) & 127
            r = jnp.minimum(opv >> 7, nru - 1)
            lo = opv & 127
            rem = lo + n - LANES  # < LANES since n <= 128 after folding
            qb = jnp.clip(((r + 1) * LANES - f) >> 7, -1, nru - 1)
            a = rowa(qb)
            b = rowa(qb + 1)
            mb = _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)
            _masked_store(out_ref, r + 2, mb, lane < rem, interpret=interpret)
            return 0

        jax.lax.fori_loop(0, fq, finish, 0, unroll=False)
        return okd & (oks >= 0)

    # ---- NEAR copy drain ---------------------------------------------------
    def hazard_move(src, dst, n):
        """Re-move for one hazardous record (stale group loads). All bytes
        below ``dst`` ARE materialized by now, so a single reload suffices
        for near copies (f >= n); self-overlapping RLE copies (f < n,
        reference src/internal.jl:469-509) extend the loaded period
        IN-REGISTER by lane-doubling rolls — no load-store ping-pong, so
        the whole record pays the reload ordering stall once (plus once
        more for the rare row-crossing tail)."""
        f = dst - src
        shift = f & 127
        ph = (-shift) & 127
        r = jnp.minimum(dst >> 7, nru - 1)
        lo = dst & 127
        q0 = jnp.clip((r * LANES - f) >> 7, -1, nru - 1)
        m, _m2 = make_m2(out_ref, q0, ph, shift)
        # Lanes [lo, lo+f) of m hold bytes that predate this record; for
        # RLE each doubling roll makes lanes [lo+it, lo+2*it) valid too.
        # Stops instantly when f >= n.
        row1 = jnp.minimum(n, LANES - lo)  # bytes this record puts in row r

        def dbl(state):
            mm, it = state
            mm = jnp.where(lane >= lo + it, _roll(mm, it, interpret=interpret), mm)
            return mm, it * 2

        m, _ = jax.lax.while_loop(lambda s: s[1] < row1, dbl, (m, f))
        keep = (lane >= lo) & (lane < lo + n)
        _masked_store(out_ref, r + 1, m, keep, interpret=interpret)

        @pl.when(lo + n > LANES)
        def _():
            # Row-crossing tail: reload AFTER the first-row store so RLE
            # sources in row r are fresh; lanes [0, f) are then valid and
            # the same doubling covers the rest (rem < LANES since n <= 128).
            rem = lo + n - LANES
            qb = jnp.clip(((r + 1) * LANES - f) >> 7, -1, nru - 1)
            mb, _ = make_m2(out_ref, qb, ph, shift)

            def dbl2(state):
                mm, it = state
                mm = jnp.where(lane >= it, _roll(mm, it, interpret=interpret), mm)
                return mm, it * 2

            mb, _ = jax.lax.while_loop(lambda s: s[1] < rem, dbl2, (mb, f))
            _masked_store(out_ref, r + 2, mb, lane < rem, interpret=interpret)

    def drain_near(tn, okd):
        """Staged groups over out_ref: all loads before any store, so the
        ~70-cycle load-after-store ordering stall is paid once per group.
        Hazards (source at-or-past the group leader's output: RLE
        self-overlap and within-group sources) and row-crossing records
        queue branch-free and re-run serially after the group's stores."""

        def fallback(j, _):
            t = hzq_ref[j]
            opv = near_op_ref[t]
            fn = near_fn_ref[t]
            f = fn & C_F_BITS
            n = (fn >> C_N_SHIFT) & 0x1FF
            hazard_move(opv - f, opv, n)
            return 0

        def grp(g, oks):
            base = g * near_group
            lead_op = near_op_ref[base]
            staged = []
            nh = jnp.int32(0)
            for k in range(near_group):
                t = base + k
                opv = near_op_ref[t]
                fn = near_fn_ref[t]
                f = fn & C_F_BITS
                n = (fn >> C_N_SHIFT) & 0x1FF
                src = opv - f
                # validity (src >= 0) accumulates as a sign-bit OR; sentinel
                # records have f == 0, n == 0, opv == 0: never poisoning,
                # never hazardous.
                oks |= src
                shift = f & 127
                ph = (-shift) & 127
                r = jnp.minimum(opv >> 7, nru - 1)
                lo = opv & 127
                q0 = jnp.maximum((r * LANES - f) >> 7, -1)
                hz = (src + n > lead_op) | (lo + n > LANES)
                a = row(out_ref, q0)
                bq = row(out_ref, q0 + 1)
                m = _roll(jnp.where(lane >= ph, a, bq), shift, interpret=interpret)
                staged.append((t, r, lo, n, m, hz))
            for t, r, lo, n, m, hz in staged:
                keep = (lane >= lo) & (lane < lo + n)
                _masked_store(out_ref, r + 1, m, keep, interpret=interpret)
                hzq_ref[nh] = t
                nh += hz.astype(jnp.int32)

            @pl.when(nh > 0)
            def _():
                jax.lax.fori_loop(0, nh, fallback, 0, unroll=False)

            return oks

        oks = jax.lax.fori_loop(0, pl.cdiv(tn, near_group), grp, jnp.int32(0), unroll=False)
        return okd & (oks >= 0)

    # ---- chunked outer loop ------------------------------------------------
    # Per chunk: refresh the snapshot with the rows the previous chunk
    # wrote, walk CHUNK tags (recording 3 record classes), then drain
    # literals -> FAR copies -> NEAR copies. The class split preserves
    # stream order where it matters: FAR sources lie entirely below cop0
    # (frozen), so FAR records depend on nothing in this chunk; NEAR
    # records run last, when all literals and FAR output are materialized,
    # with the group-hazard machinery covering intra-NEAR dependencies.
    def chunk_fn(state):
        ip, op, ok, copp = state
        cop0 = op

        def cp(q, _):
            outa_ref[q + 1, :] = out_ref[0, q + 1, :]
            return 0

        if debug_mode != 2 and debug_mode != 3:
            jax.lax.fori_loop(copp >> 7, jnp.minimum((cop0 >> 7) + 1, nru), cp, 0, unroll=False)
        ip, op, okw, tl, tf, tn = walk_chunk(ip, op, jnp.int32(-1), cop0)
        ok &= ((okw >> A_VALID_SHIFT) & 1) > 0
        if debug_mode != 2:
            drain_literals(tl)
        if debug_mode in (0, 4):
            ok = drain_far(tf, ok)
        if debug_mode == 0:
            ok = drain_near(tn, ok)
        return ip, op, ok, cop0

    ip, op, ok, _ = jax.lax.while_loop(
        lambda s: (s[0] < clen) & s[2] & (s[1] <= ulen),
        chunk_fn,
        (jnp.int32(0), jnp.int32(0), jnp.bool_(True), jnp.int32(0)),
    )

    meta_ref[0, 0, 0] = (ok & (op == ulen)).astype(jnp.int32)
    meta_ref[0, 0, 1] = op


def _build(
    cmax_padded: int,
    out_size: int,
    interpret: bool,
    debug_mode: int = 0,
    chunk: int = CHUNK,
    near_group: int = GROUP,
    fold: bool = True,
):
    if out_size % LANES:
        raise ValueError(f"out_size must be a multiple of {LANES}")
    cmax_padded = max(cmax_padded, COMP_PAD + 1)  # degenerate empty streams
    ncp = -(-cmax_padded // LANES) * LANES  # word- and lane-aligned
    nru = out_size // LANES
    # Logical comp rows; buffers get 1 guard row below + 2 above (see kernel).
    nrc = ncp // LANES

    kernel = functools.partial(
        _decode_kernel,
        ncp=ncp,
        nrc=nrc,
        nru=nru,
        interpret=interpret,
        debug_mode=debug_mode,
        chunk=chunk,
        near_group=near_group,
    )
    cap = chunk + max(8, near_group)

    def fn(comp_u8: jnp.ndarray, clens: jnp.ndarray, ulens: jnp.ndarray):
        b = comp_u8.shape[0]
        if comp_u8.shape[1] < ncp:
            comp_u8 = jnp.pad(comp_u8, ((0, 0), (0, ncp - comp_u8.shape[1])))
        comp_u8 = comp_u8[:, :ncp]
        walkw, cmds = parse_cmds(comp_u8, clens, fold)
        comp_i32 = comp_u8.astype(jnp.int32).reshape(b, nrc, LANES)
        comp_i32 = jnp.pad(comp_i32, ((0, 0), (1, 2), (0, 0)))  # guard rows
        cmdspec = pl.BlockSpec(
            # single-buffered: a double-buffered window at wide cmax would
            # crowd the 1 MiB SMEM; the lost DMA overlap is negligible next
            # to the per-block walk/drain time.
            (1, 1, ncp),
            lambda i: (i, 0, 0),
            memory_space=pltpu.SMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        out_rows, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                cmdspec,
                cmdspec,
                pl.BlockSpec((1, nrc + 3, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, nru + 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, nru + 8, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, 2), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((cap,), jnp.int32)] * 9  # records + queues
            + [
                pltpu.SMEM((max(8, near_group),), jnp.int32),  # hazard queue
                pltpu.VMEM((nru + 8, LANES), jnp.int32),  # snapshot
            ],
            interpret=interpret,
        )(
            clens.reshape(b, 1, 1).astype(jnp.int32),
            ulens.reshape(b, 1, 1).astype(jnp.int32),
            walkw.reshape(b, 1, ncp),
            cmds.reshape(b, 1, ncp),
            comp_i32,
        )
        out = out_rows[:, 1 : nru + 1, :].reshape(b, out_size).astype(jnp.uint8)
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
