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
    Match lengths up to M_CAP and every take/skip/profit decision are
    also computed in this prepass by carrying the next-4-bytes word
    through the sort (reference's emit cost model,
    src/internal.jl:289-329).
  - the COMMIT WALK on the scalar core visits ONLY take positions (skip
    commands point straight at the next take, folded into the previous
    step's tail — no skip iterations, no take/skip branch) and emits;
    matches past M_CAP extend by word compares against a prepass-built
    LE32-at-every-byte SMEM table (one load per probe word).
  - EMISSION writes tag bytes as masked row blends and literal bodies as
    128-lane row moves with one dynamic lane roll (same mover as the
    decoder), into a VMEM-resident output block; all stores are masked
    (never read-modify-write), so emission cannot stall on the
    load-after-store ordering hazard.

Blocks are independent (reference src/Snappy.jl:29-33): grid = one step
per 64 KiB block, inputs/outputs double-buffered by Pallas.

Measured cost anatomy (v5e, round 5; 128-block corpus batch at
min_profit=2, contest off — within-run A/B in benchmarks/ab_encode.py
and /tmp-era matrix runs recorded in benchmarks/NEGATIVE_RESULTS.md):

  prepass (XLA)      ~25-28 ms  two kv-sorts + suffix-min hops scan
  take chain         ~53-55 ms  the serial hops-load recurrence (the
                                round-4 "24 ms" figure was chip-regime
                                fiction: the round-4 kernel's own chain
                                measures the same 55 ms in-process today)
  match extension    (in chain) hoisted word probe + rare iterations
  emission drains    ~18 ms     record-split: the walk stores (anchor,
                                op, lit / op, d, m) records; branch-free
                                drains materialize tag bytes + literal
                                bodies (tag blends into the body row's
                                masked store); long/crossing tags re-emit
                                via the original emitters in a cleanup
                                pass. Same issue cost as the old in-walk
                                emission (the core is scalar-issue-bound
                                everywhere) but off the latency chain.
  total              ~104 ms    (contest=True adds ~13% for +0.5%
                                density; every corpus file beats the
                                native greedy baseline either way)

Incompressible blocks never reach this kernel: ops/route.py detects them
on host (~60 us/block sampled dup-ratio) and compresses them with the
batched C++ greedy encoder while the device dispatch is in flight.
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


# Prepass match lengths are exact up to this cap; the kernel extends capped
# matches scalar (they are profitable by construction, so extension work is
# never wasted).
M_CAP = 8
# Takes per chunk: the walk records ENC_CHUNK takes, then the drains
# materialize their bytes, bounding the record scratch arrays.
ENC_CHUNK = 256
# Take steps per walk backedge: lets Mosaic overlap one take's dependent
# SMEM load chain (~6 cyc/load, non-overlapping across backedges — the
# measured E7 cost model) with its neighbors'. Trailing steps past the
# last take freeze branch-free.
UNROLL_TAKES = 4


def candidate_cmds(
    blocks_u8: jnp.ndarray, blens: jnp.ndarray, min_profit: int = 1,
    with_alt: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position parse commands: the vectorized half of the greedy parse.

    blocks_u8: uint8[B, N + ENC_PAD]; blens: int32[B]. Returns a pair
    (cmds, alt), both int32[B, N]. ``alt`` holds, per position, the capped
    runner-up candidate's distance (0 = no contest): when both candidates
    reached M_CAP the prepass cannot rank them, so the kernel extends the
    runner-up too and keeps the better. ``cmds``:

      take mode (bits 0-15 nonzero): d | (m << 16) — the best candidate's
        distance and its match length, exact below M_CAP, == M_CAP meaning
        "at least M_CAP, kernel extends". Only emitted where the profit
        (match bytes minus copy-tag bytes, the reference's emit cost model,
        reference src/internal.jl:289-329) reaches ``min_profit``.
      skip mode (bits 0-15 zero): next take-mode position << 16 — the
        TPU-shaped analogue of the reference's growing-stride probe
        heuristic (reference src/internal.jl:162-172): the scalar walk
        crosses unprofitable runs in one jump.

    Candidates are exact (kv-sort groups equal 4-byte values; adjacent
    ranks give the two most recent prior occurrences), and match lengths
    up to M_CAP are computed HERE, vectorized, by carrying each position's
    next-4-bytes word through the sort — the scalar core never probes or
    extends short matches. Distances >= 2^16 are dropped: the encoder
    never emits offsets that wide inside a 64 KiB block (reference
    src/internal.jl:24-31).
    """
    n = blocks_u8.shape[-1] - ENC_PAD
    b = blocks_u8.shape[0]
    ci = blocks_u8.astype(jnp.uint32)

    def word_at(k: int):
        return (
            ci[..., k : n + k]
            | (ci[..., k + 1 : n + k + 1] << 8)
            | (ci[..., k + 2 : n + k + 2] << 16)
            | (ci[..., k + 3 : n + k + 3] << 24)
        )

    u32 = word_at(0)
    w1 = word_at(4)  # bytes p+4..p+7 (ENC_PAD slack keeps this in bounds)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    blen = blens.astype(jnp.int32)[:, None]
    # Positions whose 4-byte group straddles the block end would match via
    # padding bytes; push them to a unique key so they pair with nothing.
    usable = pos <= blen - 4
    key = jnp.where(usable, u32, jnp.uint32(0xFFFFFFFF))
    # num_keys=1: lax.sort is stable, so equal keys keep ascending position
    # order — identical output to the old (key, pos) two-key sort with a
    # cheaper comparator (verified elementwise-equal on CPU, round 5).
    sv, sp, sw = jax.lax.sort((key, pos, w1), dimension=-1, num_keys=1)

    def cand_k(k: int):
        """(match length <= M_CAP, distance) to the k-th previous equal key."""
        pad_b = jnp.zeros((b, k), jnp.bool_)
        pad_i = jnp.zeros((b, k), jnp.int32)
        pad_w = jnp.zeros((b, k), jnp.uint32)
        # Unusable (tail-pad) positions all carry the sentinel key; they
        # must not pair with each other (fake candidates — harmless after
        # the tail clamp, but thousands of dead take commands per short
        # block inflate the skip chain for nothing).
        same = jnp.concatenate(
            [pad_b, (sv[..., k:] == sv[..., :-k]) & (sv[..., k:] != jnp.uint32(0xFFFFFFFF))],
            axis=-1,
        )
        dist = sp - jnp.concatenate([pad_i, sp[..., :-k]], axis=-1)
        x = sw ^ jnp.concatenate([pad_w, sw[..., :-k]], axis=-1)
        mb = jnp.where(
            (x & 0xFF) != 0,
            0,
            jnp.where((x & 0xFFFF) != 0, 1, jnp.where((x & 0xFFFFFF) != 0, 2, jnp.where(x != 0, 3, 4))),
        ).astype(jnp.int32)
        ok = same & (dist < (1 << 16))
        return jnp.where(ok, 4 + mb, 0), jnp.where(ok, dist, 0)

    m1, d1 = cand_k(1)
    m2, d2 = cand_k(2)
    # Profit with m capped: copy cost is 2 bytes iff d < 2048 (m <= 8 < 12
    # always takes the 2-byte form), else 3. A capped match's profit is a
    # lower bound, so takes are never wrong, only conservative.
    p1 = jnp.where(m1 > 0, m1 - jnp.where(d1 < 2048, 2, 3), -1)
    p2 = jnp.where(m2 > 0, m2 - jnp.where(d2 < 2048, 2, 3), -1)
    # Tie-break toward the FARTHER candidate (d2 > d1 by construction):
    # equal profit means equal emitted bytes, but a farther source sits
    # deeper behind the decoder's write frontier, so fewer copies hit the
    # decode kernel's group-hazard re-run path. Free decode speed.
    use2 = (p2 >= p1) & (m2 > 0)
    mS, dS, pS = jnp.where(use2, m2, m1), jnp.where(use2, d2, d1), jnp.maximum(p1, p2)
    # When the candidate NOT chosen is capped, its true length is unknown
    # and could beat the chosen one; hand it to the kernel to extend and
    # compare (exactly the old extend-both behavior, paid only where the
    # prepass cannot decide). 0 = no contest.
    oM, oD = jnp.where(use2, m1, m2), jnp.where(use2, d1, d2)
    alt = jnp.where((oM == M_CAP) & (oD != dS), oD, 0)
    # Back to position order. The take decision is made pre-unsort so the
    # payload packs into two words (sort cost scales with operand count).
    #
    takeS = (pS >= min_profit) & (mS >= 4)
    packA = jnp.where(takeS, dS | (mS << 16), 0)
    if with_alt:
        _, pk, d2nd = jax.lax.sort((sp, packA, alt), dimension=-1, num_keys=1)
    else:
        # contest disabled: one fewer unsort operand (measured gate-safe:
        # every corpus file still beats the native greedy baseline,
        # round-5 density table in benchmarks/NEGATIVE_RESULTS.md)
        _, pk = jax.lax.sort((sp, packA), dimension=-1, num_keys=1)
        d2nd = jnp.zeros_like(pk)
    d = pk & 0xFFFF
    # Clamp to the block tail: a w1 compare may claim bytes past blen.
    m = jnp.minimum(pk >> 16, blen - pos)
    take = (d != 0) & (m >= 4)
    idx = jnp.where(take, pos, n)
    # Pack, at EVERY position p, everything the walk needs about the next
    # take at-or-after p into ONE word: [delta:12][m-4:3][d:16], where
    # delta = position of that take minus p, saturated at 0xFFF (the walk
    # hops 0xFFF and re-reads; "no more takes" forces 0xFFF so hops run
    # off the block). This keeps the walk's serial recurrence at a SINGLE
    # dependent SMEM load per take — the measured per-load latency is
    # ~6 cyc and the old skip-fold chain paid two of them back-to-back.
    # The payload rides a reverse min-by-position scan (a take_along_axis
    # gather here costs ~90 ms per 128-block batch — TPU gathers at this
    # shape run at scalar rate). Hand-rolled log-doubling suffix-min with
    # a carried payload: 17 rounds of shift+select, all elementwise
    # (lax.associative_scan lowers to a pathologically slow compile here).
    # Rounds stop at the 0xFFF delta saturation horizon: positions with no
    # take within 4095 bytes read as "hop" either way, so suffix-min
    # coverage past 4096 buys nothing (the walk's hop loop re-reads).
    take_pay = d | ((m - 4) << 16)  # valid at take positions
    nxt, pay_at_next = idx, take_pay
    sh = 1
    while sh < 0x1000:
        ii2 = jnp.concatenate(
            [nxt[..., sh:], jnp.full(nxt.shape[:-1] + (sh,), n, jnp.int32)], axis=-1
        )
        pp2 = jnp.concatenate(
            [pay_at_next[..., sh:], jnp.zeros(nxt.shape[:-1] + (sh,), jnp.int32)], axis=-1
        )
        t = nxt <= ii2
        nxt = jnp.where(t, nxt, ii2)
        pay_at_next = jnp.where(t, pay_at_next, pp2)
        sh <<= 1
    delta = jnp.minimum(nxt - pos, 0xFFF)
    hops = jnp.where(
        nxt >= n, jnp.int32(0xFFF) << 20, pay_at_next | (delta << 20)
    )
    return hops, jnp.where(take, d2nd, 0)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _roll(vec, shift, *, interpret: bool):
    if interpret:
        return jnp.roll(vec, shift, axis=1)
    return pltpu.roll(vec, shift, 1)


def _encode_kernel(
    blen_ref,  # SMEM (1, 1, 1) int32
    le32_ref,  # SMEM (1, 1, NL) int32: LE u32 at EVERY byte position
    dists_ref,  # SMEM (1, 1, N) int32: parse commands (see candidate_cmds)
    alt_ref,  # SMEM (1, 1, N) int32: capped runner-up distances (0 = none)
    inp_ref,  # VMEM (1, NRI, LANES) int32: input bytes one-per-lane
    out_ref,  # VMEM (1, NRO, LANES) int32: output bytes one-per-lane
    meta_ref,  # SMEM (1, 1, 1) int32: emitted length
    el_src_ref,  # SMEM scratch: literal record input address (anchor)
    el_op_ref,  # SMEM scratch: literal record output position
    el_n_ref,  # SMEM scratch: literal record length
    ec_op_ref,  # SMEM scratch: copy record output position
    ec_d_ref,  # SMEM scratch: copy record distance
    ec_m_ref,  # SMEM scratch: copy record match length
    lovf_ref,  # SMEM scratch: row-crossing literal queue
    covf_ref,  # SMEM scratch: long/row-crossing copy queue
    *,
    nri: int,
    nro: int,
    interpret: bool,
    debug_mode: int = 0,  # 1: truncate matches at M_CAP (timing diagnostics
    # only — output is NOT a valid parse of comparable density)
    # 2: walk+extension+contest, no emission; 3: no contest, full emission;
    # 4: walk+extension, no contest/emission; 5: pure take chain (m = hi,
    # no extension/contest/emission; meta counts takes)
    unroll: int = UNROLL_TAKES,
):
    blen = blen_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def load32(p):
        """LE uint32 at byte p: ONE scalar load. The per-byte word table is
        built by the XLA prepass at vector rate; the old packed-word layout
        cost ~8 scalar ops per unaligned load, and the match loop does two
        loads per probe — this is where the walk's cycles went."""
        return le32_ref[0, 0, p]

    def match_len(a, b_, start):
        """Length of the common prefix of input[a:] and input[b_:], given
        the first ``start`` bytes are known equal; bounded so a+len <= blen.
        (Capping at 64 and re-matching was tried instead of emit-side
        chunking — it loses density on repetitive data because the re-match
        at a+64 may not see the same-distance continuation among its top-2
        candidates; sample-tweet.json regressed 2.6%.)

        Scalar 4-byte word compares from SMEM: a 128-lane VMEM compare
        variant was measured 2x SLOWER overall — the per-iteration
        vector-to-scalar readback of the mismatch index costs more on the
        scalar core than the word loop it replaces. Called with start=hi
        even for prepass-exact matches: the first word compare mismatches
        immediately (tzb 0), so the loop self-terminates in one probe and
        no take/extend branch is needed.

        Loop structure is tuned for Mosaic's expensive scalar backedges
        (measured: the walk+extension phase dominated the whole kernel):
        the first probe is HOISTED — a probe at a mismatch position is a
        no-op (tzb of the xor word is 0), so non-extending takes (the
        majority) never enter the loop at all — and each backedge runs two
        probes (idempotent at the fixpoint), halving iterations for long
        matches."""
        limit = blen - a

        def probe(m):
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

        def step(state):
            m, _ = state
            m, _go = probe(m)
            return probe(m)

        m0, go0 = probe(start)
        m, _ = jax.lax.while_loop(lambda s: s[1], step, (m0, go0))
        return jnp.minimum(m, limit)

    def _store(r, m, keep):
        """Masked store: never loads out_ref, so emission cannot hit the
        load-after-store ordering stall (every output byte in [0, op) is
        written exactly once, so no read-modify-write is needed). No row
        clamp: op <= BLOCK_MAX_OUT by the format's output bound (reference
        src/Snappy.jl:80-82) and the buffer carries one extra row, so
        r and r+1 are in range by construction."""
        if interpret:
            cur = out_ref[0, r, :].reshape(1, LANES)
            out_ref[0, r, :] = jnp.where(keep, m, cur).reshape(LANES)
        else:
            pltpu.store(out_ref.at[0, r, :], m.reshape(LANES), mask=keep.reshape(LANES))

    # ---- emission helpers. op is threaded explicitly (refs close over).
    def emit3(op, b0, b1, b2, cnt):
        """Write cnt (1..3) tag bytes at output byte op."""
        l0 = op & 127
        r = op >> 7
        patch = jnp.where(
            lane == l0, b0, jnp.where(lane == l0 + 1, b1, jnp.where(lane == l0 + 2, b2, 0))
        )
        keep = (lane >= l0) & (lane < l0 + cnt)
        _store(r, patch, keep)

        # ~2% of tags cross a row boundary; predicate the second store
        @pl.when(l0 + cnt > LANES)
        def _():
            patch2 = jnp.where(
                lane == l0 + 1 - LANES, b1, jnp.where(lane == l0 + 2 - LANES, b2, 0)
            )
            _store(r + 1, patch2, lane < l0 + cnt - LANES)

        return op + cnt

    def move_body(s, o, length):
        """Copy length (>=1) input bytes [s, s+length) to output bytes at o
        (the literal body mover; same row/roll scheme as the decoder).
        Branch-free for spans of <= 2 output rows (the overwhelmingly
        common case — tags break literals well below 256 bytes only at
        emit boundaries); longer spans take one pl.when region."""
        d = o - s
        shift = d & 127
        ph = (-shift) & 127
        r0 = o >> 7
        r1 = (o + length - 1) >> 7
        lo = o & 127

        def span(q):
            qr = q >> 7
            a = inp_ref[0, jnp.clip(qr, 0, nri - 1), :].reshape(1, LANES)
            b_ = inp_ref[0, jnp.clip(qr + 1, 0, nri - 1), :].reshape(1, LANES)
            return _roll(jnp.where(lane >= ph, a, b_), shift, interpret=interpret)

        # hot path: one row; ~15% of literals cross into a second row and
        # take the predicated region (cheaper than issuing the second
        # span+store with an empty mask every time)
        m0 = span(r0 * LANES - d)
        _store(r0, m0, (lane >= lo) & (lane < lo + length))

        @pl.when(lo + length > LANES)
        def _():
            m1 = span((r0 + 1) * LANES - d)
            _store(r0 + 1, m1, lane < lo + length - LANES)

        @pl.when(r1 > r0 + 1)
        def _():
            def mid(r, _):
                gl = r * LANES + lane
                keep = gl < o + length
                _store(r, span(r * LANES - d), keep)
                return 0

            jax.lax.fori_loop(r0 + 2, r1 + 1, mid, 0, unroll=False)

    def emit_literal(op, src, length):
        """Literal tag (reference src/internal.jl:252-287) + body move.

        The store work is fenced behind ONE pl.when(length > 0): back-to-
        back copy takes (lit == 0 — a large share of takes on match-rich
        data) previously issued the full ~26-op tag+move sequence with
        empty masks; a predicated region costs ~5 cyc instead (measured
        cond cost, benchmarks/exp_vector_walk.py E7). The advanced output
        position is computed branch-free outside the region."""
        nm1 = length - 1
        hl = jnp.where(nm1 < 0, 0, jnp.where(nm1 < 60, 1, jnp.where(nm1 < 256, 2, 3)))
        b0 = jnp.where(nm1 < 60, nm1 << 2, jnp.where(nm1 < 256, 60 << 2, 61 << 2))

        @pl.when(length > 0)
        def _():
            opt = emit3(op, b0, nm1 & 0xFF, nm1 >> 8, hl)
            move_body(src, opt, length)

        return op + hl + length

    def emit_copy(op, d, m, live):
        """Chunked copy emitter (reference src/internal.jl:289-329). The
        long-match chunking (m > 64) is fenced behind one cond so the
        common short copy stays region-free. ``live`` gates the tag store
        (frozen unrolled steps emit nothing; see the walk below)."""

        def long_tail(md):
            m_, op_ = md

            def chunk64(state):
                mm, oo = state
                oo = emit3(oo, 0x02 | (63 << 2), d & 0xFF, d >> 8, 3)
                return mm - 64, oo

            m_, op_ = jax.lax.while_loop(lambda s: s[0] >= 68, chunk64, (m_, op_))

            def chunk60(state):
                mm, oo = state
                oo = emit3(oo, 0x02 | (59 << 2), d & 0xFF, d >> 8, 3)
                return mm - 60, oo

            return jax.lax.cond(m_ > 64, chunk60, lambda s: s, (m_, op_))

        m, op = jax.lax.cond(m > 64, long_tail, lambda s: s, (m, op))
        two = (m < 12) & (d < 2048)
        b0 = jnp.where(
            two, 0x01 | ((m - 4) << 2) | ((d >> 8) << 5), 0x02 | ((m - 1) << 2)
        )
        b2 = d >> 8
        return emit3(op, b0, d & 0xFF, b2, jnp.where(live, jnp.where(two, 2, 3), 0))

    # ---- main commit walk. The prepass (candidate_cmds) already made every
    # probe/extend/profit decision vectorized (including min_profit tag
    # thinning); the scalar core only jumps between take positions and
    # emits. Loop invariant: ip IS a take position (skip commands point
    # straight at the next take, so a skip is folded into the tail of the
    # previous take step as one select — no skip iterations, no take/skip
    # cond). One step = one emitted literal+copy pair.
    #
    # The loop body unrolls UNROLL_TAKES steps per backedge. Measured
    # scalar-core cost model (benchmarks/exp_vector_walk.py E7, v5e):
    # dependent SMEM loads cost ~6 cyc each and their chains do NOT
    # overlap across while-loop backedges, but DO overlap within one
    # unrolled body; a lax.cond costs ~5 cyc; backedges themselves are
    # ~free. One take has a ~4-deep dependent load chain (command word ->
    # match probes -> skip-fold word), so un-unrolled it exposes the whole
    # ~35+ cyc chain latency every take (the round-3 kernel measured
    # 122 cyc/take against ~30 issued ops). Unrolling lets take i+1's
    # loads issue under take i's latency; steps past the last take are
    # frozen branch-free (every store's lane mask empties, state holds).
    # The command word is carried through the state so the dense-takes
    # recurrence has ONE load: the skip-fold load at the match end is
    # also the next step's command word.
    def next_take(q, live):
        """Jump from match-end q to the next take via the hops words:
        one dependent load in the common case; saturated deltas (0xFFF)
        hop and re-read (rare: >4 KiB take-free runs). Returns the next
        take's position (n when none remains) and its payload word."""
        nmax = dists_ref.shape[2] - 1
        vq = dists_ref[0, 0, jnp.minimum(q, nmax)]

        def hop_cond(s):
            qq, vv = s
            return (jax.lax.shift_right_logical(vv, 20) == 0xFFF) & (qq < blen) & live

        def hop(s):
            qq, _ = s
            qq = qq + 0xFFF
            return qq, dists_ref[0, 0, jnp.minimum(qq, nmax)]

        q2, vq = jax.lax.while_loop(hop_cond, hop, (q, vq))
        delta = jax.lax.shift_right_logical(vq, 20)
        pos = jnp.where(delta == 0xFFF, dists_ref.shape[2], q2 + delta)
        return pos, vq

    def take_step(state):
        ip, anchor, op, cd, tl, tc = state
        live = ip <= blen - 4
        d = jnp.where(live, cd & 0xFFFF, 0)
        hi = jnp.where(live, ((cd >> 16) & 7) + 4, 0)
        # frozen steps: a_eff = blen drives match_len's limit to 0 -> m = 0
        a_eff = jnp.where(live, ip, blen)
        b_eff = jnp.where(live, ip - d, 0)
        if debug_mode in (1, 5):
            m = hi
        else:
            # Unconditional: for prepass-exact matches (hi < M_CAP) the
            # first word compare mismatches and the loop exits with m == hi.
            m = match_len(a_eff, b_eff, hi)

        # A capped runner-up candidate may extend farther than the
        # prepass's pick — extend and keep the better (score = match
        # bytes minus the extra byte of a far offset).
        def contest(md):
            m_, d_ = md
            d2v = jnp.where(
                live, alt_ref[0, 0, jnp.minimum(ip, alt_ref.shape[2] - 1)], 0
            )

            def ext(_):
                m2 = match_len(ip, ip - d2v, jnp.int32(M_CAP))
                far2 = jnp.where(d2v >= 2048, 1, 0)
                far1 = jnp.where(d_ >= 2048, 1, 0)
                better = (m2 - far2) > (m_ - far1)
                return jnp.where(better, m2, m_), jnp.where(better, d2v, d_)

            return jax.lax.cond(d2v > 0, ext, lambda _: (m_, d_), 0)

        m, dd = (m, d) if debug_mode in (1, 3, 4, 5) else contest((m, d))
        lit = jnp.where(live, ip - anchor, 0)
        q = ip + m
        if debug_mode == 5:  # pure take chain: meta counts takes
            op3 = op + jnp.where(live, 1, 0)
            tl2, tc2 = tl, tc
        else:
            # Modes 2/4 keep the record stores (they are part of the walk's
            # cost now) and only skip the drains (chunk_fn); a storeless
            # variant faulted the TPU worker (undiagnosed Mosaic issue with
            # the dead scratch refs — benchmarks/NEGATIVE_RESULTS.md r5).
            # RECORD, don't emit: the walk computes exact emitted sizes
            # (same arithmetic the emitters use) and stores pre-digested
            # records; the byte work happens in the post-walk drains,
            # which pipeline branch-free instead of running one take at a
            # time between the chain's serial loads (VERDICT r4 task 2).
            nm1 = lit - 1
            hl = jnp.where(nm1 < 0, 0, jnp.where(nm1 < 60, 1, jnp.where(nm1 < 256, 2, 3)))
            el_src_ref[tl] = anchor
            el_op_ref[tl] = op
            el_n_ref[tl] = lit
            op2 = op + hl + lit

            def long_sz(mb):
                m_, b_ = mb

                def chunk64(st):
                    mm, bb = st
                    return mm - 64, bb + 3

                m_, b_ = jax.lax.while_loop(lambda st: st[0] >= 68, chunk64, (m_, b_))
                return jax.lax.cond(
                    m_ > 64, lambda st: (st[0] - 60, st[1] + 3), lambda st: st, (m_, b_)
                )

            m_fin, cb = jax.lax.cond(m > 64, long_sz, lambda mb: mb, (m, jnp.int32(0)))
            two = (m_fin < 12) & (dd < 2048)
            cb = cb + jnp.where(two, 2, 3)
            ec_op_ref[tc] = op2
            ec_d_ref[tc] = dd
            ec_m_ref[tc] = m
            op3 = jnp.where(live, op2 + cb, op)
            lv = live.astype(jnp.int32)
            tl2 = tl + (lit > 0).astype(jnp.int32)  # lit>0 implies live
            tc2 = tc + lv
        # jump straight to the next take (hops word carries its d/m)
        pos2, vq = next_take(q, live)
        ip_next = jnp.where(live, pos2, ip)
        cd_next = jnp.where(live, vq, cd)
        anchor2 = jnp.where(live, q, anchor)
        return ip_next, anchor2, op3, cd_next, tl2, tc2

    # ---- record drains -----------------------------------------------------
    # Branch-free pipelined loops over the walk's records. Sources are
    # inp_ref (never stored) and tag bytes are immediates, so neither
    # drain ever loads out_ref: no load-after-store ordering stalls.
    def drain_lit_records(tl):
        """Literal tag + body, fused into ONE masked row store per record
        (the tag patch blends into the body row's head lanes). Records
        whose tag+body cross the output row queue branch-free and re-emit
        via the full emitters in a cleanup pass."""

        def one(t, lq):
            src = el_src_ref[t]
            opv = el_op_ref[t]
            n = el_n_ref[t]
            nm1 = n - 1
            hl = jnp.where(nm1 < 0, 0, jnp.where(nm1 < 60, 1, jnp.where(nm1 < 256, 2, 3)))
            b0 = jnp.where(nm1 < 60, nm1 << 2, jnp.where(nm1 < 256, 60 << 2, 61 << 2))
            bo = opv + hl
            d = bo - src
            shift = d & 127
            ph = (-shift) & 127
            r0 = opv >> 7
            lo = opv & 127
            qr = (r0 * LANES - d) >> 7
            # Clamp EACH row separately: qr can be -1 (span starts before
            # the input) — the lanes drawing from it are never kept, but
            # row qr+1 must still address row 0, not row 1.
            a = inp_ref[0, jnp.clip(qr, 0, nri - 1), :].reshape(1, LANES)
            b = inp_ref[0, jnp.clip(qr + 1, 0, nri - 1), :].reshape(1, LANES)
            mv = _roll(jnp.where(lane >= ph, a, b), shift, interpret=interpret)
            patch = jnp.where(
                lane == lo, b0,
                jnp.where(lane == lo + 1, nm1 & 0xFF, jnp.where(lane == lo + 2, nm1 >> 8, 0)),
            )
            m = jnp.where(lane < lo + hl, patch, mv)
            keep = (lane >= lo) & (lane < lo + hl + n)
            _store(r0, m, keep)
            lovf_ref[lq] = t
            return lq + (lo + hl + n > LANES).astype(jnp.int32)

        def body(g, lq):
            base = g * 8
            for k in range(8):
                lq = one(base + k, lq)
            return lq

        lq = jax.lax.fori_loop(0, pl.cdiv(tl, 8), body, jnp.int32(0), unroll=False)

        def finish(j, _):
            t = lovf_ref[j]
            src = el_src_ref[t]
            opv = el_op_ref[t]
            n = el_n_ref[t]
            emit_literal(opv, src, n)
            return 0

        jax.lax.fori_loop(0, lq, finish, 0, unroll=False)

    def drain_copy_records(tc):
        """Copy tags: one masked patch store per record for the common
        m <= 64 non-crossing case; long matches (chunked 64/60/rem tags,
        reference src/internal.jl:316-326) and row-crossing tags queue and
        re-emit via emit_copy in a cleanup pass."""

        def one(t, cq):
            opv = ec_op_ref[t]
            d = ec_d_ref[t]
            m = ec_m_ref[t]
            two = (m < 12) & (d < 2048)
            b0 = jnp.where(two, 0x01 | ((m - 4) << 2) | ((d >> 8) << 5), 0x02 | ((m - 1) << 2))
            cnt = jnp.where(m > 0, jnp.where(two, 2, 3), 0)
            lo = opv & 127
            r0 = opv >> 7
            patch = jnp.where(
                lane == lo, b0,
                jnp.where(lane == lo + 1, d & 0xFF, jnp.where(lane == lo + 2, d >> 8, 0)),
            )
            slow = (m > 64) | (lo + cnt > LANES)
            keep = (lane >= lo) & (lane < lo + cnt) & jnp.logical_not(m > 64)
            _store(r0, patch, keep)
            covf_ref[cq] = t
            return cq + slow.astype(jnp.int32)

        def body(g, cq):
            base = g * 8
            for k in range(8):
                cq = one(base + k, cq)
            return cq

        cq = jax.lax.fori_loop(0, pl.cdiv(tc, 8), body, jnp.int32(0), unroll=False)

        def finish(j, _):
            t = covf_ref[j]
            emit_copy(ec_op_ref[t], ec_d_ref[t], ec_m_ref[t], True)
            return 0

        jax.lax.fori_loop(0, cq, finish, 0, unroll=False)

    # ---- chunked outer loop: walk ENC_CHUNK takes, then drain --------------
    # normalize entry onto the first take position
    ip0, cdi = next_take(jnp.int32(0), jnp.bool_(True))

    def unrolled(i, state):
        for _ in range(unroll):
            state = take_step(state)
        return state

    def chunk_fn(state):
        ip, anchor, op, cd = state
        z = jnp.int32(0)
        ip, anchor, op, cd, tl, tc = jax.lax.fori_loop(
            0, ENC_CHUNK // unroll, unrolled, (ip, anchor, op, cd, z, z)
        )
        if debug_mode not in (2, 4, 5):
            for j in range(8):  # sentinels: n=0 / m=0 records are no-ops
                el_src_ref[tl + j] = 0
                el_op_ref[tl + j] = 0
                el_n_ref[tl + j] = 0
                ec_op_ref[tc + j] = 0
                ec_d_ref[tc + j] = 0
                ec_m_ref[tc + j] = 0
            drain_lit_records(tl)
            drain_copy_records(tc)
        return ip, anchor, op, cd

    ip, anchor, op, _ = jax.lax.while_loop(
        lambda s: s[0] <= blen - 4,
        chunk_fn,
        (ip0, jnp.int32(0), jnp.int32(0), cdi),
    )

    # tail literal (reference src/internal.jl:242-248)
    op = jax.lax.cond(
        anchor < blen, lambda o: emit_literal(o, anchor, blen - anchor), lambda o: o, op
    )
    meta_ref[0, 0, 0] = op


def _build(block_size: int, interpret: bool, min_profit: int = 1, debug_mode: int = 0, unroll: int = UNROLL_TAKES, contest: bool = True):
    if block_size % LANES:
        raise ValueError(f"block_size must be a multiple of {LANES}")
    n = block_size
    nri = -(-(n + ENC_PAD) // LANES) + 1
    nro = -(-BLOCK_MAX_OUT // LANES) + 1

    if not contest and debug_mode == 0:
        debug_mode = 3  # the no-contest record path
    kernel = functools.partial(
        _encode_kernel, nri=nri, nro=nro, interpret=interpret, debug_mode=debug_mode, unroll=unroll
    )

    def fn(blocks_u8: jnp.ndarray, blens: jnp.ndarray):
        b = blocks_u8.shape[0]
        assert blocks_u8.shape[1] == n + ENC_PAD
        cmds, alt = candidate_cmds(blocks_u8, blens, min_profit, with_alt=contest)
        # LE u32 at every byte position p in [0, n+4): match probes index up
        # to p == blen <= n. Same arithmetic as candidate_cmds' word_at(0)
        # (XLA CSEs the shared subgraph); padded to a lane-aligned width.
        ci = blocks_u8.astype(jnp.uint32)
        nl = n + LANES
        le32 = (
            ci[..., : n + 4]
            | (ci[..., 1 : n + 5] << 8)
            | (ci[..., 2 : n + 6] << 16)
            | (ci[..., 3 : n + 7] << 24)
        ).astype(jnp.int32)
        le32 = jnp.pad(le32, ((0, 0), (0, nl - (n + 4)))).reshape(b, 1, nl)
        pad = nri * LANES - blocks_u8.shape[1]
        inp_i32 = jnp.pad(blocks_u8, ((0, 0), (0, pad))).astype(jnp.int32).reshape(b, nri, LANES)
        out_rows, meta = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 1, nl), lambda i: (i, 0, 0), memory_space=pltpu.SMEM,
                    pipeline_mode=pl.Buffered(buffer_count=1),
                ),
                # The two 256 KiB command windows are single-buffered to fit
                # the 1 MiB SMEM; the lost DMA overlap is negligible vs the
                # per-block walk time.
                pl.BlockSpec(
                    (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM,
                    pipeline_mode=pl.Buffered(buffer_count=1),
                ),
                pl.BlockSpec(
                    (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM,
                    pipeline_mode=pl.Buffered(buffer_count=1),
                ),
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
            scratch_shapes=[pltpu.SMEM((ENC_CHUNK + 8,), jnp.int32)] * 8,
            interpret=interpret,
        )(blens.reshape(b, 1, 1), le32, cmds.reshape(b, 1, n), alt.reshape(b, 1, n), inp_i32)
        out = out_rows.reshape(b, nro * LANES)[:, :BLOCK_MAX_OUT].astype(jnp.uint8)
        return out, meta.reshape(b)

    return fn


@functools.lru_cache(maxsize=8)
def encode_blocks_jit(block_size: int = BLOCK_SIZE, interpret: bool = False, min_profit: int = 1, contest: bool = False):
    """jit-compiled Pallas block encoder.

    (uint8[B, block_size + ENC_PAD], int32[B] lengths) ->
    (uint8[B, BLOCK_MAX_OUT] tag streams, int32[B] emitted lengths).
    Output contract matches encode_xla.encode_blocks_jit. ``min_profit``
    sets the greedy take threshold (1 = densest, reference-equivalent;
    higher values thin tags for decode speed at a small density cost).
    ``contest=True`` re-extends capped runner-up candidates (+0.5%
    density, -13% speed — measured round 5; every corpus file beats the
    native greedy baseline either way, so the default favors speed).
    """
    return jax.jit(_build(block_size, interpret, min_profit, contest=contest))
