"""Fused Pallas TPU kernel for the MPT proof walk — the speed-of-light path.

The XLA walker (ops/mpt.walk_batch) decomposes each step into ~20 small
dependent kernels (one per one-hot contraction); at B=4096 that is ~110
sequential kernel launches whose fixed overheads dominate the walk. This
kernel runs the ENTIRE walk — root lookup, per-step RLP decode chain,
hex-prefix compare, digest match, state merge — in ONE kernel instance per
tile of 1024 proofs, with every per-proof scalar held as an [8, 128] i32
lane tile and all dynamic byte access done VMEM-locally:

  * window fetches = masked reduces over the node's word axis
    (TPU has no vector gather; a compare+select+sum over 144 word tiles is
    the in-kernel equivalent of the XLA one-hot matmul), and
  * per-lane dynamic window starts = binary shift cascades (log2(P) stages
    of static row shifts selected per lane), used for the wide windows
    (hex-prefix path, key window, expected child hash).

Semantics are IDENTICAL to ops/mpt.walk_batch (which remains the reference
implementation and the non-TPU path) and therefore to the reference's
`verify_merkle_proof` (reference: crypto-ops/src/lib.rs:8-23): hash-keyed
order-independent node lookup, inline (<32 B) children walked in place,
FOUND/EXCLUDED/INVALID status per proof.

Value extraction stays outside the kernel: it returns (status, value_node,
value_start, value_len) and the caller slices value bytes from the original
node buffers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.trie import EMPTY_ROOT
from . import mpt as mpt_ref

# Sublane depth per kernel instance (8 = one native (8, 128) vreg per
# per-proof scalar; wider tiles add ILP at higher register pressure —
# experiment knob, see keccak_pallas).
import os as _os

TILE_SUB = int(_os.environ.get("ZKP_WALK_TILE_SUB", "8"))
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE

_EMPTY_ROOT_WORDS = [
    int(np.int32(np.uint32(int.from_bytes(EMPTY_ROOT[4 * i:4 * i + 4], "big"))))
    for i in range(8)
]


def _i32(x):
    return x.astype(jnp.int32)


def _bytes_of_word(w):
    return ((w >> 24) & 255, (w >> 16) & 255, (w >> 8) & 255, w & 255)


def _align4(r, b8):
    """Select bytes r..r+3 from an 8-byte window list (r in 0..3)."""
    out = []
    for j in range(4):
        x = b8[j]
        for s in (1, 2, 3):
            x = jnp.where(r == s, b8[j + s], x)
        out.append(x)
    return out


def _head_fields(b):
    """RLP item header from 4 lane-tile bytes (mirrors rlp.item_head_window)."""
    b0 = b[0]
    single = b0 < 0x80
    long_str = (b0 >= 0xB8) & (b0 <= 0xBF)
    long_list = b0 >= 0xF8
    is_list = b0 >= 0xC0
    lol = jnp.where(long_str, b0 - 0xB7, jnp.where(long_list, b0 - 0xF7, 0))
    long_len = jnp.where(
        lol == 1, b[1],
        jnp.where(lol == 2, (b[1] << 8) | b[2],
                  (b[1] << 16) | (b[2] << 8) | b[3]))
    plen = jnp.where(
        single, 1,
        jnp.where(long_str | long_list, long_len,
                  jnp.where(is_list, b0 - 0xC0, b0 - 0x80)))
    poff = jnp.where(single, 0, 1 + lol)
    return poff, plen, is_list, lol <= 3


def _fetch_word_pair(cur, curs, wp):
    """Words cur[wp], cur[wp+1] per lane via one masked reduce each.
    cur/curs: i32 [NW, 8, 128] (curs = cur shifted down one row)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
    m = iota == wp[None]
    w1 = jnp.sum(jnp.where(m, cur, 0), axis=0)
    w2 = jnp.sum(jnp.where(m, curs, 0), axis=0)
    return w1, w2


def _fetch4(cur, curs, pos):
    """4 bytes at dynamic per-lane byte position `pos`.

    `pos` is clamped to the buffer like the XLA path's fetch_packed
    (select.py clips to nw*4-1) so a malformed header that drives the
    cursor past the buffer decodes the same bytes on both paths — parity
    by construction, not via the downstream well-formedness check."""
    pos = jnp.clip(pos, 0, cur.shape[0] * 4 - 1)
    wp = pos >> 2
    r = pos & 3
    w1, w2 = _fetch_word_pair(cur, curs, wp)
    b8 = list(_bytes_of_word(w1)) + list(_bytes_of_word(w2))
    return _align4(r, b8)


def _dyn_window(arr, start_row, out_rows: int):
    """Binary shift cascade: rows j -> arr[start_row + j] per lane.
    arr i32 [P, 8, 128], start_row i32 [8, 128] (clamped by caller).
    Returns [out_rows, 8, 128]; rows past P read as 0.

    Stages run with DESCENDING shift amounts and progressively truncate:
    after the 2^b-shift stage the remaining stages move rows by at most
    2^b - 1, so only the first out_rows + 2^b - 1 rows of each stage
    output are live. For small windows over wide buffers (the 10-row
    hex-prefix / expected-hash fetches over 144 word rows) this cuts the
    cascade from P*log2(P) to ~3x fewer row-selects; full-width windows
    (out_rows == P) are unchanged."""
    p = arr.shape[0]
    tile = arr.shape[1:]
    nbits = max(1, (p - 1).bit_length())
    cur = arr
    zero_row = jnp.zeros((1,) + tile, jnp.int32)
    for b in reversed(range(nbits)):
        s = 1 << b
        need = min(p, out_rows + s - 1)
        base = cur[:need]
        avail = max(cur.shape[0] - s, 0)  # rows cur[s:] provides
        if avail <= 0:
            shifted = jnp.zeros((need,) + tile, jnp.int32)
        elif avail >= need:
            shifted = cur[s:s + need]
        else:
            shifted = jnp.concatenate(
                [cur[s:], jnp.broadcast_to(zero_row, (need - avail,) + tile)],
                axis=0)
        take = ((start_row >> b) & 1) == 1
        cur = jnp.where(take[None], shifted, base)
    if cur.shape[0] < out_rows:
        # window wider than the buffer (tiny nodes, e.g. single-leaf
        # storage proofs where nw < the value-window row count): pad with
        # zero rows so callers always get out_rows rows — mirrors the XLA
        # twin's final pad (mpt._word_shift_window)
        cur = jnp.concatenate(
            [cur, jnp.broadcast_to(zero_row,
                                   (out_rows - cur.shape[0],) + tile)],
            axis=0)
    return cur[:out_rows]


def _walk_kernel(d: int, nw: int, kn: int, max_steps: int, mode: str,
                 vw: int,
                 words_ref, nlen_ref, nnum_ref, dig_ref, root_ref, knib_ref,
                 klen_ref, *refs):
    """mode selects the decode strategy (identical classification on every
    input — 'hinted'/'bounded' latch an overflow flag on anything they
    cannot prove and the caller re-runs the 'exact' kernel):
      'hinted'  — parallel item-header fetch at packer/device-provided
                  offset hints (ops.rlp.item_offsets), chain-verified in
                  parallel; no serial dependency, off==0 statically.
      'bounded' — serial 17-item chain with window-bounded fetches.
      'exact'   — serial chain with full-width fetches (the fallback).

    vw > 0 additionally emits the value WINDOW (vw word rows of the
    terminal node starting at vstart//4) in output rows 6..6+vw, captured
    at the FOUND transition while the node is already VMEM-resident —
    value extraction as an XLA post-stage costs ~0.11 ms/4096 (word
    shift-cascade over HBM-fetched rows); in-kernel it is one cascade
    over `cur`. The caller byte-aligns with vstart & 3."""
    if mode in ("hinted", "hinted4", "hinted1", "ordered", "pairskip"):
        # "hinted4" = hinted with full 4-byte header fetches on every
        # item (A/B baseline for the 1-byte branch-slot fetch)
        # "hinted1" = hinted with a SINGLE-PASS union-window fetch: each
        # consulted cur row is read once and feeds every item
        # accumulator whose window covers it (A/B vs 17 overlapping
        # per-item masked reduces — the kernel is VMEM-traffic-bound)
        if mode == "pairskip":
            hints_ref, out_ref, cur_ref, pair_ref = refs
        else:
            (hints_ref, out_ref, cur_ref), pair_ref = refs, None
        curs_ref = None
    elif mode == "bounded":
        (out_ref, cur_ref), curs_ref, hints_ref = refs, None, None
        pair_ref = None
    else:
        out_ref, cur_ref, curs_ref = refs
        hints_ref = None
        pair_ref = None
    bounded = mode == "bounded"
    hinted = mode in ("hinted", "hinted4", "hinted1", "ordered", "pairskip")
    RUNNING, FOUND = mpt_ref.RUNNING, mpt_ref.FOUND
    EXCLUDED, INVALID = mpt_ref.EXCLUDED, mpt_ref.INVALID
    maxnib = kn

    nnum = nnum_ref[0]
    klen = klen_ref[0]
    tile = nnum.shape  # (tile_sub, 128) — sublane depth is a call choice

    # ---- init: locate the root node by digest ----
    root_w = [root_ref[0, w] for w in range(8)]
    dig_w = [[dig_ref[0, dd, w] for w in range(8)] for dd in range(d)]

    def digest_find(expect_w):
        """(match_any, first_index) of expect over the d digest rows."""
        found = jnp.zeros(tile, jnp.bool_)
        idx = jnp.zeros(tile, jnp.int32)
        for dd in range(d):
            eq = dd < nnum
            for w in range(8):
                eq = eq & (dig_w[dd][w] == expect_w[w])
            hit = eq & ~found
            idx = jnp.where(hit, dd, idx)
            found = found | eq
        return found, idx

    root_ok, root_idx = digest_find(root_w)
    root_is_empty = jnp.ones(tile, jnp.bool_)
    for w in range(8):
        root_is_empty = root_is_empty & (root_w[w] == _EMPTY_ROOT_WORDS[w])
    empty_proof = nnum == 0
    status = jnp.where(
        empty_proof,
        jnp.where(root_is_empty, EXCLUDED, INVALID),
        jnp.where(root_ok, RUNNING, INVALID)).astype(jnp.int32)

    zero = jnp.zeros(tile, jnp.int32)
    # first-failure-class latch (mirrors mpt.walk_batch's reason channel):
    # no proof node hashes to the trusted root -> R_ROOT_MISSING
    reason0 = jnp.where(status == INVALID, mpt_ref.R_ROOT_MISSING,
                        mpt_ref.R_NONE).astype(jnp.int32)
    carry = (root_idx, zero, zero, status, zero, zero, zero, zero, reason0)

    if vw:
        for j in range(vw):
            out_ref[0, 6 + j] = zero

    def step_body(step_i, carry):
        node_idx, off, key_pos, status, vnode, vstart, vlen, ovf, reason = carry

        if mode == "ordered":
            # SEQUENTIAL-NODE fast path: the packer emits proof nodes in
            # walk order (oracle get_proof returns root->leaf; pack.py
            # preserves it), so on inline-free tries every live lane's
            # node_idx equals the step index — the current node is ONE
            # dynamically-indexed nw-row slice instead of the d-way
            # masked select (the walk kernel's measured per-step traffic
            # floor: d*nw VMEM row reads collapse to nw). Lanes whose
            # node_idx differs (unordered packs, inline-child steps,
            # root not at row 0) latch ovf and the exact kernel re-runs
            # the batch — order buys speed, never soundness: the digest
            # chain is still checked live against the selected bytes.
            si = jnp.minimum(step_i, d - 1)
            ovf = ovf | _i32((status == RUNNING) & (node_idx != si))
            is_dd = None
        else:
            # materialize the current node's words; the node-select masks
            # are loop-invariant over the word axis — computed once, not
            # per row
            is_dd = [node_idx == dd for dd in range(1, d)]
        if mode == "hinted1":
            # hinted1 fuses the union-window item fetch INTO this loop:
            # accumulators feed off the freshly selected word value, so
            # the decode never waits on the cur_ref store->load round
            # trip and each consulted row costs zero extra reads. Hint
            # words are selected first (independent of cur).
            h1_hwords = []
            for w in range(9):
                x = hints_ref[0, 0, w]
                for dd in range(1, d):
                    x = jnp.where(is_dd[dd - 1], hints_ref[0, dd, w], x)
                h1_hwords.append(x)
            h1_h = []
            for i in range(18):
                hw = h1_hwords[i // 2]
                h1_h.append((hw >> 16) & 0xFFFF if i % 2 == 0
                            else hw & 0xFFFF)
            h1_clip = [jnp.clip(h1_h[i], 0, nw * 4 - 1) for i in range(17)]
            h1_wps = [c >> 2 for c in h1_clip]
            h1_hrs = [c & 3 for c in h1_clip]
            h1_hi = [min(nw, (10 + 35 * i + 8) // 4 + 2) for i in range(17)]
            h1_wide = (0, 1, 16)
            # chunked partial accumulators: one accumulator per item
            # would serialize ~147 dependent adds (fetch_hint's jnp.sum
            # is a tree reduce); short independent chains instead
            H1_CH = 37
            h1_rows = min(nw, max(h1_hi) + 1)
            h1_nch = -(-h1_rows // H1_CH)
            h1_w1p = [[zero] * h1_nch for _ in range(17)]
            h1_w2p = {i: [zero] * h1_nch for i in h1_wide}
        for p in range(0 if mode == "ordered" else nw):
            w = words_ref[0, 0, p]
            for dd in range(1, d):
                w = jnp.where(is_dd[dd - 1], words_ref[0, dd, p], w)
            cur_ref[p] = w
            if mode == "hinted1" and p < h1_rows:
                c = p // H1_CH
                for i in range(17):
                    if p < h1_hi[i]:
                        h1_w1p[i][c] = (h1_w1p[i][c]
                                        + jnp.where(h1_wps[i] == p, w, 0))
                    if i in h1_wide and 1 <= p <= h1_hi[i]:
                        h1_w2p[i][c] = (h1_w2p[i][c]
                                        + jnp.where(h1_wps[i] == p - 1, w, 0))
        if mode == "ordered":
            blen = nlen_ref[0, si]
            # no staging at all: the node slab is ONE dynamic slice of the
            # VMEM input block — the nw cur_ref row writes of the select
            # path (the last un-ruled-out term of the kernel's measured
            # per-step floor) disappear entirely
            cur = words_ref[0, si]
        else:
            blen = nlen_ref[0, 0]
            for dd in range(1, d):
                blen = jnp.where(is_dd[dd - 1], nlen_ref[0, dd], blen)
            cur = cur_ref[:]
        if mode == "exact":
            # the 1-row-shifted copy only feeds _fetch4 (full-width decode);
            # the bounded path derives its shifted window from `sh` instead,
            # so skipping these nw scratch stores saves ~nw*4 KB of VMEM
            # traffic per step on the hot path
            for p in range(nw - 1):
                curs_ref[p] = cur_ref[p + 1]
            curs_ref[nw - 1] = zero
            curs = curs_ref[:]
        else:
            curs = None

        # next key nibble (masked reduce over the nibble axis)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (kn,) + tile, 0)
        knibs = knib_ref[0]
        c_nib = jnp.sum(jnp.where(kiota == key_pos[None], knibs, 0), axis=0)

        live0 = status == RUNNING
        zero_row = jnp.zeros((1,) + tile, jnp.int32)

        # ---- RLP decode chain: node header + up to 17 items ----
        if hinted:
            # Offset hints break the serial dependency: the packer/device
            # hint pass (ops.rlp.item_offsets) ran the serial chain once
            # per unique node; here every item header is fetched at its
            # hinted position INDEPENDENTLY and the chain law
            #   h[i+1] == h[i] + head_len_i + payload_len_i   (present)
            #   h[i+1] == h[i]                                (absent)
            # is verified in parallel. Any violation — wrong hints, or an
            # inline-child step (off != 0, whose decode a node-level hint
            # cannot describe) — latches ovf and walk_batch_pallas re-runs
            # the exact serial kernel, so classification stays
            # bit-identical to ops/mpt.walk_batch on every input.
            ovf = ovf | _i32(live0 & (off != 0))
            # per-node hint words, selected like blen (9 x u16-pair words)
            if mode == "hinted1":
                h = h1_h  # selected in the fused materialization pass
            else:
                if mode == "ordered":
                    hwords = [hints_ref[0, si, w] for w in range(9)]
                else:
                    hwords = []
                    for w in range(9):
                        x = hints_ref[0, 0, w]
                        for dd in range(1, d):
                            x = jnp.where(is_dd[dd - 1],
                                          hints_ref[0, dd, w], x)
                        hwords.append(x)
                h = []
                for i in range(18):
                    w = hwords[i // 2]
                    h.append((w >> 16) & 0xFFFF if i % 2 == 0
                             else w & 0xFFFF)

            # node header: off == 0 on the fast path, so it is bytes 0..3
            # of word row 0 — a STATIC fetch (lanes with off != 0 are
            # already latched; their decode is discarded by the re-run)
            hb = list(_bytes_of_word(cur[0]))
            po, plen, is_list, head_ok = _head_fields(hb)
            ps = po
            end = ps + plen

            # shift-by-one companion for cross-word header fetches. Every
            # unlatched hint fetch below is bounded by hi_rows <=
            # (10+35*16+8)//4+2 = 146 rows, so curs1 only needs a 146-row
            # prefix — a full nw-row copy would add ~nw scratch rows at
            # tx/receipt geometry (nw~520) and push the kernel past
            # Mosaic's scoped-VMEM budget at the picked sublane depth
            # (_pick_tile_sub's 2*min(nw,147) sh/shs term covers this
            # prefix, making the hinted estimate valid at wide nw).
            _hi_cap = min(nw, 146)
            if mode == "hinted1":
                curs1 = None
            elif nw > _hi_cap:
                curs1 = cur[1:_hi_cap + 1]
            else:
                curs1 = jnp.concatenate([cur[1:], zero_row], axis=0)

            def fetch_hint(pos, hi_rows: int):
                pc = jnp.clip(pos, 0, nw * 4 - 1)
                wp = pc >> 2
                r = pc & 3
                hi = min(nw, hi_rows)
                iota = jax.lax.broadcasted_iota(jnp.int32, (hi,) + tile, 0)
                m = iota == wp[None]
                w1 = jnp.sum(jnp.where(m, cur[:hi], 0), axis=0)
                w2 = jnp.sum(jnp.where(m, curs1[:hi], 0), axis=0)
                b8 = list(_bytes_of_word(w1)) + list(_bytes_of_word(w2))
                return _align4(r, b8)

            def fetch_hint_b0(pos, hi_rows: int):
                """First header byte only — one masked reduce, no
                cross-word alignment."""
                pc = jnp.clip(pos, 0, nw * 4 - 1)
                wp = pc >> 2
                r = pc & 3
                hi = min(nw, hi_rows)
                iota = jax.lax.broadcasted_iota(jnp.int32, (hi,) + tile, 0)
                m = iota == wp[None]
                w1 = jnp.sum(jnp.where(m, cur[:hi], 0), axis=0)
                b = (w1 >> 24) & 255
                for s in (1, 2, 3):
                    b = jnp.where(r == s, (w1 >> (24 - 8 * s)) & 255, b)
                return b

            if mode == "hinted1":
                # Single-pass union-window fetch, accumulated inside the
                # materialization loop above. fetch_hint reads cur[:hi]
                # AND curs1[:hi] per item — ~1.3k overlapping row reads
                # per step per tile across the 17 windows; the fused pass
                # reads each row ZERO extra times; per item i it fed
                #   w1[i] += (wp_i == p) ? row : 0        (= cur[wp_i])
                # and, for the wide items (0, 1, 16 need a 4-byte
                # header spanning a word boundary),
                #   w2[i] += (wp_i == p-1) ? row : 0      (= cur[wp_i+1])
                # — bit-identical decode inputs to 'hinted' (rows past
                # an item's live window accumulate nothing; lanes whose
                # hint exceeds the window bound are latched by the ovf
                # check below exactly as in 'hinted').
                def _tree(parts):
                    while len(parts) > 1:
                        parts = ([parts[j] + parts[j + 1]
                                  for j in range(0, len(parts) - 1, 2)]
                                 + ([parts[-1]] if len(parts) % 2 else []))
                    return parts[0]

                w1 = [_tree(h1_w1p[i]) for i in range(17)]
                w2 = {i: _tree(h1_w2p[i]) for i in h1_wide}
                ib1, b01 = {}, {}
                for i in range(17):
                    if i in h1_wide:
                        b8 = (list(_bytes_of_word(w1[i]))
                              + list(_bytes_of_word(w2[i])))
                        ib1[i] = _align4(h1_hrs[i], b8)
                    else:
                        wv = w1[i]
                        bb = (wv >> 24) & 255
                        for s in (1, 2, 3):
                            bb = jnp.where(h1_hrs[i] == s,
                                           (wv >> (24 - 8 * s)) & 255, bb)
                        b01[i] = bb

            sel = {
                "i0_pay": zero, "i0_len": zero, "i0_list": zero,
                "i1_start": zero, "i1_pay": zero, "i1_len": zero,
                "i1_list": zero, "i16_pay": zero, "i16_len": zero,
                "c_start": zero, "c_pay": zero, "c_len": zero,
                "c_list": zero,
            }
            count = zero
            all_ok = jnp.ones(tile, jnp.bool_)
            chain_ok = h[0] == ps
            for i in range(17):
                hi_i = h[i]
                present = hi_i < end
                # same live-window bound as the bounded kernel: item i of a
                # well-formed branch/pair starts within 10 + 35*i bytes
                ovf = ovf | _i32(present & live0 & (hi_i > 10 + 35 * i))
                if 2 <= i <= 15 and mode != "hinted4":
                    # branch slots 2..15 hold only short-form items in any
                    # honest trie (33-B hash refs, 1-B empties, <56-B
                    # inline children): the header is fully determined by
                    # its FIRST byte, so fetch one byte instead of an
                    # aligned 4-byte window (half the reduce volume, no
                    # alignment cascade). A long-form item here (crafted
                    # node) latches ovf -> exact re-run, like every other
                    # hinted-mode escape hatch.
                    b0 = (b01[i] if mode == "hinted1" else
                          fetch_hint_b0(hi_i, (10 + 35 * i + 8) // 4 + 2))
                    single = b0 < 0x80
                    short_str = (b0 >= 0x80) & (b0 <= 0xB7)
                    short_list = (b0 >= 0xC0) & (b0 <= 0xF7)
                    longf = ~single & ~short_str & ~short_list
                    ovf = ovf | _i32(present & live0 & longf)
                    ipo = jnp.where(single, 0, 1)
                    ipl = jnp.where(
                        single, 1,
                        jnp.where(short_str, b0 - 0x80, b0 - 0xC0))
                    ilist = _i32(b0 >= 0xC0)
                    ok = ~longf
                else:
                    ib = (ib1[i] if mode == "hinted1" else
                          fetch_hint(hi_i, (10 + 35 * i + 8) // 4 + 2))
                    ipo, ipl, ilist, ok = _head_fields(ib)
                    ilist = _i32(ilist)
                ips = hi_i + ipo
                # boolean algebra, not where(): Mosaic can't select on i1
                chain_ok = chain_ok & (
                    (present & (h[i + 1] == ips + ipl))
                    | (~present & (h[i + 1] == hi_i)))
                if i == 0:
                    sel["i0_pay"], sel["i0_len"], sel["i0_list"] = (
                        ips, ipl, ilist)
                if i == 1:
                    sel["i1_start"], sel["i1_pay"] = hi_i, ips
                    sel["i1_len"], sel["i1_list"] = ipl, ilist
                if i == 16:
                    sel["i16_pay"], sel["i16_len"] = ips, ipl
                if i < 16:
                    hit = present & (c_nib == i)
                    sel["c_start"] = jnp.where(hit, hi_i, sel["c_start"])
                    sel["c_pay"] = jnp.where(hit, ips, sel["c_pay"])
                    sel["c_len"] = jnp.where(hit, ipl, sel["c_len"])
                    sel["c_list"] = jnp.where(hit, ilist, sel["c_list"])
                count = count + _i32(present)
                all_ok = all_ok & (~present | ok)
            ovf = ovf | _i32(live0 & ~chain_ok)
            cursor = h[17]
            well_formed = (is_list & head_ok & (cursor == end)
                           & (end <= blen) & all_ok)
        elif bounded:
            # Header-aligned shifted copy (binary cascade):
            # sh[j] = cur[off//4 + j]. Item i of any branch/pair node starts
            # within 10 + 35*i bytes of `off` (node header <= 4 B, branch
            # items <= 33 B, pair path item <= 35 B incl. header), so each
            # item-header fetch only consults a static PREFIX window of sh —
            # a bounded masked reduce instead of one over all nw word rows
            # (the decode chain dominated step cost). Crafted nodes can
            # break the bound (well-formed RLP with oversized items); the
            # first out-of-window access is detected soundly (the cursor
            # feeding the check is produced by in-window fetches), latched
            # into the kernel's per-lane ovf output, and walk_batch_pallas
            # re-runs the batch through the exact full-width kernel — so
            # classification stays bit-identical to ops/mpt.walk_batch on
            # every input. (The re-run is an XLA-level lax.cond: Mosaic
            # cannot legalize a nested in-kernel scf.if.)
            wp_off = jnp.clip(off, 0, nw * 4 - 1) >> 2
            base = wp_off * 4
            # every LIVE in-bound fetch has rel <= 10 + 35*16 (the ovf
            # latch fires past it), i.e. consults sh rows <= 143 — so for
            # wide buckets (tx/receipt geometry, nw ~516 word rows) the sh
            # cascade truncates at 147 rows instead of nw, more than
            # halving the dominant per-step cascade. Narrow buckets keep
            # the exact full width (wp may legitimately reach nw-1 there).
            sh_rows = min(nw, (10 + 35 * 16 + 8) // 4 + 3)
            sh = _dyn_window(cur, wp_off, sh_rows)
            shs = jnp.concatenate(
                [sh[1:], jnp.zeros((1,) + tile, jnp.int32)],
                axis=0)

            def fetch_bounded(cursor, hi_rows: int):
                rel = cursor - base  # >= 0: cursor >= ps >= off >= base
                wp = jnp.clip(rel, 0, nw * 4 - 1) >> 2
                r = rel & 3
                hi = min(sh_rows, hi_rows)
                iota = jax.lax.broadcasted_iota(jnp.int32, (hi,) + tile, 0)
                m = iota == wp[None]
                w1 = jnp.sum(jnp.where(m, sh[:hi], 0), axis=0)
                w2 = jnp.sum(jnp.where(m, shs[:hi], 0), axis=0)
                b8 = list(_bytes_of_word(w1)) + list(_bytes_of_word(w2))
                return _align4(r, b8)

            # node header: clip(off) - base <= 3 -> rows 0..2 always cover
            # it; clipping `off` (not just its word index) keeps the bytes
            # identical to _fetch4's absolute clamp when a crafted parent
            # pushes an inline-child offset past the buffer
            hb = fetch_bounded(jnp.clip(off, 0, nw * 4 - 1), 3)
            fetch_item = lambda c, i: fetch_bounded(
                c, (10 + 35 * i + 8) // 4 + 2)
        else:
            hb = _fetch4(cur, curs, off)
            base = zero
            fetch_item = lambda c, i: _fetch4(cur, curs, c)

        if not hinted:
            po, plen, is_list, head_ok = _head_fields(hb)
            ps = off + po
            end = ps + plen
            # list-flags carried as i32 0/1: Mosaic rejects where() on i1
            sel = {
                "i0_pay": zero, "i0_len": zero, "i0_list": zero,
                "i1_start": zero, "i1_pay": zero, "i1_len": zero,
                "i1_list": zero, "i16_pay": zero, "i16_len": zero,
                "c_start": zero, "c_pay": zero, "c_len": zero,
                "c_list": zero,
            }
            cursor = ps
            count = zero
            all_ok = jnp.ones(tile, jnp.bool_)
            for i in range(17):
                present = cursor < end
                if bounded:
                    ovf = ovf | _i32(present & live0
                                     & (cursor - base > 10 + 35 * i))
                ib = fetch_item(cursor, i)
                ipo, ipl, ilist, ok = _head_fields(ib)
                ilist = _i32(ilist)
                ips = cursor + ipo
                if i == 0:
                    sel["i0_pay"], sel["i0_len"], sel["i0_list"] = (
                        ips, ipl, ilist)
                if i == 1:
                    sel["i1_start"], sel["i1_pay"] = cursor, ips
                    sel["i1_len"], sel["i1_list"] = ipl, ilist
                if i == 16:
                    sel["i16_pay"], sel["i16_len"] = ips, ipl
                if i < 16:
                    hit = present & (c_nib == i)
                    sel["c_start"] = jnp.where(hit, cursor, sel["c_start"])
                    sel["c_pay"] = jnp.where(hit, ips, sel["c_pay"])
                    sel["c_len"] = jnp.where(hit, ipl, sel["c_len"])
                    sel["c_list"] = jnp.where(hit, ilist, sel["c_list"])
                count = count + _i32(present)
                all_ok = all_ok & (~present | ok)
                cursor = jnp.where(present, ips + ipl, cursor)
            well_formed = (is_list & head_ok & (cursor == end)
                           & (end <= blen) & all_ok)

        # ---- extension/leaf: hex-prefix decode + nibble compare ----
        def compute_pair():
            p0s, p0l = sel["i0_pay"], sel["i0_len"]
            p0list = sel["i0_list"] == 1
            wp0 = jnp.clip(p0s, 0, nw * 4 - 1) >> 2
            r0 = jnp.clip(p0s, 0, nw * 4 - 1) & 3
            n_path_words = maxnib // 8 + 2  # 34-B window = 9 words + align
            # hinted mode: unlatched lanes have p0s = h[0] + head <= 14
            # (the i=0 window bound), so the hex-prefix window cascade
            # only needs a small static prefix of cur (latched lanes may
            # read garbage — the exact re-run replaces them)
            pw_src = cur[:min(nw, n_path_words + 6)] if hinted else cur
            pwords = _dyn_window(pw_src, wp0, n_path_words + 1)
            pbytes_raw = []
            for p in range(n_path_words + 1):
                pbytes_raw.extend(_bytes_of_word(pwords[p]))
            pbytes = []
            for j in range(maxnib // 2 + 2):
                x = pbytes_raw[j]
                for s in (1, 2, 3):
                    x = jnp.where(r0 == s, pbytes_raw[j + s], x)
                pbytes.append(x)
            pnibs = []
            for bb in pbytes:
                pnibs.append(bb >> 4)
                pnibs.append(bb & 0x0F)
            b0 = pbytes[0]
            flag = b0 >> 4
            pl_leaf = flag >= 2
            odd = flag & 1
            hpo = (~p0list & (p0l >= 1) & (flag <= 3)
                   & ((odd == 1) | ((b0 & 0x0F) == 0)))
            npt = 2 * (p0l - 1) + odd
            kwin = _dyn_window(knibs, key_pos, maxnib)
            nib_match = jnp.ones(tile, jnp.bool_)
            for j in range(maxnib):
                pn = jnp.where(odd == 1, pnibs[1 + j], pnibs[2 + j])
                nib_match = nib_match & ((j >= npt) | (pn == kwin[j]))
            within_key = key_pos + npt <= klen
            return pl_leaf, hpo, npt, nib_match & within_key

        if pair_ref is not None:
            # "pairskip": the pair machinery (hex-prefix cascade + key
            # window + nibble compare — the step's largest parallel
            # block) is gated on ANY live lane actually sitting on a
            # 2-item node. On depth-sorted account batches that is false
            # for every non-terminal step, so the region skips at
            # runtime like the whole-tile early exit. Scratch defaults
            # are irrelevant when skipped: no live lane is a pair node,
            # so the merge never consults them (dead lanes are masked
            # by pick(live)).
            any_pair = jnp.any(live0 & (count == 2))
            for j in range(4):
                pair_ref[j] = zero

            @pl.when(any_pair)
            def _():
                pil, hpo, npt, pm = compute_pair()
                pair_ref[0] = _i32(pil)
                pair_ref[1] = _i32(hpo)
                pair_ref[2] = npt
                pair_ref[3] = _i32(pm)
            p_is_leaf = pair_ref[0] == 1
            hp_ok = pair_ref[1] == 1
            n_path = pair_ref[2]
            p_match = pair_ref[3] == 1
        else:
            p_is_leaf, hp_ok, n_path, p_match = compute_pair()

        # ---- merge (mirrors mpt._step_merge) ----
        is_branch = count == 17
        is_pair = count == 2
        bad_node = ~well_formed | (~is_branch & ~is_pair)
        key_exhausted = key_pos >= klen
        bval_len = sel["i16_len"]
        branch_found = is_branch & key_exhausted & (bval_len > 0)
        branch_excl = is_branch & key_exhausted & (bval_len == 0)
        take_child = is_branch & ~key_exhausted
        child_empty = take_child & (sel["c_list"] == 0) & (sel["c_len"] == 0)
        leaf_found = (is_pair & p_is_leaf & p_match
                      & (key_pos + n_path == klen))
        leaf_excl = is_pair & p_is_leaf & ~leaf_found
        ext_bad = is_pair & ~p_is_leaf & (n_path == 0)
        ext_excl = is_pair & ~p_is_leaf & ~p_match
        ext_child = is_pair & ~p_is_leaf & p_match & ~ext_bad
        bad_node = bad_node | (is_pair & ~hp_ok) | ext_bad
        has_child = take_child & ~child_empty | ext_child
        cstart = jnp.where(take_child, sel["c_start"], sel["i1_start"])
        cpay = jnp.where(take_child, sel["c_pay"], sel["i1_pay"])
        cplen = jnp.where(take_child, sel["c_len"], sel["i1_len"])
        clist = jnp.where(take_child, sel["c_list"], sel["i1_list"])
        child_hash = has_child & (clist == 0) & (cplen == 32)
        child_inline = has_child & (clist == 1)
        child_bad = has_child & (clist == 0) & (cplen != 32)

        # expected child hash: 32 bytes at cpay -> 8 big-endian words.
        # hinted mode: unlatched child payloads start <= 10 + 35*15 + 4
        # bytes in (the i<16 window bound), so the cascade source truncates
        # to a static prefix — a large cut at tx/receipt geometry (nw~520)
        cp = jnp.clip(cpay, 0, nw * 4 - 1)
        ew_src = cur[:min(nw, 152)] if hinted else cur
        ewords = _dyn_window(ew_src, cp >> 2, 10)
        ebytes_raw = []
        for p in range(10):
            ebytes_raw.extend(_bytes_of_word(ewords[p]))
        re = cp & 3
        ew = []
        for w in range(8):
            bs = []
            for j in range(4):
                x = ebytes_raw[4 * w + j]
                for s in (1, 2, 3):
                    x = jnp.where(re == s, ebytes_raw[4 * w + j + s], x)
                bs.append(x)
            ew.append((bs[0] << 24) | (bs[1] << 16) | (bs[2] << 8) | bs[3])
        have_next, nxt = digest_find(ew)
        hash_fail = child_hash & ~have_next

        new_status = jnp.where(
            bad_node | child_bad | hash_fail, INVALID,
            jnp.where(branch_found | leaf_found, FOUND,
                      jnp.where(branch_excl | child_empty | leaf_excl
                                | ext_excl, EXCLUDED, RUNNING))).astype(jnp.int32)
        found_now = new_status == FOUND
        new_vnode = jnp.where(found_now, node_idx, vnode)
        new_vstart = jnp.where(
            found_now, jnp.where(leaf_found, sel["i1_pay"], sel["i16_pay"]),
            vstart)
        new_vlen = jnp.where(
            found_now, jnp.where(leaf_found, sel["i1_len"], sel["i16_len"]),
            vlen)
        if vw:
            # capture the value window while the terminal node is resident
            vws = jnp.where(leaf_found, sel["i1_pay"], sel["i16_pay"])
            win = _dyn_window(cur, jnp.clip(vws, 0, nw * 4 - 1) >> 2, vw)
            wrote = found_now & live0
            for j in range(vw):
                out_ref[0, 6 + j] = jnp.where(wrote, win[j],
                                              out_ref[0, 6 + j])
        new_key_pos = jnp.where(take_child, key_pos + 1,
                                jnp.where(ext_child, key_pos + n_path, key_pos))
        new_node_idx = jnp.where(child_hash, nxt, node_idx)
        new_off = jnp.where(child_hash, 0,
                            jnp.where(child_inline, cstart, off))
        # diagnosable INVALID reason: first failure class that applied
        # (mirrors mpt._step_merge's reason merge)
        new_reason = jnp.where(
            bad_node, mpt_ref.R_MALFORMED,
            jnp.where(child_bad, mpt_ref.R_BAD_CHILD_REF,
                      jnp.where(hash_fail, mpt_ref.R_HASH_MISMATCH, reason)))

        live = status == RUNNING
        pick = lambda new, old: jnp.where(live, new, old)
        return (pick(new_node_idx, node_idx), pick(new_off, off),
                pick(new_key_pos, key_pos), pick(new_status, status),
                pick(new_vnode, vnode), pick(new_vstart, vstart),
                pick(new_vlen, vlen), ovf, pick(new_reason, reason))

    def step(i, carry):
        # whole-tile early exit: once every proof in the tile has resolved,
        # remaining steps are no-ops (proof depths vary; default max_steps
        # carries headroom for nested inline nodes)
        any_live = jnp.any(carry[3] == RUNNING)
        return jax.lax.cond(any_live,
                            lambda c: step_body(jnp.int32(i), c),
                            lambda c: c, carry)

    carry = jax.lax.fori_loop(0, max_steps, step, carry)
    status = jnp.where(carry[3] == RUNNING, INVALID, carry[3]).astype(jnp.int32)
    reasons = jnp.where(carry[3] == RUNNING, mpt_ref.R_TRUNCATED,
                        carry[8]).astype(jnp.int32)
    out_ref[0, 0] = status
    out_ref[0, 1] = carry[4]
    out_ref[0, 2] = carry[5]
    out_ref[0, 3] = carry[6]
    out_ref[0, 4] = carry[7]  # bounded-decode overflow flag (0 if !bounded)
    out_ref[0, 5] = reasons   # first-failure-class code (mpt.REASON_NAMES)


@functools.partial(jax.jit, static_argnames=("max_steps", "mode", "vw"))
def _walk_lanes(words, nlens, nnum, dig, root, knib, klen, hints=None, *,
                max_steps: int, mode: str = "bounded", vw: int = 0):
    """words i32 [Bt, D, NW, S, 128]; nlens [Bt, D, S, 128];
    nnum/klen [Bt, S, 128]; dig [Bt, D, 8, S, 128]; root [Bt, 8, S, 128];
    knib [Bt, KN, S, 128]; hints [Bt, D, 9, S, 128] (mode='hinted' only).
    S is the sublane tile depth (8 by default; reduced for wide buckets —
    see _pick_tile_sub). Returns i32 [Bt, 6, S, 128] (status, vnode,
    vstart, vlen, fast-path overflow flag, INVALID reason code)."""
    bt, d, nw = words.shape[0], words.shape[1], words.shape[2]
    kn = knib.shape[1]
    sub = words.shape[3]
    kernel = functools.partial(_walk_kernel, d, nw, kn, max_steps, mode, vw)
    tile = (sub, TILE_LANE)
    spec = lambda *lead: pl.BlockSpec(
        (1,) + lead + tile, lambda i: (i,) + (0,) * (len(lead) + 2),
        memory_space=pltpu.VMEM)
    hinted = mode in ("hinted", "hinted4", "hinted1", "ordered", "pairskip")
    args = (words, nlens, nnum, dig, root, knib, klen)
    if hinted:
        args = args + (hints,)
    return pl.pallas_call(
        kernel,
        grid=(bt,),
        in_specs=[
            spec(d, nw),   # words
            spec(d),       # nlens
            spec(),        # nnum
            spec(d, 8),    # dig
            spec(8),       # root
            spec(kn),      # knib
            spec(),        # klen
        ] + ([spec(d, 9)] if hinted else []),
        out_specs=spec(6 + vw),
        out_shape=jax.ShapeDtypeStruct((bt, 6 + vw) + tile, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nw,) + tile, jnp.int32),  # cur
        ] + ([] if mode != "exact" else [
            pltpu.VMEM((nw,) + tile, jnp.int32),  # curs
        ]) + ([] if mode != "pairskip" else [
            pltpu.VMEM((4,) + tile, jnp.int32),   # gated pair outputs
        ]),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _to_words(bytes_arr):
    """u8 [..., N] -> i32 big-endian words [..., N//4]."""
    a = bytes_arr.astype(jnp.int32)
    shp = a.shape[:-1] + (a.shape[-1] // 4, 4)
    w = a.reshape(shp)
    return (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]


def _lanes(a, bt, sub=TILE_SUB):
    """[B, ...] -> [Bt, ..., sub, 128] (B = bt*sub*128, lanes innermost)."""
    rest = a.shape[1:]
    a = a.reshape((bt, sub, TILE_LANE) + rest)
    order = (0,) + tuple(range(3, 3 + len(rest))) + (1, 2)
    return a.transpose(order)


def _pick_tile_sub(d: int, nw: int, kn: int, hinted: bool = False,
                   vw: int = 0) -> int:
    """Largest sublane depth whose kernel instance fits Mosaic's 16 MB
    scoped-VMEM budget. The dominant allocations scale with the tile-row
    count: double-buffered word inputs (2*d*nw), the cur scratch (nw),
    the sh/shs decode windows (2*min(nw, 147)), and the digest/key tiles
    (2*(8d + kn)). Calibrated on v5e measurements: (d=10, nw=144, kn=64)
    = 3600 rows compiles at sub=8 (round-3 config 6); (d=3, nw=521,
    kn=8) = 4005 rows is rejected at sub=8 (scoped 20.48M > 16M limit) —
    tx/receipt geometry (~2 KB nodes) runs at sub=4, trading per-instance
    width for twice the grid steps."""
    rows = 2 * d * nw + nw + 2 * min(nw, 147) + 2 * (8 * d + kn)
    rows += 2 * vw  # value-window output rows (the base 6-row output
    #                 block is inside the 3600-row calibration)
    if hinted:
        rows += 2 * d * 9  # double-buffered hint words (the sh/shs term
        #                    above covers the hinted temps: the 146-row
        #                    curs1 prefix + the truncated pw/ew cascade
        #                    sources — curs1 is capped at min(nw, 146)
        #                    rows in the kernel, so this term is valid at
        #                    wide nw too)
    sub = TILE_SUB
    while sub > 1 and rows * sub > 3600 * 8:
        sub //= 2
    return max(sub, 1)


def walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len: int,
                      max_steps: int | None = None,
                      with_reasons: bool = False, hints=None,
                      with_overflow: bool = False,
                      hint_mode: str | None = None):
    """Drop-in for mpt.walk_batch on TPU. Returns (status, values,
    value_lens); with_reasons=True appends the per-proof INVALID reason
    channel (mpt.REASON_NAMES) — carried through the kernel's 6th output
    word, so TPU-batch triage is one run, not a fall-back to the XLA
    walker.

    hints: optional u8 [B, D, 36] per-(proof, slot) RLP item-offset hints
    (ops.rlp.item_offsets rows, scattered like digests). When given, the
    kernel runs in 'hinted' mode — parallel header fetches with a parallel
    chain check instead of the serial 17-item decode chain; wrong/stale
    hints or inline-child steps latch the overflow flag and the exact
    serial kernel re-runs, so results are bit-identical to walk_batch on
    EVERY input (hints buy speed, never change classification)."""
    b, d, n = nodes.shape
    if n % 4:
        nodes = jnp.pad(nodes, ((0, 0), (0, 0), (0, 4 - n % 4)))
    kn = key_nibbles.shape[1]
    if max_steps is None:
        max_steps = d + 6
    vw0 = max_value_len // 4 + 2 if max_value_len <= 128 else 0
    if _os.environ.get("ZKP_WALK_NO_VW"):  # A/B: force the XLA extraction
        vw0 = 0
    sub = _pick_tile_sub(d, nodes.shape[2] // 4, kn,
                         hinted=hints is not None, vw=vw0)
    tile = sub * TILE_LANE
    bp = -(-b // tile) * tile
    if bp != b:
        pad = ((0, bp - b),)
        nodes = jnp.pad(nodes, pad + ((0, 0), (0, 0)))
        node_lens = jnp.pad(node_lens, pad + ((0, 0),))
        num_nodes = jnp.pad(num_nodes, pad)
        digests = jnp.pad(digests, pad + ((0, 0), (0, 0)))
        roots = jnp.pad(roots, pad + ((0, 0),))
        key_nibbles = jnp.pad(key_nibbles, pad + ((0, 0),))
        key_lens = jnp.pad(key_lens, pad)
        if hints is not None:
            hints = jnp.pad(hints, pad + ((0, 0), (0, 0)))
    bt = bp // tile
    lanes_in = (
        _lanes(_to_words(nodes), bt, sub),
        _lanes(node_lens.astype(jnp.int32), bt, sub),
        _lanes(num_nodes.astype(jnp.int32), bt, sub),
        _lanes(_to_words(digests), bt, sub),
        _lanes(_to_words(roots), bt, sub),
        _lanes(key_nibbles.astype(jnp.int32), bt, sub),
        _lanes(key_lens.astype(jnp.int32), bt, sub),
    )
    # value window captured in-kernel for small value buckets (account/
    # storage flows): the terminal node is already VMEM-resident at the
    # FOUND transition, so the window costs one cascade instead of an XLA
    # post-stage over HBM rows (~0.11 ms/4096). Wide buckets (tx/receipt
    # values) keep the XLA shift-cascade extraction (vw rows would blow
    # the output block).
    vw = vw0
    if hints is not None:
        hmode = hint_mode or _os.environ.get("ZKP_WALK_HINT_MODE", "hinted")
        if _os.environ.get("ZKP_WALK_HINT4"):
            hmode = "hinted4"
        fast = _walk_lanes(*lanes_in, _lanes(_to_words(hints), bt, sub),
                           max_steps=max_steps, mode=hmode, vw=vw)
    else:
        fast = _walk_lanes(*lanes_in, max_steps=max_steps, mode="bounded",
                           vw=vw)
    # Fast-path overflow (bounded mode: crafted nodes whose well-formed
    # RLP items exceed the branch/pair size bounds; hinted mode: also
    # hint-chain mismatches and inline-child steps): re-run the batch
    # through the exact full-width kernel. XLA-level cond — honest
    # witnesses on inline-free tries never execute the slow branch.
    any_ovf = jnp.any(fast[:, 4] > 0)
    out = jax.lax.cond(
        any_ovf,
        lambda: _walk_lanes(*lanes_in, max_steps=max_steps, mode="exact",
                            vw=vw),
        lambda: fast,
    )  # [Bt, 6 + vw, 8, 128]
    out = out.transpose(0, 2, 3, 1).reshape(bp, 6 + vw)[:b]
    status, vnode, vstart, vlen = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
    if vw:
        # byte-align the in-kernel word window (big-endian words; same
        # math as mpt._extract_value's alignment — bit-identical output)
        win = out[:, 6:]
        by = jnp.stack([(win >> 24) & 255, (win >> 16) & 255,
                        (win >> 8) & 255, win & 255],
                       axis=-1).reshape(b, 4 * vw)
        vc = jnp.clip(vstart, 0, nodes.shape[2] - 1)
        r = vc & 3
        val = by[:, 0:max_value_len]
        for s in (1, 2, 3):
            val = jnp.where((r == s)[:, None], by[:, s:s + max_value_len],
                            val)
        value = jnp.where(
            jnp.arange(max_value_len)[None, :] < vlen[:, None], val, 0)
        result = (status, value.astype(jnp.uint8),
                  jnp.where(status == mpt_ref.FOUND, vlen, 0))
    else:
        carry = (vnode, jnp.zeros_like(vnode), jnp.zeros_like(vnode), status,
                 vnode, vstart, vlen, jnp.zeros_like(status))
        result = mpt_ref._extract_value(nodes[:b, :, :n], carry,
                                        max_value_len)
    if with_reasons:
        result = result + (out[:, 5],)
    if with_overflow:
        # per-proof FAST-path overflow latch (pre-fallback): nonzero rows
        # deferred to the exact kernel — a serving/bench diagnostic for
        # how often the hinted/bounded fast path actually served
        fast_ovf = fast.transpose(0, 2, 3, 1).reshape(bp, 6 + vw)[:b, 4]
        result = result + (fast_ovf,)
    return result


def walk_batch_pallas_segmented(depth_segments, nodes, node_lens, num_nodes,
                                digests, roots, key_nibbles, key_lens,
                                max_value_len: int,
                                max_steps: int | None = None,
                                hints=None, hint_mode: str | None = None):
    """Depth-bucketed walk dispatch: one walk_batch_pallas call per
    contiguous depth segment ((count, d), ...) covering the batch in
    order (PackedProofs.depth_segments()).

    The fused kernel's measured per-step floor at account shape is node
    materialization + input streaming, both O(d) per word row (op-count
    and fetch-traffic cuts are dead flat — see the hinted1 A/Bs); on a
    depth-sorted batch the shallow segments (~93% of a 4096-distinct-
    account batch is depth <= 5 under a depth-7 bucket) walk with their
    own smaller static node axis instead of paying the deepest proof's.

    Classification is bit-identical to the unsegmented call: each proof
    still walks its own num_nodes (segment d bounds every num_nodes in
    the segment by construction), max_steps passes through unchanged
    (truncation parity — a None default is resolved ONCE from the global
    node axis, never per segment, so a proof with many inline-node steps
    in a shallow segment truncates exactly like the unsegmented call),
    and surplus steps on shallow segments are ~free via the whole-tile
    early exit."""
    if max_steps is None:
        max_steps = nodes.shape[1] + 6  # walk_batch_pallas' global default
    outs, off = [], 0
    for cnt, dseg in depth_segments:
        sl = slice(off, off + cnt)
        outs.append(walk_batch_pallas(
            nodes[sl, :dseg], node_lens[sl, :dseg], num_nodes[sl],
            digests[sl, :dseg], roots[sl], key_nibbles[sl],
            key_lens[sl], max_value_len, max_steps,
            hints=None if hints is None else hints[sl, :dseg],
            hint_mode=hint_mode))
        off += cnt
    if off != nodes.shape[0]:
        raise ValueError(
            f"depth_segments cover {off} rows, batch has {nodes.shape[0]}")
    return tuple(jnp.concatenate(parts) for parts in zip(*outs))
