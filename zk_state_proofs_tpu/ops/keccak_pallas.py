"""Pallas TPU kernel for batched Keccak-256 — the speed-of-light path.

The pure-jnp path (ops/keccak.py) round-trips HBM between permutation steps;
this kernel keeps the whole sponge state (25 lanes x hi/lo u32) in
VMEM/vector registers for a tile of messages, so each round is pure VPU work.

Layout: the message batch is tiled as [TILE_SUB, 128] VPU tiles (one u32 per
message per lane position); every Keccak lane is a separate [TILE_SUB, 128]
array, so all theta/rho/pi/chi steps are elementwise ops with STATIC shift
amounts — no shuffles, no gathers, no cross-message traffic. Rounds run
under an in-kernel fori_loop with round constants fetched from SMEM.

Replaces the reference's serial tiny-keccak hot loop
(reference: crypto-ops/src/keccak.rs:6-12) with ~10^3 messages hashed per
kernel instance.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.keccak import RATE, ROTATION_OFFSETS, ROUND_CONSTANTS
from .keccak import bytes_to_lanes, lanes_to_bytes, pad_messages

WORDS = RATE // 8  # 17 lanes absorbed per block
# Sublane depth per kernel instance. 8 = one native (8, 128) vreg per
# Keccak lane; 16/32 process 2/4 independent vregs per op, trading
# register pressure for instruction-level parallelism across the VPU's
# ALUs (the sponge is one dependent op chain per vreg). Overridable for
# experiments via ZKP_KECCAK_TILE_SUB.
import os as _os

TILE_SUB = int(_os.environ.get("ZKP_KECCAK_TILE_SUB", "8"))
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE  # messages per kernel instance

_RC = np.zeros((24, 2), dtype=np.uint32)
for _i, _rc in enumerate(ROUND_CONSTANTS):
    _RC[_i, 0] = _rc >> 32
    _RC[_i, 1] = _rc & 0xFFFFFFFF

# pi destination: out[_PI_DEST[i]] = rot(in[i], ROTATION_OFFSETS[i])
_PI_DEST = [0] * 25
for _x in range(5):
    for _y in range(5):
        _PI_DEST[_x + 5 * _y] = _y + 5 * ((2 * _x + 3 * _y) % 5)


def _rotl(hi, lo, n: int):
    """64-bit rotate-left by a static amount on (hi, lo) u32 tiles."""
    n %= 64
    if n == 0:
        return hi, lo
    if n == 32:
        return lo, hi
    if n > 32:
        hi, lo = lo, hi
        n -= 32
    return (
        (hi << n) | (lo >> (32 - n)),
        (lo << n) | (hi >> (32 - n)),
    )


def _permute(sh, sl, rc_ref, unrolled: bool = False):
    """24 Keccak-f[1600] rounds over 25 hi/lo [TILE_SUB, 128] tiles.

    Measured on v5e: the fori_loop form is ~430x FASTER than full static
    unrolling (straight-lining 24 rounds explodes Mosaic register
    allocation into spills); keep unrolled=False."""

    def round_fn(r, carry):
        ah = list(carry[0])
        al = list(carry[1])
        # theta
        ch = [ah[x] ^ ah[x + 5] ^ ah[x + 10] ^ ah[x + 15] ^ ah[x + 20] for x in range(5)]
        cl = [al[x] ^ al[x + 5] ^ al[x + 10] ^ al[x + 15] ^ al[x + 20] for x in range(5)]
        for x in range(5):
            rh, rl = _rotl(ch[(x + 1) % 5], cl[(x + 1) % 5], 1)
            dh = ch[(x - 1) % 5] ^ rh
            dl = cl[(x - 1) % 5] ^ rl
            for y in range(5):
                ah[x + 5 * y] = ah[x + 5 * y] ^ dh
                al[x + 5 * y] = al[x + 5 * y] ^ dl
        # rho + pi
        bh, bl = [None] * 25, [None] * 25
        for i in range(25):
            rh, rl = _rotl(ah[i], al[i], ROTATION_OFFSETS[i])
            bh[_PI_DEST[i]], bl[_PI_DEST[i]] = rh, rl
        # chi
        for y in range(5):
            rowh = [bh[x + 5 * y] for x in range(5)]
            rowl = [bl[x + 5 * y] for x in range(5)]
            for x in range(5):
                ah[x + 5 * y] = rowh[x] ^ (~rowh[(x + 1) % 5] & rowh[(x + 2) % 5])
                al[x + 5 * y] = rowl[x] ^ (~rowl[(x + 1) % 5] & rowl[(x + 2) % 5])
        # iota
        if isinstance(r, int):  # unrolled: bake the constant as an immediate
            ah[0] = ah[0] ^ jnp.uint32(_RC[r, 0])
            al[0] = al[0] ^ jnp.uint32(_RC[r, 1])
        else:
            ah[0] = ah[0] ^ rc_ref[r, 0]
            al[0] = al[0] ^ rc_ref[r, 1]
        return tuple(ah), tuple(al)

    if unrolled:
        carry = (tuple(sh), tuple(sl))
        for r in range(24):
            carry = round_fn(r, carry)
        sh, sl = carry
    else:
        sh, sl = jax.lax.fori_loop(0, 24, round_fn, (tuple(sh), tuple(sl)))
    return list(sh), list(sl)


def _keccak_kernel(num_blocks: int, masked: bool, rc_ref, *refs):
    if masked:
        nblk_ref, mh_ref, ml_ref, out_ref, st_ref = refs
    else:
        mh_ref, ml_ref, out_ref = refs
    zero = jnp.zeros((TILE_SUB, TILE_LANE), jnp.uint32)

    if not masked:
        sh = [zero] * 25
        sl = [zero] * 25
        for ib in range(num_blocks):
            xh = [sh[w] ^ mh_ref[0, ib, w] for w in range(WORDS)] + sh[WORDS:]
            xl = [sl[w] ^ ml_ref[0, ib, w] for w in range(WORDS)] + sl[WORDS:]
            sh, sl = _permute(xh, xl, rc_ref)
        for w in range(4):
            out_ref[0, w, 0] = sh[w]
            out_ref[0, w, 1] = sl[w]
        return

    # masked path: state lives in VMEM scratch [50, sub, lane] so blocks a
    # whole tile has already finished can skip their permutation entirely
    # (batches sorted/bucketed by size make most tiles homogeneous)
    for w in range(25):
        st_ref[w] = zero
        st_ref[25 + w] = zero
    nblk = nblk_ref[0]
    for ib in range(num_blocks):
        @pl.when(jnp.any(nblk > ib) if ib > 0 else True)
        def _(ib=ib):
            sh = [st_ref[w] for w in range(25)]
            sl = [st_ref[25 + w] for w in range(25)]
            xh = [sh[w] ^ mh_ref[0, ib, w] for w in range(WORDS)] + sh[WORDS:]
            xl = [sl[w] ^ ml_ref[0, ib, w] for w in range(WORDS)] + sl[WORDS:]
            nh, nl = _permute(xh, xl, rc_ref)
            if ib > 0:
                active = nblk > ib
                nh = [jnp.where(active, a, b) for a, b in zip(nh, sh)]
                nl = [jnp.where(active, a, b) for a, b in zip(nl, sl)]
            for w in range(25):
                st_ref[w] = nh[w]
                st_ref[25 + w] = nl[w]
    for w in range(4):
        out_ref[0, w, 0] = st_ref[w]
        out_ref[0, w, 1] = st_ref[25 + w]


@functools.partial(jax.jit, static_argnames=("num_blocks", "masked"))
def _keccak_lanes(msg_hi, msg_lo, nblocks, *, num_blocks: int, masked: bool):
    """msg_hi/lo: u32 [Bt, NB, 17, TILE_SUB, 128]; nblocks: i32
    [Bt, TILE_SUB, 128]. Returns u32 [Bt, 4, 2, TILE_SUB, 128] digest lanes
    (hi at [..., 0, :, :], lo at [..., 1, :, :])."""
    bt = msg_hi.shape[0]
    kernel = functools.partial(_keccak_kernel, num_blocks, masked)
    msg_spec = pl.BlockSpec(
        (1, num_blocks, WORDS, TILE_SUB, TILE_LANE),
        lambda i: (i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [jnp.asarray(_RC)]
    if masked:
        in_specs.append(
            pl.BlockSpec((1, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(nblocks)
    in_specs += [msg_spec, msg_spec]
    inputs += [msg_hi, msg_lo]
    scratch = (
        [pltpu.VMEM((50, TILE_SUB, TILE_LANE), jnp.uint32)] if masked else []
    )
    return pl.pallas_call(
        kernel,
        grid=(bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 4, 2, TILE_SUB, TILE_LANE),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bt, 4, 2, TILE_SUB, TILE_LANE), jnp.uint32),
        scratch_shapes=scratch,
        # off-TPU (CPU tests) the kernel runs in the Pallas interpreter
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def _keccak_kernel_raw(num_blocks: int, n_words: int, rc_ref, nlen_ref,
                       words_ref, out_ref, st_ref):
    """Masked sponge over RAW row words: the Keccak pad10*1 and the
    byte->lane assembly happen IN-REGISTER here instead of as XLA
    elementwise passes over [B, NB*RATE] byte tensors (pad_messages +
    bytes_to_lanes + two big transposes measured ~55% of small-pool hash
    time on v5e — more than the permutations themselves).

    words_ref: u32 [1, n_words, sub, 128] — little-endian u32 words of
    the row bytes (a free bitcast on the host/XLA side: word k = bytes
    4k..4k+3, byte 4k lowest). Keccak lane j of block ib is exactly words
    (34*ib + 2*j, +1) as (lo, hi) — 136 % 8 == 0 keeps every lane
    4-aligned, so assembly is indexing plus length masks, no shuffles.
    nlen_ref: i32 [1, sub, 128] byte lengths. Per-tile block skip as in
    the byte-path masked kernel."""
    zero = jnp.zeros(nlen_ref.shape[1:], jnp.uint32)
    for w in range(25):
        st_ref[w] = zero
        st_ref[25 + w] = zero
    nlen = nlen_ref[0]
    nblk = nlen // int(RATE) + 1
    q80 = nblk * int(RATE) - 1  # byte position of the 0x80 domain bit

    def assemble(widx: int, q: int):
        """Lane half at static row-word widx covering bytes q..q+3:
        raw bytes masked to the message length, 0x01 pad at byte `len`,
        0x80 at the last byte of the message's final rate block."""
        raw = words_ref[0, widx] if widx < n_words else zero
        nb = nlen - q  # bytes of this word inside the message
        m = jnp.where(
            nb <= 0, jnp.uint32(0),
            jnp.where(nb == 1, jnp.uint32(0xFF),
                      jnp.where(nb == 2, jnp.uint32(0xFFFF),
                                jnp.where(nb == 3, jnp.uint32(0xFFFFFF),
                                          jnp.uint32(0xFFFFFFFF)))))
        x = raw & m
        # legacy 0x01 pad byte at offset `len` (little-endian byte order)
        x = x ^ jnp.where(
            nb == 0, jnp.uint32(0x01),
            jnp.where(nb == 1, jnp.uint32(0x0100),
                      jnp.where(nb == 2, jnp.uint32(0x010000),
                                jnp.where(nb == 3, jnp.uint32(0x01000000),
                                          jnp.uint32(0)))))
        e = q80 - q
        x = x ^ jnp.where(
            e == 0, jnp.uint32(0x80),
            jnp.where(e == 1, jnp.uint32(0x8000),
                      jnp.where(e == 2, jnp.uint32(0x800000),
                                jnp.where(e == 3, jnp.uint32(0x80000000),
                                          jnp.uint32(0)))))
        return x

    for ib in range(num_blocks):
        @pl.when(jnp.any(nblk > ib) if ib > 0 else True)
        def _(ib=ib):
            sh = [st_ref[w] for w in range(25)]
            sl = [st_ref[25 + w] for w in range(25)]
            xh, xl = list(sh), list(sl)
            for w in range(WORDS):
                base = 34 * ib + 2 * w
                q = int(RATE) * ib + 8 * w
                xl[w] = sl[w] ^ assemble(base, q)
                xh[w] = sh[w] ^ assemble(base + 1, q + 4)
            nh, nl = _permute(xh, xl, rc_ref)
            if ib > 0:
                active = nblk > ib
                nh = [jnp.where(active, a, b) for a, b in zip(nh, sh)]
                nl = [jnp.where(active, a, b) for a, b in zip(nl, sl)]
            for w in range(25):
                st_ref[w] = nh[w]
                st_ref[25 + w] = nl[w]
    for w in range(4):
        out_ref[0, w, 0] = st_ref[w]
        out_ref[0, w, 1] = st_ref[25 + w]


@functools.partial(jax.jit, static_argnames=("num_blocks",))
def _keccak_lanes_raw(words, nlens, *, num_blocks: int):
    """words: u32 [Bt, NW, TILE_SUB, 128] (LE row words, lane-tiled);
    nlens: i32 [Bt, TILE_SUB, 128]. Returns u32 [Bt, 4, 2, TILE_SUB, 128]
    digest lanes, identical to _keccak_lanes."""
    bt, nw = words.shape[0], words.shape[1]
    kernel = functools.partial(_keccak_kernel_raw, num_blocks, nw)
    return pl.pallas_call(
        kernel,
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nw, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, 2, TILE_SUB, TILE_LANE),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bt, 4, 2, TILE_SUB, TILE_LANE),
                                       jnp.uint32),
        scratch_shapes=[pltpu.VMEM((50, TILE_SUB, TILE_LANE), jnp.uint32)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(_RC), nlens, words)


def keccak256_tpu_raw(data, lengths=None):
    """keccak256_tpu via the raw-word kernel (pad + lane assembly fused
    in-kernel). Bit-identical digests. NEGATIVE RESULT on v5e (kept as a
    documented experiment): 0.285 ms vs the byte-path kernel's 0.251 ms
    on the 5632x576 headline pool — the in-register select chains of the
    assembly cost more than the XLA pad/lane/transpose pre-passes they
    replace (XLA fuses those well). data u8 [B, L], lengths i32 [B]."""
    data = jnp.asarray(data, dtype=jnp.uint8)
    b, max_len = data.shape
    if lengths is None:
        lengths = jnp.full((b,), max_len, dtype=jnp.int32)
    else:
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
    num_blocks = max_len // RATE + 1
    bp = -(-b // TILE) * TILE
    if bp != b:
        data = jnp.pad(data, ((0, bp - b), (0, 0)))
        lengths = jnp.pad(lengths, (0, bp - b))
    l8 = -(-max_len // 8) * 8
    if l8 != max_len:
        data = jnp.pad(data, ((0, 0), (0, l8 - max_len)))
    # free little-endian u32 view of the row bytes (TPU is little-endian)
    words = jax.lax.bitcast_convert_type(
        data.reshape(bp, l8 // 4, 4), jnp.uint32)  # [Bp, W]
    bt = bp // TILE
    words = words.reshape(bt, TILE_SUB, TILE_LANE, l8 // 4).transpose(
        0, 3, 1, 2)
    nl = lengths.reshape(bt, TILE_SUB, TILE_LANE)
    out = _keccak_lanes_raw(words, nl, num_blocks=num_blocks)
    out = out.transpose(0, 3, 4, 1, 2).reshape(bp, 4, 2)
    return lanes_to_bytes(out[:, :, 0], out[:, :, 1])[:b]


def keccak256_tpu(data, lengths=None, *, unpadded_count=None):
    """Batched Ethereum Keccak-256 via the Pallas kernel.

    data: uint8 [B, L]; lengths: int32 [B] (defaults to full L).
    Returns uint8 [B, 32]. B is padded internally to a multiple of 1024.
    """
    data = jnp.asarray(data, dtype=jnp.uint8)
    b, max_len = data.shape
    if lengths is None:
        lengths = jnp.full((b,), max_len, dtype=jnp.int32)
    else:
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
    num_blocks = max_len // RATE + 1
    hi, lo = _keccak_digest_lanes(data, lengths, num_blocks)
    return lanes_to_bytes(hi, lo)[:b]


def _keccak_digest_lanes(data, lengths, num_blocks: int):
    """Shared core: returns digest lanes (hi, lo) u32 [Bp, 4] where Bp is the
    1024-padded batch. Tail messages are padded with zero-length inputs."""
    b = data.shape[0]
    bp = -(-b // TILE) * TILE
    if bp != b:
        data = jnp.pad(data, ((0, bp - b), (0, 0)))
        lengths = jnp.pad(lengths, (0, bp - b))
    padded = pad_messages(data, lengths, num_blocks)
    blocks = padded.reshape(bp, num_blocks, RATE)
    mh, ml = bytes_to_lanes(blocks)  # [Bp, NB, 17]
    # -> [Bt, NB, 17, TILE_SUB, 128]
    bt = bp // TILE
    resh = lambda a: (
        a.reshape(bt, TILE_SUB, TILE_LANE, num_blocks, WORDS)
        .transpose(0, 3, 4, 1, 2)
    )
    nblocks = (lengths // RATE + 1).reshape(bt, TILE_SUB, TILE_LANE)
    masked = num_blocks > 1
    out = _keccak_lanes(
        resh(mh), resh(ml), nblocks, num_blocks=num_blocks, masked=masked
    )  # [Bt, 4, 2, TILE_SUB, 128]
    out = out.transpose(0, 3, 4, 1, 2).reshape(bp, 4, 2)
    return out[:, :, 0], out[:, :, 1]  # hi, lo  [Bp, 4]
