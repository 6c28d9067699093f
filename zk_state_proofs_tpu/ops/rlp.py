"""Fixed-shape, table-free RLP *node* decoding on device.

TPU-native replacement for the RLP node codec the reference delegates to the
`eth_trie` crate and `alloy-rlp` (reference: crypto-ops/src/lib.rs:14-22,
trie-utils usage at proofs/transaction.rs:45,67). Everything operates on
zero-padded uint8 buffers with explicit lengths — static shapes under jit;
per-item spans come out of a 17-step lax.scan so branch (17-item) and
extension/leaf (2-item) nodes decode through one code path.

All functions are written for a SINGLE buffer and vmapped by callers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_ITEMS = 17  # branch node arity (16 children + value)


def _get(buf, idx):
    """Safe byte fetch as int32: clamps index into range (buffers carry zero
    padding, and all OOB reads happen only on already-invalid paths)."""
    idx = jnp.clip(idx, 0, buf.shape[0] - 1)
    return buf[idx].astype(jnp.int32)


def item_head(buf, pos):
    """Parse the RLP header of the item starting at byte offset `pos`.

    Returns (payload_start, payload_len, is_list, head_valid):
      - single byte < 0x80: payload is the byte itself (len 1)
      - 0x80-0xb7 short string / 0xc0-0xf7 short list: 1-byte header
      - 0xb8-0xbf long string / 0xf8-0xff long list: 1 + length-of-length
        header (lengths up to 3 bytes = 16 MB, far above any trie node)
    `head_valid` rejects length-of-length > 3 only; canonicality of the
    encoding itself is enforced by the trusted keccak commitment (a proof
    node hashes to its 32-byte identity, so byte-level malleability is
    already excluded).
    """
    b0 = _get(buf, pos)
    single = b0 < 0x80
    long_str = (b0 >= 0xB8) & (b0 <= 0xBF)
    long_list = b0 >= 0xF8
    is_list = b0 >= 0xC0
    lol = jnp.where(long_str, b0 - 0xB7, jnp.where(long_list, b0 - 0xF7, 0))
    l1, l2, l3 = _get(buf, pos + 1), _get(buf, pos + 2), _get(buf, pos + 3)
    long_len = jnp.where(
        lol == 1, l1, jnp.where(lol == 2, (l1 << 8) | l2, (l1 << 16) | (l2 << 8) | l3)
    )
    payload_len = jnp.where(
        single,
        1,
        jnp.where(
            long_str | long_list,
            long_len,
            jnp.where(is_list, b0 - 0xC0, b0 - 0x80),
        ),
    )
    payload_start = jnp.where(single, pos, pos + 1 + lol)
    head_valid = lol <= 3
    return payload_start, payload_len, is_list, head_valid


def node_items(buf, start, buf_len):
    """Decode a trie node (an RLP list) at `start` into up to 17 item spans.

    Returns a dict of arrays indexed [17]:
      item_start   header offset of each item (== inline-child node offset)
      payload_start, payload_len, is_list
      present      item exists (True for the node's real items)
    plus scalars: count (item count), list_end, well_formed.
    """
    ps, plen, is_list, head_ok = item_head(buf, start)
    end = ps + plen

    def step(cursor, _):
        ips, ipl, ilist, ok = item_head(buf, cursor)
        present = cursor < end
        item_end = ips + ipl
        nxt = jnp.where(present, item_end, cursor)
        return nxt, (cursor, ips, ipl, ilist, present, ok & present)

    cursor_final, (istart, ipay, iplen, ilist, present, iok) = jax.lax.scan(
        step, ps, None, length=MAX_ITEMS
    )
    count = present.sum()
    well_formed = (
        is_list
        & head_ok
        & (cursor_final == end)
        & (end <= buf_len)
        & jnp.all(~present | iok)
    )
    return {
        "item_start": istart,
        "payload_start": ipay,
        "payload_len": iplen,
        "is_list": ilist,
        "present": present,
        "count": count,
        "well_formed": well_formed,
        "list_end": end,
    }


def read_bytes32(buf, pos):
    """Gather 32 bytes starting at `pos` (clamped) as uint8 [32]."""
    idx = jnp.clip(pos + jnp.arange(32), 0, buf.shape[0] - 1)
    return buf[idx]


def bytes_to_nibbles_device(key_bytes):
    """uint8 [K] -> uint8 [2K] nibble expansion (high first)."""
    hi = key_bytes >> 4
    lo = key_bytes & 0x0F
    return jnp.stack([hi, lo], axis=-1).reshape(key_bytes.shape[0] * 2)
