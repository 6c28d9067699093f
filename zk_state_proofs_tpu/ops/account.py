"""Device-side Ethereum account-leaf decoding.

Equivalent of the reference's `alloy_rlp::decode_exact::<Account>` inside the
storage circuit (reference:
circuits/risc0-storage-proof/.../storage-circuit/src/main.rs:15): the
account leaf value is RLP `[nonce, balance, storage_root, code_hash]`; the
decoded `storage_root` feeds level-2 (per-account storage trie) proof
verification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rlp import node_items, read_bytes32


def _bytes_left_pad(buf, start, length, width: int):
    """Big-endian byte span -> left-padded uint8 [width] (u64 nonces are
    returned as 8 bytes, u256 balances as 32 — JAX runs without x64, so wide
    ints stay in byte form)."""
    j = jnp.arange(width)
    src = start + j - (width - length)
    valid = j >= (width - length)
    idx = jnp.clip(src, 0, buf.shape[0] - 1)
    return jnp.where(valid, buf[idx], 0).astype(jnp.uint8)


def decode_account_one(value, value_len):
    """Decode one account leaf value (uint8 [V], length scalar).

    Returns dict(ok, nonce u8[8] big-endian, balance u8[32] big-endian,
    storage_root u8[32], code_hash u8[32])."""
    items = node_items(value, 0, value_len)
    ok = (
        items["well_formed"]
        & (items["count"] == 4)
        & ~items["is_list"][0]
        & ~items["is_list"][1]
        & (items["payload_len"][2] == 32)
        & (items["payload_len"][3] == 32)
        & (items["list_end"] == value_len)
    )
    nonce = _bytes_left_pad(value, items["payload_start"][0], items["payload_len"][0], 8)
    balance = _bytes_left_pad(value, items["payload_start"][1], items["payload_len"][1], 32)
    storage_root = read_bytes32(value, items["payload_start"][2])
    code_hash = read_bytes32(value, items["payload_start"][3])
    return {
        "ok": ok,
        "nonce": nonce,
        "balance": balance,
        "storage_root": storage_root,
        "code_hash": code_hash,
    }


decode_account = jax.vmap(decode_account_one)
