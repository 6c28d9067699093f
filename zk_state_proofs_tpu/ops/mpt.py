"""Batched MPT proof verification on device — the framework's core op.

TPU-native re-design of the reference's `verify_merkle_proof`
(reference: crypto-ops/src/lib.rs:8-23) and the `eth_trie` nibble-path walk
it delegates to. Instead of a recursive DB walk, verification is
*phase-split* for the hardware:

  Phase 1 (MXU/VPU-heavy): every proof node in the batch is keccak-hashed by
  the batched keccak kernel in one shot.
  Phase 2 (gather/compare): a fixed-trip-count walker steps root -> leaf
  through each proof, re-checking that each consumed child hash matches the
  precomputed digest of the next node, decoding branch/extension/leaf
  structure with the fixed-shape RLP decoder, and consuming key nibbles.

Instead of panicking like the reference ("Failed to verify" /
"Key does not exist!", crypto-ops/src/lib.rs:14,22), the batch verifier
returns a per-proof STATUS code plus the extracted value span:
  FOUND    — key present, value extracted (reference: the Ok path)
  EXCLUDED — proof is consistent and proves absence (reference panics
             "Key does not exist!")
  INVALID  — hash mismatch / malformed node / truncated proof (reference
             panics "Invalid merkle proof" or "Failed to verify")

Everything is static-shape: proofs are padded to [max_nodes, node_len] and
walked for a fixed number of steps with masked state updates. Inline
(<32-byte, embedded) child nodes are walked in-place within the parent's
buffer — no host-side flattening, the device verifies exactly the bytes the
hash commitment covers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..oracle.trie import EMPTY_ROOT
from .rlp import (bytes_to_nibbles_device, decode_node_select, item_head,
                  node_items, read_bytes32)
from .select import fetch_window_1d

# status codes (per proof)
RUNNING = 0
FOUND = 1
EXCLUDED = 2
INVALID = 3

_EMPTY_ROOT_NP = np.frombuffer(EMPTY_ROOT, dtype=np.uint8)


def _walk_step(nodes, node_lens, num_nodes, digests, key_nibbles, key_len, carry):
    """One walker step over the current (possibly inline) node."""
    node_idx, off, key_pos, status, vnode, vstart, vlen = carry
    buf = nodes[node_idx]
    buf_len = node_lens[node_idx]
    maxnib = key_nibbles.shape[0]
    # single gather-free fetch of the remaining key window; element 0 is the
    # branch child nibble (garbage once the key is exhausted — masked below)
    key_win = fetch_window_1d(key_nibbles, key_pos, maxnib).astype(jnp.int32)
    c = key_win[0]
    items = decode_node_select(buf, off, buf_len, c)

    is_branch = items["count"] == 17
    is_pair = items["count"] == 2
    bad_node = ~items["well_formed"] | (~is_branch & ~is_pair)

    # ---- branch node ----
    key_exhausted = key_pos >= key_len
    bval_len = items["i16_len"]
    branch_found = is_branch & key_exhausted & (bval_len > 0)
    branch_excl = is_branch & key_exhausted & (bval_len == 0)
    b_cstart = items["c_start"]
    b_cpay = items["c_pay"]
    b_cplen = items["c_len"]
    b_clist = items["c_list"]
    take_child = is_branch & ~key_exhausted
    child_empty = take_child & ~b_clist & (b_cplen == 0)

    # ---- extension/leaf node (2 items) ----
    p0s = items["i0_pay"]
    p0l = items["i0_len"]
    p0list = items["i0_list"]
    # gather-free window fetch of the hex-prefix path (profiled: batched
    # gathers were ~65% of walk time; the one-hot matmul form is ~3x faster)
    path_window = fetch_window_1d(buf, p0s, maxnib // 2 + 2)  # [K/2+2] bytes
    wnib = bytes_to_nibbles_device(path_window).astype(jnp.int32)  # [K+4]
    b0 = path_window[0].astype(jnp.int32)
    flag = b0 >> 4
    is_leaf = flag >= 2
    odd = flag & 1
    # path nibble j lives at global nibble index j + (2 - odd); odd has only
    # two values, so select between two static slices instead of gathering
    path_nib = jnp.where(odd == 1, wnib[1 : maxnib + 1], wnib[2 : maxnib + 2])
    hp_ok = is_pair & ~p0list & (p0l >= 1) & (flag <= 3) & ((odd == 1) | ((b0 & 0x0F) == 0))
    n_path = 2 * (p0l - 1) + odd
    j = jnp.arange(maxnib)
    key_nib = key_win
    active_j = j < n_path
    within_key = key_pos + n_path <= key_len
    nibbles_match = jnp.all(~active_j | (path_nib == key_nib)) & within_key

    leaf_found = is_pair & is_leaf & nibbles_match & (key_pos + n_path == key_len)
    leaf_excl = is_pair & is_leaf & ~leaf_found
    ext_bad = is_pair & ~is_leaf & (n_path == 0)  # empty extension path: malformed
    ext_excl = is_pair & ~is_leaf & ~nibbles_match
    ext_child = is_pair & ~is_leaf & nibbles_match & ~ext_bad
    e_cstart = items["i1_start"]
    e_cpay = items["i1_pay"]
    e_cplen = items["i1_len"]
    e_clist = items["i1_list"]
    bad_node = bad_node | (is_pair & ~hp_ok) | ext_bad

    # ---- merge child reference (branch child or extension child) ----
    has_child = take_child & ~child_empty | ext_child
    cstart = jnp.where(take_child, b_cstart, e_cstart)
    cpay = jnp.where(take_child, b_cpay, e_cpay)
    cplen = jnp.where(take_child, b_cplen, e_cplen)
    clist = jnp.where(take_child, b_clist, e_clist)
    child_hash = has_child & ~clist & (cplen == 32)
    child_inline = has_child & clist
    child_bad = has_child & ~clist & (cplen != 32)

    # hash-referenced child: locate the node whose digest matches, matching
    # the reference's hash-keyed proof DB semantics (crypto-ops/src/
    # lib.rs:10-13 — proof nodes may arrive in ANY order)
    expected = fetch_window_1d(buf, cpay, 32)
    d = digests.shape[0]
    row_match = jnp.all(digests == expected[None, :], axis=1) & (
        jnp.arange(d) < num_nodes
    )
    have_next = jnp.any(row_match)
    nxt = jnp.argmax(row_match).astype(jnp.int32)
    hash_fail = child_hash & ~have_next

    # ---- resolve new state ----
    new_status = jnp.where(
        bad_node | child_bad | hash_fail,
        INVALID,
        jnp.where(
            branch_found | leaf_found,
            FOUND,
            jnp.where(branch_excl | child_empty | leaf_excl | ext_excl, EXCLUDED, RUNNING),
        ),
    )
    # value span (leaf item 1 payload, or branch item 16 payload)
    found_now = new_status == FOUND
    new_vnode = jnp.where(found_now, node_idx, vnode)
    new_vstart = jnp.where(
        found_now, jnp.where(leaf_found, items["i1_pay"], items["i16_pay"]), vstart
    )
    new_vlen = jnp.where(
        found_now, jnp.where(leaf_found, items["i1_len"], items["i16_len"]), vlen
    )
    new_key_pos = jnp.where(take_child, key_pos + 1, jnp.where(ext_child, key_pos + n_path, key_pos))
    new_node_idx = jnp.where(child_hash, nxt, node_idx)
    new_off = jnp.where(child_hash, 0, jnp.where(child_inline, cstart, off))

    live = status == RUNNING
    pick = lambda new, old: jnp.where(live, new, old)
    return (
        pick(new_node_idx, node_idx),
        pick(new_off, off),
        pick(new_key_pos, key_pos),
        pick(new_status, status),
        pick(new_vnode, vnode),
        pick(new_vstart, vstart),
        pick(new_vlen, vlen),
    )


def walk_one(nodes, node_lens, num_nodes, digests, root, key_nibbles, key_len,
             max_value_len: int, max_steps: int | None = None):
    """Walk a single padded proof. Returns (status, value[max_value_len],
    value_len). vmapped over the batch by `verify_proofs`."""
    d = nodes.shape[0]
    empty_proof = num_nodes == 0
    root_is_empty = jnp.all(root == jnp.asarray(_EMPTY_ROOT_NP))
    # the root node may sit anywhere in the (unordered) proof list —
    # reference semantics: proof DB keyed by hash (crypto-ops/src/lib.rs:14)
    root_match = jnp.all(digests == root[None, :], axis=1) & (
        jnp.arange(d) < num_nodes
    )
    root_ok = jnp.any(root_match)
    root_idx = jnp.argmax(root_match).astype(jnp.int32)
    status0 = jnp.where(
        empty_proof,
        jnp.where(root_is_empty, EXCLUDED, INVALID),
        jnp.where(root_ok, RUNNING, INVALID),
    ).astype(jnp.int32)
    zero = jnp.int32(0)
    carry = (root_idx, zero, zero, status0, zero, zero, zero)

    step = functools.partial(
        _walk_step, nodes, node_lens, num_nodes, digests, key_nibbles, key_len
    )
    if max_steps is None:
        max_steps = d + 6  # hashed depth + headroom for nested inline nodes
    carry = jax.lax.fori_loop(0, max_steps, lambda _, c: step(c), carry)
    node_idx, off, key_pos, status, vnode, vstart, vlen = carry
    status = jnp.where(status == RUNNING, INVALID, status)

    # extract the value span
    val_buf = nodes[vnode]
    idx = jnp.clip(vstart + jnp.arange(max_value_len), 0, val_buf.shape[0] - 1)
    value = jnp.where(jnp.arange(max_value_len) < vlen, val_buf[idx], 0)
    vlen = jnp.where(status == FOUND, vlen, 0)
    return status, value.astype(jnp.uint8), vlen


def hash_nodes(nodes, node_lens):
    """Phase 1: digest every padded proof node. nodes u8 [B, D, N],
    node_lens i32 [B, D] -> digests u8 [B, D, 32]. Uses the Pallas kernel on
    TPU, the pure-jnp sponge elsewhere.

    Rows are hashed depth-major ([D, B] order): node size correlates
    strongly with trie depth (roots/branches span 4-5 rate blocks, leaves 1,
    padding 0), so kernel tiles become near-homogeneous and the per-tile
    block-skip in the masked kernel eliminates most padded permutations —
    a free transpose instead of a device sort."""
    b, d, n = nodes.shape
    flat = nodes.transpose(1, 0, 2).reshape(b * d, n)
    lens = node_lens.transpose(1, 0).reshape(b * d)
    if jax.default_backend() == "tpu":
        from .keccak_pallas import keccak256_tpu

        digests = keccak256_tpu(flat, lens)
    else:
        from .keccak import keccak256

        digests = keccak256(flat, lens)
    return digests.reshape(d, b, 32).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("max_value_len", "max_steps"))
def verify_proofs(nodes, node_lens, num_nodes, roots, key_nibbles, key_lens,
                  max_value_len: int = 128, max_steps: int | None = None):
    """Batched MPT proof verification.

    nodes       u8  [B, D, N]   zero-padded RLP proof nodes, root first
    node_lens   i32 [B, D]
    num_nodes   i32 [B]
    roots       u8  [B, 32]     trusted root hashes
    key_nibbles u8  [B, K]      nibble-expanded lookup keys
    key_lens    i32 [B]         nibble counts
    max_steps: walker trip count; default D + 6 (depth + headroom for
    nested inline nodes). Tries whose values never encode below 32 bytes
    (account tries: leaves >= 70 B) cannot contain inline nodes, so
    max_steps = D is exact and ~2x faster.
    Returns (status i32 [B], values u8 [B, max_value_len], value_lens i32 [B]).
    """
    digests = hash_nodes(nodes, node_lens)
    walker = jax.vmap(
        lambda nd, nl, nn, dg, rt, kn, kl: walk_one(
            nd, nl, nn, dg, rt, kn, kl, max_value_len, max_steps
        )
    )
    return walker(nodes, node_lens, num_nodes, digests, roots, key_nibbles, key_lens)
