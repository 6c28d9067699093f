"""Batched MPT proof verification on device — the framework's core op.

TPU-native re-design of the reference's `verify_merkle_proof`
(reference: crypto-ops/src/lib.rs:8-23) and the `eth_trie` nibble-path walk
it delegates to. Instead of a recursive DB walk, verification is
*phase-split* for the hardware:

  Phase 1 (MXU/VPU-heavy): every proof node in the batch is keccak-hashed by
  the batched keccak kernel in one shot.
  Phase 2 (decode/compare): a fixed-trip-count walker steps root -> leaf
  through each proof, locating each consumed child by digest match over the
  proof rows (the reference's hash-keyed DB semantics — node order never
  matters, crypto-ops/src/lib.rs:10-14), decoding branch/extension/leaf
  structure with the fixed-shape RLP decoder, and consuming key nibbles.

The walker is natively batched (no vmap): every per-step quantity is a [B]
vector, and all dynamic byte access goes through ONE packed-word table per
step (select.make_word_table) so each fetch is a single f32 one-hot
contraction on the MXU — TPU has no vector gather, and this formulation
keeps the step's intermediates small enough to live in VMEM. The 17
sequential header parses per node are irreducible (RLP items are
length-prefixed chains) but cost one tiny contraction each.

The batched step is conditioned at two levels (scalar lax.cond, so skipped
work costs nothing at runtime): the extension/leaf hex-prefix machinery
only runs on steps where some live proof sits on a 2-item node (account
tries: 1 of ~6 steps), and a step where no proof is live at all is a no-op
(early batch completion under conservative max_steps).

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
from .rlp import bytes_to_nibbles_device, decode_node_select
from .select import fetch_window, make_word_table

# status codes (per proof)
RUNNING = 0
FOUND = 1
EXCLUDED = 2
INVALID = 3

# INVALID reason codes (per proof; verify_proofs_diagnose) — the debugging
# surface matching the reference's distinct panic messages
# ("Invalid merkle proof" / "Failed to verify", crypto-ops/src/lib.rs:14,22)
R_NONE = 0           # proof not INVALID
R_MALFORMED = 1      # ill-formed RLP node / wrong item count / bad hex-prefix
R_BAD_CHILD_REF = 2  # hash child reference is not 32 bytes
R_HASH_MISMATCH = 3  # referenced digest matches no proof node
R_ROOT_MISSING = 4   # no proof node hashes to the trusted root
R_TRUNCATED = 5      # walk ran out of nodes/steps before a terminal
REASON_NAMES = {
    R_NONE: "ok",
    R_MALFORMED: "malformed-node",
    R_BAD_CHILD_REF: "bad-child-ref",
    R_HASH_MISMATCH: "hash-mismatch",
    R_ROOT_MISSING: "root-missing",
    R_TRUNCATED: "truncated",
}

_EMPTY_ROOT_NP = np.frombuffer(EMPTY_ROOT, dtype=np.uint8)


def _step_pair(buf, key_nibbles, key_lens, key_pos, p0s, p0l, p0list):
    """Extension/leaf machinery for the whole batch: hex-prefix decode +
    nibble-path comparison. Two wide window fetches (`fetch_window`: wide
    windows lower better through its two-stage form than through multi-row
    packed contractions) — executed under a scalar cond when `conditional`,
    since only steps where some live proof sits on a 2-item node need it."""
    maxnib = key_nibbles.shape[1]
    path_window = fetch_window(buf, p0s, maxnib // 2 + 2).astype(jnp.int32)
    wnib = bytes_to_nibbles_device(path_window)
    b0 = path_window[:, 0]
    flag = b0 >> 4
    is_leaf = flag >= 2
    odd = flag & 1
    hp_ok = ~p0list & (p0l >= 1) & (flag <= 3) & ((odd == 1) | ((b0 & 0x0F) == 0))
    n_path = 2 * (p0l - 1) + odd
    # path nibble j lives at global nibble index j + (2 - odd); odd has only
    # two values, so select between two static slices instead of gathering
    path_nib = jnp.where((odd == 1)[:, None], wnib[:, 1:maxnib + 1],
                         wnib[:, 2:maxnib + 2])
    key_nib = fetch_window(key_nibbles, key_pos, maxnib).astype(jnp.int32)
    j = jnp.arange(maxnib)[None, :]
    within_key = key_pos + n_path <= key_lens
    match = jnp.all((j >= n_path[:, None]) | (path_nib == key_nib),
                    axis=1) & within_key
    return {
        "is_leaf": is_leaf,
        "hp_ok": hp_ok,
        "n_path": n_path,
        "match": match,
    }


def _pair_zeros(b):
    return {
        "is_leaf": jnp.zeros((b,), jnp.bool_),
        "hp_ok": jnp.ones((b,), jnp.bool_),
        "n_path": jnp.zeros((b,), jnp.int32),
        "match": jnp.zeros((b,), jnp.bool_),
    }


def _step_merge(buf, num_nodes, digests, key_lens, carry, items, pair):
    """Resolve the batch's transitions from decode + pair outputs."""
    node_idx, off, key_pos, status, vnode, vstart, vlen, reason = carry

    is_branch = items["count"] == 17
    is_pair = items["count"] == 2
    bad_node = ~items["well_formed"] | (~is_branch & ~is_pair)

    # ---- branch node ----
    key_exhausted = key_pos >= key_lens
    bval_len = items["i16_len"]
    branch_found = is_branch & key_exhausted & (bval_len > 0)
    branch_excl = is_branch & key_exhausted & (bval_len == 0)
    take_child = is_branch & ~key_exhausted
    child_empty = take_child & ~items["c_list"] & (items["c_len"] == 0)

    # ---- extension/leaf node ----
    is_leaf = pair["is_leaf"]
    n_path = pair["n_path"]
    nibbles_match = pair["match"]
    leaf_found = is_pair & is_leaf & nibbles_match & (key_pos + n_path == key_lens)
    leaf_excl = is_pair & is_leaf & ~leaf_found
    ext_bad = is_pair & ~is_leaf & (n_path == 0)  # empty extension path
    ext_excl = is_pair & ~is_leaf & ~nibbles_match
    ext_child = is_pair & ~is_leaf & nibbles_match & ~ext_bad
    bad_node = bad_node | (is_pair & ~pair["hp_ok"]) | ext_bad

    # ---- merge child reference (branch child or extension child) ----
    has_child = take_child & ~child_empty | ext_child
    cstart = jnp.where(take_child, items["c_start"], items["i1_start"])
    cpay = jnp.where(take_child, items["c_pay"], items["i1_pay"])
    cplen = jnp.where(take_child, items["c_len"], items["i1_len"])
    clist = jnp.where(take_child, items["c_list"], items["i1_list"])
    child_hash = has_child & ~clist & (cplen == 32)
    child_inline = has_child & clist
    child_bad = has_child & ~clist & (cplen != 32)

    # hash-referenced child: locate the node whose digest matches, matching
    # the reference's hash-keyed proof DB (order-independent)
    expected = fetch_window(buf, cpay, 32)  # u8 [B, 32]
    d = digests.shape[1]
    row_match = jnp.all(digests == expected[:, None, :], axis=2) & (
        jnp.arange(d)[None, :] < num_nodes[:, None]
    )
    have_next = jnp.any(row_match, axis=1)
    nxt = jnp.argmax(row_match, axis=1).astype(jnp.int32)
    hash_fail = child_hash & ~have_next

    # ---- resolve new state ----
    new_status = jnp.where(
        bad_node | child_bad | hash_fail,
        INVALID,
        jnp.where(
            branch_found | leaf_found,
            FOUND,
            jnp.where(branch_excl | child_empty | leaf_excl | ext_excl,
                      EXCLUDED, RUNNING),
        ),
    )
    found_now = new_status == FOUND
    new_vnode = jnp.where(found_now, node_idx, vnode)
    new_vstart = jnp.where(
        found_now, jnp.where(leaf_found, items["i1_pay"], items["i16_pay"]),
        vstart,
    )
    new_vlen = jnp.where(
        found_now, jnp.where(leaf_found, items["i1_len"], items["i16_len"]),
        vlen,
    )
    new_key_pos = jnp.where(take_child, key_pos + 1,
                            jnp.where(ext_child, key_pos + n_path, key_pos))
    new_node_idx = jnp.where(child_hash, nxt, node_idx)
    new_off = jnp.where(child_hash, 0, jnp.where(child_inline, cstart, off))
    # diagnosable INVALID reason: first failure class that applied
    new_reason = jnp.where(
        bad_node, R_MALFORMED,
        jnp.where(child_bad, R_BAD_CHILD_REF,
                  jnp.where(hash_fail, R_HASH_MISMATCH, reason)))

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
        pick(new_reason, reason),
    )


def _init_carry(num_nodes, digests, roots):
    """Batched init: find each proof's root node by digest (it may sit
    anywhere in the unordered proof list)."""
    b, d = digests.shape[0], digests.shape[1]
    empty_proof = num_nodes == 0
    root_is_empty = jnp.all(roots == jnp.asarray(_EMPTY_ROOT_NP)[None, :], axis=1)
    root_match = jnp.all(digests == roots[:, None, :], axis=2) & (
        jnp.arange(d)[None, :] < num_nodes[:, None]
    )
    root_ok = jnp.any(root_match, axis=1)
    root_idx = jnp.argmax(root_match, axis=1).astype(jnp.int32)
    status0 = jnp.where(
        empty_proof,
        jnp.where(root_is_empty, EXCLUDED, INVALID),
        jnp.where(root_ok, RUNNING, INVALID),
    ).astype(jnp.int32)
    reason0 = jnp.where(status0 == INVALID, R_ROOT_MISSING, R_NONE)
    zero = jnp.zeros((b,), jnp.int32)
    return (root_idx, zero, zero, status0, zero, zero, zero, reason0)


def _word_shift_window(words, start_col, out_cols: int):
    """Per-row dynamic window over the column axis via a binary shift
    cascade: out[b, j] = words[b, start_col_b + j] (0 past the end).
    log2(C) stages of static slices + row-selects — no gathers, no
    one-hot materialization, so it scales to wide windows (tx values)
    where a one-hot select matrix would be GBs. Stages run with
    DESCENDING shifts and truncate progressively (see the in-kernel
    _dyn_window twin, ops/mpt_pallas.py)."""
    b, c = words.shape
    nbits = max(1, (c - 1).bit_length())
    cur = words
    for bit in reversed(range(nbits)):
        s = 1 << bit
        need = min(c, out_cols + s - 1)
        base = cur[:, :need]
        avail = max(cur.shape[1] - s, 0)
        if avail <= 0:
            shifted = jnp.zeros((b, need), cur.dtype)
        elif avail >= need:
            shifted = cur[:, s:s + need]
        else:
            shifted = jnp.pad(cur[:, s:], ((0, 0), (0, need - avail)))
        take = ((start_col >> bit) & 1) == 1
        cur = jnp.where(take[:, None], shifted, base)
    if cur.shape[1] < out_cols:  # buffer narrower than the window
        cur = jnp.pad(cur, ((0, 0), (0, out_cols - cur.shape[1])))
    return cur[:, :out_cols]


def _extract_value(nodes, carry, max_value_len: int):
    """Slice each proof's value bytes out of its terminal node.

    Gather-free: TPU row/element gathers cost ~10 ns/element, which made
    a take_along_axis extraction ~5.9 ms at [4096, 128] — longer than
    the entire hash+walk. Instead: masked-sum node-row select over the
    i32 word view (D terms), a word-granular shift-cascade window at
    vstart//4, then a static 4-way byte alignment. ~0.1 ms at the
    headline shape and memory-sane at tx-size values (2 KB windows)."""
    node_idx, off, key_pos, status, vnode, vstart, vlen, reason = carry
    b, d, n = nodes.shape
    n4 = -(-n // 4) * 4
    if n4 != n:
        nodes = jnp.pad(nodes, ((0, 0), (0, 0), (0, n4 - n)))
    w = nodes.astype(jnp.int32).reshape(b, d, n4 // 4, 4)
    words = (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]
    valw = jnp.zeros((b, n4 // 4), jnp.int32)
    for dd in range(d):
        valw = jnp.where((vnode == dd)[:, None], words[:, dd], valw)
    vc = jnp.clip(vstart, 0, n4 - 1)
    k = max_value_len // 4 + 2
    win = _word_shift_window(valw, vc >> 2, k)  # [B, K]
    by = jnp.stack([(win >> 24) & 255, (win >> 16) & 255,
                    (win >> 8) & 255, win & 255], axis=-1).reshape(b, 4 * k)
    r = vc & 3
    out = by[:, 0:max_value_len]
    for s in (1, 2, 3):
        out = jnp.where((r == s)[:, None], by[:, s:s + max_value_len], out)
    value = jnp.where(jnp.arange(max_value_len)[None, :] < vlen[:, None],
                      out, 0)
    vlen = jnp.where(status == FOUND, vlen, 0)
    return status, value.astype(jnp.uint8), vlen


def walk_batch(nodes, node_lens, num_nodes, digests, roots, key_nibbles,
               key_lens, max_value_len: int, max_steps: int | None = None,
               conditional: bool = True):
    """Batched walk over [B, D, N] proofs.

    conditional=True gates the pair-node machinery and whole steps behind
    scalar lax.cond (wins when max_steps is conservative or pair nodes are
    rare per step); conditional=False emits straight-line steps (wins
    slightly when max_steps is exact, e.g. account-trie buckets)."""
    b, d, n = nodes.shape
    if max_steps is None:
        max_steps = d + 6  # hashed depth + headroom for nested inline nodes

    carry = _init_carry(num_nodes, digests, roots)
    kn32 = key_nibbles.astype(jnp.int32)
    maxnib = key_nibbles.shape[1]

    def step_body(carry):
        node_idx, off, key_pos = carry[0], carry[1], carry[2]
        buf = jnp.take_along_axis(nodes, node_idx[:, None, None], axis=1)[:, 0]
        blen = jnp.take_along_axis(node_lens, node_idx[:, None], axis=1)[:, 0]
        table = make_word_table(buf)
        # next key nibble via masked sum (the full key window is only needed
        # on pair-node steps and is fetched there)
        c = jnp.sum(jnp.where(jnp.arange(maxnib)[None, :] == key_pos[:, None],
                              kn32, 0), axis=1)
        items = decode_node_select(table, off, blen, c)
        run_pair = lambda: _step_pair(buf, key_nibbles, key_lens, key_pos,
                                      items["i0_pay"], items["i0_len"],
                                      items["i0_list"])
        if conditional:
            live = carry[3] == RUNNING
            any_pair = jnp.any((items["count"] == 2) & live)
            pair = jax.lax.cond(any_pair, run_pair, lambda: _pair_zeros(b))
        else:
            pair = run_pair()
        return _step_merge(buf, num_nodes, digests, key_lens, carry,
                           items, pair)

    def step(_, carry):
        if not conditional:
            return step_body(carry)
        any_live = jnp.any(carry[3] == RUNNING)
        return jax.lax.cond(any_live, step_body, lambda c: c, carry)

    carry = jax.lax.fori_loop(0, max_steps, step, carry)
    status, value, vlen = _extract_value(nodes, carry, max_value_len)
    reasons = jnp.where(status == RUNNING, R_TRUNCATED, carry[7])
    status = jnp.where(status == RUNNING, INVALID, status)
    return status, value, vlen, reasons


def walk_one(nodes, node_lens, num_nodes, digests, root, key_nibbles, key_len,
             max_value_len: int, max_steps: int | None = None):
    """Single-proof walk (thin wrapper over the batched walker)."""
    status, value, vlen, _ = walk_batch(
        nodes[None], node_lens[None], num_nodes[None], digests[None],
        root[None], key_nibbles[None], key_len[None], max_value_len, max_steps,
    )
    return status[0], value[0], vlen[0]


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


def _hash_pool_rows(pool_nodes, pool_lens, pool_segments=None):
    """Digest pool rows, optionally as one keccak call per contiguous
    block-count segment (PackedProofs.pool_block_segments()): the
    length-sorted pool is mostly 1-block leaves, but an unsegmented call
    preps (pad/lane-assemble/transpose) the full static block bucket for
    every row — at the headline pool that is 5 rate blocks per row where
    the segmented form preps ~1.4 (two-point device A/B: ~0.08 -> ~0.03
    ms/batch). Bit-identical digests (parity-checked in tests and in
    analysis/ab_keccak.py)."""
    if jax.default_backend() == "tpu":
        from .keccak_pallas import keccak256_tpu as _keccak
    else:
        from .keccak import keccak256 as _keccak
    if pool_segments is None:
        return _keccak(pool_nodes, pool_lens)
    outs, off = [], 0
    for cnt, w in pool_segments:
        outs.append(_keccak(pool_nodes[off:off + cnt, :w],
                            pool_lens[off:off + cnt]))
        off += cnt
    if off != pool_nodes.shape[0]:
        raise ValueError(
            f"pool_segments cover {off} rows, pool has {pool_nodes.shape[0]}")
    return jnp.concatenate(outs)


def hash_nodes_pooled(pool_nodes, pool_lens, pool_idx, with_hints=False,
                      pool_hints=None, pool_segments=None):
    """Phase 1 with deduplicated hashing: digest the unique-node pool once
    and scatter to the per-proof table. pool_nodes u8 [U, N], pool_lens i32
    [U], pool_idx i32 [B, D] -> digests u8 [B, D, 32].

    Proof batches share trie nodes heavily (every proof repeats the trie's
    root/branch prefix), so U << B*D; the scatter is an exact one-hot bf16
    contraction (digest bytes < 256). Security is unchanged: the walker
    still checks the keccak link of every step of every proof — equal
    per-proof bytes simply share one permutation, where the reference
    re-hashes per proof (crypto-ops/src/lib.rs:10-13).

    with_hints=True additionally rides the 36 per-node RLP offset-hint
    bytes on the SAME one-hot scatter, returning (digests, hints u8
    [B, D, 36]) for the fused walk kernel's hinted (parallel-decode)
    mode. Hints come from `pool_hints` (u8 [U, 36], computed for ~free
    on the host at pack time — PackedProofs.pool_hints()) when given;
    otherwise from the device pass (ops.rlp.item_offsets — ~0.34 ms per
    5.6k-row pool on v5e: 18 sequential tiny fetches, launch-bound, so
    prefer pack-time hints on streamed paths).
    """
    pool_dig = _hash_pool_rows(pool_nodes, pool_lens, pool_segments)
    payload = pool_dig
    if with_hints:
        if pool_hints is None:
            from .rlp import item_offsets

            pool_hints = item_offsets(pool_nodes)
        payload = jnp.concatenate([pool_dig, pool_hints], axis=1)  # [U, 68]
    out = scatter_pool_payload(payload, pool_idx)
    if with_hints:
        return out[..., :32], out[..., 32:]
    return out


def scatter_pool_payload(payload, pool_idx):
    """Exact one-hot bf16 contraction: payload u8 [U, W], pool_idx i32
    [B, D] -> u8 [B, D, W]. Bytes are < 256, exact in bf16; the MXU
    contraction beats row gathers ~13x at the headline shape and a
    VMEM Pallas alternative (measured negative result, CLAUDE.md)."""
    b, d = pool_idx.shape
    u = payload.shape[0]
    onehot = (
        jnp.arange(u, dtype=jnp.int32)[None, :] == pool_idx.reshape(b * d)[:, None]
    ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        onehot, payload.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8).reshape(b, d, -1)


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps",
                                    "conditional", "hinted", "hint_mode",
                                    "depth_segments", "pool_segments"))
def verify_proofs_pooled(nodes, node_lens, num_nodes, roots, key_nibbles,
                         key_lens, pool_nodes, pool_lens, pool_idx,
                         pool_hints=None,
                         max_value_len: int = 128, max_steps: int | None = None,
                         conditional: bool = True, hinted: bool = True,
                         hint_mode: str | None = None,
                         depth_segments: tuple | None = None,
                         pool_segments: tuple | None = None):
    """`verify_proofs` with deduplicated hashing (see hash_nodes_pooled).
    The pool is produced by witness packing (PackedProofs.pool()).

    hinted=True (TPU): the pool scatter also carries per-node RLP offset
    hints so the fused kernel decodes without its serial header chain
    (results bit-identical; see walk_batch_pallas). Pass
    pool_hints=packed.pool_hints() (u8 [U, 36]) to use the ~free
    pack-time host scan instead of the device hint pass. Pass
    hinted=False for workloads dominated by inline-child steps (storage
    tries with short values), where the hinted fast path would always
    defer to the exact re-run and cost an extra kernel.

    depth_segments (TPU): static ((count, d), ...) covering the batch in
    order (PackedProofs.depth_segments()) — the walk dispatches one
    kernel call per contiguous depth segment, slicing the node axis to
    that segment's d. On depth-sorted batches the shallow segments skip
    the deep tiles' per-step d-way node materialization and input
    streaming (the measured walk-time floor). Hashing/scatter stay
    shared; classification is unchanged (each proof still walks its own
    num_nodes; segment d >= every num_nodes inside it by construction).

    pool_segments: static ((row_count, width), ...) covering the pool in
    order (PackedProofs.pool_block_segments()) — pool hashing dispatches
    one keccak call per contiguous block-count segment at its trimmed
    width (the XLA prep passes scale with the static block bucket; the
    sorted pool is mostly 1-block rows). Digests are bit-identical."""
    if jax.default_backend() == "tpu":
        from .mpt_pallas import walk_batch_pallas

        if depth_segments is not None:
            # SEGMENTED SCATTER: the digest/hint one-hot contraction costs
            # rows proportional to B*D, but with depth segments every slot
            # beyond a segment's d is padding nobody consults — scattering
            # per segment shrinks the contraction to sum(cnt_i * d_i)
            # rows (~-33% at the depth-sorted headline mix). Digests for
            # consulted slots are bit-identical; the walk per segment is
            # walk_batch_pallas_segmented's dispatch, fused with its own
            # scatter.
            pool_dig = _hash_pool_rows(pool_nodes, pool_lens, pool_segments)
            payload = pool_dig
            if hinted:
                if pool_hints is None:
                    from .rlp import item_offsets

                    pool_hints = item_offsets(pool_nodes)
                payload = jnp.concatenate([pool_dig, pool_hints], axis=1)
            if max_steps is None:
                max_steps = nodes.shape[1] + 6  # global default, not per-seg
            outs, off = [], 0
            for cnt, dseg in depth_segments:
                sl = slice(off, off + cnt)
                dh = scatter_pool_payload(payload, pool_idx[sl, :dseg])
                outs.append(walk_batch_pallas(
                    nodes[sl, :dseg], node_lens[sl, :dseg], num_nodes[sl],
                    dh[..., :32], roots[sl], key_nibbles[sl], key_lens[sl],
                    max_value_len, max_steps,
                    hints=dh[..., 32:] if hinted else None,
                    hint_mode=hint_mode))
                off += cnt
            if off != nodes.shape[0]:
                raise ValueError(
                    f"depth_segments cover {off} rows, batch has "
                    f"{nodes.shape[0]}")
            return tuple(jnp.concatenate(parts) for parts in zip(*outs))
        if hinted:
            digests, hints = hash_nodes_pooled(pool_nodes, pool_lens,
                                               pool_idx, with_hints=True,
                                               pool_hints=pool_hints,
                                               pool_segments=pool_segments)
        else:
            digests = hash_nodes_pooled(pool_nodes, pool_lens, pool_idx,
                                        pool_segments=pool_segments)
            hints = None
        return walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                                 key_nibbles, key_lens, max_value_len,
                                 max_steps, hints=hints, hint_mode=hint_mode)
    digests = hash_nodes_pooled(pool_nodes, pool_lens, pool_idx,
                                pool_segments=pool_segments)
    return walk_batch(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len, max_steps,
                      conditional)[:3]


@functools.partial(jax.jit, static_argnames=())
def hash_pool(pool_nodes, pool_lens):
    """Digest a unique-node pool: u8 [U, N], i32 [U] -> u8 [U, 32].
    The one-time phase of the device-resident witness flow (see
    verify_proofs_indexed)."""
    if jax.default_backend() == "tpu":
        from .keccak_pallas import keccak256_tpu

        return keccak256_tpu(pool_nodes, pool_lens)
    from .keccak import keccak256

    return keccak256(pool_nodes, pool_lens)


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps",
                                    "conditional", "hinted"))
def verify_proofs_indexed(pool_nodes, pool_lens, pool_digests, pool_idx,
                          num_nodes, roots, key_nibbles, key_lens,
                          pool_hints=None,
                          max_value_len: int = 128,
                          max_steps: int | None = None,
                          conditional: bool = True, hinted: bool = True):
    """Verification against a DEVICE-RESIDENT witness pool.

    The streaming counterpart of verify_proofs_pooled for repeated sweeps
    over one trie: the unique-node pool (bytes + lengths + digests from
    hash_pool) stays on device across batches, and each batch ships only
    its row indices — per-proof node tables are materialized on device by
    row gathers from the pool. On this CI the host->device link is the
    sweep bottleneck (~64 MB/s through the relay; a 4096-proof batch's
    node tables are ~23 MB, its indices ~16 KB), so this turns a
    ~360 ms/batch transfer into microseconds of HBM traffic.

    Safety is unchanged from verify_proofs_pooled: nodes gathered from
    the pool are exactly the bytes the digests commit to (same row), and
    the walker still checks every per-proof hash link against `roots`
    (the reference re-hashes per proof, crypto-ops/src/lib.rs:10-13).

    pool_nodes u8 [U, N], pool_lens i32 [U], pool_digests u8 [U, 32],
    pool_idx i32 [B, D], num_nodes i32 [B], roots u8 [B, 32].
    pool_hints u8 [U, 36] (optional): precomputed RLP offset hints
    (PackedProofs.pool_hints(), ~free on the host at pack time). Without
    them the hinted path recomputes item_offsets(pool_nodes) on-device
    INSIDE every jitted call — ~0.34 ms per 5.6k-row pool (18 tiny
    launch-bound fetches); resident-pool callers should pass them.
    """
    b, d = pool_idx.shape
    flat = pool_idx.reshape(b * d)
    nodes = jnp.take(pool_nodes, flat, axis=0).reshape(b, d, -1)
    node_lens = jnp.take(pool_lens, flat).reshape(b, d)
    on_tpu = jax.default_backend() == "tpu"
    hints = None
    if hinted and on_tpu:
        # hint rows ride the SAME row gather as the digests (concat before
        # the take — row-gather cost is per ROW, not per byte, so the 68-B
        # rows cost what the 32-B digest rows did)
        if pool_hints is None:
            from .rlp import item_offsets

            pool_hints = item_offsets(pool_nodes)
        payload = jnp.concatenate([pool_digests, pool_hints], axis=1)
        taken = jnp.take(payload, flat, axis=0).reshape(b, d, 68)
        digests, hints = taken[..., :32], taken[..., 32:]
    else:
        digests = jnp.take(pool_digests, flat, axis=0).reshape(b, d, 32)
    if on_tpu:
        from .mpt_pallas import walk_batch_pallas

        return walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                                 key_nibbles, key_lens, max_value_len,
                                 max_steps, hints=hints)
    return walk_batch(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len, max_steps,
                      conditional)[:3]


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps", "conditional"))
def verify_proofs_prehashed(nodes, node_lens, num_nodes, digests, roots,
                            key_nibbles, key_lens, hints=None,
                            max_value_len: int = 128,
                            max_steps: int | None = None,
                            conditional: bool = True):
    """The walk phase alone, against PRECOMPUTED node digests.

    For device-resident sweeps that materialize global per-proof tables
    once (models.sweep.sweep_resident with materialize=True): the pool is
    hashed a single time, digests are scattered to the global [A, D, 32]
    table, and each batch is a contiguous-row take of (nodes, lens,
    digests) — measured ~4x faster than per-batch pool-row gathers on
    v5e (row gathers cost ~0.22 ns/B; 4 KB proof rows beat 576 B node
    rows). Digests MUST come from hashing the same node bytes (the
    sweep materializes both from the same pool rows); the walker still
    checks every per-proof hash link against `roots` (the reference
    re-hashes per proof, crypto-ops/src/lib.rs:10-13). Optional `hints`
    (u8 [B, D, 36], materialized like the digests from
    ops.rlp.item_offsets pool rows) select the kernel's parallel-decode
    hinted mode on TPU."""
    if jax.default_backend() == "tpu":
        from .mpt_pallas import walk_batch_pallas

        return walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                                 key_nibbles, key_lens, max_value_len,
                                 max_steps, hints=hints)
    return walk_batch(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len, max_steps,
                      conditional)[:3]


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps", "conditional"))
def verify_proofs_pool_stream(pool_nodes, pool_lens, pool_idx, num_nodes,
                              roots, key_nibbles, key_lens,
                              max_value_len: int = 128,
                              max_steps: int | None = None,
                              conditional: bool = True):
    """Pooled verification where ONLY the pool crosses the host->device
    link: the fresh-batch counterpart of verify_proofs_indexed.

    verify_proofs_pooled ships both the [B, D, N] per-proof node tables
    AND the pool; but the tables are fully determined by
    (pool_nodes, pool_idx), so a fresh streamed batch only needs the pool
    plus ~half a MB of per-proof scalars — on this CI's ~64 MB/s relay
    link that cuts a 4096-proof batch from ~20 MB to ~4 MB of transfer.
    Node bytes, digests, and gathers are materialized on device; every
    per-proof hash link is still checked by the walker (the reference
    re-hashes per proof, crypto-ops/src/lib.rs:10-13)."""
    digests = hash_pool(pool_nodes, pool_lens)
    return verify_proofs_indexed(pool_nodes, pool_lens, digests, pool_idx,
                                 num_nodes, roots, key_nibbles, key_lens,
                                 max_value_len=max_value_len,
                                 max_steps=max_steps, conditional=conditional)


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps", "conditional"))
def verify_proofs(nodes, node_lens, num_nodes, roots, key_nibbles, key_lens,
                  max_value_len: int = 128, max_steps: int | None = None,
                  conditional: bool = True):
    """Batched MPT proof verification.

    nodes       u8  [B, D, N]   zero-padded RLP proof nodes (any order)
    node_lens   i32 [B, D]
    num_nodes   i32 [B]
    roots       u8  [B, 32]     trusted root hashes
    key_nibbles u8  [B, K]      nibble-expanded lookup keys
    key_lens    i32 [B]         nibble counts
    max_steps: walker trip count; default D + 6 (depth + headroom for
    nested inline nodes). Tries whose values never encode below 32 bytes
    (account tries: leaves >= 70 B) cannot contain inline nodes, so
    max_steps = D is exact; with the any-live early-out the default is
    nearly as fast.
    Returns (status i32 [B], values u8 [B, max_value_len], value_lens i32 [B]).
    """
    digests = hash_nodes(nodes, node_lens)
    if jax.default_backend() == "tpu":
        # fused single-kernel walk (see mpt_pallas) — `conditional` is a
        # scheduling hint for the XLA walker only
        from .mpt_pallas import walk_batch_pallas

        return walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                                 key_nibbles, key_lens, max_value_len,
                                 max_steps)
    return walk_batch(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len, max_steps,
                      conditional)[:3]


@functools.partial(jax.jit,
                   static_argnames=("max_value_len", "max_steps"))
def verify_proofs_diagnose(nodes, node_lens, num_nodes, roots, key_nibbles,
                           key_lens, max_value_len: int = 128,
                           max_steps: int | None = None):
    """`verify_proofs` plus a per-proof INVALID reason channel — the
    framework's debugging surface for the reference's distinct panic
    messages (crypto-ops/src/lib.rs:14,22). On TPU the fused kernel
    carries the first-failure-class latch in its 6th output word, so
    diagnosis is one run of the hot path; elsewhere the XLA walker's
    reason channel serves.

    Returns (status i32 [B], values, value_lens, reasons i32 [B]) with
    reasons in {R_NONE, R_MALFORMED, R_BAD_CHILD_REF, R_HASH_MISMATCH,
    R_ROOT_MISSING, R_TRUNCATED} (names: REASON_NAMES)."""
    digests = hash_nodes(nodes, node_lens)
    if jax.default_backend() == "tpu":
        from .mpt_pallas import walk_batch_pallas

        return walk_batch_pallas(nodes, node_lens, num_nodes, digests, roots,
                                 key_nibbles, key_lens, max_value_len,
                                 max_steps, with_reasons=True)
    return walk_batch(nodes, node_lens, num_nodes, digests, roots,
                      key_nibbles, key_lens, max_value_len, max_steps)
