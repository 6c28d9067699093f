"""Fused Pallas walk kernel vs the XLA reference walker (interpret mode).

On CPU the kernel runs in the Pallas interpreter, so this exercises the
exact kernel code path the TPU compiles, against the XLA walker that the
rest of the suite already proves bit-exact vs the oracle.
"""

import numpy as np
import jax.numpy as jnp

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.ops.mpt_pallas import walk_batch_pallas
from zk_state_proofs_tpu.witness import pack_proofs


def test_pallas_walk_matches_xla_walker():
    t = EthTrie()
    keys = []
    for i in range(48):
        k = keccak256(b"pallas-%d" % i)[:6]
        t.insert(k, rlp.int_to_min_bytes(i + 1))  # small values -> inline
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:12]]
    # exclusion proof
    absent = b"\xfe" * 6
    entries.append((root, t.get_proof(absent), absent))
    # corrupted node -> INVALID
    bad = [bytearray(x) for x in t.get_proof(keys[0])]
    bad[0][5] ^= 1
    entries.append((root, [bytes(x) for x in bad], keys[0]))
    # truncated proof -> INVALID
    entries.append((root, t.get_proof(keys[1])[:-1], keys[1]))
    # shuffled node order (hash-keyed semantics)
    import random
    proof = list(t.get_proof(keys[2]))
    random.Random(0).shuffle(proof)
    entries.append((root, proof, keys[2]))

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2 = walk_batch_pallas(*args[:3], dig, *args[3:], 128)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert int(np.asarray(s2)[12]) == mpt.EXCLUDED
    assert int(np.asarray(s2)[13]) == mpt.INVALID
    assert int(np.asarray(s2)[14]) == mpt.INVALID
    assert int(np.asarray(s2)[15]) == mpt.FOUND


def test_pallas_reason_latch_matches_xla_walker():
    """The fused kernel's 6th output word (first-failure-class latch) must
    agree with the XLA walker's reason channel on every failure class:
    R_ROOT_MISSING, R_HASH_MISMATCH, R_MALFORMED, R_BAD_CHILD_REF,
    R_TRUNCATED — and R_NONE on FOUND/EXCLUDED proofs."""
    t = EthTrie()
    keys = []
    for i in range(32):
        k = keccak256(b"reason-%d" % i)
        t.insert(k, b"\x05" + bytes([i]) * 40)  # >=32B values: hashed children
        keys.append(k)
    root = t.root_hash()

    entries = [(root, t.get_proof(keys[0]), keys[0])]         # FOUND
    absent = keccak256(b"nope")
    entries.append((root, t.get_proof(absent), absent))        # EXCLUDED
    entries.append((b"\x13" * 32, t.get_proof(keys[1]), keys[1]))  # root missing
    # hash mismatch: drop an inner node so a child digest resolves nowhere
    proof = t.get_proof(keys[2])
    assert len(proof) >= 2
    entries.append((root, proof[:1], keys[2]))                 # hash-mismatch
    # malformed: corrupt the referenced leaf's RLP in place (keeping its
    # digest entry out of sync would be hash-mismatch; instead craft a
    # 1-item list node referenced as root)
    crafted = rlp.encode([b"\x01"])
    entries.append((keccak256(crafted), [crafted], keys[3]))   # malformed
    # bad child ref: branch whose chosen child is a 31-byte string
    nib = keys[4][0] >> 4
    branch = [b""] * 17
    branch[nib] = b"\x07" * 31
    crafted2 = rlp.encode(branch)
    entries.append((keccak256(crafted2), [crafted2], keys[4]))  # bad-child-ref
    # truncated: a self-looping extension can't happen; instead force step
    # exhaustion with max_steps=1 on a depth>=2 proof (checked below
    # separately against the XLA walker's R_TRUNCATED)

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    s1, v1, l1, r1 = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, r2 = walk_batch_pallas(*args[:3], dig, *args[3:], 128,
                                       with_reasons=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    r = np.asarray(r2)
    assert r[0] == mpt.R_NONE and r[1] == mpt.R_NONE
    assert r[2] == mpt.R_ROOT_MISSING
    assert r[3] == mpt.R_HASH_MISMATCH
    assert r[4] == mpt.R_MALFORMED
    assert r[5] == mpt.R_BAD_CHILD_REF

    # step exhaustion -> R_TRUNCATED on both paths
    s1t, _, _, r1t = mpt.walk_batch(*args[:3], dig, *args[3:], 128,
                                    max_steps=1)
    s2t, _, _, r2t = walk_batch_pallas(*args[:3], dig, *args[3:], 128,
                                       max_steps=1, with_reasons=True)
    np.testing.assert_array_equal(np.asarray(r1t), np.asarray(r2t))
    assert np.asarray(r2t)[0] == mpt.R_TRUNCATED

    # diagnose_batch surfaces the same codes through the model API
    from zk_state_proofs_tpu.models import diagnose_batch

    res = diagnose_batch(packed)
    np.testing.assert_array_equal(res.reasons, r)
    counts = res.counts()
    assert counts["invalid_root-missing"] == 1
    assert counts["invalid_hash-mismatch"] == 1
    assert counts["invalid_malformed-node"] == 1
    assert counts["invalid_bad-child-ref"] == 1


def test_pallas_wide_bucket_reduced_tile_parity():
    """Tx/receipt geometry (~2 KB nodes, nw ~520 word rows) exceeds
    Mosaic's 16 MB scoped-VMEM budget at the default 8-sublane tile
    (measured on v5e: 20.48M requested); walk_batch_pallas must pick a
    narrower tile (_pick_tile_sub -> 4) and still match the XLA walker
    bit-exactly."""
    from zk_state_proofs_tpu.ops.mpt_pallas import _pick_tile_sub

    assert _pick_tile_sub(3, 520, 8) < 8      # the measured-OOM shape
    assert _pick_tile_sub(7, 144, 64) == 8    # headline account bucket
    assert _pick_tile_sub(10, 144, 64) == 8   # config-6 depth-10 bucket
                                              # (proven on-chip in round 3)

    t = EthTrie()
    keys = []
    for i in range(48):
        k = rlp.encode_int(i)
        t.insert(k, b"\x44" * (1800 + 13 * i))  # ~2 KB leaf values
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:3]]
    absent = rlp.encode_int(999)
    entries.append((root, t.get_proof(absent), absent))

    packed = pack_proofs(entries, node_len=2080, key_nibbles=8)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 2048)
    s2, v2, l2 = walk_batch_pallas(*args[:3], dig, *args[3:], 2048)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert (np.asarray(s2)[:3] == mpt.FOUND).all()


def _rlp_head(buf, pos):
    """Pure-python RLP item header (test oracle for item_offsets)."""
    b0 = buf[pos] if pos < len(buf) else 0
    if b0 < 0x80:
        return pos, 1
    if b0 < 0xB8:
        return pos + 1, b0 - 0x80
    if b0 < 0xC0:
        lol = b0 - 0xB7
        ln = int.from_bytes(buf[pos + 1:pos + 1 + lol].ljust(lol, b"\0"), "big")
        return pos + 1 + lol, ln
    if b0 < 0xF8:
        return pos + 1, b0 - 0xC0
    lol = b0 - 0xF7
    ln = int.from_bytes(buf[pos + 1:pos + 1 + lol].ljust(lol, b"\0"), "big")
    return pos + 1 + lol, ln


def test_item_offsets_matches_serial_chain():
    """The device hint pass (ops.rlp.item_offsets) must reproduce the
    serial decode-chain cursors byte-for-byte for every node shape the
    walker meets: branch, extension, leaf, and crafted lists."""
    from zk_state_proofs_tpu.ops.rlp import item_offsets

    t = EthTrie()
    for i in range(64):
        t.insert(keccak256(b"off-%d" % i), b"\x17" * 40)
    nodes = [n for k in (keccak256(b"off-0"), keccak256(b"off-1"))
             for n in t.get_proof(k)]
    nodes += [rlp.encode([b"\x01"]), rlp.encode([]), b"\x00", b"",
              rlp.encode([b"\x22" * 40] * 17)]
    n_max = max(len(x) for x in nodes)
    n_pad = -(-max(n_max, 4) // 4) * 4
    buf = np.zeros((len(nodes), n_pad), np.uint8)
    for i, x in enumerate(nodes):
        buf[i, :len(x)] = np.frombuffer(x, np.uint8)
    hints = np.asarray(item_offsets(jnp.asarray(buf)))
    assert hints.shape == (len(nodes), 36)
    h = (hints[:, 0::2].astype(np.int64) << 8) | hints[:, 1::2]
    for r, node in enumerate(nodes):
        padded = bytes(buf[r])
        ps, plen = _rlp_head(padded, 0)
        end = ps + plen
        cursor = ps
        expect = [cursor]
        for _ in range(17):
            if cursor < end:
                ip, il = _rlp_head(padded, min(cursor, n_pad - 1))
                cursor = cursor + (ip - min(cursor, n_pad - 1)) + il
            expect.append(min(cursor, 0xFFFF))
        np.testing.assert_array_equal(h[r], expect, err_msg=f"row {r}")


def test_host_item_offsets_matches_device(monkeypatch):
    """The pack-time host hint scan (native C++ and the numpy fallback)
    must agree byte-for-byte with the device pass — disagreement would
    silently demote every batch to the exact-fallback kernel."""
    from zk_state_proofs_tpu import native
    from zk_state_proofs_tpu.ops.rlp import item_offsets
    from zk_state_proofs_tpu.witness.pack import host_item_offsets

    t = EthTrie()
    for i in range(64):
        t.insert(keccak256(b"hio-%d" % i), b"\x2a" * 44)
    nodes = [n for k in (keccak256(b"hio-0"), keccak256(b"hio-3"))
             for n in t.get_proof(k)]
    nodes += [rlp.encode([b"\x01"]), rlp.encode([]), b"\x00", b"",
              rlp.encode([b"\x22" * 40] * 17),
              rlp.encode([b"\x33" * 200, b"\x44"]),
              bytes([0xF9, 0x01, 0x00]) + b"\x55" * 64]  # long-list header
    n_pad = -(-max(len(x) for x in nodes) // 4) * 4
    buf = np.zeros((len(nodes), n_pad), np.uint8)
    for i, x in enumerate(nodes):
        buf[i, :len(x)] = np.frombuffer(x, np.uint8)
    device = np.asarray(item_offsets(jnp.asarray(buf)))
    if native.available():
        native_out = native.item_offsets_native(buf)
        np.testing.assert_array_equal(native_out, device)
    monkeypatch.setattr(native, "item_offsets_native", lambda rows: None)
    np.testing.assert_array_equal(host_item_offsets(buf), device)


def _hints_for(packed):
    """Per-(proof, slot) hints straight from the node table (the pooled
    path scatters the same rows; tests build them directly)."""
    from zk_state_proofs_tpu.ops.rlp import item_offsets

    b, d, n = packed.nodes.shape
    flat = jnp.asarray(packed.nodes.reshape(b * d, n))
    return item_offsets(flat).reshape(b, d, 36)


def test_pallas_hinted_parity_and_fast_path():
    """Hinted mode must match the XLA walker bit-exactly on honest AND
    adversarial inputs; on an inline-free trie the fast path must serve
    every proof itself (no exact-kernel fallback)."""
    t = EthTrie()
    keys = []
    for i in range(64):
        k = keccak256(b"hint-%d" % i)
        t.insert(k, b"\x09" + bytes([i]) * 40)  # >=32B values: no inlines
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:12]]
    absent = keccak256(b"hint-absent")
    entries.append((root, t.get_proof(absent), absent))          # EXCLUDED
    entries.append((b"\x31" * 32, t.get_proof(keys[1]), keys[1]))  # root miss
    entries.append((root, t.get_proof(keys[2])[:1], keys[2]))    # hash miss
    crafted = rlp.encode([b"\x01"])
    entries.append((keccak256(crafted), [crafted], keys[3]))     # malformed
    bad = [bytearray(x) for x in t.get_proof(keys[4])]
    bad[-1][5] ^= 1
    entries.append((root, [bytes(x) for x in bad], keys[4]))     # corrupt

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, r1 = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, r2, ovf = walk_batch_pallas(
        *args[:3], dig, *args[3:], 128, hints=hints, with_reasons=True,
        with_overflow=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # account-style trie, honest hints: nothing defers to the exact kernel
    assert (np.asarray(ovf)[:len(entries)] == 0).all()
    assert (np.asarray(s2)[:12] == mpt.FOUND).all()


def test_pallas_hinted1_single_pass_parity():
    """hinted1 (single-pass union-window fetch — each cur row read once,
    feeding every item accumulator) must decode bit-identically to
    'hinted': same statuses/values/reasons, and no exact-kernel fallback
    on an honest inline-free batch."""
    t = EthTrie()
    keys = []
    for i in range(64):
        k = keccak256(b"h1p-%d" % i)
        t.insert(k, b"\x09" + bytes([i]) * 40)
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:12]]
    absent = keccak256(b"h1p-absent")
    entries.append((root, t.get_proof(absent), absent))          # EXCLUDED
    entries.append((b"\x31" * 32, t.get_proof(keys[1]), keys[1]))  # root miss
    entries.append((root, t.get_proof(keys[2])[:1], keys[2]))    # hash miss
    crafted = rlp.encode([b"\x01"])
    entries.append((keccak256(crafted), [crafted], keys[3]))     # malformed

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, r1 = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, r2, ovf = walk_batch_pallas(
        *args[:3], dig, *args[3:], 128, hints=hints, with_reasons=True,
        with_overflow=True, hint_mode="hinted1")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert (np.asarray(ovf)[:len(entries)] == 0).all()


def test_pallas_hinted_inline_falls_back():
    """Inline (<32 B) children cannot be described by node-level hints:
    those steps latch the overflow flag and the exact kernel re-run keeps
    results bit-identical to the XLA walker."""
    t = EthTrie()
    keys = []
    for i in range(48):
        k = keccak256(b"inl-%d" % i)[:6]
        t.insert(k, rlp.int_to_min_bytes(i + 1))  # tiny values -> inline
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:8]]
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, ovf = walk_batch_pallas(*args[:3], dig, *args[3:], 128,
                                        hints=hints, with_overflow=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert (np.asarray(ovf) > 0).any()  # inline steps deferred


def test_pallas_hinted_corrupt_hints_fall_back():
    """Wrong hints (stale cache / hostile packer) must cost performance
    only: the chain check latches and the exact re-run restores correct
    classification for every proof."""
    t = EthTrie()
    keys = []
    for i in range(32):
        k = keccak256(b"cor-%d" % i)
        t.insert(k, b"\x0a" * 48)
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:8]]
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    good = np.asarray(_hints_for(packed))
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    for corrupt in (np.zeros_like(good),
                    (good + 7) % 255,
                    np.roll(good, 2, axis=-1)):
        s2, v2, l2, ovf = walk_batch_pallas(
            *args[:3], dig, *args[3:], 128,
            hints=jnp.asarray(corrupt), with_overflow=True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert (np.asarray(ovf) > 0).any()


def test_hash_nodes_pooled_with_hints_scatter():
    """The pooled scatter must deliver each slot's hint row bit-exactly
    (bf16 one-hot contraction is exact on bytes), matching item_offsets
    computed directly on the per-proof node table."""
    t = EthTrie()
    keys = []
    for i in range(32):
        k = keccak256(b"sc-%d" % i)
        t.insert(k, b"\x0b" * 40)
        keys.append(k)
    root = t.root_hash()
    packed = pack_proofs([(root, t.get_proof(k), k) for k in keys[:16]])
    pool = packed.pool()
    dig1 = mpt.hash_nodes(jnp.asarray(packed.nodes),
                          jnp.asarray(packed.node_lens))
    dig2, hints = mpt.hash_nodes_pooled(*(jnp.asarray(a) for a in pool),
                                        with_hints=True)
    direct = np.asarray(_hints_for(packed))
    b, d = packed.node_lens.shape
    real = np.arange(d)[None, :] < packed.num_nodes[:, None]
    np.testing.assert_array_equal(
        np.asarray(dig1)[real], np.asarray(dig2)[real])
    np.testing.assert_array_equal(np.asarray(hints)[real], direct[real])


def test_pallas_depth_segmented_dispatch_parity():
    """The depth-bucketed walk dispatch (one kernel call per contiguous
    depth segment, node axis sliced to the segment's d) must classify and
    extract bit-identically to the unsegmented kernel and the XLA walker,
    on a mixed-depth depth-sorted batch including failures."""
    from zk_state_proofs_tpu.ops.mpt_pallas import (
        walk_batch_pallas_segmented)

    t = EthTrie()
    keys = []
    for i in range(96):
        k = keccak256(b"seg-%d" % i)
        t.insert(k, b"\x09" + bytes([i]) * 40)
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:24]]
    absent = keccak256(b"seg-absent")
    entries.append((root, t.get_proof(absent), absent))          # EXCLUDED
    entries.append((b"\x31" * 32, t.get_proof(keys[1]), keys[1]))  # root miss
    entries.sort(key=lambda e: -len(e[1]))  # the bench/serving batch order
    packed = pack_proofs(entries)

    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)

    segs = packed.depth_segments(tile=8)  # small tile -> >1 segment here
    assert len(segs) >= 2
    assert sum(c for c, _ in segs) == packed.batch
    # segment d bounds every num_nodes inside it
    off = 0
    for cnt, dseg in segs:
        assert int(packed.num_nodes[off:off + cnt].max()) <= dseg
        off += cnt

    for hints in (None, _hints_for(packed)):
        s2, v2, l2 = walk_batch_pallas_segmented(
            segs, *args[:3], dig, *args[3:], 128,
            max_steps=packed.nodes.shape[1], hints=hints)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_pallas_bounded_decode_overflow_fallback():
    """Crafted well-formed-RLP nodes whose items exceed the branch/pair
    size bounds (e.g. a 2-item list with a 100-byte first item) trip the
    bounded decode's overflow flag; walk_batch_pallas must fall back to
    the full-width kernel and still match the XLA walker bit-exactly."""
    t = EthTrie()
    keys = []
    for i in range(8):
        k = keccak256(b"ovf-%d" % i)
        t.insert(k, b"v%d" % i)
        keys.append(k)
    root = t.root_hash()

    entries = [(root, t.get_proof(k), k) for k in keys[:4]]
    # crafted node: RLP 2-item list, item0 = 100-byte string (> the 35-byte
    # pair-path bound), referenced as the proof's root
    crafted = rlp.encode([b"\x11" * 100, b"\x22"])
    entries.append((keccak256(crafted), [crafted], keys[0]))
    # crafted 17-item list with oversized middle items
    crafted2 = rlp.encode([b"\x33" * 40] * 17)
    entries.append((keccak256(crafted2), [crafted2], keys[1]))

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2 = walk_batch_pallas(*args[:3], dig, *args[3:], 128)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert (np.asarray(s2)[:4] == mpt.FOUND).all()


def test_pallas_ordered_parity_and_fast_path():
    """'ordered' mode (sequential-node materialization: cur = nodes[step]
    via one dynamic slice instead of the d-way masked select) must match
    the XLA walker bit-exactly on honest AND adversarial inputs, and on a
    walk-ordered inline-free batch the fast path must serve every proof
    itself (no exact-kernel fallback)."""
    t = EthTrie()
    keys = []
    for i in range(64):
        k = keccak256(b"ord-%d" % i)
        t.insert(k, b"\x09" + bytes([i]) * 40)  # >=32B values: no inlines
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:12]]
    absent = keccak256(b"ord-absent")
    entries.append((root, t.get_proof(absent), absent))          # EXCLUDED
    entries.append((b"\x31" * 32, t.get_proof(keys[1]), keys[1]))  # root miss
    entries.append((root, t.get_proof(keys[2])[:1], keys[2]))    # hash miss
    crafted = rlp.encode([b"\x01"])
    entries.append((keccak256(crafted), [crafted], keys[3]))     # malformed
    bad = [bytearray(x) for x in t.get_proof(keys[4])]
    bad[-1][5] ^= 1
    entries.append((root, [bytes(x) for x in bad], keys[4]))     # corrupt

    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, r1 = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, r2, ovf = walk_batch_pallas(
        *args[:3], dig, *args[3:], 128, hints=hints, with_reasons=True,
        with_overflow=True, hint_mode="ordered")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # honest walk-ordered pack: nothing defers to the exact kernel
    assert (np.asarray(ovf)[:len(entries)] == 0).all()
    assert (np.asarray(s2)[:12] == mpt.FOUND).all()


def test_pallas_ordered_unordered_pack_falls_back():
    """A proof whose nodes are NOT in walk order is legal input (the
    reference's proof DB is hash-keyed and order-independent,
    crypto-ops/src/lib.rs:10-14): ordered mode must latch the overflow
    flag on it and the exact re-run must keep results bit-identical."""
    t = EthTrie()
    keys = []
    for i in range(48):
        k = keccak256(b"oshuf-%d" % i)
        t.insert(k, b"\x0b" + bytes([i]) * 40)
        keys.append(k)
    root = t.root_hash()
    rng = np.random.default_rng(3)
    entries = []
    for k in keys[:10]:
        p = list(t.get_proof(k))
        if len(p) > 1:
            perm = rng.permutation(len(p))
            p = [p[j] for j in perm]
        entries.append((root, p, k))
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, _ = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, ovf = walk_batch_pallas(
        *args[:3], dig, *args[3:], 128, hints=hints, with_overflow=True,
        hint_mode="ordered")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert (np.asarray(s2) == mpt.FOUND).all()
    assert (np.asarray(ovf) > 0).any()  # out-of-order steps deferred


def test_pallas_value_window_wider_than_tiny_node_buffer():
    """A single-leaf proof of a tiny node (~43 B => fewer word rows than
    the value-window row count) must still compile and extract: the
    in-kernel _dyn_window pads to the requested rows (r5 regression —
    config 2's one-slot storage trie failed Mosaic lowering with
    'Only 2D gather is supported' before the pad)."""
    st = EthTrie()
    slot = bytes(32)
    val = rlp.encode_int(39_035_000_000_000)
    st.insert(keccak256(slot), val)
    root = st.root_hash()
    proof = st.get_proof(keccak256(slot))
    assert len(proof) == 1 and len(proof[0]) < 64  # the tiny-node shape
    packed = pack_proofs([(root, proof, keccak256(slot))])
    args = [jnp.asarray(a) for a in packed.astuple()]
    assert packed.nodes.shape[2] // 4 < 64 // 4 + 2  # nw < vw
    dig = mpt.hash_nodes(args[0], args[1])
    s, v, l = walk_batch_pallas(*args[:3], dig, *args[3:], 64, None)
    assert int(np.asarray(s)[0]) == mpt.FOUND
    assert bytes(np.asarray(v)[0][:int(np.asarray(l)[0])]) == val


def test_pallas_pairskip_parity():
    """'pairskip' (extension/leaf machinery gated behind a whole-tile
    any-pair pl.when) must be bit-identical to 'hinted' on honest and
    adversarial batches, including EXCLUDED leaves, root misses, and an
    inline-node trie that defers to the exact kernel."""
    t = EthTrie()
    keys = []
    for i in range(48):
        k = keccak256(b"psk-%d" % i)
        t.insert(k, b"\x09" + bytes([i]) * 40)
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:10]]
    absent = keccak256(b"psk-absent")
    entries.append((root, t.get_proof(absent), absent))
    entries.append((b"\x31" * 32, t.get_proof(keys[1]), keys[1]))
    entries.append((root, t.get_proof(keys[2])[:1], keys[2]))
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    s1, v1, l1, r1 = mpt.walk_batch(*args[:3], dig, *args[3:], 128)
    s2, v2, l2, r2, ovf = walk_batch_pallas(
        *args[:3], dig, *args[3:], 128, hints=hints, with_reasons=True,
        with_overflow=True, hint_mode="pairskip")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert (np.asarray(ovf)[:len(entries)] == 0).all()

    # inline-node trie: pairskip's hinted base defers to the exact kernel
    t2 = EthTrie()
    for i in range(24):
        t2.insert(keccak256(b"pski-%d" % i)[:6], rlp.int_to_min_bytes(i + 1))
    r2_ = t2.root_hash()
    e2 = [(r2_, t2.get_proof(keccak256(b"pski-%d" % i)[:6]),
           keccak256(b"pski-%d" % i)[:6]) for i in range(8)]
    p2 = pack_proofs(e2)
    a2 = [jnp.asarray(a) for a in p2.astuple()]
    d2 = mpt.hash_nodes(a2[0], a2[1])
    h2 = _hints_for(p2)
    sa, va, la, _ = mpt.walk_batch(*a2[:3], d2, *a2[3:], 64)
    sb, vb, lb = walk_batch_pallas(*a2[:3], d2, *a2[3:], 64,
                                   hints=h2, hint_mode="pairskip")
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_pallas_segmented_composes_with_hint_modes():
    """Depth-segmented dispatch must stay bit-identical to the
    unsegmented call under every hint mode (the production bench runs
    seg+hinted; ordered/pairskip are opt-in) — including a None
    max_steps, which must resolve from the GLOBAL node axis, not per
    segment (r4 advice #1)."""
    t = EthTrie()
    keys = [keccak256(b"smx-%d" % i) for i in range(64)]
    for i, k in enumerate(keys):
        t.insert(k, b"\x0c" + bytes([i]) * 40)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys[:24]]
    entries.sort(key=lambda e: -len(e[1]))  # depth-sorted
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    dig = mpt.hash_nodes(args[0], args[1])
    hints = _hints_for(packed)
    segs = packed.depth_segments(tile=8)
    from zk_state_proofs_tpu.ops.mpt_pallas import walk_batch_pallas_segmented

    for hm in ("hinted", "ordered", "pairskip"):
        ref = walk_batch_pallas(*args[:3], dig, *args[3:], 64, None,
                                hints=hints, hint_mode=hm)
        out = walk_batch_pallas_segmented(
            segs, *args[:3], dig, *args[3:], 64, None,
            hints=hints, hint_mode=hm)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), hm)
        assert (np.asarray(out[0]) == mpt.FOUND).all(), hm
