"""Batched device MPT walker vs the oracle across every proof shape."""

import random

import numpy as np
import pytest

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.witness import pack_proofs


def _build_trie(n, seed=0, val_len=60):
    rng = random.Random(seed)
    t = EthTrie()
    kvs = {}
    for i in range(n):
        k = keccak256(b"key-%d-%d" % (seed, i))
        v = bytes(rng.randrange(1, 256) for _ in range(rng.randrange(1, val_len)))
        kvs[k] = v
        t.insert(k, v)
    return t, kvs


def _verify(entries, **kw):
    packed = pack_proofs(entries, **kw)
    status, values, vlens = mpt.verify_proofs(*packed.astuple())
    return np.asarray(status), np.asarray(values), np.asarray(vlens)


def test_inclusion_batch():
    t, kvs = _build_trie(200, seed=1)
    root = t.root_hash()
    keys = list(kvs)[:64]
    entries = [(root, t.get_proof(k), k) for k in keys]
    status, values, vlens = _verify(entries)
    for i, k in enumerate(keys):
        assert status[i] == mpt.FOUND, (i, status[i])
        assert bytes(values[i][: vlens[i]]) == kvs[k], i


def test_exclusion_batch():
    t, _ = _build_trie(100, seed=2)
    root = t.root_hash()
    absent = [keccak256(b"absent-%d" % i) for i in range(16)]
    entries = [(root, t.get_proof(k), k) for k in absent]
    status, _, vlens = _verify(entries)
    assert (status == mpt.EXCLUDED).all()
    assert (vlens == 0).all()


def test_tampered_and_truncated_invalid():
    t, kvs = _build_trie(100, seed=3)
    root = t.root_hash()
    k = list(kvs)[5]
    proof = t.get_proof(k)
    assert len(proof) >= 2
    tampered = list(proof)
    bad = bytearray(tampered[-1])
    bad[-1] ^= 1
    tampered[-1] = bytes(bad)
    entries = [
        (root, tampered, k),            # leaf bit-flip -> hash mismatch
        (root, proof[:-1], k),           # truncated -> missing node
        (b"\x00" * 32, proof, k),       # wrong root
        (root, proof[1:], k),            # dropped root node
    ]
    status, _, _ = _verify(entries)
    assert (status == mpt.INVALID).all(), status


def test_wrong_key_is_invalid():
    # a proof generated for key A is not an exclusion proof for key B:
    # the walk hits a child hash whose node is missing -> INVALID
    t, kvs = _build_trie(100, seed=4)
    root = t.root_hash()
    a, b = list(kvs)[0], keccak256(b"some-other-key")
    status, _, _ = _verify([(root, t.get_proof(a), b)])
    assert status[0] in (mpt.INVALID, mpt.EXCLUDED)


def test_tx_style_trie_with_inline_nodes():
    """rlp(index) keys + small values produce inline (<32 B) embedded
    nodes — the walker must descend inside parent buffers
    (reference semantics: eth_trie inline node handling)."""
    t = EthTrie()
    vals = {}
    for i in range(40):
        v = bytes([i + 1]) * (1 + (i * 13) % 45)
        vals[i] = v
        t.insert(rlp.encode_int(i), v)
    root = t.root_hash()
    entries = [(root, t.get_proof(rlp.encode_int(i)), rlp.encode_int(i)) for i in range(40)]
    status, values, vlens = _verify(entries, key_nibbles=16)
    for i in range(40):
        assert status[i] == mpt.FOUND, (i, status[i])
        assert bytes(values[i][: vlens[i]]) == vals[i], i


def test_tiny_trie_fully_inline():
    t = EthTrie()
    for i in range(4):
        t.insert(rlp.encode_int(i), bytes([0x40 + i]))
    root = t.root_hash()
    entries = [(root, t.get_proof(rlp.encode_int(i)), rlp.encode_int(i)) for i in range(4)]
    status, values, vlens = _verify(entries, key_nibbles=16)
    for i in range(4):
        assert status[i] == mpt.FOUND, (i, status[i])
        assert bytes(values[i][: vlens[i]]) == bytes([0x40 + i])


def test_single_leaf_trie():
    t = EthTrie()
    k = keccak256(b"only")
    t.insert(k, b"the-value")
    root = t.root_hash()
    status, values, vlens = _verify([(root, t.get_proof(k), k)])
    assert status[0] == mpt.FOUND
    assert bytes(values[0][: vlens[0]]) == b"the-value"


def test_branch_value_lookup():
    """Key that terminates exactly at a branch node (prefix of another)."""
    t = EthTrie()
    t.insert(b"\x12\x34", b"at-branch")
    t.insert(b"\x12\x34\x56", b"deeper")
    t.insert(b"\x12\x35\x56", b"sibling")
    root = t.root_hash()
    entries = [
        (root, t.get_proof(b"\x12\x34"), b"\x12\x34"),
        (root, t.get_proof(b"\x12\x34\x56"), b"\x12\x34\x56"),
    ]
    status, values, vlens = _verify(entries, key_nibbles=16)
    assert status[0] == mpt.FOUND and bytes(values[0][: vlens[0]]) == b"at-branch"
    assert status[1] == mpt.FOUND and bytes(values[1][: vlens[1]]) == b"deeper"


def test_mixed_batch_statuses():
    t, kvs = _build_trie(150, seed=6)
    root = t.root_hash()
    k_in = list(kvs)[7]
    k_out = keccak256(b"nope")
    proof_in = t.get_proof(k_in)
    bad = [bytes(p) for p in proof_in[:-1]]
    entries = [
        (root, proof_in, k_in),
        (root, t.get_proof(k_out), k_out),
        (root, bad, k_in),
    ]
    status, values, vlens = _verify(entries)
    assert list(status) == [mpt.FOUND, mpt.EXCLUDED, mpt.INVALID]
    assert bytes(values[0][: vlens[0]]) == kvs[k_in]


def test_empty_trie_root():
    from zk_state_proofs_tpu.oracle import EMPTY_ROOT

    status, _, _ = _verify([(EMPTY_ROOT, [], keccak256(b"x"))])
    assert status[0] == mpt.EXCLUDED
    status, _, _ = _verify([(b"\x11" * 32, [], keccak256(b"x"))])
    assert status[0] == mpt.INVALID


def test_shuffled_proof_order():
    """Reference semantics: the proof DB is keyed by hash, so node order
    must not matter (crypto-ops/src/lib.rs:10-13)."""
    import random

    t, kvs = _build_trie(150, seed=12)
    root = t.root_hash()
    rng = random.Random(0)
    entries = []
    keys = list(kvs)[:16]
    for k in keys:
        proof = list(t.get_proof(k))
        rng.shuffle(proof)
        entries.append((root, proof, k))
    status, values, vlens = _verify(entries)
    for i, k in enumerate(keys):
        assert status[i] == mpt.FOUND, i
        assert bytes(values[i][: vlens[i]]) == kvs[k]


def test_fetch_primitives_match_numpy():
    """fetch_window and fetch_packed vs a numpy oracle, incl. widths with
    width % 4 in {2, 3} at every pos % 4 (regression: fetch_window used one
    word too few, zeroing the final byte when pos % 4 == 3)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zk_state_proofs_tpu.ops.select import (fetch_packed, fetch_window,
                                                make_word_table)

    rng = np.random.default_rng(7)
    B, N = 64, 96
    buf = rng.integers(0, 256, (B, N), dtype=np.uint8)
    pos = np.arange(B, dtype=np.int32) % (N + 8)  # covers every pos%4 + OOB
    table = jax.jit(make_word_table)(jnp.asarray(buf))
    for w in (4, 7, 10, 32, 34, 64):
        want = np.zeros((B, w), np.int32)
        for i in range(B):
            p = min(int(pos[i]), N - 1)
            span = buf[i, p:p + w]
            want[i, :len(span)] = span
        got_w = np.asarray(jax.jit(
            lambda b, p, w=w: fetch_window(b, p, w))(jnp.asarray(buf),
                                                     jnp.asarray(pos)))
        np.testing.assert_array_equal(got_w.astype(np.int32), want)
        if w <= 5:  # fetch_packed covers header-sized windows only
            got_p = np.asarray(jax.jit(
                lambda t, p, w=w: fetch_packed(t, p, w))(table,
                                                         jnp.asarray(pos)))
            np.testing.assert_array_equal(got_p, want)


def test_pooled_hashing_matches_direct():
    """verify_proofs_pooled (deduplicated hashing + one-hot digest scatter)
    is bit-identical to verify_proofs on a mixed batch (found / excluded /
    invalid / inline nodes)."""
    import numpy as np
    import jax.numpy as jnp
    from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
    from zk_state_proofs_tpu.ops import mpt
    from zk_state_proofs_tpu.witness import pack_proofs

    t = EthTrie()
    keys = []
    for i in range(60):
        k = keccak256(b"pool-%d" % i)[:6]
        t.insert(k, rlp.int_to_min_bytes(i + 1))  # small values -> inline
        keys.append(k)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys]
    absent = b"\xee" * 6
    entries.append((root, t.get_proof(absent), absent))
    bad = [bytearray(x) for x in t.get_proof(keys[3])]
    bad[0][4] ^= 0x40
    entries.append((root, [bytes(x) for x in bad], keys[3]))
    packed = pack_proofs(entries)
    args = [jnp.asarray(a) for a in packed.astuple()]
    pargs = [jnp.asarray(a) for a in packed.pool()]
    s1, v1, l1 = mpt.verify_proofs(*args)
    s2, v2, l2 = mpt.verify_proofs_pooled(*args, *pargs)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # the pool really deduplicates: far fewer unique rows than proof rows
    assert pargs[0].shape[0] < packed.nodes.shape[0] * packed.nodes.shape[1]


def test_invalid_reason_codes():
    """verify_proofs_diagnose splits INVALID into diagnosable reasons —
    the reference's distinct panic messages (crypto-ops/src/lib.rs:14,22)
    as a per-proof channel."""
    from zk_state_proofs_tpu.models import diagnose_batch
    from zk_state_proofs_tpu.witness import pack_proofs

    t = EthTrie()
    keys = [keccak256(b"rs%d" % i) for i in range(48)]
    for i, k in enumerate(keys):
        t.insert(k, bytes([i % 200 + 1]) * 40)
    root = t.root_hash()
    good = t.get_proof(keys[0])

    entries = []
    # 0: valid
    entries.append((root, good, keys[0]))
    # 1: root node absent entirely -> root-missing
    entries.append((root, good[1:], keys[0]))
    # 2: leaf replaced by garbage (hash link broken) -> hash-mismatch
    entries.append((root, good[:-1] + [b"\xde\xad" * 30], keys[0]))
    # 3: truncated (intermediate node missing) -> hash-mismatch at that link
    entries.append((root, [good[0]], keys[0]))
    # 4: root node bytes corrupted -> its digest no longer matches root
    bad_root_node = bytearray(good[0]); bad_root_node[-1] ^= 1
    entries.append((root, [bytes(bad_root_node)] + good[1:], keys[0]))
    packed = pack_proofs(entries)

    res = diagnose_batch(packed)
    assert res.status[0] == mpt.FOUND and res.reasons[0] == mpt.R_NONE
    assert res.status[1] == mpt.INVALID and res.reasons[1] == mpt.R_ROOT_MISSING
    assert res.status[2] == mpt.INVALID and res.reasons[2] == mpt.R_HASH_MISMATCH
    assert res.status[3] == mpt.INVALID and res.reasons[3] == mpt.R_HASH_MISMATCH
    assert res.status[4] == mpt.INVALID and res.reasons[4] == mpt.R_ROOT_MISSING
    counts = res.counts()
    assert counts["invalid"] == 4
    assert counts["invalid_root-missing"] == 2
    assert counts["invalid_hash-mismatch"] == 2


def test_malformed_node_reason():
    """A node that is valid RLP bytes at the root position but not a
    branch/extension/leaf structure diagnoses as malformed-node."""
    from zk_state_proofs_tpu.models import diagnose_batch
    from zk_state_proofs_tpu.oracle import rlp as orlp
    from zk_state_proofs_tpu.witness import pack_proofs

    # a 3-item list is never a valid trie node; make it >= 32 bytes
    bogus = orlp.encode([b"\x01" * 20, b"\x02" * 20, b"\x03" * 20])
    root = keccak256(bogus)
    packed = pack_proofs([(root, [bogus], keccak256(b"k"))])
    res = diagnose_batch(packed)
    assert res.status[0] == mpt.INVALID
    assert res.reasons[0] == mpt.R_MALFORMED
