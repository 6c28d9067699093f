"""PackingError taxonomy + deserialized-pool integrity validation.

The pooled verifier (ops.mpt.verify_proofs_pooled) hashes pool_nodes but
walks nodes[i, j]; a mismatched mapping deserialized from a stale/corrupt
cache must be rejected at load time, never trusted (the reference re-hashes
every node per proof, reference: crypto-ops/src/lib.rs:10-13).
"""

import numpy as np
import pytest

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.utils.errors import PackingError
from zk_state_proofs_tpu.witness.pack import (
    PackedProofs,
    pack_proofs,
    validate_node_pool,
)


def _small_batch(n=8):
    t = EthTrie()
    keys = [keccak256(b"acct%d" % i) for i in range(32)]
    for i, k in enumerate(keys):
        t.insert(k, rlp.encode([rlp.int_to_min_bytes(i), b"\x01",
                                keccak256(b"s"), keccak256(b"c")]))
    root = t.root_hash()
    return pack_proofs([(root, t.get_proof(keys[i]), keys[i]) for i in range(n)])


def test_bucket_overflow_raises_packing_error():
    packed = _small_batch()
    real_depth = int(packed.num_nodes.max())
    t = EthTrie()
    keys = [keccak256(b"x%d" % i) for i in range(32)]
    for k in keys:
        t.insert(k, b"\x01" * 40)
    root = t.root_hash()
    entries = [(root, t.get_proof(keys[0]), keys[0])]
    with pytest.raises(PackingError):
        pack_proofs(entries, max_nodes=1) if real_depth > 1 else pack_proofs(
            entries, node_len=4)
    with pytest.raises(PackingError):
        pack_proofs(entries, node_len=8)


def test_key_nibble_overflow_raises_packing_error():
    """Both pack paths (native C++ and Python fallback) reject an
    over-long key with PackingError."""
    packed = _small_batch(1)
    root = bytes(packed.roots[0])
    node = bytes(packed.nodes[0, 0][: packed.node_lens[0, 0]])
    with pytest.raises(PackingError):
        pack_proofs([(root, [node], b"\xab" * 40)], key_nibbles=64)


def test_pool_round_trip_validates(tmp_path):
    packed = _small_batch()
    packed.pool()
    p = tmp_path / "batch.npz"
    packed.save(p)
    loaded = PackedProofs.load(p)
    assert loaded.pool_nodes is not None
    np.testing.assert_array_equal(loaded.pool_idx, packed.pool_idx)


def test_corrupted_pool_rejected_on_load(tmp_path):
    """Flipping one byte of a pooled node in the cache must fail load —
    otherwise the pooled verifier would hash the corrupt pool row while
    walking the original node bytes."""
    packed = _small_batch()
    packed.pool()
    # corrupt a real pool row (row 0 is the reserved zero row)
    packed.pool_nodes = packed.pool_nodes.copy()
    packed.pool_nodes[1, 0] ^= 0xFF
    p = tmp_path / "bad.npz"
    packed.save(p)
    with pytest.raises(PackingError, match="pool integrity"):
        PackedProofs.load(p)


def test_swapped_pool_idx_rejected_on_load(tmp_path):
    """Remapping pool_idx to point at the wrong (but valid) pool row is
    caught too — the subtle attack shape: every referenced row exists,
    the mapping just lies."""
    packed = _small_batch()
    packed.pool()
    idx = packed.pool_idx.copy()
    # leaf rows differ per proof; swap proof 0's leaf mapping with proof 1's
    d0, d1 = int(packed.num_nodes[0]) - 1, int(packed.num_nodes[1]) - 1
    idx[0, d0], idx[1, d1] = idx[1, d1], idx[0, d0]
    assert idx[0, d0] != packed.pool_idx[0, d0], "test needs distinct leaves"
    packed.pool_idx = idx
    p = tmp_path / "swapped.npz"
    packed.save(p)
    with pytest.raises(PackingError):
        PackedProofs.load(p)


def test_validate_node_pool_direct():
    packed = _small_batch()
    validate_node_pool(packed.nodes, packed.node_lens, packed.num_nodes,
                       *packed.pool())
    with pytest.raises(PackingError, match="out of range"):
        validate_node_pool(
            packed.nodes, packed.node_lens, packed.num_nodes,
            packed.pool_nodes, packed.pool_lens,
            np.full_like(packed.pool_idx, packed.pool_nodes.shape[0]),
        )
