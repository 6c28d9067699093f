"""Oracle MPT against canonical Ethereum trie test vectors + proof semantics."""

import random

import pytest

from zk_state_proofs_tpu.oracle import (
    EMPTY_ROOT,
    EthTrie,
    MissingKeyError,
    TrieError,
    keccak256,
    rlp,
    verify_merkle_proof,
)
from zk_state_proofs_tpu.oracle.trie import hp_decode, hp_encode


def test_empty_root():
    assert EthTrie().root_hash() == EMPTY_ROOT
    assert EMPTY_ROOT == keccak256(rlp.encode(b""))


def test_hp_roundtrip():
    for nibs in [[], [1], [1, 2], [0xF, 0, 3], list(range(16))]:
        for leaf in (False, True):
            if not nibs and not leaf:
                continue
            enc = hp_encode(nibs, leaf)
            dec_nibs, dec_leaf = hp_decode(enc)
            assert (dec_nibs, dec_leaf) == (nibs, leaf)


# Canonical vectors from the ethereum/tests trie suite (public fixtures).
def test_dogs_vector():
    t = EthTrie()
    for k, v in [
        (b"do", b"verb"),
        (b"dog", b"puppy"),
        (b"doge", b"coin"),
        (b"horse", b"stallion"),
    ]:
        t.insert(k, v)
    assert (
        t.root_hash().hex()
        == "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84"
    )


def test_foo_bar_vector():
    t = EthTrie()
    t.insert(b"foo", b"bar")
    t.insert(b"food", b"bass")
    assert (
        t.root_hash().hex()
        == "17beaa1648bafa633cda809c90c04af50fc8aed3cb40d16efbddee6fdf63c4c3"
    )


def test_single_leaf_root():
    t = EthTrie()
    t.insert(b"A", b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
    assert (
        t.root_hash().hex()
        == "d23786fb4a010da3ce639d66d5e904a11dbc02746d1ce25029e53290cabf28ab"
    )


def test_insert_order_independence():
    kvs = [(f"key{i}".encode(), f"value-{i*i}".encode()) for i in range(50)]
    t1, t2 = EthTrie(), EthTrie()
    for k, v in kvs:
        t1.insert(k, v)
    for k, v in reversed(kvs):
        t2.insert(k, v)
    assert t1.root_hash() == t2.root_hash()


def test_get():
    t = EthTrie()
    kvs = {f"k{i}".encode(): f"v{i}".encode() for i in range(100)}
    for k, v in kvs.items():
        t.insert(k, v)
    for k, v in kvs.items():
        assert t.get(k) == v
    assert t.get(b"absent") is None


def test_proof_round_trip_random():
    rng = random.Random(42)
    t = EthTrie()
    kvs = {}
    for i in range(300):
        k = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 12)))
        v = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 80)))
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()
    for k, v in list(kvs.items())[:100]:
        proof = t.get_proof(k)
        assert verify_merkle_proof(root, proof, k) == v


def test_proof_keccak_keyed():
    """Account-trie style: keys are keccak(address) — 64-nibble paths
    (reference: account key discipline, account.rs:54)."""
    t = EthTrie()
    kvs = {}
    for i in range(64):
        k = keccak256(b"address-%d" % i)
        v = rlp.encode([rlp.int_to_min_bytes(i), b"\x01" * 10])
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()
    for k, v in kvs.items():
        assert verify_merkle_proof(root, t.get_proof(k), k) == v


def test_missing_key_raises():
    t = EthTrie()
    for i in range(40):
        t.insert(keccak256(b"%d" % i), b"val%d" % i)
    root = t.root_hash()
    absent = keccak256(b"not-inserted")
    proof = t.get_proof(absent)
    with pytest.raises(MissingKeyError):
        verify_merkle_proof(root, proof, absent)


def test_invalid_proof_raises():
    t = EthTrie()
    for i in range(40):
        t.insert(keccak256(b"%d" % i), b"val%d" % i)
    root = t.root_hash()
    k = keccak256(b"7")
    proof = t.get_proof(k)
    with pytest.raises(TrieError):
        verify_merkle_proof(root, proof[1:], k)  # drop root node
    with pytest.raises(TrieError):
        verify_merkle_proof(b"\x00" * 32, proof, k)  # wrong root


def test_tampered_value_detected():
    t = EthTrie()
    for i in range(40):
        t.insert(keccak256(b"%d" % i), b"val%d" % i)
    root = t.root_hash()
    k = keccak256(b"7")
    proof = [bytearray(p) for p in t.get_proof(k)]
    proof[-1][-1] ^= 0x01  # flip a bit in the leaf
    with pytest.raises(TrieError):
        verify_merkle_proof(root, [bytes(p) for p in proof], k)


def test_rlp_index_keys_like_tx_trie():
    """Transaction-trie style: key = rlp(index), values of mixed size so
    inline (<32B) nodes occur (reference: transaction.rs:45,63-68)."""
    t = EthTrie()
    n = 60
    vals = {}
    for i in range(n):
        v = bytes([i]) * (1 + (i * 13) % 90)
        vals[i] = v
        t.insert(rlp.encode_int(i), v)
    root = t.root_hash()
    for i in range(n):
        k = rlp.encode_int(i)
        proof = t.get_proof(k)
        assert verify_merkle_proof(root, proof, k) == vals[i]


def test_tiny_trie_inline_nodes():
    """Small values make nearly every node inline — stresses embedded-node
    handling in both proof generation and walking."""
    t = EthTrie()
    for i in range(4):
        t.insert(rlp.encode_int(i), bytes([0x40 + i]))
    root = t.root_hash()
    for i in range(4):
        k = rlp.encode_int(i)
        assert verify_merkle_proof(root, t.get_proof(k), k) == bytes([0x40 + i])
