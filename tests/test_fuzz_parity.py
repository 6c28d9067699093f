"""Adversarial fuzzing: device walker vs oracle on corrupted witnesses,
device RLP decoder vs oracle on arbitrary bytes, and run-to-run
determinism (the framework's race-detection analog, SURVEY.md §5)."""

import random

import numpy as np
import pytest

from zk_state_proofs_tpu.oracle import (
    EthTrie,
    MissingKeyError,
    TrieError,
    keccak256,
    rlp,
)
from zk_state_proofs_tpu.oracle import trie as otrie
from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.witness import pack_proofs


def _oracle_status(root, proof, key):
    try:
        from zk_state_proofs_tpu.oracle import verify_merkle_proof

        verify_merkle_proof(root, proof, key)
        return mpt.FOUND
    except MissingKeyError:
        return mpt.EXCLUDED
    except TrieError:
        return mpt.INVALID


def test_corrupted_proofs_agree_with_oracle():
    rng = random.Random(5)
    t = EthTrie()
    kvs = {}
    for i in range(120):
        k = keccak256(b"fz%d" % i)
        v = bytes(rng.randrange(1, 256) for _ in range(rng.randrange(1, 60)))
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()

    entries = []
    expected = []
    keys = list(kvs)
    for trial in range(48):
        k = keys[rng.randrange(len(keys))]
        proof = [bytearray(p) for p in t.get_proof(k)]
        mode = trial % 4
        if mode == 1:  # corrupt a random byte in a random node
            n = rng.randrange(len(proof))
            proof[n][rng.randrange(len(proof[n]))] ^= 1 + rng.randrange(255)
        elif mode == 2:  # drop a random node
            del proof[rng.randrange(len(proof))]
        elif mode == 3:  # swap two nodes
            if len(proof) >= 2:
                i1, i2 = rng.sample(range(len(proof)), 2)
                proof[i1], proof[i2] = proof[i2], proof[i1]
        proof = [bytes(p) for p in proof]
        entries.append((root, proof, k))
        expected.append(_oracle_status(root, proof, k))

    packed = pack_proofs(entries)
    status = np.asarray(mpt.verify_proofs(*packed.astuple())[0])
    for i in range(len(entries)):
        assert status[i] == expected[i], (i, int(status[i]), expected[i])


def test_random_bytes_as_nodes_never_found():
    """Garbage proof nodes must never verify (they cannot hash to root)."""
    rng = random.Random(7)
    entries = []
    for i in range(16):
        nodes = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
                 for _ in range(rng.randrange(1, 5))]
        entries.append((keccak256(b"root%d" % i), nodes, keccak256(b"k%d" % i)))
    packed = pack_proofs(entries)
    status = np.asarray(mpt.verify_proofs(*packed.astuple())[0])
    assert (status == mpt.INVALID).all()


def test_device_rlp_items_match_oracle():
    """node_items vs oracle RLP list decode on random valid node encodings."""
    import jax.numpy as jnp

    from zk_state_proofs_tpu.ops.rlp import node_items

    rng = random.Random(11)
    for _ in range(60):
        n_items = rng.choice([2, 17])
        items = []
        for _ in range(n_items):
            kind = rng.random()
            if kind < 0.3:
                items.append(b"")
            elif kind < 0.8:
                items.append(bytes(rng.randrange(256) for _ in range(32)))
            else:
                items.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 80))))
        enc = rlp.encode(items)
        buf = np.zeros(800, dtype=np.uint8)
        buf[: len(enc)] = np.frombuffer(enc, np.uint8)
        out = node_items(jnp.asarray(buf), jnp.int32(0), jnp.int32(len(enc)))
        assert bool(out["well_formed"]), items
        assert int(out["count"]) == n_items
        decoded = rlp.decode(enc)
        for j, item in enumerate(decoded):
            ps = int(out["payload_start"][j])
            pl = int(out["payload_len"][j])
            assert bytes(buf[ps : ps + pl]) == item


def test_determinism_bit_exact():
    """Two runs over the same witnesses must agree bit-exactly — the
    framework's determinism check (SURVEY.md §5: race detection analog)."""
    from zk_state_proofs_tpu.models import batch_commitment, verify_merkle_batch

    t = EthTrie()
    for i in range(64):
        t.insert(keccak256(b"det%d" % i), b"value-%d" % i)
    root = t.root_hash()
    entries = [
        (root, t.get_proof(keccak256(b"det%d" % i)), keccak256(b"det%d" % i))
        for i in range(32)
    ]
    packed = pack_proofs(entries)
    c1 = batch_commitment(verify_merkle_batch(packed))
    c2 = batch_commitment(verify_merkle_batch(packed))
    assert c1 == c2
    assert len(c1) == 32
