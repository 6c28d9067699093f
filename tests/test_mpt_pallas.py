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
