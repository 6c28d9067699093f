"""Device level-wise trie-root reduction vs oracle roots."""

import random

import numpy as np

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.ops.trie_build import compute_root_bytes
from zk_state_proofs_tpu.witness.trie_plan import plan_index_trie, plan_trie


def _oracle_root(items):
    t = EthTrie()
    for k, v in items:
        t.insert(k, v)
    return t.root_hash()


def test_index_trie_root_matches_oracle():
    rng = random.Random(0)
    values = [bytes(rng.randrange(256) for _ in range(60 + rng.randrange(400)))
              for _ in range(130)]
    plan = plan_index_trie(values)
    got = compute_root_bytes(plan)
    want = _oracle_root((rlp.encode_int(i), v) for i, v in enumerate(values))
    assert got == want
    assert plan.num_levels >= 2


def test_small_values_inline_nodes():
    values = [bytes([i + 1]) * (1 + i % 9) for i in range(20)]
    plan = plan_index_trie(values)
    got = compute_root_bytes(plan)
    want = _oracle_root((rlp.encode_int(i), v) for i, v in enumerate(values))
    assert got == want


def test_keccak_keyed_trie():
    rng = random.Random(1)
    items = [
        (keccak256(b"k%d" % i), bytes(rng.randrange(1, 256) for _ in range(rng.randrange(1, 120))))
        for i in range(80)
    ]
    plan = plan_trie(items)
    assert compute_root_bytes(plan) == _oracle_root(items)


def test_single_and_empty():
    items = [(keccak256(b"solo"), b"v" * 40)]
    assert compute_root_bytes(plan_trie(items)) == _oracle_root(items)
    from zk_state_proofs_tpu.oracle import EMPTY_ROOT

    assert compute_root_bytes(plan_trie([])) == EMPTY_ROOT


def test_receipt_trie_from_synthetic_block():
    from zk_state_proofs_tpu.witness import synthetic_block
    from zk_state_proofs_tpu.witness.encoding import encode_receipt

    fx = synthetic_block(num_txs=24, seed=21)
    values = [encode_receipt(r) for r in fx["receipts"]]
    plan = plan_index_trie(values)
    got = compute_root_bytes(plan)
    assert "0x" + got.hex() == fx["block"]["receiptsRoot"]


def test_extension_node_trie_plan():
    """Keys sharing prefixes force extension nodes through the planner
    (the canonical 'dogs' trie contains ext + branch-with-value nodes)."""
    items = [(b"do", b"verb"), (b"dog", b"puppy"), (b"doge", b"coin"),
             (b"horse", b"stallion")]
    plan = plan_trie(items)
    got = compute_root_bytes(plan)
    assert got.hex() == "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84"


def test_large_values_multiblock_leaves():
    """Leaves spanning several keccak rate blocks (tx-calldata-sized)."""
    import random

    rng = random.Random(3)
    values = [bytes(rng.randrange(256) for _ in range(500 + rng.randrange(1500)))
              for _ in range(40)]
    plan = plan_index_trie(values)
    got = compute_root_bytes(plan)
    want = _oracle_root((rlp.encode_int(i), v) for i, v in enumerate(values))
    assert got == want
