"""Real mainnet blocks, verified offline — the round-3 trust gap.

The reference's strongest anchor is reconstructing tries from pinned live
mainnet blocks and matching the header roots
(reference: trie-utils/tests/transaction.rs:12-40, tests/receipt.rs:9-23,
pinned hashes trie-utils/src/constants.rs:5-12). This CI has no egress, so
the fixtures here are real mainnet data reproducible offline:

  - `fixtures/mainnet_headers.json`: the FULL genesis and block-1 headers.
    Every genesis field is protocol-hardcoded (yellow paper / every
    client's chainspec); block 1's fields are public record. The tests
    assert keccak(encode_header(fields)) == the canonical block hash, so a
    single-byte drift in ANY field (stateRoot, transactionsRoot, bloom,
    nonce, ...) or in the RLP/keccak/encoder stack fails. This pins the
    header encoder AND both blocks' transactionsRoot/receiptsRoot
    externally.
  - `fixtures/mainnet_block_46147.json`: the block carrying the first
    transaction ever mined. The tx's raw bytes are pinned externally by
    its published hash (keccak(raw) == 0x5c504ed4...); the fixture's
    transactionsRoot is hand-derivable from them (one-leaf trie =>
    keccak(rlp([0x20||0x80, raw])) — re-derived inside the test, not
    trusted from the fixture). Rebuilding the trie and matching this root
    is the offline equivalent of the reference's pinned-block root check.

Header fields NOT reproducible offline (46147's parentHash, stateRoot,
mixHash...) are deliberately absent from the fixtures — nothing here is
fabricated.
"""

import json
import os

import numpy as np

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.witness.builders import (
    build_transaction_trie,
    get_all_receipt_proof_inputs,
    get_all_transaction_proof_inputs,
    get_transaction_proof_input,
)
from zk_state_proofs_tpu.witness.encoding import (
    block_hash,
    encode_header,
    encode_transaction,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _load(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def test_genesis_header_hash():
    """keccak(rlp(genesis header)) == the canonical mainnet genesis hash —
    a fully external, protocol-hardcoded anchor for the header encoder."""
    genesis = _load("mainnet_headers.json")["genesis"]
    assert block_hash(genesis).hex() == (
        "d4e56740f876aef8c010b86a40d5f56745a118d0906a34e69aec8c0db1cb8fa3"
    )
    # genesis commits to the EMPTY tx/receipt tries: rebuild both and match
    # the header roots (the reference's root-check flow on a real block)
    empty_root = bytes.fromhex(
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421")
    assert build_transaction_trie([]).root_hash() == empty_root
    assert get_all_transaction_proof_inputs(genesis) == []
    assert get_all_receipt_proof_inputs(genesis, []) == []


def test_block1_header_hash():
    """Block 1's full header (public record) hashes to its canonical block
    hash; its parentHash field equals the genesis hash, chaining the two
    anchors."""
    headers = _load("mainnet_headers.json")
    b1 = headers["block1"]
    assert block_hash(b1).hex() == (
        "88e96d4537bea4d9c05d12549907b32561d3bf31f45aae734cdc119f13406cb6"
    )
    assert b1["parentHash"][2:] == block_hash(headers["genesis"]).hex()
    # empty tx/receipt tries root-checked against the real header
    assert get_all_transaction_proof_inputs(b1) == []
    assert get_all_receipt_proof_inputs(b1, []) == []


def test_block1_header_byte_drift_detected():
    """Flipping one bit anywhere in the header changes the hash."""
    b1 = _load("mainnet_headers.json")["block1"]
    good = block_hash(b1)
    bad = dict(b1)
    bad["gasLimit"] = "0x1389"
    assert block_hash(bad) != good


def test_header_fork_fields_gated_by_presence():
    """Post-fork header fields (baseFeePerGas, withdrawalsRoot, blob
    fields, parentBeaconBlockRoot, requestsHash) are appended in order iff
    present — a pre-London dict encodes 15 items, a Cancun-era dict 20."""
    b1 = _load("mainnet_headers.json")["block1"]
    pre = encode_header(b1)
    assert len(rlp.decode(pre)) == 15
    cancun = dict(b1)
    cancun.update({
        "baseFeePerGas": "0x7",
        "withdrawalsRoot": "0x" + "11" * 32,
        "blobGasUsed": "0x0",
        "excessBlobGas": "0x0",
        "parentBeaconBlockRoot": "0x" + "22" * 32,
    })
    items = rlp.decode(encode_header(cancun))
    assert len(items) == 20
    assert items[15] == b"\x07"           # baseFeePerGas
    assert items[16] == b"\x11" * 32      # withdrawalsRoot
    assert items[17] == b"" and items[18] == b""  # zero blob gas fields
    assert items[19] == b"\x22" * 32      # parentBeaconBlockRoot


def test_block_46147_transactions_root():
    """Rebuild block 46147's one-tx transaction trie and match its
    transactionsRoot (reference flow: trie-utils/tests/transaction.rs:12-40).

    Trust chain, all offline: the raw tx bytes are pinned by the published
    tx hash (external); the expected root is re-derived IN THIS TEST as
    keccak(rlp([hex-prefix(path rlp(0)), raw])) — the one-leaf-trie
    definition — and must equal both the trie builder's root and the
    fixture's pinned transactionsRoot."""
    block = _load("mainnet_block_46147.json")
    tx = block["transactions"][0]
    raw = encode_transaction(tx)
    # external anchor: the first mainnet tx's published hash
    assert keccak256(raw).hex() == (
        "5c504ed432cb51138bcf09aa5e8a410dd4a1e204ef84bfed1be16dfba1b22060"
    )
    # hand-derivation of the 1-leaf trie root: path = nibbles(rlp(0)) =
    # [8, 0], even-length leaf hex-prefix byte 0x20
    leaf = rlp.encode([bytes([0x20, 0x80]), raw])
    derived_root = keccak256(leaf)
    assert derived_root.hex() == block["transactionsRoot"][2:]
    trie = build_transaction_trie(block["transactions"])
    assert trie.root_hash() == derived_root


def test_block_46147_proof_end_to_end_device():
    """The full witness flow on the real block: build the tx proof against
    the header's transactionsRoot (builder re-checks the root), verify it
    on the device path, and extract the exact raw tx bytes."""
    from zk_state_proofs_tpu.models import verify_merkle_proof

    block = _load("mainnet_block_46147.json")
    inp = get_transaction_proof_input(block, 0)
    assert inp.root_hash.hex() == block["transactionsRoot"][2:]
    value = verify_merkle_proof(inp.root_hash, inp.proof, inp.key)
    assert value == encode_transaction(block["transactions"][0])


def test_block_46147_tamper_detected():
    """Any single-byte drift from the real mainnet tx breaks the rebuilt
    root against the pinned transactionsRoot (WitnessError at the builder
    boundary)."""
    import pytest

    from zk_state_proofs_tpu.witness.builders import WitnessError

    block = _load("mainnet_block_46147.json")
    tampered = json.loads(json.dumps(block))
    tampered["transactions"][0]["value"] = "0x7a6a"  # 31337 -> 31338 wei
    with pytest.raises(WitnessError):
        get_transaction_proof_input(tampered, 0)
