"""Witness builders — the four proof-input flavors.

Equivalents of the reference's trie-utils builders:
  - transaction: rebuild the whole tx trie locally from block data, insert
    each EIP-2718-encoded tx at path rlp(index), extract the proof, pair
    with the header's transactions_root
    (reference: trie-utils/src/proofs/transaction.rs:26-73)
  - receipt: same local-rebuild pattern over block receipts
    (reference: trie-utils/src/proofs/receipt.rs:28-93)
  - account: from an eth_getProof response; key = keccak(address)
    (reference: trie-utils/src/proofs/account.rs:24-74, key at :54)
  - storage: account proof + N storage proofs with RAW slot keys
    (reference: trie-utils/src/proofs/storage.rs:24-121)
"""

from __future__ import annotations

from ..oracle import EthTrie, keccak256, rlp
from .encoding import _data, encode_receipt, encode_transaction
from .types import MerkleProofInput, StorageProofInput


class WitnessError(ValueError):
    """Witness construction failed (e.g. rebuilt root != header root)."""


def build_transaction_trie(txs: list[dict]) -> EthTrie:
    """Insert every tx of a block at path rlp(index)
    (reference transaction.rs:44-64). Each tx is shape-validated first so
    a malformed RPC response raises WitnessError, not a KeyError inside
    the envelope encoder."""
    from .models import validate_transaction

    trie = EthTrie()
    for i, tx in enumerate(txs):
        trie.insert(rlp.encode_int(i), encode_transaction(validate_transaction(tx)))
    return trie


def build_receipt_trie(receipts: list[dict]) -> EthTrie:
    """Insert every receipt of a block at path rlp(index)
    (reference proofs/receipt.rs:44-86)."""
    trie = EthTrie()
    for i, rcpt in enumerate(receipts):
        trie.insert(rlp.encode_int(i), encode_receipt(rcpt))
    return trie


def get_transaction_proof_input(block: dict, index: int) -> MerkleProofInput:
    """Rebuild the block's tx trie, check the root against the header's
    transactionsRoot, and extract the proof for `index`."""
    txs = block["transactions"]
    if not 0 <= index < len(txs):
        raise WitnessError(f"tx index {index} out of range ({len(txs)} txs)")
    trie = build_transaction_trie(txs)
    root = trie.root_hash()
    header_root = _data(block["transactionsRoot"])
    if root != header_root:
        raise WitnessError(
            f"rebuilt tx trie root {root.hex()} != header transactionsRoot "
            f"{header_root.hex()}"
        )
    key = rlp.encode_int(index)
    return MerkleProofInput(proof=trie.get_proof(key), root_hash=root, key=key)


def get_receipt_proof_input(block: dict, receipts: list[dict], index: int) -> MerkleProofInput:
    """Rebuild the block's receipt trie, check against receiptsRoot, and
    extract the proof for `index`."""
    if not 0 <= index < len(receipts):
        raise WitnessError(f"receipt index {index} out of range")
    trie = build_receipt_trie(receipts)
    root = trie.root_hash()
    header_root = _data(block["receiptsRoot"])
    if root != header_root:
        raise WitnessError(
            f"rebuilt receipt trie root {root.hex()} != header receiptsRoot "
            f"{header_root.hex()}"
        )
    key = rlp.encode_int(index)
    return MerkleProofInput(proof=trie.get_proof(key), root_hash=root, key=key)


def get_account_proof_input(proof_response: dict, state_root: bytes, address: str) -> MerkleProofInput:
    """From an eth_getProof response: account witness with key =
    keccak(address) (reference account.rs:42-55). The response is parsed
    through the typed AccountProofResult model first, so a malformed
    shape raises WitnessError at this boundary."""
    from .models import AccountProofResult

    parsed = AccountProofResult.from_rpc(proof_response)
    return MerkleProofInput(
        proof=parsed.account_proof,
        root_hash=bytes(state_root),
        key=keccak256(_data(address)),
    )


def get_storage_proof_input(
    proof_response: dict, state_root: bytes, address: str, storage_keys: list
) -> StorageProofInput:
    """From an eth_getProof response with storage keys: the two-level
    witness. Slot keys stay RAW (hashed at verify time), the account key is
    pre-hashed (reference storage.rs:58-77). Typed-model parsing as in
    get_account_proof_input."""
    from .models import AccountProofResult

    parsed = AccountProofResult.from_rpc(proof_response)
    by_key = {sp.key: sp.proof for sp in parsed.storage_proof}
    slots = [_data(k).rjust(32, b"\x00") for k in storage_keys]
    missing = [s.hex() for s in slots if s not in by_key]
    if missing:
        raise WitnessError(f"storage proofs missing for slots: {missing}")
    addr_keccak = keccak256(_data(address))
    return StorageProofInput(
        account_proof=parsed.account_proof,
        storage_proofs=[by_key[s] for s in slots],
        root_hash=bytes(state_root),
        account_key=addr_keccak,
        storage_keys=slots,
        address_keccak=addr_keccak,
    )


def get_all_transaction_proof_inputs(block: dict) -> list:
    """All tx proofs of a block with ONE trie build (the per-index builder
    rebuilds per call, reference-style; this is the batch-friendly path)."""
    txs = block["transactions"]
    trie = build_transaction_trie(txs)
    root = trie.root_hash()
    header_root = _data(block["transactionsRoot"])
    if root != header_root:
        raise WitnessError(
            f"rebuilt tx trie root {root.hex()} != header transactionsRoot "
            f"{header_root.hex()}"
        )
    out = []
    for i in range(len(txs)):
        key = rlp.encode_int(i)
        out.append(MerkleProofInput(proof=trie.get_proof(key), root_hash=root, key=key))
    return out


def get_all_receipt_proof_inputs(block: dict, receipts: list) -> list:
    """All receipt proofs of a block with ONE trie build."""
    trie = build_receipt_trie(receipts)
    root = trie.root_hash()
    header_root = _data(block["receiptsRoot"])
    if root != header_root:
        raise WitnessError(
            f"rebuilt receipt trie root {root.hex()} != header receiptsRoot "
            f"{header_root.hex()}"
        )
    out = []
    for i in range(len(receipts)):
        key = rlp.encode_int(i)
        out.append(MerkleProofInput(proof=trie.get_proof(key), root_hash=root, key=key))
    return out
