"""Typed OP/Arbitrum/eth_getProof response models.

Recorded-style realistic responses (shapes per the reference's typed
structs: optimism/types.rs:4-38, arbitrum/types.rs:3-66) must parse into
validated views; malformed shapes must raise WitnessError at the model
boundary — never a KeyError deep inside the envelope encoders.
"""

import pytest

from zk_state_proofs_tpu.utils.errors import WitnessError
from zk_state_proofs_tpu.witness.models import (
    AccountProofResult,
    ArbBlock,
    OpBlock,
    StorageProofEntry,
    validate_transaction,
)

# realistic OP-mainnet-shaped block: an L1-attributes deposit tx (type
# 0x7e, first in every OP block) followed by a user EIP-1559 tx — the two
# shapes the reference's OPClient parses (op-alloy Transaction)
OP_BLOCK = {
    "jsonrpc": "2.0",
    "hash": "0x" + "ab" * 32,
    "number": "0x7750a3c",
    "difficulty": "0x0",
    "miner": "0x4200000000000000000000000000000000000011",
    "nonce": "0x0000000000000000",
    "size": "0x2af",
    "timestamp": "0x66f2b3c1",
    "uncles": [],
    "stateRoot": "0x" + "11" * 32,
    "transactionsRoot": "0x" + "22" * 32,
    "receiptsRoot": "0x" + "33" * 32,
    "withdrawalsRoot": "0x" + "44" * 32,
    "withdrawals": [],
    "transactions": [
        {
            "type": "0x7e",
            "hash": "0x" + "55" * 32,
            "sourceHash": "0x" + "66" * 32,
            "from": "0xdeaddeaddeaddeaddeaddeaddeaddeaddead0001",
            "to": "0x4200000000000000000000000000000000000015",
            "mint": "0x0",
            "value": "0x0",
            "gas": "0xf4240",
            "isSystemTx": False,
            "input": "0x440a5e20",
        },
        {
            "type": "0x2",
            "hash": "0x" + "77" * 32,
            "chainId": "0xa",
            "nonce": "0x1c",
            "maxPriorityFeePerGas": "0xf4240",
            "maxFeePerGas": "0x5f5e100",
            "gas": "0x5208",
            "from": "0x" + "88" * 20,
            "to": "0x" + "99" * 20,
            "value": "0xde0b6b3a7640000",
            "input": "0x",
            "accessList": [],
            "yParity": "0x1",
            "r": "0x" + "aa" * 32,
            "s": "0x" + "1b" * 32,
        },
    ],
}

# realistic eth_getProof result (reference arbitrum/types.rs:44-66)
PROOF_RESPONSE = {
    "address": "0xfd086bc7cd5c481dcc9c85ebe478a1c0b69fcbb9",
    "accountProof": ["0x" + "f8" * 2 + "00" * 50, "0x" + "e2" * 40],
    "balance": "0x0",
    "codeHash": "0x" + "c5" * 32,
    "nonce": "0x1",
    "storageHash": "0x" + "5e" * 32,
    "storageProof": [
        {"key": "0x0", "proof": ["0x" + "aa" * 45], "value": "0x2386f26fc10000"},
    ],
}


def test_op_block_parses():
    blk = OpBlock.from_rpc(OP_BLOCK)
    assert blk.number == 0x7750A3C
    assert blk.state_root == bytes.fromhex("11" * 32)
    assert blk.transactions_root == bytes.fromhex("22" * 32)
    assert len(blk.transactions) == 2
    assert blk.transactions[0]["type"] == "0x7e"


def test_op_block_missing_header_field():
    bad = dict(OP_BLOCK)
    del bad["transactionsRoot"]
    with pytest.raises(WitnessError, match="transactionsRoot"):
        OpBlock.from_rpc(bad)


def test_op_block_malformed_deposit_tx():
    bad = {**OP_BLOCK,
           "transactions": [{k: v for k, v in OP_BLOCK["transactions"][0].items()
                             if k != "sourceHash"}]}
    with pytest.raises(WitnessError, match="sourceHash"):
        OpBlock.from_rpc(bad)


def test_op_block_bad_hex():
    bad = {**OP_BLOCK, "stateRoot": "0xzz"}
    with pytest.raises(WitnessError, match="stateRoot"):
        OpBlock.from_rpc(bad)


def test_arb_block_refuses_transactions():
    blk = ArbBlock.from_rpc({
        "hash": "0x" + "cd" * 32, "number": "0x12d687",
        "stateRoot": "0x" + "ef" * 32,
        "difficulty": "0x1", "miner": "0x" + "00" * 20,
        "nonce": "0x0000000000000001", "size": "0x100",
        "timestamp": "0x66f2b3c1", "uncles": [],
    })
    assert blk.number == 0x12D687
    with pytest.raises(WitnessError, match="not supported"):
        _ = blk.transactions


def test_account_proof_result_parses_and_cross_checks():
    parsed = AccountProofResult.from_rpc(PROOF_RESPONSE)
    assert parsed.address == bytes.fromhex("fd086bc7cd5c481dcc9c85ebe478a1c0b69fcbb9")
    assert parsed.nonce == 1
    assert parsed.storage_hash == bytes.fromhex("5e" * 32)
    assert len(parsed.account_proof) == 2
    assert parsed.storage_proof[0].key == bytes(32)  # left-padded slot 0
    assert parsed.storage_proof[0].value == 0x2386F26FC10000


def test_account_proof_malformed_shapes():
    with pytest.raises(WitnessError, match="accountProof"):
        AccountProofResult.from_rpc({**PROOF_RESPONSE, "accountProof": "0xff"})
    bad = dict(PROOF_RESPONSE)
    del bad["storageHash"]
    with pytest.raises(WitnessError, match="storageHash"):
        AccountProofResult.from_rpc(bad)
    with pytest.raises(WitnessError, match="address"):
        AccountProofResult.from_rpc({**PROOF_RESPONSE, "address": "0x1234"})


def test_storage_proof_entry_string_hex():
    """Arbitrum serves string-hex proofs (reference arbitrum/types.rs:60-66,
    hex-decoded by callers account.rs:58-74) — the model decodes them."""
    sp = StorageProofEntry.from_rpc(
        {"key": "0x1", "proof": ["0xf851", "0xe2a0" + "00" * 33], "value": "0x5"})
    assert sp.key[-1] == 1 and len(sp.key) == 32
    assert all(isinstance(n, bytes) for n in sp.proof)
    with pytest.raises(WitnessError):
        StorageProofEntry.from_rpc({"key": "0x1", "proof": "not-a-list"})


def test_validate_transaction_per_envelope():
    with pytest.raises(WitnessError, match="missing required"):
        validate_transaction({"type": "0x2", "chainId": "0x1"})
    with pytest.raises(WitnessError, match="unsupported"):
        validate_transaction({"type": "0x50"})
    with pytest.raises(WitnessError, match="yParity"):
        validate_transaction({
            "type": "0x2", "chainId": "0x1", "nonce": "0x0",
            "maxPriorityFeePerGas": "0x1", "maxFeePerGas": "0x2",
            "gas": "0x5208", "value": "0x0", "r": "0x1", "s": "0x2",
        })
    # 4844 without blob fields must fail
    with pytest.raises(WitnessError, match="blobVersionedHashes|maxFeePerBlobGas"):
        validate_transaction({
            "type": "0x3", "chainId": "0x1", "nonce": "0x0",
            "maxPriorityFeePerGas": "0x1", "maxFeePerGas": "0x2",
            "gas": "0x5208", "value": "0x0", "yParity": "0x0",
            "r": "0x1", "s": "0x2",
        })


def test_builders_raise_witness_error_on_malformed_block():
    """A block whose tx list contains a malformed tx surfaces WitnessError
    from the trie builder, not KeyError from the encoder."""
    from zk_state_proofs_tpu.witness.builders import build_transaction_trie

    with pytest.raises(WitnessError):
        build_transaction_trie([{"type": "0x2", "chainId": "0x1"}])


def test_builders_accept_typed_proof_and_reject_malformed():
    from zk_state_proofs_tpu.witness.builders import (
        get_account_proof_input,
        get_storage_proof_input,
    )

    inp = get_account_proof_input(PROOF_RESPONSE, b"\x00" * 32,
                                  PROOF_RESPONSE["address"])
    assert len(inp.proof) == 2
    sp = get_storage_proof_input(PROOF_RESPONSE, b"\x00" * 32,
                                 PROOF_RESPONSE["address"], ["0x0"])
    assert sp.storage_keys == [bytes(32)]
    with pytest.raises(WitnessError):
        get_account_proof_input({"address": "0x1"}, b"\x00" * 32, "0x" + "00" * 20)
