"""Circuit entrypoint parity: borsh in -> committed values out, mirroring
the reference zkVM guests (prover test flows, offline)."""

import pytest

from zk_state_proofs_tpu.oracle import EthTrie, MissingKeyError, keccak256, rlp
from zk_state_proofs_tpu.models import (
    run_merkle_circuit,
    run_merkle_circuit_batch,
    run_storage_circuit,
)
from zk_state_proofs_tpu.witness import (
    MerkleProofInput,
    StorageProofInput,
    get_transaction_proof_input,
    synthetic_block,
)
from zk_state_proofs_tpu.witness.encoding import encode_transaction


def test_merkle_circuit_tx_flow():
    """Mirrors prover test_generate_ethereum_transaction_zk_proof flows
    (reference prover/src/bin/main.rs:59-87): witness -> borsh -> circuit
    -> committed value == the encoded transaction."""
    fx = synthetic_block(num_txs=12, seed=41)
    inp = get_transaction_proof_input(fx["block"], 7)
    committed = run_merkle_circuit(inp.to_borsh())
    assert committed == encode_transaction(fx["block"]["transactions"][7])


def test_merkle_circuit_batch():
    fx = synthetic_block(num_txs=10, seed=42)
    inputs = [get_transaction_proof_input(fx["block"], i).to_borsh() for i in range(10)]
    out = run_merkle_circuit_batch(inputs)
    for i, v in enumerate(out):
        assert v == encode_transaction(fx["block"]["transactions"][i])


def test_storage_circuit_flow():
    """Mirrors the Risc0 storage circuit flow (reference
    prover/src/bin/main.rs:209-243 + storage-circuit/src/main.rs:6-31)."""
    world = EthTrie()
    addr = bytes.fromhex("ab" * 20)
    st = EthTrie()
    slots, values = [], []
    for s in range(3):
        slot = keccak256(b"slot%d" % s)
        val = rlp.encode_int(10_000 + s)
        st.insert(keccak256(slot), val)
        slots.append(slot)
        values.append(val)
    sroot = st.root_hash()
    leaf = rlp.encode([b"\x05", b"\x10", sroot, keccak256(b"code")])
    world.insert(keccak256(addr), leaf)
    for i in range(30):
        world.insert(keccak256(b"x%d" % i), rlp.encode([b"\x01", b"", sroot, sroot]))
    state_root = world.root_hash()

    inp = StorageProofInput(
        account_proof=world.get_proof(keccak256(addr)),
        storage_proofs=[st.get_proof(keccak256(s)) for s in slots],
        root_hash=state_root,
        account_key=keccak256(addr),
        storage_keys=slots,
        address_keccak=keccak256(addr),
    )
    committed = run_storage_circuit(inp.to_borsh())
    assert committed == values

    # absent slot -> the circuit's "Key does not exist!" panic path
    bad_slot = keccak256(b"absent")
    inp_bad = StorageProofInput(
        account_proof=inp.account_proof,
        storage_proofs=[st.get_proof(keccak256(bad_slot))],
        root_hash=state_root,
        account_key=inp.account_key,
        storage_keys=[bad_slot],
        address_keccak=inp.address_keccak,
    )
    with pytest.raises(MissingKeyError):
        run_storage_circuit(inp_bad.to_borsh())
