"""Flagship verification workloads (the four trie flavors + storage
composition)."""

from .blocks import (
    Erc20Transfer,
    decode_receipt_value,
    extract_erc20_transfers,
    verify_block_receipts,
    verify_block_transactions,
)
from .circuits import (
    run_merkle_circuit,
    run_merkle_circuit_batch,
    run_storage_circuit,
)
from .service import BatchVerifier, ServiceStats
from .sweep import (SweepResult, replicated_batches, sweep, sweep_entries,
                    sweep_resident, sweep_resident_epochs)
from .verifier import (
    batch_commitment,
    diagnose_batch,
    verify_account_batch,
    GroupedStorageVerifyResult,
    StorageVerifyResult,
    VerifyResult,
    verify_merkle_batch,
    verify_merkle_proof,
    verify_storage_batch,
    verify_storage_grouped,
)

__all__ = [
    "BatchVerifier",
    "ServiceStats",
    "run_merkle_circuit",
    "run_merkle_circuit_batch",
    "run_storage_circuit",
    "SweepResult",
    "replicated_batches",
    "sweep",
    "sweep_entries",
    "sweep_resident",
    "sweep_resident_epochs",
    "batch_commitment",
    "diagnose_batch",
    "verify_account_batch",
    "Erc20Transfer",
    "decode_receipt_value",
    "extract_erc20_transfers",
    "verify_block_receipts",
    "verify_block_transactions",
    "GroupedStorageVerifyResult",
    "StorageVerifyResult",
    "VerifyResult",
    "verify_merkle_batch",
    "verify_merkle_proof",
    "verify_storage_batch",
    "verify_storage_grouped",
]
