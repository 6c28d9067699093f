"""Flagship verification workloads (the four trie flavors + storage
composition)."""

from .verifier import (
    StorageVerifyResult,
    VerifyResult,
    verify_merkle_batch,
    verify_merkle_proof,
    verify_storage_batch,
)

__all__ = [
    "StorageVerifyResult",
    "VerifyResult",
    "verify_merkle_batch",
    "verify_merkle_proof",
    "verify_storage_batch",
]
