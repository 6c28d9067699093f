"""L4 host pipeline: witness packing, fixtures, RPC clients, tx/receipt
encoders, and the reference-compatible wire format."""

from .pack import PackedProofs, pack_proofs
from .types import MerkleProofInput, StorageProofInput
from .encoding import encode_receipt, encode_transaction
from .builders import (
    WitnessError,
    build_receipt_trie,
    build_transaction_trie,
    get_account_proof_input,
    get_receipt_proof_input,
    get_storage_proof_input,
    get_transaction_proof_input,
)
from .fixtures import (
    ERC20_TRANSFER_TOPIC,
    load_fixture,
    record_block_fixture,
    record_proof_fixture,
    save_fixture,
    synthetic_block,
)
from .rpc import (
    ArbitrumClient,
    EthereumClient,
    JsonRpcClient,
    OptimismClient,
    RpcError,
    load_infura_key_from_env,
)

__all__ = [
    "PackedProofs",
    "pack_proofs",
    "MerkleProofInput",
    "StorageProofInput",
    "encode_receipt",
    "encode_transaction",
    "WitnessError",
    "build_receipt_trie",
    "build_transaction_trie",
    "get_account_proof_input",
    "get_receipt_proof_input",
    "get_storage_proof_input",
    "get_transaction_proof_input",
    "ERC20_TRANSFER_TOPIC",
    "load_fixture",
    "record_block_fixture",
    "record_proof_fixture",
    "save_fixture",
    "synthetic_block",
    "ArbitrumClient",
    "EthereumClient",
    "JsonRpcClient",
    "OptimismClient",
    "RpcError",
    "load_infura_key_from_env",
]
