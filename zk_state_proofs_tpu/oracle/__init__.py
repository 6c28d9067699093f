"""L0 bit-exact pure-Python oracle: keccak-256, RLP, hexary MPT.

Small, slow, trusted. Generates and validates the golden fixtures every
device kernel is tested against (SURVEY.md §7.2 layer 1).
"""

from .keccak import keccak256, keccak_f1600
from . import rlp
from .trie import (
    EMPTY_ROOT,
    EthTrie,
    MissingKeyError,
    TrieError,
    bytes_to_nibbles,
    hp_decode,
    hp_encode,
    verify_merkle_proof,
    walk_proof,
)

__all__ = [
    "keccak256",
    "keccak_f1600",
    "rlp",
    "EMPTY_ROOT",
    "EthTrie",
    "MissingKeyError",
    "TrieError",
    "bytes_to_nibbles",
    "hp_decode",
    "hp_encode",
    "verify_merkle_proof",
    "walk_proof",
]
