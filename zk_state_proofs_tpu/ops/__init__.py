"""Device compute path: batched keccak, RLP node decode, MPT walker."""

from .keccak import keccak256, keccak_f1600, keccak256_fixed

__all__ = ["keccak256", "keccak_f1600", "keccak256_fixed"]
