"""L4 host pipeline: witness packing, fixtures, RPC clients, tx/receipt
encoders, and the reference-compatible wire format."""

from .pack import PackedProofs, pack_proofs

__all__ = ["PackedProofs", "pack_proofs"]
