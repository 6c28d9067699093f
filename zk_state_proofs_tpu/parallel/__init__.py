"""L5 mesh/sharding layer: data-parallel proof verification over a device
mesh with psum-reduced stats."""

from .dist_trie import compute_root_sharded
from .mesh import (
    BATCH_AXIS,
    make_mesh,
    make_sharded_storage_verifier,
    make_sharded_verifier,
    pad_batch,
    verify_proofs_sharded,
    verify_storage_grouped_sharded,
)

__all__ = [
    "compute_root_sharded",
    "BATCH_AXIS",
    "make_mesh",
    "make_sharded_storage_verifier",
    "make_sharded_verifier",
    "pad_batch",
    "verify_proofs_sharded",
    "verify_storage_grouped_sharded",
]
