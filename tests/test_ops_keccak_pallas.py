"""Pallas keccak kernel vs oracle (interpreter mode on CPU)."""

import numpy as np

from zk_state_proofs_tpu.oracle import keccak256 as oracle_keccak
from zk_state_proofs_tpu.ops.keccak_pallas import TILE, keccak256_tpu


def test_single_block_fixed():
    rng = np.random.default_rng(0)
    b = TILE  # one grid instance
    data = rng.integers(0, 256, (b, 100), dtype=np.uint8)
    out = np.asarray(keccak256_tpu(data))
    for i in range(0, b, 173):
        assert bytes(out[i]) == oracle_keccak(bytes(data[i])), i


def test_variable_length_multiblock():
    rng = np.random.default_rng(1)
    b = 64  # forces internal padding of the batch to TILE
    data = rng.integers(0, 256, (b, 300), dtype=np.uint8)
    lens = rng.integers(0, 301, b).astype(np.int32)
    lens[0] = 0
    lens[1] = 135  # combined 0x81 pad byte
    lens[2] = 136  # exactly one full block -> pad-only second block
    lens[3] = 300
    out = np.asarray(keccak256_tpu(data, lens))
    for i in range(b):
        assert bytes(out[i]) == oracle_keccak(bytes(data[i, : lens[i]])), i
