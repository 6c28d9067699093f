"""Pallas keccak kernel vs oracle (interpreter mode on CPU)."""

import numpy as np

from zk_state_proofs_tpu.oracle import keccak256 as oracle_keccak
from zk_state_proofs_tpu.ops.keccak_pallas import (
    TILE, keccak256_tpu, keccak256_tpu_raw)


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


def test_raw_kernel_matches_byte_kernel():
    """The raw-word kernel (in-register pad10*1 + lane assembly from the
    bitcast LE word view) must agree with the byte-path kernel and the
    oracle on every padding edge: empty rows, block-boundary lengths,
    lengths not a multiple of 8 (misaligned pad byte within a word), and
    a non-multiple-of-8 bucket width."""
    rng = np.random.default_rng(2)
    b = 64
    for width in (300, 285):  # 285: bucket width forces byte padding to 288
        data = rng.integers(0, 256, (b, width), dtype=np.uint8)
        lens = rng.integers(0, width + 1, b).astype(np.int32)
        lens[:8] = [0, 1, 7, 8, 135, 136, 137, width]
        out = np.asarray(keccak256_tpu_raw(data, lens))
        ref = np.asarray(keccak256_tpu(data, lens))
        np.testing.assert_array_equal(out, ref)
        for i in range(0, b, 11):
            assert bytes(out[i]) == oracle_keccak(bytes(data[i, : lens[i]])), i
    # fixed-length form (no lengths argument)
    data = rng.integers(0, 256, (TILE, 100), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(keccak256_tpu_raw(data)), np.asarray(keccak256_tpu(data)))
