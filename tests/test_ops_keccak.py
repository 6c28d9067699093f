"""Device keccak vs oracle: exhaustive cross-checks over lengths & batches."""

import numpy as np
import pytest

from zk_state_proofs_tpu.oracle import keccak256 as oracle_keccak
from zk_state_proofs_tpu.ops import keccak as dev


def _batch_digest(msgs, max_len=None):
    max_len = max_len if max_len is not None else max(len(m) for m in msgs)
    data = np.zeros((len(msgs), max_len), dtype=np.uint8)
    lengths = np.zeros(len(msgs), dtype=np.int32)
    for i, m in enumerate(msgs):
        data[i, : len(m)] = np.frombuffer(m, dtype=np.uint8)
        lengths[i] = len(m)
    out = np.asarray(dev.keccak256(data, lengths))
    return [bytes(out[i]) for i in range(len(msgs))]


def test_known_vectors():
    msgs = [b"", b"abc", b"The quick brown fox jumps over the lazy dog", b"testing"]
    got = _batch_digest(msgs, max_len=64)
    for m, d in zip(msgs, got):
        assert d == oracle_keccak(m), m


def test_vs_oracle_lengths():
    # every interesting boundary: 0, 1, 31, 32, 55, 56, 134, 135, 136, 137,
    # 271, 272, 273 (multi-block + combined-pad-byte cases)
    rng = np.random.default_rng(0)
    lengths = [0, 1, 31, 32, 55, 56, 133, 134, 135, 136, 137, 200, 271, 272, 273, 400]
    msgs = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for n in lengths]
    got = _batch_digest(msgs, max_len=max(lengths))
    for m, d in zip(msgs, got):
        assert d == oracle_keccak(m), len(m)


def test_vs_oracle_random_batch():
    rng = np.random.default_rng(7)
    msgs = [
        bytes(rng.integers(0, 256, int(rng.integers(0, 550)), dtype=np.uint8))
        for _ in range(64)
    ]
    got = _batch_digest(msgs, max_len=550)
    for m, d in zip(msgs, got):
        assert d == oracle_keccak(m)


def test_fixed_length_path():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    out = np.asarray(dev.keccak256_fixed(data))
    for i in range(32):
        assert bytes(out[i]) == oracle_keccak(bytes(data[i]))


def test_nd_batch_shape():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, (4, 8, 32), dtype=np.uint8)
    out = np.asarray(dev.keccak256_fixed(data))
    assert out.shape == (4, 8, 32)
    assert bytes(out[2, 5]) == oracle_keccak(bytes(data[2, 5]))
