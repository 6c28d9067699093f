"""Oracle RLP codec: canonical-form vectors + round trips."""

import pytest

from zk_state_proofs_tpu.oracle import rlp


# Classic RLP spec vectors
CASES = [
    (b"dog", bytes([0x83]) + b"dog"),
    ([b"cat", b"dog"], bytes([0xC8, 0x83]) + b"cat" + bytes([0x83]) + b"dog"),
    (b"", bytes([0x80])),
    ([], bytes([0xC0])),
    (b"\x0f", bytes([0x0F])),
    (b"\x04\x00", bytes([0x82, 0x04, 0x00])),
    (
        [[], [[]], [[], [[]]]],
        bytes([0xC7, 0xC0, 0xC1, 0xC0, 0xC3, 0xC0, 0xC1, 0xC0]),
    ),
    (
        b"Lorem ipsum dolor sit amet, consectetur adipisicing elit",
        bytes([0xB8, 0x38]) + b"Lorem ipsum dolor sit amet, consectetur adipisicing elit",
    ),
]


def test_encode_vectors():
    for item, expected in CASES:
        assert rlp.encode(item) == expected


def test_decode_round_trip():
    for item, expected in CASES:
        assert rlp.decode(expected) == item


def test_int_encoding():
    # tx index 0 encodes to 0x80 — used as trie path (reference transaction.rs:45)
    assert rlp.encode_int(0) == b"\x80"
    assert rlp.encode_int(15) == b"\x0f"
    assert rlp.encode_int(1024) == bytes([0x82, 0x04, 0x00])
    assert rlp.int_to_min_bytes(0) == b""
    assert rlp.decode_int(b"") == 0
    assert rlp.decode_int(bytes([0x04, 0x00])) == 1024


def test_strict_decode_errors():
    with pytest.raises(rlp.RlpError):
        rlp.decode(bytes([0x83]) + b"do")  # truncated
    with pytest.raises(rlp.RlpError):
        rlp.decode(bytes([0x83]) + b"dogs")  # trailing
    with pytest.raises(rlp.RlpError):
        rlp.decode(bytes([0x81, 0x05]))  # non-canonical single byte
    with pytest.raises(rlp.RlpError):
        rlp.decode(bytes([0xB8, 0x05]) + b"hello")  # long form for short len


def test_nested_round_trip_random():
    import random

    rng = random.Random(0)

    def rand_item(depth):
        if depth > 3 or rng.random() < 0.6:
            return bytes(rng.randrange(256) for _ in range(rng.randrange(70)))
        return [rand_item(depth + 1) for _ in range(rng.randrange(5))]

    for _ in range(200):
        item = rand_item(0)
        assert rlp.decode(rlp.encode(item)) == item
