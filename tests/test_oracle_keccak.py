"""Oracle Keccak-256 against published test vectors.

These are the canonical legacy-Keccak (pre-FIPS202, pad 0x01) digests —
the variant Ethereum uses (reference: crypto-ops/src/keccak.rs:6-12 via
tiny-keccak's Keccak::v256).
"""

from zk_state_proofs_tpu.oracle import keccak256

# (message, keccak256 hex) — well-known public vectors
VECTORS = [
    (b"", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    (b"abc", "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"),
    (
        b"The quick brown fox jumps over the lazy dog",
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15",
    ),
    (
        b"The quick brown fox jumps over the lazy dog.",
        "578951e24efd62a3d63a86f7cd19aaa53c898fe287d2552133220370240b572d",
    ),
    # sha3 ethereum genesis-adjacent vector: keccak('testing')
    (b"testing", "5f16f4c7f149ac4f9510d9cf8cf384038ad348b3bcdc01915f95de12df9d1b02"),
]


def test_known_vectors():
    for msg, hexdigest in VECTORS:
        assert keccak256(msg).hex() == hexdigest, msg


def test_multiblock_messages():
    # spans 1, exactly 1 (135 + pad), 2, and 4+ rate blocks
    for n in [0, 1, 135, 136, 137, 271, 272, 273, 500, 1000]:
        msg = bytes((i * 7 + 3) % 256 for i in range(n))
        d = keccak256(msg)
        assert len(d) == 32
        # determinism
        assert keccak256(msg) == d


def test_rate_boundary_padding():
    # len % 136 == 135 forces the 0x81 combined pad byte path
    msg = b"\xaa" * 135
    d1 = keccak256(msg)
    assert d1 != keccak256(b"\xaa" * 136)
    assert len(d1) == 32
