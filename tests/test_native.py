"""Native C++ host library vs Python oracle (keccak + packing parity)."""

import numpy as np
import pytest

from zk_state_proofs_tpu import native
from zk_state_proofs_tpu.oracle import EthTrie, keccak256 as py_keccak


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@requires_native
def test_native_keccak_matches_oracle():
    msgs = [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 1000]
    for m in msgs:
        assert native.keccak256(m) == py_keccak(m)
    batch = native.keccak256_batch(msgs)
    for m, d in zip(msgs, batch):
        assert d == py_keccak(m)


@requires_native
def test_native_pack_matches_python():
    import zk_state_proofs_tpu.witness.pack as pack_mod
    from zk_state_proofs_tpu.witness import pack_proofs

    t = EthTrie()
    kvs = {}
    for i in range(60):
        k = py_keccak(b"n%d" % i)
        v = b"v%d" % i
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in list(kvs)[:20]]

    nat = pack_proofs(entries)  # native path (available)
    # force the pure-Python path for comparison
    orig = native.pack_proofs_native
    try:
        native.pack_proofs_native = lambda *a, **k: None
        py = pack_proofs(entries)
    finally:
        native.pack_proofs_native = orig

    for a, b in zip(nat.astuple(), py.astuple()):
        assert a.dtype == b.dtype
        assert (np.asarray(a) == np.asarray(b)).all()


@requires_native
def test_native_pack_bucket_overflow():
    from zk_state_proofs_tpu.witness import pack_proofs

    entries = [(b"\x00" * 32, [b"\x01" * 100], b"\x02" * 4)]
    with pytest.raises(ValueError):
        pack_proofs(entries, node_len=50)
