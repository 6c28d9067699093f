"""Sharded verification over the 8-device virtual CPU mesh."""

import numpy as np

from zk_state_proofs_tpu.oracle import EthTrie, keccak256
from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.parallel import make_mesh, verify_proofs_sharded
from zk_state_proofs_tpu.witness import pack_proofs

import jax


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_verify_matches_single_device():
    t = EthTrie()
    kvs = {}
    for i in range(120):
        k = keccak256(b"p%d" % i)
        v = bytes([i % 250 + 1]) * (1 + i % 40)
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()
    keys = list(kvs)[:30]  # 30 not divisible by 8 -> exercises padding
    entries = [(root, t.get_proof(k), k) for k in keys]
    entries.append((root, t.get_proof(keccak256(b"no")), keccak256(b"no")))
    packed = pack_proofs(entries)

    mesh = make_mesh()
    status, values, vlens, counts = verify_proofs_sharded(mesh, packed)
    assert (status[:30] == mpt.FOUND).all()
    assert status[30] == mpt.EXCLUDED
    for i, k in enumerate(keys):
        assert bytes(values[i][: vlens[i]]) == kvs[k]
    # psum'ed global counts exclude the padding rows
    assert counts.tolist() == [30, 1, 0]

    # must agree with the unsharded path
    s1, v1, l1 = (np.asarray(x) for x in mpt.verify_proofs(*packed.astuple()))
    assert (s1 == status).all()
    assert (l1 == vlens).all()
    assert (v1 == values).all()


def test_sharded_trie_root_matches_oracle():
    import random

    from zk_state_proofs_tpu.oracle import rlp as orlp
    from zk_state_proofs_tpu.parallel import compute_root_sharded
    from zk_state_proofs_tpu.witness.trie_plan import plan_index_trie
    from zk_state_proofs_tpu.oracle import EthTrie

    rng = random.Random(9)
    values = [bytes(rng.randrange(256) for _ in range(50 + rng.randrange(300)))
              for _ in range(150)]
    t = EthTrie()
    for i, v in enumerate(values):
        t.insert(orlp.encode_int(i), v)
    want = t.root_hash()

    mesh = make_mesh()
    plan = plan_index_trie(values)
    # leaves level must actually shard over 8 devices
    assert plan.levels[0].templates.shape[0] >= 8 * 8
    root, _ = compute_root_sharded(mesh, plan)
    assert bytes(root) == want
