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


def test_sharded_pooled_sweep_matches_unsharded():
    """sweep(mesh=..., dedup=True) routes through the pooled sharded
    verifier; counts must match the unsharded pooled path, and the
    memoized builder must not re-jit on repeated sweeps."""
    from zk_state_proofs_tpu.models import replicated_batches, sweep
    from zk_state_proofs_tpu.parallel.mesh import make_sharded_verifier

    t = EthTrie()
    keys = [keccak256(b"sw%d" % i) for i in range(64)]
    for i, k in enumerate(keys):
        t.insert(k, bytes([i % 250 + 1]) * 40)
    root = t.root_hash()
    entries = [(root, t.get_proof(keys[i % 64]), keys[i % 64])
               for i in range(128)]
    entries[-1] = (root, t.get_proof(keccak256(b"absent")), keccak256(b"absent"))
    packed = pack_proofs(entries)

    mesh = make_mesh()
    res_sharded = sweep(replicated_batches(packed, 2), mesh=mesh)
    res_plain = sweep(replicated_batches(packed, 2))
    assert (res_sharded.found, res_sharded.excluded, res_sharded.invalid) == \
        (res_plain.found, res_plain.excluded, res_plain.invalid)
    assert res_sharded.found == 2 * 127 and res_sharded.excluded == 2

    # memoization: a second sweep must reuse the cached verifier (no re-jit)
    hits0 = make_sharded_verifier.cache_info().hits
    sweep(replicated_batches(packed, 1), mesh=mesh)
    assert make_sharded_verifier.cache_info().hits > hits0
    assert make_sharded_verifier(mesh, max_value_len=128, pooled=True) is \
        make_sharded_verifier(mesh, max_value_len=128, pooled=True)


def test_sharded_resident_epoch_sweep_matches_dp1():
    """sweep_resident_epochs(mesh=...) — BASELINE config 5's sharded
    shape: global tables row-sharded over 8 devices, per-shard contiguous
    windows, counts psum'ed. Totals and found counts must match the dp=1
    run exactly (same window coverage per epoch)."""
    from zk_state_proofs_tpu.models import sweep_resident_epochs

    t = EthTrie()
    keys = [keccak256(b"rse%d" % i) for i in range(128)]
    for i, k in enumerate(keys):
        t.insert(k, bytes([i % 250 + 1]) * 40)
    root = t.root_hash()
    entries = [(root, t.get_proof(k), k) for k in keys]
    packed = pack_proofs(entries)

    mesh = make_mesh()
    res8 = sweep_resident_epochs(packed, epochs=3, batch=32, mesh=mesh,
                                 salt=7)
    res1 = sweep_resident_epochs(packed, epochs=3, batch=32, salt=7)
    assert res8.total == res1.total == 3 * 4 * 32
    assert (res8.found, res8.excluded, res8.invalid) == \
        (res1.found, res1.excluded, res1.invalid)
    assert res8.found == res8.total

    # shapes that don't divide the mesh are rejected
    import pytest

    with pytest.raises(ValueError):
        sweep_resident_epochs(packed, epochs=1, batch=33, mesh=mesh)


def test_sharded_grouped_storage_matches_unsharded():
    """dp-sharded grouped two-level storage (slots sharded, accounts +
    pools replicated, psum'ed counts) must be bit-identical to
    models.verify_storage_grouped, including a tampered account whose
    slots all invalidate, and a slot count that doesn't divide the mesh
    (padding rows stay out of the global counts)."""
    from zk_state_proofs_tpu.models import verify_storage_grouped
    from zk_state_proofs_tpu.parallel import verify_storage_grouped_sharded
    from tests.test_storage_model import _build_world

    world, accounts = _build_world(n_accounts=3, slots_per=6)
    state_root = world.root_hash()
    a_entries = []
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        proof = world.get_proof(keccak256(addr))
        if ai == 2:  # tampered account -> its slots must all invalidate
            proof = [bytes(p) for p in proof]
            tb = bytearray(proof[-1])
            tb[-1] ^= 1
            proof[-1] = bytes(tb)
        a_entries.append((state_root, proof, keccak256(addr)))
    s_entries, slot_keys, slot_accounts = [], [], []
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        for slot in slots:
            s_entries.append((sroot, st.get_proof(keccak256(slot)),
                              keccak256(slot)))
            slot_keys.append(slot)
            slot_accounts.append(ai)
    a_packed = pack_proofs(a_entries)
    s_packed = pack_proofs(s_entries)
    slots_arr = np.stack([np.frombuffer(s, np.uint8) for s in slot_keys])
    sa = np.asarray(slot_accounts, np.int32)
    assert len(s_entries) % 8 != 0  # 18 slots: exercises slot padding

    ref = verify_storage_grouped(a_packed, s_packed, slots_arr, sa)
    mesh = make_mesh()
    a_st, a_roots, s_st, s_v, s_vl, counts = verify_storage_grouped_sharded(
        mesh, a_packed, s_packed, slots_arr, sa)
    np.testing.assert_array_equal(a_st, ref.account_status)
    np.testing.assert_array_equal(a_roots, ref.storage_root)
    np.testing.assert_array_equal(s_st, ref.slot_status)
    np.testing.assert_array_equal(s_v, ref.slot_values)
    np.testing.assert_array_equal(s_vl, ref.slot_value_lens)
    want = [int((ref.slot_status == c).sum())
            for c in (mpt.FOUND, mpt.EXCLUDED, mpt.INVALID)]
    assert counts.tolist() == want
    assert counts[2] == 6  # the tampered account's 6 slots
