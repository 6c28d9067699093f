"""Two-level account->storage verification vs oracle-built world state."""

import numpy as np

from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.models import verify_storage_batch, verify_merkle_proof
from zk_state_proofs_tpu.witness import pack_proofs
from zk_state_proofs_tpu.oracle.trie import MissingKeyError, TrieError


def _account_leaf(nonce, balance, storage_root, code_hash):
    return rlp.encode(
        [rlp.int_to_min_bytes(nonce), rlp.int_to_min_bytes(balance), storage_root, code_hash]
    )


def _build_world(n_accounts=8, slots_per=4):
    world = EthTrie()
    accounts = []
    for a in range(n_accounts):
        addr = keccak256(b"addr-%d" % a)[:20]
        st = EthTrie()
        slots = {}
        for s in range(slots_per):
            slot = keccak256(b"slot-%d-%d" % (a, s))  # raw 32-byte slot key
            val = rlp.encode_int(1000 * a + s + 1)
            slots[slot] = val
            st.insert(keccak256(slot), val)
        sroot = st.root_hash()
        leaf = _account_leaf(a + 1, 10**18 + a, sroot, keccak256(b"code-%d" % a))
        world.insert(keccak256(addr), leaf)
        accounts.append((addr, st, sroot, slots, leaf))
    return world, accounts


def test_storage_two_level():
    world, accounts = _build_world()
    state_root = world.root_hash()

    a_entries, s_entries, slot_keys, expected = [], [], [], []
    for addr, st, sroot, slots, leaf in accounts:
        for slot, val in slots.items():
            a_entries.append((state_root, world.get_proof(keccak256(addr)), keccak256(addr)))
            s_entries.append((sroot, st.get_proof(keccak256(slot)), keccak256(slot)))
            slot_keys.append(slot)
            expected.append(val)

    a_packed = pack_proofs(a_entries)
    s_packed = pack_proofs(s_entries)
    slots_arr = np.stack([np.frombuffer(s, np.uint8) for s in slot_keys])
    res = verify_storage_batch(a_packed, s_packed, slots_arr)

    assert (res.account_status == mpt.FOUND).all()
    assert (res.slot_status == mpt.FOUND).all()
    for i, val in enumerate(expected):
        assert res.slot_value(i) == val, i
    # decoded account fields
    assert int.from_bytes(bytes(res.nonce[0]), "big") == 1
    bal = int.from_bytes(bytes(res.balance[0]), "big")
    assert bal == 10**18 + 0
    assert bytes(res.storage_root[0]) == accounts[0][2]


def test_storage_bad_account_invalidates_slots():
    world, accounts = _build_world(n_accounts=4, slots_per=2)
    state_root = world.root_hash()
    addr, st, sroot, slots, leaf = accounts[0]
    slot = next(iter(slots))
    a_proof = world.get_proof(keccak256(addr))
    s_proof = st.get_proof(keccak256(slot))
    # tamper the account proof leaf
    bad = [bytes(p) for p in a_proof]
    t = bytearray(bad[-1])
    t[-1] ^= 1
    bad[-1] = bytes(t)
    a_packed = pack_proofs([(state_root, bad, keccak256(addr))])
    s_packed = pack_proofs([(sroot, s_proof, keccak256(slot))])
    slots_arr = np.frombuffer(slot, np.uint8)[None]
    res = verify_storage_batch(a_packed, s_packed, slots_arr)
    assert res.account_status[0] == mpt.INVALID
    assert res.slot_status[0] == mpt.INVALID


def test_single_proof_reference_semantics():
    world, accounts = _build_world(n_accounts=4, slots_per=1)
    state_root = world.root_hash()
    addr = accounts[0][0]
    key = keccak256(addr)
    proof = world.get_proof(key)
    assert verify_merkle_proof(state_root, proof, key) == accounts[0][4]
    try:
        verify_merkle_proof(state_root, world.get_proof(keccak256(b"zz")), keccak256(b"zz"))
        raise AssertionError("expected MissingKeyError")
    except MissingKeyError:
        pass
    try:
        verify_merkle_proof(state_root, proof[:-1], key)
        raise AssertionError("expected TrieError")
    except MissingKeyError:
        raise
    except TrieError:
        pass


def test_storage_grouped_matches_duplicated_form():
    """N-slots-per-account input shape (reference StorageProofInput,
    crypto-ops/src/types.rs:12-19): 4 unique accounts x 32 slots each.
    Exactly 4 account verifications run (the account batch is [4], not
    [128]), and every slot outcome is bit-identical to the duplicated
    1:1 form."""
    from zk_state_proofs_tpu.models import (verify_storage_grouped)

    world, accounts = _build_world(n_accounts=4, slots_per=32)
    state_root = world.root_hash()

    # grouped form: one account row per unique account
    a_entries = [(state_root, world.get_proof(keccak256(a[0])),
                  keccak256(a[0])) for a in accounts]
    s_entries, slot_keys, slot_accounts, expected = [], [], [], []
    dup_a_entries = []
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        for slot, val in slots.items():
            s_entries.append((sroot, st.get_proof(keccak256(slot)),
                              keccak256(slot)))
            slot_keys.append(slot)
            slot_accounts.append(ai)
            expected.append(val)
            dup_a_entries.append(a_entries[ai])

    a_packed = pack_proofs(a_entries)
    s_packed = pack_proofs(s_entries)
    slots_arr = np.stack([np.frombuffer(s, np.uint8) for s in slot_keys])
    sa = np.asarray(slot_accounts, np.int32)

    # the account batch really is 4 rows (one verification per account)
    assert a_packed.batch == 4
    res = verify_storage_grouped(a_packed, s_packed, slots_arr, sa)
    assert res.account_status.shape == (4,)
    assert (res.account_status == mpt.FOUND).all()
    assert (res.slot_status == mpt.FOUND).all()
    for i, val in enumerate(expected):
        assert res.slot_value(i) == val, i
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        assert bytes(res.storage_root[ai]) == sroot

    # bit-identical to the duplicated 1:1 form (unpooled parity reference)
    dup_a = pack_proofs(dup_a_entries)
    dup = verify_storage_batch(dup_a, s_packed, slots_arr, dedup=False)
    np.testing.assert_array_equal(res.slot_status, dup.slot_status)
    np.testing.assert_array_equal(res.slot_values, dup.slot_values)
    np.testing.assert_array_equal(res.slot_value_lens, dup.slot_value_lens)
    np.testing.assert_array_equal(res.account_status,
                                  dup.account_status[::32][:4])

    # a bad account index must be rejected on the host
    try:
        verify_storage_grouped(a_packed, s_packed, slots_arr,
                               np.full(len(sa), 4, np.int32))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_storage_grouped_bad_account_masks_its_slots_only():
    """Tampering ONE account's proof invalidates exactly its slots."""
    from zk_state_proofs_tpu.models import verify_storage_grouped

    world, accounts = _build_world(n_accounts=3, slots_per=4)
    state_root = world.root_hash()
    a_entries = []
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        proof = world.get_proof(keccak256(addr))
        if ai == 1:  # tamper account 1's leaf
            proof = [bytes(p) for p in proof]
            t = bytearray(proof[-1])
            t[-1] ^= 1
            proof[-1] = bytes(t)
        a_entries.append((state_root, proof, keccak256(addr)))
    s_entries, slot_keys, slot_accounts = [], [], []
    for ai, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        for slot in slots:
            s_entries.append((sroot, st.get_proof(keccak256(slot)),
                              keccak256(slot)))
            slot_keys.append(slot)
            slot_accounts.append(ai)
    res = verify_storage_grouped(
        pack_proofs(a_entries), pack_proofs(s_entries),
        np.stack([np.frombuffer(s, np.uint8) for s in slot_keys]),
        np.asarray(slot_accounts, np.int32))
    assert res.account_status[1] == mpt.INVALID
    assert (res.account_status[[0, 2]] == mpt.FOUND).all()
    sa = np.asarray(slot_accounts)
    assert (res.slot_status[sa == 1] == mpt.INVALID).all()
    assert (res.slot_status[sa != 1] == mpt.FOUND).all()


def test_storage_batch_pooled_matches_unpooled():
    """The pooled two-level path (dedup=True default) is bit-identical to
    the unpooled core AND hashes fewer rows (the account batch repeats one
    trie's prefix — the exact case dedup exists for)."""
    world, accounts = _build_world(n_accounts=6, slots_per=4)
    state_root = world.root_hash()
    a_entries, s_entries, slot_keys = [], [], []
    for addr, st, sroot, slots, leaf in accounts:
        for slot in slots:
            a_entries.append((state_root, world.get_proof(keccak256(addr)),
                              keccak256(addr)))
            s_entries.append((sroot, st.get_proof(keccak256(slot)),
                              keccak256(slot)))
            slot_keys.append(slot)
    a_packed = pack_proofs(a_entries)
    s_packed = pack_proofs(s_entries)
    slots_arr = np.stack([np.frombuffer(s, np.uint8) for s in slot_keys])
    pooled = verify_storage_batch(a_packed, s_packed, slots_arr)
    plain = verify_storage_batch(a_packed, s_packed, slots_arr, dedup=False)
    for f in ("account_status", "storage_root", "nonce", "balance",
              "code_hash", "slot_status", "slot_values", "slot_value_lens"):
        np.testing.assert_array_equal(getattr(pooled, f), getattr(plain, f))
    # dedup is real: unique pool rows < total proof node rows
    pool_rows = int((a_packed.pool()[1] > 0).sum())
    total_rows = int(a_packed.num_nodes.sum())
    assert pool_rows < total_rows, (pool_rows, total_rows)


def test_verify_account_batch_decodes_fields():
    """Direct coverage for verify_account_batch (pooled path): verify a
    batch of account proofs and cross-check every decoded field against
    the oracle's inserted leaves — the reference account-test flow
    (trie-utils/tests/account.rs:33-129: verify, decode_exact::<Account>,
    compare storage_root against the known storage hash)."""
    from zk_state_proofs_tpu.models import verify_account_batch

    world, accounts = _build_world(n_accounts=12, slots_per=1)
    state_root = world.root_hash()
    entries = [(state_root, world.get_proof(keccak256(a[0])), keccak256(a[0]))
               for a in accounts]
    packed = pack_proofs(entries)
    res, fields = verify_account_batch(packed)
    assert res.all_found
    for i, (addr, st, sroot, slots, leaf) in enumerate(accounts):
        assert bytes(fields["storage_root"][i]) == sroot
        assert bytes(fields["code_hash"][i]) == keccak256(b"code-%d" % i)
        assert int.from_bytes(bytes(fields["nonce"][i]), "big") == i + 1
        assert int.from_bytes(bytes(fields["balance"][i]), "big") == 10**18 + i
        assert bool(fields["ok"][i])
    # non-pooled path agrees
    res2, fields2 = verify_account_batch(packed, dedup=False)
    assert (res2.status == res.status).all()
    np.testing.assert_array_equal(fields2["storage_root"], fields["storage_root"])
