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
