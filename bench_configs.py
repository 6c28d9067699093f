"""The five BASELINE.json workload configs as runnable benchmarks.

  1. Single transaction Merkle proof verified vs transactions_root
     (recorded/synthetic fixture).
  2. Account proof + storage-slot proof vs state_root (nested tries).
  3. Full receipt-trie verification for one block + ERC20 log extraction.
  4. Batch of 4096 mixed account/storage/tx proofs, data-parallel, 1 chip.
  5. Large proof sweep (scaled-down 1M-proof config) with sharded batches
     and collective trie-root reduction.

Prints one JSON line per config (stdout). Run with --quick for smaller
shapes. The headline driver metric stays in bench.py.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np


def _emit(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def config1_single_tx(quick):
    from zk_state_proofs_tpu.witness import synthetic_block, get_transaction_proof_input
    from zk_state_proofs_tpu.models import run_merkle_circuit
    from zk_state_proofs_tpu.witness.encoding import encode_transaction

    fx = synthetic_block(num_txs=16 if quick else 64, seed=1)
    inp = get_transaction_proof_input(fx["block"], 15)
    t0 = time.time()
    value = run_merkle_circuit(inp.to_borsh())
    dt = time.time() - t0
    ok = value == encode_transaction(fx["block"]["transactions"][15])
    extras = {}
    try:
        extras = _tx_geometry_batch(quick)
        ok = ok and extras.pop("_ok")
    except Exception as e:
        print(f"tx-geometry batch failed: {e!r}", file=sys.stderr)
        ok = False
    _emit("single_tx_proof", ok=ok, seconds=round(dt, 3), **extras)
    return ok


def _tx_geometry_batch(quick):
    """Validate + measure the fused walk kernel at TX-TRIE geometry on the
    current backend (VERDICT r3 missing #4): ~2 KB leaf nodes mean ~516
    word rows per node in kernel VMEM — a shape every prior bench avoided
    (account buckets are 576 B). Runs a 4096-proof batch of real tx-trie
    witnesses through verify_proofs_pooled; on TPU this compiles the
    Mosaic kernel at nw=517 and reports device throughput (in-graph
    iterations, perturbed padding, same methodology as bench.py)."""
    import secrets

    import jax
    import jax.numpy as jnp

    from zk_state_proofs_tpu.ops import mpt
    from zk_state_proofs_tpu.witness import pack_proofs, synthetic_block
    from zk_state_proofs_tpu.witness.builders import get_all_transaction_proof_inputs

    total = 1024 if quick else 4096
    # big-calldata txs so leaf nodes hit the ~2 KB bucket the VERDICT
    # flagged as unproven (synthetic_block's default calldata is < 260 B)
    import random

    from zk_state_proofs_tpu.witness.builders import build_transaction_trie

    rng = random.Random(11)
    txs = []
    for i in range(64 if quick else 256):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(1400, 1960)))
        txs.append({
            "type": "0x2", "chainId": "0x1", "nonce": hex(i),
            "maxPriorityFeePerGas": "0x3b9aca00",
            "maxFeePerGas": "0x2540be400", "gas": "0x7a120",
            "to": "0x" + "%040x" % rng.getrandbits(160),
            "value": hex(rng.getrandbits(48)),
            "input": "0x" + data.hex(), "accessList": [],
            "yParity": hex(i & 1),
            "r": "0x" + "%064x" % rng.getrandbits(255),
            "s": "0x" + "%064x" % rng.getrandbits(255),
        })
    trie = build_transaction_trie(txs)
    block = {"transactions": txs,
             "transactionsRoot": "0x" + trie.root_hash().hex()}
    inputs = get_all_transaction_proof_inputs(block)
    entries = [inputs[i % len(inputs)].as_entry() for i in range(total)]
    node_len = max(len(n) for _, p, _ in entries for n in p)
    node_len = -(-(node_len + 4) // 4) * 4  # word-align + perturbation pad
    packed = pack_proofs(entries, node_len=node_len)
    args = [jnp.asarray(a) for a in packed.astuple()]
    pargs = [jnp.asarray(a) for a in packed.pool()]
    d = packed.nodes.shape[1]

    # FULL-WIDTH value extraction: the reference's verify returns the
    # WHOLE leaf value (crypto-ops/src/lib.rs:20-22) — for a tx leaf
    # that is the ~2 KB encoded transaction, extracted through the XLA
    # word shift-cascade path (mpt._word_shift_window; the in-kernel vw
    # capture only covers max_value_len <= 128). r4's 758k proofs/s tx
    # figure capped max_value_len=128 AND discarded values; this is the
    # honest end-to-end rate.
    from zk_state_proofs_tpu.witness.encoding import encode_transaction

    maxv = max(len(encode_transaction(tx)) for tx in txs)
    mvl = -(-maxv // 128) * 128

    import functools

    fn = functools.partial(mpt.verify_proofs_pooled, max_value_len=mvl,
                           max_steps=d + 2)
    status, v0, l0 = fn(*args, *pargs)
    status = np.asarray(status)
    ok = bool((status == mpt.FOUND).all())
    # spot-check the wide extraction end-to-end: row 0's value is its tx
    i0 = 0
    enc0 = encode_transaction(txs[0 % len(inputs)])
    ok = ok and bytes(np.asarray(v0)[i0, :int(np.asarray(l0)[i0])]) == enc0

    K = 8

    @jax.jit
    def step(ctr):
        def body(_, carry):
            ctr, acc, accv = carry
            ctr = ctr + 1
            pn = args[0].at[:, :, -1].set(ctr.astype(jnp.uint8))
            pp = pargs[0].at[:, -1].set(ctr.astype(jnp.uint8))
            s, v, l = fn(pn, *args[1:], pp, *pargs[1:])
            # consume EVERY output the rate claims to measure: an unused
            # value tensor is dead-code-eliminated by XLA and the rate
            # would silently exclude the extraction stage (the repo's
            # extraction-honesty rule, CLAUDE.md r4)
            accv = accv ^ jnp.sum(v.astype(jnp.int32), axis=1) ^ (l << 8)
            return ctr, acc + s, accv
        return jax.lax.fori_loop(
            0, K, body, (ctr, jnp.zeros((total,), jnp.int32),
                         jnp.zeros((total,), jnp.int32)))

    ctr, acc, accv = step(jnp.asarray(np.int32(secrets.randbelow(1 << 20))))
    jax.block_until_ready((acc, accv))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        ctr, acc, accv = step(ctr)
        np.asarray(acc), np.asarray(accv)  # forced host read (relay-safe)
        best = min(best, (time.time() - t0) / K)
    ok = ok and bool((np.asarray(acc) == K * mpt.FOUND).all())
    return {
        "_ok": ok,
        "tx_geometry_batch": total,
        "tx_geometry_node_len": node_len,
        "tx_geometry_depth": d,
        "tx_geometry_max_value_len": mvl,
        "tx_geometry_proofs_per_sec": round(total / best, 1),
        "tx_geometry_ms_per_batch": round(best * 1e3, 3),
        "tx_geometry_backend": jax.default_backend(),
    }


def config2_account_storage(quick):
    from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
    from zk_state_proofs_tpu.models import run_storage_circuit
    from zk_state_proofs_tpu.witness import StorageProofInput

    world, st = EthTrie(), EthTrie()
    addr = bytes.fromhex("dac17f958d2ee523a2206206994597c13d831ec7")
    slot = bytes(32)  # totalSupply slot 0 (reference constants.rs)
    val = rlp.encode_int(39_035_000_000_000)
    st.insert(keccak256(slot), val)
    sroot = st.root_hash()
    world.insert(keccak256(addr), rlp.encode([b"\x01", b"\x01", sroot, keccak256(b"usdt")]))
    for i in range(64 if quick else 512):
        world.insert(keccak256(b"acct%d" % i), rlp.encode([b"\x01", b"", sroot, sroot]))
    inp = StorageProofInput(
        account_proof=world.get_proof(keccak256(addr)),
        storage_proofs=[st.get_proof(keccak256(slot))],
        root_hash=world.root_hash(),
        account_key=keccak256(addr),
        storage_keys=[slot],
        address_keccak=keccak256(addr),
    )
    t0 = time.time()
    values = run_storage_circuit(inp.to_borsh())
    dt = time.time() - t0
    ok = values == [val]
    extras = {}
    try:
        extras = _grouped_storage_batch(quick)
        ok = ok and extras.pop("_ok")
    except Exception as e:
        print(f"grouped-storage batch failed: {e!r}", file=sys.stderr)
        ok = False
    _emit("account_storage_proof", ok=ok, seconds=round(dt, 3), **extras)
    return ok


def _grouped_storage_batch(quick):
    """Batch-scale device throughput for the TWO-LEVEL grouped storage
    flow (VERDICT r4 missing #4): A unique accounts x S slots/account
    through the reference's most complex circuit shape
    (storage-circuit/src/main.rs:6-31 — account verified once, slots
    verified against its decoded storage_root, slot keys hashed
    in-graph). In-graph iterations with perturbed padding, slot VALUES
    and account fields folded into live accumulators (extraction-honesty
    rule). The slot level runs the UNHINTED kernel (inline short leaves
    would defer the hinted path every batch), so this is that kernel's
    first device number at storage shape."""
    import secrets

    import jax
    import jax.numpy as jnp

    from zk_state_proofs_tpu import native
    from zk_state_proofs_tpu.models.verifier import _storage_core_grouped
    from zk_state_proofs_tpu.ops import mpt
    from zk_state_proofs_tpu.oracle import EthTrie, rlp
    from zk_state_proofs_tpu.witness import pack_proofs

    n_accounts = 64 if quick else 512
    slots_per = 8
    slots_in_trie = 64 if quick else 256  # realistic storage-trie depth
    total_slots = n_accounts * slots_per

    nk = native.keccak256
    t0 = time.time()
    world = EthTrie(hasher=nk)
    sroots, slot_proof_sets, slot_keys = [], [], []
    for a in range(n_accounts):
        st = EthTrie(hasher=nk)
        raw_slots = [a.to_bytes(16, "big") + i.to_bytes(16, "big")
                     for i in range(slots_in_trie)]
        for i, rs in enumerate(raw_slots):
            st.insert(nk(rs), rlp.encode_int((a << 20) + i + 1))
        sroots.append(st.root_hash())
        chosen = raw_slots[::slots_in_trie // slots_per][:slots_per]
        slot_keys.append(chosen)
        slot_proof_sets.append([st.get_proof(nk(rs)) for rs in chosen])
    addr_keys = [nk(b"gs-acct-%d" % a) for a in range(n_accounts)]
    for a, k in enumerate(addr_keys):
        world.insert(k, rlp.encode([
            rlp.int_to_min_bytes(a + 1), rlp.int_to_min_bytes(10**18 + a),
            sroots[a], nk(b"code%d" % a)]))
    wroot = world.root_hash()
    a_entries = [(wroot, world.get_proof(k), k) for k in addr_keys]
    s_entries, slots_flat, slot_accounts = [], [], []
    for a in range(n_accounts):
        for j, rs in enumerate(slot_keys[a]):
            # roots/keys are supplied on device by the grouped core;
            # entry root/key here only size the pack
            s_entries.append((sroots[a], slot_proof_sets[a][j], nk(rs)))
            slots_flat.append(rs)
            slot_accounts.append(a)
    witness_s = time.time() - t0

    a_node_len = max(len(n) for _, p, _ in a_entries for n in p)
    s_node_len = max(len(n) for _, p, _ in s_entries for n in p)
    ap = pack_proofs(a_entries, node_len=-(-(a_node_len + 4) // 4) * 4)
    sp = pack_proofs(s_entries, node_len=-(-(s_node_len + 4) // 4) * 4)
    # slots padded to 36 B: the hash is length-masked to 32, so the
    # perturbation byte rides the padding (distinct dispatches, exact keys)
    slots_np = np.zeros((total_slots, 36), np.uint8)
    slots_np[:, :32] = np.frombuffer(
        b"".join(slots_flat), np.uint8).reshape(total_slots, 32)

    a_args = [jnp.asarray(x) for x in ap.astuple() + ap.pool()]
    s_args = [jnp.asarray(x) for x in sp.astuple() + sp.pool()]
    d_slots = jnp.asarray(slots_np)
    d_sa = jnp.asarray(np.asarray(slot_accounts, np.int32))

    def core(ctr):
        pert = ctr.astype(jnp.uint8)
        a_n = a_args[0].at[:, :, -1].set(pert)
        a_pn = a_args[6].at[:, -1].set(pert)
        s_n = s_args[0].at[:, :, -1].set(pert)
        s_pn = s_args[6].at[:, -1].set(pert)
        sl = d_slots.at[:, -1].set(pert)
        return _storage_core_grouped(
            a_n, *a_args[1:6], a_pn, *a_args[7:9],
            s_n, *s_args[1:3], s_pn, *s_args[7:9], sl, d_sa)

    a_st, acct, s_st, s_v, s_vl = core(jnp.asarray(np.int32(7)))
    ok = bool((np.asarray(a_st) == mpt.FOUND).all())
    ok = ok and bool((np.asarray(s_st) == mpt.FOUND).all())
    # spot-check one slot value end-to-end
    want = rlp.encode_int((0 << 20) + 0 + 1)
    got = bytes(np.asarray(s_v)[0, :int(np.asarray(s_vl)[0])])
    ok = ok and got == want

    K = 8

    @jax.jit
    def step(ctr):
        def body(_, carry):
            ctr, acc_a, acc_s, accv = carry
            ctr = ctr + 1
            a_st, acct, s_st, s_v, s_vl = core(ctr)
            accv = (accv ^ jnp.sum(s_v.astype(jnp.int32), axis=1)
                    ^ (s_vl << 8))
            # account-level outputs stay live too (storage_root feeds the
            # slot walks already; fold balance/nonce so decode is whole)
            acc_a = (acc_a + a_st
                     + jnp.sum(acct["balance"].astype(jnp.int32), axis=1))
            return ctr, acc_a, acc_s + s_st, accv
        z = jnp.zeros((total_slots,), jnp.int32)
        za = jnp.zeros((n_accounts,), jnp.int32)
        return jax.lax.fori_loop(0, K, body, (ctr, za, z, z))

    ctr, acc_a, acc_s, accv = step(
        jnp.asarray(np.int32(secrets.randbelow(1 << 20))))
    jax.block_until_ready((acc_s, accv))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        ctr, acc_a, acc_s, accv = step(ctr)
        np.asarray(acc_s), np.asarray(accv)  # forced host read
        best = min(best, (time.time() - t0) / K)
    ok = ok and bool((np.asarray(acc_s) == K * mpt.FOUND).all())
    return {
        "_ok": ok,
        "grouped_accounts": n_accounts,
        "grouped_slots_per_account": slots_per,
        "grouped_slot_proofs": total_slots,
        "grouped_account_depth": int(ap.nodes.shape[1]),
        "grouped_slot_depth": int(sp.nodes.shape[1]),
        "grouped_witness_gen_seconds": round(witness_s, 2),
        "grouped_slots_per_sec": round(total_slots / best, 1),
        "grouped_ms_per_batch": round(best * 1e3, 3),
        "grouped_backend": jax.default_backend(),
    }


def config3_receipt_trie(quick):
    from zk_state_proofs_tpu.witness import synthetic_block
    from zk_state_proofs_tpu.models import verify_block_receipts

    n = 32 if quick else 128
    fx = synthetic_block(num_txs=n, seed=3)
    t0 = time.time()
    res, transfers = verify_block_receipts(fx["block"], fx["receipts"])
    dt = time.time() - t0
    ok = res.all_found
    extras = {}
    try:
        extras = _erc20_extract_sweep(quick)
        ok = ok and extras.pop("_ok")
    except Exception as e:
        print(f"erc20 extraction sweep failed: {e!r}", file=sys.stderr)
        ok = False
    _emit("full_receipt_trie", ok=ok, receipts=n, erc20_transfers=len(transfers),
          seconds=round(dt, 3), **extras)
    return ok


def _erc20_extract_sweep(quick):
    """Host cost of structured ERC20 log extraction at a 100%-CANDIDATE
    sweep shape (VERDICT r4 weak #6: mainnet reality is Transfer-heavy —
    every receipt here carries 1-3 Transfer logs). Compares the r5
    vectorized breadth-first parser (models.blocks) against the full
    per-receipt host RLP decode it replaced; results are asserted equal."""
    import random

    from zk_state_proofs_tpu.models.blocks import extract_erc20_transfers
    from zk_state_proofs_tpu.ops import mpt
    from zk_state_proofs_tpu.witness.encoding import encode_receipt
    from zk_state_proofs_tpu.witness.fixtures import ERC20_TRANSFER_TOPIC

    rows = 512 if quick else 4096
    rng = random.Random(17)
    topic = ERC20_TRANSFER_TOPIC

    def word():
        return "0x" + bytes(rng.randrange(256) for _ in range(32)).hex()

    receipts = []
    for i in range(rows):
        logs = [{"address": "0x" + bytes(rng.randrange(256)
                                         for _ in range(20)).hex(),
                 "topics": [topic, word(), word()],
                 "data": word()}
                for _ in range(rng.randrange(1, 4))]
        receipts.append({"type": "0x2", "status": "0x1",
                         "cumulativeGasUsed": hex(30000 * (i + 1)),
                         "logs": logs})
    values = [encode_receipt(r) for r in receipts]
    nmax = max(len(v) for v in values)
    arr = np.zeros((rows, nmax), np.uint8)
    lens = np.zeros(rows, np.int32)
    for i, v in enumerate(values):
        arr[i, :len(v)] = np.frombuffer(v, np.uint8)
        lens[i] = len(v)
    status = np.full(rows, mpt.FOUND, np.int32)

    vec_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        got = extract_erc20_transfers(arr, lens, status,
                                      engine="vectorized")
        vec_s = min(vec_s, time.time() - t0)

    host_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        ref = extract_erc20_transfers(arr, lens, status, engine="host")
        host_s = min(host_s, time.time() - t0)
    ok = len(got) == len(ref) == sum(len(r["logs"]) for r in receipts)
    ok = ok and all(
        (g.token, g.sender, g.receiver, g.amount, g.tx_index) ==
        (w.token, w.sender, w.receiver, w.amount, w.tx_index)
        for g, w in zip(got, ref))
    return {
        "_ok": ok,
        "erc20_sweep_receipts": rows,
        "erc20_sweep_transfers": len(got),
        "erc20_vectorized_receipts_per_sec": round(rows / vec_s, 1),
        "erc20_host_decode_receipts_per_sec": round(rows / host_s, 1),
        "erc20_vectorized_speedup": round(host_s / vec_s, 2),
    }


def config4_mixed_batch(quick):
    from zk_state_proofs_tpu.oracle import EthTrie, keccak256, rlp
    from zk_state_proofs_tpu.ops import mpt
    from zk_state_proofs_tpu.witness import pack_proofs, synthetic_block
    from zk_state_proofs_tpu.witness.builders import get_transaction_proof_input

    total = 512 if quick else 4096
    third = total // 3
    # account proofs
    t = EthTrie()
    for i in range(256):
        t.insert(keccak256(b"a%d" % i),
                 rlp.encode([b"\x01", b"\x02", keccak256(b"s"), keccak256(b"c")]))
    root = t.root_hash()
    entries = []
    for i in range(third):
        k = keccak256(b"a%d" % (i % 256))
        entries.append((root, t.get_proof(k), k))
    # storage proofs
    st = EthTrie()
    for i in range(256):
        st.insert(keccak256(keccak256(b"slot%d" % i)), rlp.encode_int(i + 1))
    sroot = st.root_hash()
    for i in range(third):
        k = keccak256(keccak256(b"slot%d" % (i % 256)))
        entries.append((sroot, st.get_proof(k), k))
    # tx proofs
    fx = synthetic_block(num_txs=32, seed=4)
    tx_inputs = [get_transaction_proof_input(fx["block"], i) for i in range(32)]
    while len(entries) < total:
        inp = tx_inputs[len(entries) % 32]
        entries.append(inp.as_entry())
    # +4 bytes of bucket padding so the perturbation byte below always lands
    # beyond every node's real bytes
    max_node = max(len(n) for _, p, _ in entries for n in p)
    packed = pack_proofs(entries, node_len=max_node + 4)
    args = packed.astuple()
    pargs = packed.pool()
    status = np.asarray(mpt.verify_proofs_pooled(*args, *pargs)[0])
    ok = (status == mpt.FOUND).all()

    # throughput: in-graph iterations on genuinely distinct inputs (the
    # remote runtime caches duplicate dispatches; per-dispatch timing
    # measures the tunnel) — same methodology as bench.py
    import jax
    import jax.numpy as jnp

    import secrets

    jargs = [jnp.asarray(a) for a in args]
    jpargs = [jnp.asarray(a) for a in pargs]
    K = 8
    salt = secrets.randbelow(1 << 20)  # unique dispatches across reruns

    @jax.jit
    def step(ctr):
        def body(_, carry):
            ctr, acc, accv = carry
            ctr = ctr + 1
            pn = jargs[0].at[:, :, -1].set(ctr.astype(jnp.uint8))
            pp = jpargs[0].at[:, -1].set(ctr.astype(jnp.uint8))
            s, v, l = mpt.verify_proofs_pooled(pn, *jargs[1:], pp,
                                               *jpargs[1:])
            # extraction honesty (CLAUDE.md r4): fold values + lengths
            # into a live accumulator so XLA cannot dead-code-eliminate
            # the extraction stage from the measured loop
            accv = accv ^ jnp.sum(v.astype(jnp.int32), axis=1) ^ (l << 8)
            return ctr, acc + s, accv
        return jax.lax.fori_loop(
            0, K, body, (ctr, jnp.zeros((total,), jnp.int32),
                         jnp.zeros((total,), jnp.int32)))

    ctr, acc, accv = step(jnp.asarray(np.int32(salt)))
    jax.block_until_ready((acc, accv))
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ctr, acc, accv = step(ctr)
    np.asarray(acc), np.asarray(accv)  # forced host read (relay-safe)
    dt = (time.time() - t0) / (reps * K)
    ok = ok and (np.asarray(acc) == K * mpt.FOUND).all()
    _emit("mixed_batch_4096", ok=bool(ok), batch=total,
          proofs_per_sec=round(total / dt, 1), seconds=round(dt, 4))
    return ok


def config5_sweep_with_root_reduction(quick):
    """BASELINE config 5 at honest scale: 1,048,576 DISTINCT-COMPOSITION
    proofs streamed end-to-end — oracle witness generation up front, then
    per-batch C++ packing + pooling overlapped with device verification
    (sweep_entries). The reported rate INCLUDES packing and host->device
    transfer; every batch is a distinct random sample of the trie's
    accounts, so no dispatch can be served from the relay's duplicate
    cache. quick: 65,536 proofs over an 8,192-account trie."""
    import jax

    from zk_state_proofs_tpu import native
    from zk_state_proofs_tpu.models import sweep_entries
    from zk_state_proofs_tpu.oracle import EthTrie, rlp
    from zk_state_proofs_tpu.parallel import compute_root_sharded, make_mesh
    from zk_state_proofs_tpu.witness import synthetic_block
    from zk_state_proofs_tpu.witness.encoding import encode_receipt
    from zk_state_proofs_tpu.witness.trie_plan import plan_index_trie

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    n_accounts = 8192 if quick else 65536
    batch = 4096
    nbatches = 16 if quick else 256

    # witness generation (reported separately): account trie + all proofs
    t0 = time.time()
    nk = native.keccak256
    trie = EthTrie(hasher=nk)
    keys = [nk(b"sweep-acct-%d" % i) for i in range(n_accounts)]
    for i, k in enumerate(keys):
        trie.insert(k, rlp.encode([
            rlp.int_to_min_bytes(i + 1), rlp.int_to_min_bytes(10**18 + i),
            nk(b"sr%d" % i), nk(b"ch%d" % i)]))
    root = trie.root_hash()
    proofs = [trie.get_proof(k) for k in keys]
    witness_s = time.time() - t0
    max_nodes = max(len(p) for p in proofs)

    import secrets

    # measured sweeps are salted per process (distinct dispatch contents on
    # every rerun — the relay content-caches duplicate dispatches); the
    # PROBE stays on a fixed seed so the pool-row bucket (a jit shape) is
    # stable across runs and hits the persistent compile cache
    rng = np.random.default_rng(secrets.randbits(64))
    probe_rng = np.random.default_rng(5)

    def batches(n, r=None):
        r = rng if r is None else r
        order, pos = r.permutation(n_accounts), 0
        for _ in range(n):
            if pos + batch > n_accounts:
                order, pos = r.permutation(n_accounts), 0
            idx = order[pos:pos + batch]
            pos += batch
            yield [(root, proofs[i], keys[i]) for i in idx]

    # probe one batch for the fixed pool-row bucket (stable jit shape)
    from zk_state_proofs_tpu.witness import pack_proofs

    probe = pack_proofs(next(batches(1, probe_rng)), max_nodes=max_nodes,
                        node_len=576)
    probe_rows = probe.pool()[0].shape[0]
    pool_rows = -(-int(probe_rows * 1.125) // 128) * 128
    dedup_ratio = float(probe.num_nodes.sum()) / max(
        float((probe.pool()[1] > 0).sum()), 1.0)

    kw = dict(max_nodes=max_nodes, node_len=576, pool_rows=pool_rows,
              mesh=mesh)
    sweep_entries(batches(1), **kw)  # compile
    fresh = sweep_entries(batches(nbatches), **kw)

    # DEVICE-RESIDENT mode (the headline): pack the whole witness set once,
    # keep pool + per-proof tables on device, stream only row indices
    # (~16 KB/batch vs ~23 MB/batch — the relay link is the fresh-stream
    # bottleneck at ~64 MB/s)
    from zk_state_proofs_tpu.models import sweep_resident

    # depth-sorted global order: the epoch sweep's contiguous windows then
    # hit the walk kernel's per-tile early exit (most tiles stop at their
    # own depth, not the global max)
    order_by_depth = sorted(range(n_accounts), key=lambda i: -len(proofs[i]))
    gp = pack_proofs([(root, proofs[i], keys[i]) for i in order_by_depth],
                     max_nodes=max_nodes, node_len=576)

    def index_batches(n):
        order, pos = rng.permutation(n_accounts), 0
        for _ in range(n):
            if pos + batch > n_accounts:
                order, pos = rng.permutation(n_accounts), 0
            yield order[pos:pos + batch].astype(np.int32)
            pos += batch

    # HEADLINE: zero-gather epoch sweep — the whole 1M-proof sweep as ONE
    # dispatch over contiguous windows of the materialized resident tables,
    # each epoch made distinct work by an in-graph padding-byte counter
    from zk_state_proofs_tpu.models import sweep_resident_epochs

    epochs = nbatches * batch // n_accounts
    # on a multi-device mesh the epoch sweep itself shards: tables
    # row-sharded, per-shard contiguous windows, counts psum'ed
    # (BASELINE config 5's "sharded across a pod slice" shape); dp=1 on
    # the single real chip is the unsharded path, unchanged
    ep_mesh = mesh if (mesh is not None
                       and n_accounts % mesh.devices.size == 0
                       and batch % mesh.devices.size == 0) else None
    # warm with the SAME static epochs (a different count is a different
    # program; compiling inside the measured call costs seconds), and a
    # different salt so the measured dispatch is distinct work
    sweep_resident_epochs(gp, epochs=epochs, batch=batch,
                          max_steps=max_nodes, mesh=ep_mesh,
                          salt=1000 + secrets.randbelow(1000))
    res_ep = sweep_resident_epochs(gp, epochs=epochs, batch=batch,
                                   max_steps=max_nodes, mesh=ep_mesh,
                                   salt=secrets.randbelow(1000))
    # FUSED permuted-access mode (random row access per batch, one
    # dispatch): per-dispatch relay overhead (~20 ms dispatch+sync here)
    # otherwise dominates the ~1 ms/batch device time
    sweep_resident(gp, index_batches(nbatches), max_steps=max_nodes,
                   fused=True)  # compile (distinct indices, real sweep)
    res_fused = sweep_resident(gp, index_batches(nbatches),
                               max_steps=max_nodes, fused=True)
    # per-dispatch streamed-index mode, reported for the overhead breakdown
    sweep_resident(gp, index_batches(1), max_steps=max_nodes)  # warm trace
    res = sweep_resident(gp, index_batches(nbatches), max_steps=max_nodes)
    # collective trie-root reduction over a synthetic block's receipts
    fx = synthetic_block(num_txs=64 if quick else 256, seed=5)
    values = [encode_receipt(r) for r in fx["receipts"]]
    plan = plan_index_trie(values)
    if mesh is not None:
        rroot, _ = compute_root_sharded(mesh, plan)
    else:
        from zk_state_proofs_tpu.ops.trie_build import compute_root

        rroot, _ = compute_root(plan)
    rroot_ok = "0x" + bytes(rroot).hex() == fx["block"]["receiptsRoot"]
    ok = (res_ep.found == res_ep.total and res_fused.found == res_fused.total
          and res.found == res.total and fresh.found == fresh.total
          and rroot_ok)
    _emit("sweep_with_root_reduction", ok=bool(ok), proofs=res_ep.total,
          proofs_per_sec=round(res_ep.proofs_per_sec, 1),
          seconds=round(res_ep.seconds, 2),
          witness_gen_seconds=round(witness_s, 2),
          resident_pack_upload_seconds=round(res_ep.pack_seconds, 2),
          random_access_proofs_per_sec=round(res_fused.proofs_per_sec, 1),
          stream_proofs_per_sec=round(res.proofs_per_sec, 1),
          stream_dispatch_seconds=round(res.dispatch_seconds, 2),
          fresh_stream_proofs_per_sec=round(fresh.proofs_per_sec, 1),
          fresh_pack_seconds=round(fresh.pack_seconds, 2),
          fresh_dispatch_seconds=round(fresh.dispatch_seconds, 2),
          batches=res_ep.batches, accounts=n_accounts,
          pool_rows=pool_rows, dedup_ratio=round(dedup_ratio, 2),
          root_ok=bool(rroot_ok),
          devices=(ep_mesh.devices.size if ep_mesh is not None else 1))
    return ok


def config6_distinct_1m(quick):
    """1,048,576 FULLY DISTINCT account proofs (one per account of a
    2^20-account trie), verified in a single-epoch resident sweep — the
    gold-standard honesty check on config 5's epoch formulation (which
    re-verifies a 65,536-account set 16x with distinct perturbations).
    quick: 2^17 accounts."""
    import secrets

    from zk_state_proofs_tpu import native
    from zk_state_proofs_tpu.models import sweep_resident_epochs
    from zk_state_proofs_tpu.oracle import EthTrie, rlp
    from zk_state_proofs_tpu.witness import pack_proofs

    n = (1 << 17) if quick else (1 << 20)
    t0 = time.time()
    nk = native.keccak256
    trie = EthTrie(hasher=nk)
    keys = [nk(b"m-acct-%d" % i) for i in range(n)]
    for i, k in enumerate(keys):
        trie.insert(k, rlp.encode([
            rlp.int_to_min_bytes(i + 1), rlp.int_to_min_bytes(10**18 + i),
            nk(b"sr%d" % i), nk(b"ch%d" % i)]))
    root = trie.root_hash()
    proofs = [trie.get_proof(k) for k in keys]
    witness_s = time.time() - t0
    max_nodes = max(len(p) for p in proofs)

    t0 = time.time()
    order = sorted(range(n), key=lambda i: -len(proofs[i]))  # tile early exit
    gp = pack_proofs([(root, proofs[i], keys[i]) for i in order],
                     max_nodes=max_nodes, node_len=576)
    gp.pool()
    pack_s = time.time() - t0

    batch = 4096
    sweep_resident_epochs(gp, epochs=1, batch=batch, max_steps=max_nodes,
                          salt=(1 << 20) + secrets.randbelow(1 << 10))
    res = sweep_resident_epochs(gp, epochs=1, batch=batch,
                                max_steps=max_nodes,
                                salt=secrets.randbelow(1 << 20))
    ok = res.found == res.total
    _emit("distinct_1m_resident", ok=bool(ok), proofs=res.total,
          proofs_per_sec=round(res.proofs_per_sec, 1),
          seconds=round(res.seconds, 3),
          witness_gen_seconds=round(witness_s, 1),
          host_pack_seconds=round(pack_s, 1),
          device_pack_upload_seconds=round(res.pack_seconds, 1),
          accounts=n, max_depth=max_nodes, batches=res.batches)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    args = ap.parse_args()
    fns = {
        "1": config1_single_tx,
        "2": config2_account_storage,
        "3": config3_receipt_trie,
        "4": config4_mixed_batch,
        "5": config5_sweep_with_root_reduction,
        "6": config6_distinct_1m,
    }
    ok = True
    for c in args.configs.split(","):
        ok &= bool(fns[c](args.quick))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
