"""Block-level tx/receipt verification + ERC20 extraction on synthetic blocks."""

import numpy as np

from zk_state_proofs_tpu.ops import mpt
from zk_state_proofs_tpu.models import (
    verify_block_receipts,
    verify_block_transactions,
)
from zk_state_proofs_tpu.witness import encode_transaction, synthetic_block


def test_verify_block_transactions():
    fx = synthetic_block(num_txs=20, seed=11)
    block = fx["block"]
    res = verify_block_transactions(block)
    assert res.all_found
    for i in range(20):
        assert res.value(i) == encode_transaction(block["transactions"][i])


def test_verify_block_receipts_with_erc20():
    fx = synthetic_block(num_txs=24, seed=12)
    res, transfers = verify_block_receipts(fx["block"], fx["receipts"])
    assert res.all_found
    # the generator plants Transfer logs with probability .6 — some must appear
    assert len(transfers) >= 3
    for t in transfers:
        assert len(t.token) == 20 and len(t.sender) == 20 and len(t.receiver) == 20
        assert t.amount >= 0
    # cross-check against the raw receipt fixture
    from zk_state_proofs_tpu.witness.fixtures import ERC20_TRANSFER_TOPIC
    want = sum(
        1
        for r in fx["receipts"]
        for l in r["logs"]
        if l["topics"] and l["topics"][0] == ERC20_TRANSFER_TOPIC and len(l["topics"]) == 3
    )
    assert len(transfers) == want


def test_subset_indices():
    fx = synthetic_block(num_txs=16, seed=13)
    res = verify_block_transactions(fx["block"], indices=[3, 9])
    assert res.status.shape == (2,)
    assert res.all_found
    assert res.value(1) == encode_transaction(fx["block"]["transactions"][9])
