"""CLI driver + graft entry contract."""

import json
import sys

import pytest

from zk_state_proofs_tpu.__main__ import main
from zk_state_proofs_tpu.witness import save_fixture, synthetic_block


def test_selftest(capsys):
    rc = main(["selftest", "--txs", "8"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["ok"] is True
    assert out["transactions"]["found"] == 8


def test_verify_tx_and_receipts_from_fixture(tmp_path, capsys):
    fx = synthetic_block(num_txs=10, seed=31)
    path = tmp_path / "block.json"
    save_fixture(path, fx)

    rc = main(["verify-tx", "--fixture", str(path), "--index", "4"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["counts"]["found"] == 1

    rc = main(["verify-receipts", "--fixture", str(path), "--erc20"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["counts"]["found"] == 10
    assert "erc20_transfers" in out


def test_graft_entry():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    import numpy as np

    status = np.asarray(fn(*args)[0])
    assert (status == 1).all()
    g.dryrun_multichip(8)


def test_committed_fixture_verifies(capsys):
    """The in-repo recorded fixture must verify end-to-end via the CLI."""
    rc = main(["verify-tx", "--fixture", "fixtures/synthetic_block_64.json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["counts"]["found"] == 64


def test_diagnose_command(tmp_path, capsys):
    """`diagnose` verifies a block's tx proofs and reports per-proof
    INVALID reason codes; tampering a tx makes the rebuilt trie root
    drift, which diagnose surfaces rather than raising."""
    import json

    fx = synthetic_block(num_txs=8, seed=41)
    path = tmp_path / "block.json"
    save_fixture(path, fx)
    rc = main(["diagnose", "--fixture", str(path), "--kind", "tx"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["failures"] == []
    assert out["counts"]["found"] == 8

    rc = main(["diagnose", "--fixture", str(path), "--kind", "receipts"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["counts"]["found"] == 8


def test_verify_storage_cli_enforces_header_anchor(tmp_path, capsys):
    """verify-storage must (1) verify a getproof fixture end-to-end on
    the device path and (2) refuse a fixture whose full header does not
    hash to its pinned block hash (the offline trust anchor for
    stateRoot — same chain as tests/test_mainnet_getproof.py)."""
    from tests.test_mainnet_getproof import _synthetic_getproof_fixture

    fx, expected_hash = _synthetic_getproof_fixture()
    fx["block"]["hash"] = "0x" + expected_hash.hex()
    path = tmp_path / "usdt_proof.json"
    save_fixture(path, fx)

    rc = main(["verify-storage", "--fixture", str(path)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["account_found"] is True
    assert out["slots"][0]["value"] != "0x"

    # tamper any header field -> anchor mismatch, hard refusal
    fx["block"]["gasUsed"] = "0x1"
    save_fixture(path, fx)
    rc = main(["verify-storage", "--fixture", str(path)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert out["error"] == "header-anchor mismatch"
