"""CLI (`python -m bn254_tpu`) and mixed-length batch-hash coverage."""

import io
import json
import sys

import numpy as np
import pytest

from bn254_tpu.__main__ import main as cli


SK1 = "c9afa9d845ba75166b5c215767b1d6934e50c3db36e89b127b8a622b120f6721"
SK2 = "a55e93edb1350916bf5beea1b13d8f198ef410033445bcb645b65be5432722f1"


def run_cli(capsys, *argv):
    rc = cli(list(argv))
    return rc, capsys.readouterr().out.strip()


def test_sign_verify_aggregate_flow(capsys):
    rc, pk1 = run_cli(capsys, "pubkey", SK1)
    assert rc == 0
    rc, pk2 = run_cli(capsys, "pubkey", SK2)
    rc, sig1 = run_cli(capsys, "sign", SK1, "sample")
    rc, sig2 = run_cli(capsys, "sign", SK2, "sample")
    rc, agg_sig = run_cli(capsys, "aggregate-sigs", sig1, sig2)
    rc, agg_pk = run_cli(capsys, "aggregate-pks", pk1, pk2)
    rc, out = run_cli(capsys, "verify", agg_pk, agg_sig, "sample")
    assert rc == 0 and out == "ok"
    rc, out = run_cli(capsys, "verify", agg_pk, agg_sig, "tampered")
    assert rc == 1 and out == "FAIL"


def test_hash_to_g1_golden(capsys):
    # reference hash_test.rs:10-30 golden vector for "sample"
    rc, out = run_cli(capsys, "hash-to-g1", "sample")
    assert rc == 0
    assert out == (
        "0211e028f08c500889891cc294fe758a60e84495ec1e2d0bce208c9fc67b6486fd"
    )


def test_hex_msg_flag(capsys):
    rc, a = run_cli(capsys, "sign", SK1, "sample")
    rc, b = run_cli(capsys, "--hex-msg", "sign", SK1, "73616d706c65")
    assert a == b


def test_keygen_roundtrip(capsys):
    rc, out = run_cli(capsys, "keygen")
    sk, pk = out.split()
    rc, pk2 = run_cli(capsys, "pubkey", sk)
    assert pk2 == pk


def test_batch_verify_cli_mixed_lengths(capsys, monkeypatch):
    """Device batch path through the CLI, with UNEQUAL message lengths
    (exercises the length-bucketing in hash_to_g1_device)."""
    msgs = ["alpha", "bee", "gamma-longer-msg", "dz"]
    lines = []
    for i, m in enumerate(msgs):
        sk = SK1 if i % 2 == 0 else SK2
        _, sig = run_cli(capsys, "sign", sk, m)
        _, pk = run_cli(capsys, "pubkey", sk)
        lines.append(json.dumps({"msg": m, "sig": sig, "pk": pk}))
    # tamper the last tuple
    rec = json.loads(lines[-1])
    _, bad_sig = run_cli(capsys, "sign", SK1, "other")
    rec["sig"] = bad_sig
    lines[-1] = json.dumps(rec)

    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines)))
    rc = cli(["batch-verify"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert [line.split()[0] for line in out] == ["ok", "ok", "ok", "FAIL"]


def test_batch_check_public_keys():
    from bn254_tpu import PrivateKey, PublicKey, api
    from bn254_tpu.protocol.types import PublicKeyG1

    sks = [PrivateKey(1000003 + i) for i in range(3)]
    pk2 = [PublicKey.from_private_key(k) for k in sks]
    pk1 = [PublicKeyG1.from_private_key(k) for k in sks]
    pk1[2] = PublicKeyG1.from_private_key(sks[0])  # mismatch
    ok = api.batch_check_public_keys(pk2, pk1)
    assert ok.tolist() == [True, True, False]
