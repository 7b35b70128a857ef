"""JSON serde tests — port of /root/reference/src/serde_test.rs."""

import json

from bn254_tpu import PrivateKey, PublicKey
from bn254_tpu.protocol import serde


def test_private_key_json_roundtrip():
    sk = PrivateKey.random()
    encoded = serde.private_key_to_json(sk)
    assert isinstance(json.loads(encoded), list)
    assert len(json.loads(encoded)) == 32
    assert serde.private_key_from_json(encoded) == sk


def test_public_key_json_roundtrip():
    pk = PublicKey.from_private_key(PrivateKey.random())
    encoded = serde.public_key_to_json(pk)
    assert len(json.loads(encoded)) == 65
    assert serde.public_key_from_json(encoded) == pk


def test_json_wire_format_is_byte_sequence():
    """The reference serialises as a serde seq of bytes (serde.rs:16-22),
    i.e. a JSON array of integers 0..=255."""
    sk = PrivateKey.from_hex(
        "023aed31b5a9e486366ea9988b05dba469c6206e58361d9c065bbea7d928204a"
    )
    data = json.loads(serde.private_key_to_json(sk))
    assert all(isinstance(b, int) and 0 <= b < 256 for b in data)
    assert bytes(data) == sk.to_bytes()
