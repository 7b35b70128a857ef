"""JSON (de)serialisation of PrivateKey / PublicKey.

Wire-compatible with the reference's serde impls
(/root/reference/src/serde.rs:10-56), which serialise both types as JSON
sequences of byte values:
  * PrivateKey  -> [b0, ..., b31]      (32 canonical BE bytes)
  * PublicKey   -> [b0, ..., b64]      (65 compressed bytes)
"""

from __future__ import annotations

import json

from .types import PrivateKey, PublicKey


def private_key_to_json(key: PrivateKey) -> str:
    return json.dumps(list(key.to_bytes()))


def private_key_from_json(data: str) -> PrivateKey:
    return PrivateKey.from_bytes(bytes(json.loads(data)))


def public_key_to_json(key: PublicKey) -> str:
    return json.dumps(list(key.to_compressed()))


def public_key_from_json(data: str) -> PublicKey:
    return PublicKey.from_compressed(bytes(json.loads(data)))
