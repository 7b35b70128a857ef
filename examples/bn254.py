#!/usr/bin/env python
"""Two-key aggregate signature walk-through.

Mirrors the reference's example (/root/reference/examples/bn254.rs:1-35,
identical to its README example): derive two keypairs from fixed hex
secrets, sign the same message with both, aggregate signatures and public
keys with `+`, and verify the aggregate pair.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bn254_tpu import ECDSA, PrivateKey, PublicKey  # noqa: E402


def main() -> None:
    # Fixed secret keys (examples/bn254.rs:7-12)
    private_key_1 = PrivateKey.from_hex(
        "c9afa9d845ba75166b5c215767b1d6934e50c3db36e89b127b8a622b120f6721"
    )
    private_key_2 = PrivateKey.from_hex(
        "2009da7287c158b126123c113d1c85241b6e3294dd75c643588630a8bc0f934c"
    )

    # Public keys in G2
    public_key_1 = PublicKey.from_private_key(private_key_1)
    public_key_2 = PublicKey.from_private_key(private_key_2)

    message = b"sample"

    # Sign with both keys
    signature_1 = ECDSA.sign(message, private_key_1)
    signature_2 = ECDSA.sign(message, private_key_2)

    # Aggregate by group addition
    aggregate_public_key = public_key_1 + public_key_2
    aggregate_signature = signature_1 + signature_2

    # Verify the aggregate signature under the aggregate key
    ECDSA.verify(message, aggregate_signature, aggregate_public_key)
    print("Aggregate signature verified!")
    print("  agg sig:", aggregate_signature.to_compressed().hex())
    print("  agg pk :", aggregate_public_key.to_compressed().hex())


if __name__ == "__main__":
    main()
