"""Protocol (sign/verify/aggregate) tests — ports of /root/reference/src/ecdsa_test.rs."""

import pytest

from bn254_tpu import (
    ECDSA,
    PrivateKey,
    PublicKey,
    PublicKeyG1,
    Signature,
    VerificationFailedError,
    check_public_keys,
)

SK1_HEX = "1ab1126ff2e37c6e6eddea943ccb3a48f83b380b856424ee552e113595525565"
SK2_HEX = "2009da7287c158b126123c113d1c85241b6e3294dd75c643588630a8bc0f934c"
MSG = bytes.fromhex("73616d706c65")  # ASCII "sample"
SIG2_HEX = "020f047a153e94b5f109e4013d1bd078112817cf0d58cdf6ba8891f9849852ba5b"


def test_sign_1():
    """ecdsa_test.rs:6-17."""
    sk = PrivateKey.from_hex(SK2_HEX)
    sig = ECDSA.sign(MSG, sk)
    assert sig.to_compressed().hex() == SIG2_HEX


def test_verify_signed_msg():
    """ecdsa_test.rs:21-38."""
    sk = PrivateKey.from_hex(SK2_HEX)
    pk = PublicKey.from_private_key(sk)
    sig = Signature.from_compressed(bytes.fromhex(SIG2_HEX))
    ECDSA.verify(MSG, sig, pk)  # raises on failure


def test_verify_wrong_key_fails():
    sk1, sk2 = PrivateKey.from_hex(SK1_HEX), PrivateKey.from_hex(SK2_HEX)
    sig = ECDSA.sign(MSG, sk2)
    with pytest.raises(VerificationFailedError):
        ECDSA.verify(MSG, sig, PublicKey.from_private_key(sk1))


def test_verify_wrong_message_fails():
    sk = PrivateKey.from_hex(SK2_HEX)
    sig = ECDSA.sign(MSG, sk)
    with pytest.raises(VerificationFailedError):
        ECDSA.verify(b"other message", sig, PublicKey.from_private_key(sk))


def test_verify_aggregate_signatures():
    """ecdsa_test.rs:42-79."""
    sk1, sk2 = PrivateKey.from_hex(SK1_HEX), PrivateKey.from_hex(SK2_HEX)
    sig1, sig2 = ECDSA.sign(MSG, sk1), ECDSA.sign(MSG, sk2)
    pk1, pk2 = PublicKey.from_private_key(sk1), PublicKey.from_private_key(sk2)

    ECDSA.verify(MSG, sig1, pk1)
    ECDSA.verify(MSG, sig2, pk2)
    ECDSA.verify(MSG, sig1 + sig2, pk1 + pk2)


def test_verify_valid_public_keys_in_g1_g2():
    """ecdsa_test.rs:83-95."""
    sk = PrivateKey.from_hex(SK1_HEX)
    check_public_keys(
        PublicKey.from_private_key(sk), PublicKeyG1.from_private_key(sk)
    )


def test_verify_invalid_public_keys_in_g1_g2():
    """ecdsa_test.rs:99-112."""
    sk1, sk2 = PrivateKey.from_hex(SK1_HEX), PrivateKey.from_hex(SK2_HEX)
    with pytest.raises(VerificationFailedError):
        check_public_keys(
            PublicKey.from_private_key(sk1), PublicKeyG1.from_private_key(sk2)
        )


def test_public_key_g1_from_uncompressed():
    """ecdsa_test.rs:116-131."""
    sk = PrivateKey.from_hex(SK1_HEX)
    pk2 = PublicKey.from_private_key(sk)
    pk1 = PublicKeyG1.from_private_key(sk)
    pk1_again = PublicKeyG1.from_uncompressed(pk1.to_uncompressed())
    check_public_keys(pk2, pk1_again)


def test_sig_from_uncompressed():
    """ecdsa_test.rs:135-154."""
    sk = PrivateKey.from_hex(SK2_HEX)
    pk = PublicKey.from_private_key(sk)
    sig = Signature.from_compressed(bytes.fromhex(SIG2_HEX))
    sig_again = Signature.from_uncompressed(sig.to_uncompressed())
    ECDSA.verify(MSG, sig_again, pk)


def test_example_flow():
    """examples/bn254.rs:3-34 — the README two-key aggregate walk-through."""
    sk1 = PrivateKey.from_hex(
        "c9afa9d845ba75166b5c215767b1d6934e50c3db36e89b127b8a622b120f6721"
    )
    sk2 = PrivateKey.from_hex(
        "a55e93edb1350916bf5beea1b13d8f198ef410033445bcb645b65be5432722f1"
    )
    pk1, pk2 = PublicKey.from_private_key(sk1), PublicKey.from_private_key(sk2)
    message = b"sample"
    sig1, sig2 = ECDSA.sign(message, sk1), ECDSA.sign(message, sk2)
    ECDSA.verify(message, sig1 + sig2, pk1 + pk2)
