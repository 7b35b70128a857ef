"""Key/signature type tests — ports of /root/reference/src/types_test.rs."""

import pytest

from bn254_tpu import (
    InvalidLengthError,
    PrivateKey,
    PublicKey,
    PublicKeyG1,
    Signature,
)
from bn254_tpu.host import curve as C


def test_valid_private_key():
    """types_test.rs:15-21."""
    raw = bytes.fromhex(
        "023aed31b5a9e486366ea9988b05dba469c6206e58361d9c065bbea7d928204a"
    )
    assert PrivateKey.from_bytes(raw).to_bytes() == raw


def test_valid_private_key_hex():
    """types_test.rs:23-27."""
    h = "023aed31b5a9e486366ea9988b05dba469c6206e58361d9c065bbea7d928204a"
    assert PrivateKey.from_hex(h).to_hex() == h


def test_invalid_private_key_too_long():
    """types_test.rs:30-39."""
    with pytest.raises(InvalidLengthError):
        PrivateKey.from_bytes(b"\xaa" * 51)


def test_invalid_private_key_too_short():
    """types_test.rs:41-46."""
    with pytest.raises(InvalidLengthError):
        PrivateKey.from_bytes(b"\xaa" * 2)


def test_compressed_public_key_roundtrip():
    """types_test.rs:49-55."""
    compressed = bytes.fromhex(
        "0a023aed31b5a9e486366ea9988b05dba469c6206e58361d9c065bbea7d928204a"
        "761efc6e4fa08ed227650134b52c7f7dd0463963e8a4bf21f4899fe5da7f984a"
    )
    pk = PublicKey.from_compressed(compressed)
    assert pk.to_compressed() == compressed


def test_uncompressed_public_key_roundtrip():
    """types_test.rs:58-69."""
    uncompressed = bytes.fromhex(
        "28fe26becbdc0384aa67bf734d08ec78ecc2330f0aa02ad9da00f56c37907f78"
        "2cd080d897822a95a0fb103c54f06e9bf445f82f10fe37efce69ecb59514abc8"
        "237faeb0351a693a45d5d54aa9759f52a71d76edae2132616d6085a9b2228bf9"
        "0f46bd1ef47552c3089604c65a3e7154e3976410be01149b60d5a41a6053e6c2"
    )
    pk = PublicKey.from_uncompressed(uncompressed)
    assert pk.to_uncompressed() == uncompressed


# types_test.rs:72-129 — four sk -> G2 public-key derivation vectors
DERIVATION_VECTORS = [
    (
        "1ab1126ff2e37c6e6eddea943ccb3a48f83b380b856424ee552e113595525565",
        "28fe26becbdc0384aa67bf734d08ec78ecc2330f0aa02ad9da00f56c37907f78"
        "2cd080d897822a95a0fb103c54f06e9bf445f82f10fe37efce69ecb59514abc8"
        "237faeb0351a693a45d5d54aa9759f52a71d76edae2132616d6085a9b2228bf9"
        "0f46bd1ef47552c3089604c65a3e7154e3976410be01149b60d5a41a6053e6c2",
    ),
    (
        "2009da7287c158b126123c113d1c85241b6e3294dd75c643588630a8bc0f934c",
        "1cd5df38ed2f184b9830bfd3c2175d53c1455352307ead8cbd7c6201202f4aa8"
        "02ce1c4241143cc61d82589c9439c6dd60f81fa6f029625d58bc0f2e25e4ce89"
        "0ba19ae3b5a298b398b3b9d410c7e48c4c8c63a1d6b95b098289fbe1503d00fb"
        "2ec596e93402de0abc73ce741f37ed4984a0b59c96e20df8c9ea1c4e6ec04556",
    ),
    (
        "26fb4d661491b0a623637a2c611e34b6641cdea1743bee94c17b67e5ef14a550",
        "077dfcf14e940b69bf88fa1ad99b6c7e1a1d6d2cb8813ac53383bf505a17f8ff"
        "2d1a9b04a2c5674373353b5a25591292e69c37c0b84d9ef1c780a57bb98638e6"
        "2dc52f109b333c4125bccf55bc3a839ce57676514405656c79e577e231519273"
        "2410eee842807d9325f22d087fa6bc79d9bbea07f5fa8c345e1e57b28ad54f84",
    ),
    (
        "0f6b8785374476a3b3e4bde2c64dfb12964c81c7930d32367c8e318609387872",
        "270567a05b56b02e813281d554f46ce0c1b742b622652ef5a41d69afb6eb8338"
        "1bab5671c5107de67fe06007dde240a84674c8ff13eeac6d64bad0caf2cfe53e"
        "0142f4e04fc1402e17ae7e624fd9bd15f1eae0a1d8eda4e26ab70fd4cd793338"
        "02b54a5deaaf86dc7f03d080c8373d62f03b3be06dac42b2d9426a8ebd0caf4a",
    ),
]


@pytest.mark.parametrize("sk_hex,pk_hex", DERIVATION_VECTORS)
def test_public_key_derivation(sk_hex, pk_hex):
    sk = PrivateKey.from_hex(sk_hex)
    pk = PublicKey.from_private_key(sk)
    assert pk == PublicKey.from_uncompressed(bytes.fromhex(pk_hex))
    assert pk.to_uncompressed().hex() == pk_hex


def test_aggregate_public_keys():
    """types_test.rs:133-144 — G2::one + G2::one compressed output."""
    agg = PublicKey(C.G2_ONE) + PublicKey(C.G2_ONE)
    assert agg.to_compressed().hex() == (
        "0b061848379c6bccd9e821e63ff6932738835b78e1e10079a0866073eba5b8bb44"
        "4afbb053d16542e2b839477434966e5a9099093b6b3351f84ac19fe28f096548"
    )


def test_aggregate_signatures():
    """types_test.rs:147-159 — G1::one + G1::one compressed output."""
    agg = Signature(C.G1_ONE) + Signature(C.G1_ONE)
    assert agg.to_compressed().hex() == (
        "02030644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd3"
    )


def test_sub_and_neg():
    pk1 = PublicKey(C.G2_ONE)
    pk2 = PublicKey(C.g2_mul(C.G2_ONE, 5))
    assert (pk2 - pk1) == PublicKey(C.g2_mul(C.G2_ONE, 4))
    assert (-pk1) + pk1 + pk1 == pk1
    s1 = Signature(C.G1_ONE)
    s3 = Signature(C.g1_mul(C.G1_ONE, 3))
    assert (s3 - s1) == Signature(C.g1_mul(C.G1_ONE, 2))
    g1pk = PublicKeyG1(C.G1_ONE)
    assert (-g1pk) + g1pk + g1pk == g1pk


def test_public_key_g1_roundtrips():
    sk = PrivateKey.from_hex(DERIVATION_VECTORS[0][0])
    pk1 = PublicKeyG1.from_private_key(sk)
    assert PublicKeyG1.from_compressed(pk1.to_compressed()) == pk1
    assert PublicKeyG1.from_uncompressed(pk1.to_uncompressed()) == pk1


def test_signature_compressed_roundtrip():
    sig_hex = "020f047a153e94b5f109e4013d1bd078112817cf0d58cdf6ba8891f9849852ba5b"
    sig = Signature.from_compressed(bytes.fromhex(sig_hex))
    assert sig.to_compressed().hex() == sig_hex
    assert Signature.from_uncompressed(sig.to_uncompressed()) == sig
