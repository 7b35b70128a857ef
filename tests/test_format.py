"""NEAR pairing-check formatter tests (utils.rs:197-239 parity)."""

import pytest

from bn254_tpu import (
    ECDSA,
    InvalidLengthError,
    PrivateKey,
    PublicKey,
    format_pairing_check_uncompressed_values,
    format_pairing_check_values,
)
from bn254_tpu.codec import points as PC
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as C

SK_HEX = "2009da7287c158b126123c113d1c85241b6e3294dd75c643588630a8bc0f934c"
MSG = b"sample"


@pytest.fixture(scope="module")
def signed():
    sk = PrivateKey.from_hex(SK_HEX)
    pk = PublicKey.from_private_key(sk)
    sig = ECDSA.sign(MSG, sk)
    return sk, pk, sig


def test_format_pairing_check_values(signed):
    _, pk, sig = signed
    pairs = format_pairing_check_values(
        MSG, sig.to_compressed(), pk.to_compressed()
    )
    assert len(pairs) == 2
    (h_le, pk_le), (sig_le, ng2_le) = pairs
    assert len(h_le) == 64 and len(sig_le) == 64
    assert len(pk_le) == 128 and len(ng2_le) == 128
    # first pair: (H(m), PK)
    assert h_le == PC.g1_to_borsh_le(hash_to_g1(MSG))
    assert pk_le == PC.g2_to_borsh_le(pk.point)
    # second pair: (sig, -G2::one)
    assert sig_le == PC.g1_to_borsh_le(sig.point)
    assert ng2_le == PC.g2_to_borsh_le(C.g2_neg(C.G2_ONE))


def test_uncompressed_variant_matches_compressed(signed):
    """utils.rs:216-239 — byte-reversing BE limbs must equal the borsh LE
    output of the decompression path."""
    _, pk, sig = signed
    a = format_pairing_check_values(MSG, sig.to_compressed(), pk.to_compressed())
    b = format_pairing_check_uncompressed_values(
        MSG, sig.to_uncompressed(), pk.to_uncompressed()
    )
    assert a == b


def test_borsh_le_is_little_endian(signed):
    """LE limb order proven by the reference reversing 32-byte BE chunks
    (utils.rs:221-227)."""
    _, _, sig = signed
    be = sig.to_uncompressed()
    le = PC.g1_to_borsh_le(sig.point)
    assert le[0:32] == be[0:32][::-1]
    assert le[32:64] == be[32:64][::-1]


def test_uncompressed_variant_length_checks(signed):
    _, pk, sig = signed
    with pytest.raises(InvalidLengthError):
        format_pairing_check_uncompressed_values(MSG, b"\x00" * 10, pk.to_uncompressed())
    with pytest.raises(InvalidLengthError):
        format_pairing_check_uncompressed_values(MSG, sig.to_uncompressed(), b"\x00" * 11)
