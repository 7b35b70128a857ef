"""Hash-to-G1 tests — ports of /root/reference/src/hash_test.rs."""

import pytest

from bn254_tpu.codec import points as PC
from bn254_tpu.constants import LAST_MULTIPLE_OF_P_BELOW_2_256, P
from bn254_tpu.hash.tai import hash_to_g1, hash_to_g1_with_ctr
from bn254_tpu.host import curve as C


def test_hash_to_try_and_increment_1():
    """hash_test.rs:10-18 — ASCII "sample"."""
    point = hash_to_g1(bytes.fromhex("73616d706c65"))
    assert (
        PC.g1_to_compressed(point).hex()
        == "0211e028f08c500889891cc294fe758a60e84495ec1e2d0bce208c9fc67b6486fd"
    )


def test_hash_to_try_and_increment_2():
    """hash_test.rs:21-30 — ASCII "hello"."""
    point = hash_to_g1(bytes.fromhex("68656c6c6f"))
    assert (
        PC.g1_to_compressed(point).hex()
        == "0200b201235f522abbd3863b7496dfa213be0ed1f4c7a22196d8afddec7e64c8ec"
    )


def test_rejection_constant_is_5p():
    """hash_test.rs:34-43 — the rejection bound equals 5·p and 6·p wraps."""
    assert LAST_MULTIPLE_OF_P_BELOW_2_256 == 5 * P
    assert 5 * P < 2**256
    assert 6 * P >= 2**256
    # the reference's U256::mul wraps mod 2^256; 6p mod 2^256 < p
    assert (6 * P) % (2**256) < P


def test_sample_succeeds_at_ctr_0():
    """SURVEY.md §2.3: "sample" finds a valid point at ctr = 0."""
    _, ctr = hash_to_g1_with_ctr(b"sample")
    assert ctr == 0


def test_hash_point_on_curve_and_even_y():
    for msg in [b"sample", b"hello", b"a", b"", b"x" * 100]:
        aff = C.g1_to_affine(hash_to_g1(msg))
        assert C.g1_is_on_curve(aff)
        assert aff[1] % 2 == 0  # 0x02 prefix selects the even root


def test_hash_deterministic():
    assert C.g1_to_affine(hash_to_g1(b"det")) == C.g1_to_affine(hash_to_g1(b"det"))
