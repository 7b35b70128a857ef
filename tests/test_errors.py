"""Error-taxonomy wiring tests (VERDICT round 2, missing #5).

The reference raises these through `utils.rs:92` (get_bit ->
IndexOutOfBounds), `error.rs:37` (CurveError::ToAffineConversion), and
`error.rs:64-74` (serde/borsh byte-stream failures -> SerializationError).
Round 2 declared the variants without a raising code path; these tests pin
the now-wired analogous failure points.
"""

import pytest

from bn254_tpu import (
    IndexOutOfBoundsError,
    SerializationError,
    ToAffineConversionError,
)
from bn254_tpu.codec import points as PC
from bn254_tpu.host import curve as HC
from bn254_tpu.protocol import serde
from bn254_tpu.utils import convert as CV


def test_get_bit_out_of_bounds():
    assert PC.u256_get_bit(2, 1) is True
    assert PC.u256_get_bit(2, 0) is False
    with pytest.raises(IndexOutOfBoundsError):
        PC.u256_get_bit(2, 256)
    with pytest.raises(IndexOutOfBoundsError):
        PC.u256_get_bit(2, -1)


def test_to_affine_conversion_error_on_identity_batch():
    ident = HC.g1_add(HC.G1_ONE, HC.g1_neg(HC.G1_ONE))  # point at infinity
    with pytest.raises(ToAffineConversionError):
        CV.g1_batch_to_device_affine([HC.G1_ONE, ident])
    ident2 = HC.g2_add(HC.G2_ONE, HC.g2_neg(HC.G2_ONE))
    with pytest.raises(ToAffineConversionError):
        CV.g2_batch_to_device_affine([ident2])


@pytest.mark.parametrize(
    "payload",
    ["not json {", "[1, 2, 999]", '"a string"', "[1, -3]"],
)
def test_serialization_error_on_malformed_json(payload):
    with pytest.raises(SerializationError):
        serde.private_key_from_json(payload)
    with pytest.raises(SerializationError):
        serde.public_key_from_json(payload)
