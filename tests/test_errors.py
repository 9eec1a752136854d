"""Typed error domains raised at protocol boundaries (round-1 verdict #10).

The reference's two error enums (InnerProductError::MessageLengthInvalid,
/root/reference/inner_products/src/lib.rs:17-38; InnerProductArgumentError::
{MessageLengthInvalid, InnerProductInvalid}, /root/reference/ip_proofs/src/
lib.rs:21-43) map to ripp_tpu.errors.  These tests assert the TYPED error
(not a bare assert) and are device-free: every check fires before any
kernel work, so they run with or without a reachable backend.
"""

import pytest

from ripp_tpu.errors import (
    InnerProductArgumentError,
    InnerProductError,
    check_power_of_two,
    check_same_length,
)
from ripp_tpu.models import gipa
from ripp_tpu.models.commitments import ScalarIP
from ripp_tpu.models.instances import scalar_ipa_config
from ripp_tpu.models.vectors import PlaceholderVec
from ripp_tpu.ops.points import dev_ctx


class _LenOnly:
    """Stands in for a protocol vector where only len() is consulted."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def test_inner_product_length_mismatch():
    ctx = dev_ctx("bls12_toy")
    ip = ScalarIP(ctx)
    with pytest.raises(InnerProductError) as e:
        ip.compute(_LenOnly(4), _LenOnly(8))
    assert "4, 8" in str(e.value)


def test_gipa_prove_length_mismatch():
    ctx = dev_ctx("bls12_toy")
    cfg = scalar_ipa_config(ctx)
    with pytest.raises(InnerProductArgumentError) as e:
        gipa.prove_with_aux(
            cfg, _LenOnly(4), _LenOnly(8), _LenOnly(4), _LenOnly(4),
            PlaceholderVec(1),
        )
    assert "4, 8" in str(e.value)


def test_gipa_prove_not_power_of_two():
    ctx = dev_ctx("bls12_toy")
    cfg = scalar_ipa_config(ctx)
    with pytest.raises(InnerProductArgumentError) as e:
        gipa.prove_with_aux(
            cfg, _LenOnly(3), _LenOnly(3), _LenOnly(3), _LenOnly(3),
            PlaceholderVec(1),
        )
    assert "power of two" in str(e.value)


def test_gipa_verify_length_mismatch():
    ctx = dev_ctx("bls12_toy")
    cfg = scalar_ipa_config(ctx)
    proof = gipa.GIPAProof(steps=[], r_base=(0, 0))
    with pytest.raises(InnerProductArgumentError):
        gipa.verify(cfg, (_LenOnly(4), _LenOnly(8), PlaceholderVec(1)),
                    (None, None, None), proof)


def test_error_helpers_are_valueerrors():
    # both domains inherit ValueError so legacy callers keep working
    assert issubclass(InnerProductError, ValueError)
    assert issubclass(InnerProductArgumentError, ValueError)
    with pytest.raises(InnerProductError):
        check_same_length([1], [1, 2])
    with pytest.raises(InnerProductArgumentError):
        check_power_of_two(0)
