"""Serialization / ChaCha / Fiat-Shamir tests."""

from ripp_tpu.host.curves import bls12_381
from ripp_tpu.utils.chacha import ChaChaRng, chacha20_block
from ripp_tpu.utils.fiat_shamir import (
    FiatShamirRng,
    SeededRng,
    challenge_field,
    challenge_u128,
    blake2b_digest,
    rand_field,
    rand_sw_point,
)
from ripp_tpu.utils.serialize import (
    CurveSerializer,
    deser_field,
    deser_group_uncompressed,
    ser_field,
    ser_group_uncompressed,
)


def test_chacha20_djb_vector():
    # Original djb ChaCha20 test vector: all-zero key, counter 0, nonce 0.
    ks = chacha20_block([0] * 8, 0, [0, 0])
    byts = b"".join(w.to_bytes(4, "little") for w in ks)
    assert byts[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"
    assert byts[16:32].hex() == "bdd219b8a08ded1aa836efcc8b770dc7"


def test_chacha_rng_stream_consistency():
    r1 = ChaChaRng(b"\x01" * 32)
    r2 = ChaChaRng(b"\x01" * 32)
    a = [r1.next_u32() for _ in range(20)]
    lo, hi = a[0], a[1]
    assert r2.next_u64() == lo | (hi << 32)


def test_fiat_shamir_rng_deterministic():
    r1 = FiatShamirRng(b"falafel")
    r2 = FiatShamirRng(b"falafel")
    assert r1.next_u128() == r2.next_u128()
    r1.absorb(b"material")
    r2.absorb(b"material")
    assert r1.next_u64() == r2.next_u64()
    r1.absorb(b"x")
    r2.absorb(b"y")
    assert r1.next_u64() != r2.next_u64()


def test_challenge_loops():
    r_mod = bls12_381().r
    mat = lambda counter: counter.to_bytes(8, "big") + b"hello"
    c, cinv, _ = challenge_u128(blake2b_digest, mat, r_mod)
    assert (c * cinv) % r_mod == 1
    f = challenge_field(blake2b_digest, mat, r_mod)
    assert 0 <= f < r_mod


def test_field_serialization_roundtrip():
    c = bls12_381()
    rng = SeededRng(2)
    for F in (c.tower.fp, c.tower.fp2, c.tower.fp12, c.fr):
        a = F.fromlist([rand_field(rng, F.p) for _ in range(F.degree)])
        b = ser_field(F, a)
        assert len(b) == F.degree * ((F.p.bit_length() + 7) // 8)
        assert F.eq(deser_field(F, b), a)


def test_group_serialization_roundtrip():
    c = bls12_381()
    rng = SeededRng(6)
    s = CurveSerializer(c)
    for curve, ser in ((c.g1, s.g1), (c.g2, s.g2)):
        P = rand_sw_point(rng, curve)
        data = ser(P)
        F = curve.F
        back = deser_group_uncompressed(F, curve, data)
        assert curve.eq(back, P)
        # infinity encodes/decodes
        inf_data = ser(None)
        assert deser_group_uncompressed(F, curve, inf_data) is None
    # fr serialization is 32 bytes
    assert len(s.fr(123)) == 32
    # gt serialization is 12 * 48 bytes
    from ripp_tpu.host.pairing import pairing
    e = pairing(c, c.g1_gen, c.g2_gen)
    assert len(s.gt(e)) == 12 * 48


def test_field_from_random_bytes_ark_semantics():
    """ark-ff Fp::from_random_bytes: LE limbs, top limb shaved to the
    modulus bit size (REPR_SHAVE_BITS), None when still >= modulus. The
    shave is what terminates the rejection loops on small-r test curves
    (round-4: _challenge_r hung on bls12_nano without it)."""
    from ripp_tpu.utils.fiat_shamir import field_from_random_bytes

    r = (1 << 61) - 1  # 61-bit modulus -> 1 limb, shave 3 bits
    data = (0xFFFF_FFFF_FFFF_FFFF).to_bytes(8, "little") + b"\xaa" * 24
    v = field_from_random_bytes(data, r)
    # masked to 61 bits = 2^61 - 1 = r -> rejected
    assert v is None
    data = ((1 << 61) - 2).to_bytes(8, "little") + b"\xaa" * 24
    assert field_from_random_bytes(data, r) == (1 << 61) - 2
    # bytes beyond the limb window are ignored
    assert field_from_random_bytes(
        (123).to_bytes(8, "little") + b"\xff" * 24, r) == 123
    # 255-bit modulus: 4 limbs, shave 1 bit
    r381 = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
    top = (1 << 256) - 1
    v = field_from_random_bytes(top.to_bytes(32, "little"), r381)
    assert v is None  # 2^255 - 1 >= r381
    ok = (r381 - 1) | (1 << 255)  # top bit shaved away -> accepted
    assert field_from_random_bytes(ok.to_bytes(32, "little"), r381) == r381 - 1
