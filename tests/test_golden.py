"""Golden serialization / Fiat-Shamir fixtures (fixed byte strings).

Round-trip tests alone cannot catch a format divergence from arkworks
(SURVEY.md section 7.3; round-1 verdict Missing #4): these tests pin exact
byte strings so any layout regression fails loudly.

Sources of the expected bytes:
  * Blake2b-512/Blake2s-256("abc"): RFC 7693 appendix A/B reference vectors
    (independently verifies hashlib matches the RustCrypto `blake2` crate,
    which implements the same RFC parameters the reference uses at
    /root/reference/ip_proofs/src/gipa.rs:452, sipp/src/lib.rs:39).
  * BLS12-381 generator encodings: the standard generator coordinates
    (same constants as zcash/arkworks ark-bls12-381 curves.rs) laid out per
    ark-serialize 0.4: little-endian 48-byte base-field coeffs, c0-first
    towers, infinity flag 0x40 / lexicographic-negative-y flag 0x80 in the
    top bits of the FINAL byte.  Derived once from those documented rules;
    pinned so serialize.py can never silently drift.
"""

import hashlib

from ripp_tpu.host.curves import bls12_381
from ripp_tpu.utils.serialize import CurveSerializer
from ripp_tpu.utils.fiat_shamir import blake2b_digest

G1_GEN_UNCOMPRESSED = (
    "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c3"
    "0faca94f8c63952694d79731a7d3f117e1e7c5462923aa0ce48a88a244c73cd0"
    "edb3042ccb18db00f60ad0d595e0f5fce48a1d74ed309ea0f1a0aae381f4b308"
)
G1_GEN_COMPRESSED = (
    "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c3"
    "0faca94f8c63952694d79731a7d3f117"
)
G2_GEN_UNCOMPRESSED = (
    "b8bd21c1c85680d4efbb05a82603ac0b77d1e37a640b51b4023b40fad47ae4c6"
    "5110c52d27050826910a8ff0b2a24a027e2b045d057dace5575d941312f14c33"
    "49507fdcbb61dab51ab62099d0d06b59654f2788a0d3ac7d609f7152602be013"
    "0128b808865493e189a2ac3bccc93a922cd16051699a426da7d3bd8caa9bfdad"
    "1a352edac6cdc98c116e7d7227d5e50cbe795ff05f07a9aaa11dec5c270d373f"
    "ab992e57ab927426af63a7857e283ecb998bc22bb0d2ac32cc34a72ea0c40606"
)


def test_blake2_rfc7693_vectors():
    assert hashlib.blake2b(b"abc").hexdigest() == (
        "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
    )
    assert hashlib.blake2s(b"abc").hexdigest() == (
        "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982"
    )
    # repo wrapper uses the same default parameters
    assert blake2b_digest(b"abc").hex().startswith("ba80a53f")


def test_g1_generator_bytes():
    curve = bls12_381()
    s = CurveSerializer(curve)
    assert s.g1(curve.g1_gen).hex() == G1_GEN_UNCOMPRESSED
    assert s.g1(curve.g1_gen, compressed=True).hex() == G1_GEN_COMPRESSED


def test_g2_generator_bytes():
    curve = bls12_381()
    s = CurveSerializer(curve)
    assert s.g2(curve.g2_gen).hex() == G2_GEN_UNCOMPRESSED


def test_infinity_bytes():
    curve = bls12_381()
    s = CurveSerializer(curve)
    b = s.g1(None)
    assert b == b"\x00" * 95 + b"\x40"
    assert s.g1(None, compressed=True) == b"\x00" * 47 + b"\x40"


def test_fr_bytes():
    curve = bls12_381()
    s = CurveSerializer(curve)
    assert s.fr(1) == b"\x01" + b"\x00" * 31
    assert s.fr(curve.r - 1) == (curve.r - 1).to_bytes(32, "little")


def test_deser_rejects_noncanonical_and_bad_points():
    curve = bls12_381()
    s = CurveSerializer(curve)
    # coordinate >= p must be rejected (canonicity)
    bad_x = (curve.p).to_bytes(48, "little")
    gen = bytearray(bytes.fromhex(G1_GEN_UNCOMPRESSED))
    noncanon = bytes(bad_x) + bytes(gen[48:])
    try:
        s.deser_g1(noncanon)
        assert False, "non-canonical coordinate accepted"
    except ValueError:
        pass
    # off-curve point must be rejected
    off = bytearray(gen)
    off[0] ^= 1
    try:
        s.deser_g1(bytes(off))
        assert False, "off-curve point accepted"
    except ValueError:
        pass


def test_deser_rejects_out_of_subgroup():
    """E(Fp) has cofactor h != 1 for BLS12-381; find a point on the curve
    but outside the order-r subgroup and check rejection."""
    curve = bls12_381()
    s = CurveSerializer(curve)
    g1 = curve.g1
    pt = g1.find_point(5)  # cofactor-cleared -> in subgroup
    # build an out-of-subgroup point: any point before cofactor clearing
    # with full order; scan x until one is found
    x = 2
    raw = None
    while True:
        cand = g1.point_from_x(g1.F.from_int(x), greatest=False)
        if cand is not None and not g1.in_subgroup(cand):
            raw = cand
            break
        x += 1
    data = s.g1(raw)
    try:
        s.deser_g1(data)
        assert False, "out-of-subgroup point accepted"
    except ValueError:
        pass
    # and the good point round-trips
    assert s.deser_g1(s.g1(pt)) == pt


# ---------------------------------------------------------------------------
# Golden protocol transcripts (round-4 verdict item 9): frozen per-round
# challenges + commitment bytes of seeded n=8 SIPP and GIPA(TIPP) runs on
# bls12_nano, regenerated through the REAL prover code.  Any regression in
# Fiat-Shamir framing (_ser_com ordering, nonce bytes, serializer layout,
# sponge seeding - /root/reference/ip_proofs/src/gipa.rs:240-258,
# /root/reference/sipp/src/lib.rs:56-60) fails these loudly.
#
# Fixtures are SELF-GENERATED (committed from the run that froze them);
# cross-validation against a live arkworks run remains open - the curve
# here is the nano test curve, which arkworks does not ship.
# ---------------------------------------------------------------------------

def _load_transcripts():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__),
                        "golden_transcripts.json")
    with open(path) as f:
        return json.load(f)


def test_golden_sipp_transcript():
    from ripp_tpu.models import sipp
    from ripp_tpu.models.vectors import FrVec, PointVec
    from ripp_tpu.ops.points import dev_ctx
    from ripp_tpu.utils.fiat_shamir import (
        FiatShamirRng,
        SeededRng,
        rand_field,
        rand_sw_point,
    )

    fix = _load_transcripts()["sipp"]
    ctx = dev_ctx("bls12_nano")
    host = ctx.host
    s = CurveSerializer(host)
    n = 8
    rng = SeededRng(17)
    A = [rand_sw_point(rng, host.g1) for _ in range(n)]
    B = [rand_sw_point(rng, host.g2) for _ in range(n)]
    r = [rand_field(rng, host.r) for _ in range(n)]
    value = sipp.product_of_pairings_with_coeffs(
        ctx, PointVec.from_host(ctx, "g1", A),
        PointVec.from_host(ctx, "g2", B), FrVec.from_ints(ctx, r))
    seed = sipp._instance_seed(ctx, A, B, r, value)
    assert seed.hex() == fix["seed"], "SIPP sponge seed framing changed"
    proof = sipp.prove(ctx, A, B, r, value)
    fs = FiatShamirRng(seed)
    assert len(proof.gt_elems) == len(fix["rounds"])
    for (z_l, z_r), want in zip(proof.gt_elems, fix["rounds"]):
        blob = s.gt(z_l) + s.gt(z_r)
        assert blob.hex() == want["zlzr"], "SIPP round commitment bytes"
        fs.absorb(blob)
        assert hex(fs.next_u128()) == want["x"], "SIPP round challenge"


def test_golden_gipa_transcript():
    from ripp_tpu.models import gipa
    from ripp_tpu.models.instances import tipp_config
    from ripp_tpu.models.vectors import PointVec
    from ripp_tpu.ops.points import dev_ctx
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point

    fix = _load_transcripts()["gipa"]
    ctx = dev_ctx("bls12_nano")
    host = ctx.host
    rng = SeededRng(18)
    cfg = tipp_config(ctx)
    n = 8
    mA = [rand_sw_point(rng, host.g1) for _ in range(n)]
    mB = [rand_sw_point(rng, host.g2) for _ in range(n)]
    ckA = [rand_sw_point(rng, host.g2) for _ in range(n)]
    ckB = [rand_sw_point(rng, host.g1) for _ in range(n)]
    ck_t = cfg.ipc.setup(rng, 1)
    proof, aux = gipa.prove_with_aux(
        cfg,
        PointVec.from_host(ctx, "g1", mA),
        PointVec.from_host(ctx, "g2", mB),
        PointVec.from_host(ctx, "g2", ckA),
        PointVec.from_host(ctx, "g1", ckB),
        ck_t,
    )
    got_ts = [hex(c) for c in reversed(aux.transcript)]  # prove order
    assert got_ts == fix["transcript"], "GIPA challenge transcript changed"
    for (com_1, com_2), want in zip(reversed(proof.steps), fix["coms"]):
        assert gipa._ser_com(cfg, com_1).hex() == want["com1"], \
            "GIPA com_1 framing changed"
        assert gipa._ser_com(cfg, com_2).hex() == want["com2"], \
            "GIPA com_2 framing changed"
