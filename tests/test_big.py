"""North-star-scale tests, gated behind RIPP_BIG_TESTS=1 (the analog of the
reference's #[ignore]'d degree-65535 tests,
/root/reference/ip_proofs/src/applications/poly_commit/mod.rs:389,436-439).

Run manually on the TPU:
    RIPP_BIG_TESTS=1 python -m pytest tests/test_big.py -x -q -s
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RIPP_BIG_TESTS") != "1",
    reason="big tests run manually (RIPP_BIG_TESTS=1)",
)


def _ctx():
    from ripp_tpu.ops.points import dev_ctx

    return dev_ctx("bls12_381")


def test_msm_2_16():
    """BASELINE config 2: G1 MSM at n = 2^16 on BLS12-381."""
    import time

    import jax

    from ripp_tpu.models.vectors import PointVec
    from ripp_tpu.ops import msm as msm_mod
    from ripp_tpu.ops.fixed_base import fixed_base_msm
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

    ctx = _ctx()
    host = ctx.host
    n = 1 << 16
    rng = SeededRng(7)
    base = PointVec.from_host(ctx, "g1", [host.g1_gen])
    pts = fixed_base_msm(ctx.g1, base.pts, list(range(1, n + 1)),
                         host.r.bit_length())
    ks = [rand_field(rng, host.r) for _ in range(n)]
    scalars = ctx.t.fr_to_dev(ks)

    out = msm_mod.msm(ctx.g1, ctx.t.fr, pts, scalars)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = msm_mod.msm(ctx.g1, ctx.t.fr, pts, scalars)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"\nMSM G1 2^16: {dt*1e3:.1f} ms, {n/dt:.0f} points/s")

    # correctness: sum of (i+1)*k_i * G must equal (sum (i+1) k_i) * G
    total = sum((i + 1) * k for i, k in enumerate(ks)) % host.r
    expect = host.g1.scalar_mul(host.g1_gen, total)
    got = PointVec(ctx, "g1",
                   __import__("jax").tree.map(lambda x: x[None], out),
                   1).first()
    assert host.g1.eq(got, expect), "MSM 2^16 mismatch"


def test_tipa_2_14():
    """BASELINE config 3: TIPP/TIPA prove+verify at n = 2^14."""
    import time

    from ripp_tpu.models import tipa
    from ripp_tpu.models.instances import tipp_config
    from ripp_tpu.models.vectors import PointVec
    from ripp_tpu.ops.fixed_base import fixed_base_msm
    from ripp_tpu.utils.fiat_shamir import SeededRng

    ctx = _ctx()
    host = ctx.host
    n = 1 << 14
    rng = SeededRng(11)
    cfg = tipp_config(ctx)

    t0 = time.perf_counter()
    srs = tipa.setup_srs(ctx, rng, n)
    print(f"\nTIPA SRS gen 2^14: {time.perf_counter()-t0:.1f} s")
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()

    base1 = PointVec.from_host(ctx, "g1", [host.g1_gen])
    base2 = PointVec.from_host(ctx, "g2", [host.g2_gen])
    m_a = PointVec(ctx, "g1", fixed_base_msm(
        ctx.g1, base1.pts, [2 * i + 3 for i in range(n)],
        host.r.bit_length()), n)
    m_b = PointVec(ctx, "g2", fixed_base_msm(
        ctx.g2, base2.pts, [3 * i + 5 for i in range(n)],
        host.r.bit_length()), n)

    t0 = time.perf_counter()
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    print(f"TIPA commit 2^14: {time.perf_counter()-t0:.1f} s")

    import os as _os

    reps = int(_os.environ.get("RIPP_BIG_REPEAT", "1"))
    for rep in range(reps):
        t0 = time.perf_counter()
        proof = tipa.prove(cfg, srs, (m_a, m_b), (ck_a, ck_b, ck_t))
        prove_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok = tipa.verify(cfg, v_srs, ck_t, com, proof)
        verify_s = time.perf_counter() - t0
        # rep 0 pays the per-process trace/compile warmup; later reps are
        # the steady-state numbers (RIPP_BIG_REPEAT=2)
        print(f"TIPA 2^14 (rep {rep}): prove {prove_s:.1f} s, "
              f"verify {verify_s:.1f} s")
        assert ok


def test_groth16_aggregation_2_12():
    """BASELINE config 5 (reduced): end-to-end aggregation at 2^12 proofs."""
    import time

    from ripp_tpu.applications import groth16, groth16_aggregation as agg
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

    ctx = _ctx()
    host = ctx.host
    n = 1 << 12
    rng = SeededRng(13)
    cs = groth16.sum_circuit(4)
    pk = groth16.setup(host, cs, rng)

    t0 = time.perf_counter()
    zs, publics = [], []
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(4)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        zs.append(z)
        publics.append(z[1:cs.num_public + 1])
    A, B2, C = groth16.prove_batch(ctx, pk, cs, zs, rng)
    import jax

    jax.block_until_ready(A.pts)
    print(f"\nGroth16 prove_batch 2^12: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    srs = agg.setup_inner_product(ctx, rng, n)
    print(f"IP SRS gen 2^12: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    aproof = agg.aggregate_proofs_vec(ctx, srs, A, B2, C)
    agg_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = agg.verify_aggregate_proof(
        ctx, srs.get_verifier_key(), pk.vk, publics, aproof
    )
    ver_s = time.perf_counter() - t0
    print(f"aggregation 2^12: aggregate {agg_s:.1f} s, verify {ver_s:.1f} s")
    assert ok


def test_poly_commit_2_16():
    """BASELINE config 4: trusted two-tier PC open/verify at degree
    2^16 - 1 (the reference's #[ignore] univariate test scale,
    poly_commit/mod.rs:436-439)."""
    import time

    from ripp_tpu.applications import poly_commit as pc
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field
    from ripp_tpu.utils.poly import poly_eval

    from ripp_tpu.ops.points import dev_ctx

    ctx = dev_ctx("bls12_381")
    r = ctx.host.r
    rng = SeededRng(29)
    degree = (1 << 16) - 1
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]

    t0 = time.perf_counter()
    srs = pc.setup_univariate(ctx, rng, degree)
    print(f"\nPC setup 2^16: {time.perf_counter()-t0:.1f} s")
    v_srs = srs.ip_srs.get_verifier_key()

    t0 = time.perf_counter()
    com, y_coms = pc.commit_univariate(ctx, srs, coeffs)
    print(f"PC commit 2^16: {time.perf_counter()-t0:.1f} s")

    z = rand_field(rng, r)
    t0 = time.perf_counter()
    proof = pc.open_univariate(ctx, srs, coeffs, y_coms, z)
    open_s = time.perf_counter() - t0
    ev = poly_eval(coeffs, z, r)
    t0 = time.perf_counter()
    ok = pc.verify_univariate(ctx, v_srs, degree, com, z, ev, proof)
    verify_s = time.perf_counter() - t0
    print(f"PC open 2^16: {open_s:.1f} s, verify {verify_s:.2f} s")
    assert ok


def test_poly_commit_transparent_2_16():
    """BASELINE config 4 twin: TRANSPARENT two-tier PC open/verify at
    degree 2^16 - 1 (the reference's #[ignore] test scale,
    poly_commit/transparent.rs:364-367)."""
    import time

    from ripp_tpu.applications import poly_commit_transparent as tpc
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field
    from ripp_tpu.utils.poly import poly_eval

    ctx = _ctx()
    r = ctx.host.r
    rng = SeededRng(37)
    degree = (1 << 16) - 1
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]

    t0 = time.perf_counter()
    ck = tpc.setup_univariate(ctx, rng, degree)
    print(f"\ntransparent PC setup 2^16: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    com, y_coms = tpc.commit_univariate(ctx, ck, coeffs)
    print(f"transparent PC commit 2^16: {time.perf_counter()-t0:.1f} s")

    z = rand_field(rng, r)
    t0 = time.perf_counter()
    proof = tpc.open_univariate(ctx, ck, coeffs, y_coms, z)
    open_s = time.perf_counter() - t0
    ev = poly_eval(coeffs, z, r)
    t0 = time.perf_counter()
    ok = tpc.verify_univariate(ctx, ck, com, z, ev, proof)
    verify_s = time.perf_counter() - t0
    print(f"transparent PC open 2^16: {open_s:.1f} s, verify {verify_s:.2f} s")
    assert ok


def test_blake2s_groth16_roundtrip():
    """The reference bench's actual workload: a Groth16 proof of Blake2s
    preimage knowledge (bench.rs:30-75), ~21.5k constraints through the
    NTT-domain QAP."""
    import struct
    import time

    from ripp_tpu.applications import groth16
    from ripp_tpu.applications.blake2s_circuit import build_blake2s_circuit
    from ripp_tpu.utils.fiat_shamir import SeededRng

    ctx = _ctx()
    host = ctx.host
    rng = SeededRng(57)
    input_words = list(struct.unpack("<8I", bytes(range(11, 43))))
    cs, z, out_words = build_blake2s_circuit(host.r, input_words)
    print(f"\nBlake2s circuit: {len(cs.constraints)} constraints")

    t0 = time.perf_counter()
    pk = groth16.setup(host, cs, rng)
    print(f"Groth16 setup (21k constraints): {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    proof = groth16.prove(host, pk, cs, z, rng)
    print(f"Groth16 prove: {time.perf_counter()-t0:.1f} s")

    publics = z[1:cs.num_public + 1]
    t0 = time.perf_counter()
    ok = groth16.verify(host, pk.vk, publics, proof)
    print(f"Groth16 verify: {time.perf_counter()-t0:.2f} s")
    assert ok
    bad = list(publics)
    bad[0] = (bad[0] + 1) % host.r
    assert not groth16.verify(host, pk.vk, bad, proof)


@pytest.mark.skipif(os.environ.get("RIPP_NORTHSTAR") != "1",
                    reason="full 2^16 north star (RIPP_NORTHSTAR=1)")
def test_groth16_aggregation_2_16():
    """BASELINE config 5, full scale: 2^16 proofs aggregated end-to-end."""
    import time

    from ripp_tpu.applications import groth16, groth16_aggregation as agg
    from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

    ctx = _ctx()
    host = ctx.host
    n = 1 << 16
    rng = SeededRng(61)
    cs = groth16.sum_circuit(4)
    pk = groth16.setup(host, cs, rng)

    t0 = time.perf_counter()
    zs, publics = [], []
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(4)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        zs.append(z)
        publics.append(z[1:cs.num_public + 1])
    A, B2, C = groth16.prove_batch(ctx, pk, cs, zs, rng)
    import jax

    jax.block_until_ready(A.pts)
    print(f"\nGroth16 prove_batch 2^16: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    srs = agg.setup_inner_product(ctx, rng, n)
    print(f"IP SRS gen 2^16: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    aproof = agg.aggregate_proofs_vec(ctx, srs, A, B2, C)
    agg_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = agg.verify_aggregate_proof(
        ctx, srs.get_verifier_key(), pk.vk, publics, aproof
    )
    ver_s = time.perf_counter() - t0
    print(f"aggregation 2^16: aggregate {agg_s:.1f} s, verify {ver_s:.1f} s")
    assert ok


def test_complete_circuit_monolithic():
    """The reference's `complete_circuit` baseline (bench.rs:470-526):
    one monolithic Groth16 proof covering several Blake2s instances, with
    device-batched setup (fixed-base tables) and prover (query MSMs)."""
    import struct
    import time

    from ripp_tpu.applications import groth16
    from ripp_tpu.applications.blake2s_circuit import (
        build_blake2s_multi_circuit,
    )
    from ripp_tpu.utils.fiat_shamir import SeededRng

    ctx = _ctx()
    host = ctx.host
    rng = SeededRng(91)
    n = 4
    inputs = [list(struct.unpack("<8I", bytes(range(k, k + 32))))
              for k in range(n)]
    t0 = time.perf_counter()
    cs, z, _ = build_blake2s_multi_circuit(host.r, inputs)
    print(f"\nmono circuit n={n}: {len(cs.constraints)} constraints "
          f"({time.perf_counter()-t0:.1f} s to synthesize)")

    t0 = time.perf_counter()
    pk = groth16.setup_device(ctx, cs, rng)
    print(f"setup_device: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    A, B2, C = groth16.prove_batch(ctx, pk, cs, [z], rng)
    proof = groth16.Proof(a=A.to_host()[0], b=B2.to_host()[0],
                          c=C.to_host()[0])
    print(f"prove (device batch=1): {time.perf_counter()-t0:.1f} s")

    publics = z[1:cs.num_public + 1]
    assert groth16.verify(host, pk.vk, publics, proof)
    bad = list(publics)
    bad[3] = (bad[3] + 1) % host.r
    assert not groth16.verify(host, pk.vk, bad, proof)


def test_setup_device_matches_host():
    """setup_device must reproduce setup() exactly from the same seed
    (same toxic waste, device fixed-base ladders vs native host ladders)."""
    from ripp_tpu.applications import groth16
    from ripp_tpu.utils.fiat_shamir import SeededRng

    ctx = _ctx()
    host = ctx.host
    cs = groth16.sum_circuit(4)
    pk1 = groth16.setup(host, cs, SeededRng(9))
    pk2 = groth16.setup_device(ctx, cs, SeededRng(9))
    assert pk1.vk.gamma_abc_g1 == pk2.vk.gamma_abc_g1
    assert pk1.a_query == pk2.a_query
    assert pk1.b_g1_query == pk2.b_g1_query
    assert pk1.b_g2_query == pk2.b_g2_query
    assert pk1.l_query == pk2.l_query
    assert pk1.h_query == pk2.h_query
    assert (pk1.vk.alpha_g1, pk1.beta_g1, pk1.delta_g1) == \
        (pk2.vk.alpha_g1, pk2.beta_g1, pk2.delta_g1)
    assert (pk1.vk.beta_g2, pk1.vk.gamma_g2, pk1.vk.delta_g2) == \
        (pk2.vk.beta_g2, pk2.vk.gamma_g2, pk2.vk.delta_g2)


def test_olr_device_outer_prover():
    """olr with the OUTER BW6-761 Groth16 setup+prove running device-
    batched (BW6DevCtx: 48-limb Fp kernels, fixed-base window tables,
    Pippenger MSM) instead of the native host ladders.  Cross-checks the
    device pipeline against the host prover's verifier."""
    import time

    from ripp_tpu.applications import groth16
    from ripp_tpu.applications.groth16_recursion import (
        build_verifier_circuit,
    )
    from ripp_tpu.host.curves import bls12_377
    from ripp_tpu.ops.points import bw6_dev_ctx
    from ripp_tpu.utils.fiat_shamir import SeededRng

    cv = bls12_377()
    bctx = bw6_dev_ctx()
    bw6 = bctx.host
    cs_in = groth16.sum_circuit(4)
    pk = groth16.setup(cv, cs_in, SeededRng(31))
    z = groth16.sum_circuit_assignment(cs_in, [3, 4, 5, 6], 18, cv.r)
    prf = groth16.prove(cv, pk, cs_in, z, SeededRng(32))
    pubs = z[1:cs_in.num_public + 1]

    rc_cs, rc_z = build_verifier_circuit(pk.vk, [pubs], [prf], 32, cv)
    t0 = time.perf_counter()
    opk = groth16.setup_device(bctx, rc_cs, SeededRng(41))
    print(f"\nolr setup_device: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    A, B2, C = groth16.prove_batch(bctx, opk, rc_cs, [rc_z], SeededRng(42))
    oprf = groth16.Proof(a=A.to_host()[0], b=B2.to_host()[0],
                         c=C.to_host()[0])
    print(f"olr prove_batch (device): {time.perf_counter()-t0:.1f} s")
    ok = groth16.verify(bw6, opk.vk, rc_z[1:rc_cs.num_public + 1], oprf)
    assert ok
    bad = list(rc_z[1:rc_cs.num_public + 1])
    bad[0] = (bad[0] + 1) % bw6.r
    assert not groth16.verify(bw6, opk.vk, bad, oprf)


def test_olr_one_layer_recursion():
    """The reference's `olr` scheme end-to-end (bench.rs:413-458): one
    BW6-761 Groth16 proof verifying a BLS12-377 Groth16 proof in-circuit
    (~38k constraints/verified proof; host-native outer prover)."""
    import time

    from ripp_tpu.applications import groth16
    from ripp_tpu.applications.groth16_recursion import (
        build_verifier_circuit,
    )
    from ripp_tpu.host.curves import bls12_377, bw6_761
    from ripp_tpu.utils.fiat_shamir import SeededRng

    cv = bls12_377()
    bw6 = bw6_761()
    cs_in = groth16.sum_circuit(4)
    pk = groth16.setup(cv, cs_in, SeededRng(31))
    z = groth16.sum_circuit_assignment(cs_in, [3, 4, 5, 6], 18, cv.r)
    prf = groth16.prove(cv, pk, cs_in, z, SeededRng(32))
    pubs = z[1:cs_in.num_public + 1]

    t0 = time.perf_counter()
    rc_cs, rc_z = build_verifier_circuit(pk.vk, [pubs], [prf], 32, cv)
    print(f"\nolr circuit: {len(rc_cs.constraints)} constraints "
          f"({time.perf_counter()-t0:.1f} s)")
    t0 = time.perf_counter()
    opk = groth16.setup(bw6, rc_cs, SeededRng(41))
    print(f"outer setup: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    oprf = groth16.prove(bw6, opk, rc_cs, rc_z, SeededRng(42))
    print(f"outer prove: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    ok = groth16.verify(bw6, opk.vk, rc_z[1:rc_cs.num_public + 1], oprf)
    print(f"outer verify: {time.perf_counter()-t0:.2f} s")
    assert ok
    bad = list(rc_z[1:rc_cs.num_public + 1])
    bad[0] = (bad[0] + 1) % bw6.r
    assert not groth16.verify(bw6, opk.vk, bad, oprf)
