"""TIPA prove/verify bench (benches/benches/tipa.rs parity): TIPP, MIPP,
TIPP+SRS-shift, MIPP-SSM at LEN=16 on BLS12-381."""

from __future__ import annotations

import sys

from ripp_tpu.models import ssm, tipa
from ripp_tpu.models.instances import (
    mipp_config,
    mipp_ssm_config,
    tipp_config,
)
from ripp_tpu.models.vectors import FrVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field
from ripp_tpu.utils.poly import structured_scalar_power

from .common import rand_fr_vec, rand_g1_vec, rand_g2_vec, timed

LEN = 16


def bench_tipa(name, cfg, srs, m_a, m_b):
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(None, 1)
    v_srs = srs.get_verifier_key()
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof, ms = timed(tipa.prove, cfg, srs, (m_a, m_b), (ck_a, ck_b, ck_t))
    print(f"{name} prove, len {len(m_a)}: {ms:.1f} ms")
    ok, ms = timed(tipa.verify, cfg, v_srs, ck_t, com, proof)
    assert ok
    print(f"{name} verify, len {len(m_a)}: {ms:.1f} ms")


def bench_tipa_srs_shift(cfg, srs, m_a, m_b, rng):
    host = cfg.ctx.host
    ctx = cfg.ctx
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(None, 1)
    v_srs = srs.get_verifier_key()
    com_a = cfg.lmc.commit(ck_a, m_a)
    com_b = cfg.rmc.commit(ck_b, m_b)
    r_shift = rand_field(rng, host.r)
    r_vec = structured_scalar_power(len(m_a), r_shift, host.r)
    r_inv_vec = [pow(x, -1, host.r) for x in r_vec]
    m_a_r = m_a.hadamard_scale(FrVec.from_ints(ctx, r_vec))
    ck_a_r = ck_a.hadamard_scale(FrVec.from_ints(ctx, r_inv_vec))
    t = cfg.ip.compute(m_a_r, m_b)
    com_t = cfg.ipc.commit(ck_t, [t])
    proof, ms = timed(
        tipa.prove_with_srs_shift, cfg, srs, (m_a_r, m_b),
        (ck_a_r, ck_b, ck_t), r_shift,
    )
    print(f"TIPA TIPP+shift prove, len {len(m_a)}: {ms:.1f} ms")
    ok, ms = timed(
        tipa.verify_with_srs_shift, cfg, v_srs, ck_t,
        (com_a, com_b, com_t), proof, r_shift,
    )
    assert ok
    print(f"TIPA TIPP+shift verify, len {len(m_a)}: {ms:.1f} ms")


def bench_tipa_ssm(cfg, srs, m_a, rng):
    host = cfg.ctx.host
    ctx = cfg.ctx
    ck_a, _ = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(None, 1)
    v_srs = srs.get_verifier_key()
    b = rand_field(rng, host.r)
    m_b = FrVec.from_ints(
        ctx, structured_scalar_power(len(m_a), b, host.r)
    )
    com_a = cfg.lmc.commit(ck_a, m_a)
    t = cfg.ip.compute(m_a, m_b)
    com_t = cfg.ipc.commit(ck_t, [t])
    proof, ms = timed(ssm.prove_tipa_ssm, cfg, srs, m_a, m_b, ck_a, ck_t)
    print(f"TIPA MIPP-SSM prove, len {len(m_a)}: {ms:.1f} ms")
    ok, ms = timed(
        ssm.verify_tipa_ssm, cfg, v_srs, ck_t, com_a, com_t, b, proof
    )
    assert ok
    print(f"TIPA MIPP-SSM verify, len {len(m_a)}: {ms:.1f} ms")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else LEN
    ctx = dev_ctx("bls12_381")
    rng = SeededRng(0)
    srs = tipa.setup_srs(ctx, rng, n)
    bench_tipa(
        "TIPA TIPP", tipp_config(ctx), srs,
        rand_g1_vec(ctx, rng, n), rand_g2_vec(ctx, rng, n),
    )
    bench_tipa(
        "TIPA MIPP", mipp_config(ctx), srs,
        rand_g1_vec(ctx, rng, n), rand_fr_vec(ctx, rng, n),
    )
    bench_tipa_srs_shift(
        tipp_config(ctx), srs, rand_g1_vec(ctx, rng, n),
        rand_g2_vec(ctx, rng, n), rng,
    )
    bench_tipa_ssm(mipp_ssm_config(ctx), srs, rand_g1_vec(ctx, rng, n), rng)


if __name__ == "__main__":
    main()
