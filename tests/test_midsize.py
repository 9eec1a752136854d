"""Mid-size protocol round-trips on the nano curve (round-4 verdict item 8).

The reference's tests stop at TEST_SIZE=8 (gipa.rs:468); north-star runs
then hit shape families CI never compiled. These n=256 runs exercise the
[256]-tier executables of every kernel family (Miller, MSM, folds,
challenge products) in the routine suite - a compile blowup or tier
regression surfaces here, in minutes, instead of mid-north-star-run.

bls12_nano keeps the XLA:CPU compile cost of the [256] modules tractable
on a 1-core host (see ops/fp.py ripple-carry note)."""

from ripp_tpu.models import gipa, sipp
from ripp_tpu.models.instances import tipp_config
from ripp_tpu.models.vectors import FrVec, PointVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point

N = 256


def _ctx():
    return dev_ctx("bls12_nano")


def test_sipp_midsize():
    ctx = _ctx()
    host = ctx.host
    rng = SeededRng(21)
    A = [rand_sw_point(rng, host.g1) for _ in range(N)]
    B = [rand_sw_point(rng, host.g2) for _ in range(N)]
    r = [rand_field(rng, host.r) for _ in range(N)]
    value = sipp.product_of_pairings_with_coeffs(
        ctx, PointVec.from_host(ctx, "g1", A),
        PointVec.from_host(ctx, "g2", B), FrVec.from_ints(ctx, r))
    proof = sipp.prove(ctx, A, B, r, value)
    assert sipp.verify(ctx, A, B, r, value, proof)


def test_gipa_tipp_midsize():
    ctx = _ctx()
    host = ctx.host
    rng = SeededRng(22)
    cfg = tipp_config(ctx)
    m_a = PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, host.g1) for _ in range(N)])
    m_b = PointVec.from_host(
        ctx, "g2", [rand_sw_point(rng, host.g2) for _ in range(N)])
    ck_a = PointVec.from_host(
        ctx, "g2", [rand_sw_point(rng, host.g2) for _ in range(N)])
    ck_b = PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, host.g1) for _ in range(N)])
    ck_t = cfg.ipc.setup(rng, 1)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof = gipa.prove(cfg, (m_a, m_b, t), (ck_a, ck_b, ck_t), com)
    assert gipa.verify(cfg, (ck_a, ck_b, ck_t), com, proof)
