"""Sharded reductions on an 8-device virtual CPU mesh vs host ground truth.

Runs on the nano BLS12 parameterization (bls12_nano): identical kernel and
collective code paths to BLS12-381 at the smallest real-curve limb count
(round-4: the toy curve's one-module sharded Miller was a 7m51s XLA:CPU
compile on the 1-core box; nano at nl=4 roughly halves every module).

Run as a script under JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=8 (see test_parallel.py, which drives
this in a subprocess because the main test process is pinned to the real
single-chip TPU platform).

The bit-neutrality contract (SURVEY.md section 4): sharding a reduction
across N devices must produce the IDENTICAL result as one device — folds
and reductions are exact modular integer math.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize hook overrides JAX_PLATFORMS via jax.config at
# interpreter start; re-assert the CPU request (see tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from ripp_tpu.host import pairing as hp  # noqa: E402
from ripp_tpu.ops.points import dev_ctx  # noqa: E402
from ripp_tpu.parallel import (  # noqa: E402
    data_mesh,
    sharded_msm_host,
    sharded_multi_pairing,
)
from ripp_tpu.utils.fiat_shamir import (  # noqa: E402
    SeededRng,
    rand_field,
    rand_sw_point,
)

# global size = 8 per device so every mesh program runs the cached
# [8]-local executables (local shards below 8 are padded anyway)
N = 64


def check_sharded_msm(ctx, mesh):
    rng = SeededRng(5)
    host = ctx.host
    pts = [rand_sw_point(rng, host.g1) for _ in range(N)]
    ks = [rand_field(rng, host.r) for _ in range(N)]
    expect = None
    for p, k in zip(pts, ks):
        expect = host.g1.add(expect, host.g1.scalar_mul(p, k))
    got = sharded_msm_host(
        ctx, "g1", mesh, ctx.g1_to_dev(pts), ctx.t.fr_to_dev(ks)
    )
    assert host.g1.eq(got, expect), "sharded MSM != host"
    print("sharded msm ok")


def check_sharded_multi_pairing(ctx, mesh):
    rng = SeededRng(6)
    host = ctx.host
    A = [rand_sw_point(rng, host.g1) for _ in range(N)]
    B = [rand_sw_point(rng, host.g2) for _ in range(N)]
    expect = None
    for a, b in zip(A, B):
        z = hp.pairing(host, a, b)
        expect = z if expect is None else host.tower.fp12.mul(expect, z)
    got = sharded_multi_pairing(ctx, mesh, ctx.g1_to_dev(A), ctx.g2_to_dev(B))
    assert got == expect, "sharded multi-pairing != host"
    print("sharded multi-pairing ok")


def check_sharded_sipp_byte_identical(ctx, mesh, n=64):
    """The protocol-level contract (SURVEY.md section 4): proving on 1
    device and on 8 devices from the same seed must give BYTE-IDENTICAL
    proofs (Fq12 products are exact, so sharding is bit-neutral)."""
    from ripp_tpu.models import sipp
    from ripp_tpu.models.vectors import FrVec, PointVec
    from ripp_tpu.parallel import ShardedSIPP
    from ripp_tpu.utils.serialize import CurveSerializer

    rng = SeededRng(9)
    host = ctx.host
    A = [rand_sw_point(rng, host.g1) for _ in range(n)]
    B = [rand_sw_point(rng, host.g2) for _ in range(n)]
    r = [rand_field(rng, host.r) for _ in range(n)]
    value = sipp.product_of_pairings_with_coeffs(
        ctx,
        PointVec.from_host(ctx, "g1", A),
        PointVec.from_host(ctx, "g2", B),
        FrVec.from_ints(ctx, r),
    )
    single = sipp.prove(ctx, A, B, r, value)
    sharded = ShardedSIPP(ctx, mesh).prove(A, B, r, value)

    s = CurveSerializer(host)
    bytes_single = b"".join(
        s.gt(zl) + s.gt(zr) for zl, zr in single.gt_elems
    )
    bytes_sharded = b"".join(
        s.gt(zl) + s.gt(zr) for zl, zr in sharded.gt_elems
    )
    assert bytes_single == bytes_sharded, "sharded proof bytes diverge"
    assert sipp.verify(ctx, A, B, r, value, sharded)
    print(f"sharded sipp byte-identical ok (n={n})")


def check_sharded_gipa_byte_identical(ctx, mesh, n=64):
    """Round-4: GIPA/TIPA provers ride the mesh (VERDICT r3 item 6).
    TIPP (pairing-IP, AFGHO both sides) proved on 1 device and on the
    8-device mesh from identical inputs must give BYTE-IDENTICAL proofs
    (/root/reference/ip_proofs/src/gipa.rs:196-297 dataflow, cyclic
    sharding per parallel/vectors.py)."""
    from ripp_tpu.models import gipa
    from ripp_tpu.models.instances import tipp_config
    from ripp_tpu.models.vectors import PointVec
    from ripp_tpu.parallel.vectors import ShardedPointVec
    from ripp_tpu.utils.proof_io import ser_gipa_proof

    rng = SeededRng(11)
    host = ctx.host
    cfg = tipp_config(ctx)
    A = [rand_sw_point(rng, host.g1) for _ in range(n)]
    B = [rand_sw_point(rng, host.g2) for _ in range(n)]
    ckA = [rand_sw_point(rng, host.g2) for _ in range(n)]  # lmc keys in G2
    ckB = [rand_sw_point(rng, host.g1) for _ in range(n)]  # rmc keys in G1
    ck_t = cfg.ipc.setup(rng, 1)

    m_a_d = PointVec.from_host(ctx, "g1", A)
    m_b_d = PointVec.from_host(ctx, "g2", B)
    ck_a_d = PointVec.from_host(ctx, "g2", ckA)
    ck_b_d = PointVec.from_host(ctx, "g1", ckB)
    proof_d, _ = gipa.prove_with_aux(cfg, m_a_d, m_b_d, ck_a_d, ck_b_d,
                                     ck_t)

    m_a_s = ShardedPointVec.from_host(ctx, mesh, "g1", A)
    m_b_s = ShardedPointVec.from_host(ctx, mesh, "g2", B)
    ck_a_s = ShardedPointVec.from_host(ctx, mesh, "g2", ckA)
    ck_b_s = ShardedPointVec.from_host(ctx, mesh, "g1", ckB)
    proof_s, _ = gipa.prove_with_aux(cfg, m_a_s, m_b_s, ck_a_s, ck_b_s,
                                     ck_t)

    assert ser_gipa_proof(cfg, proof_d) == ser_gipa_proof(cfg, proof_s), \
        "sharded TIPP proof bytes diverge from single-device"
    com = (
        cfg.lmc.commit(ck_a_d, m_a_d),
        cfg.rmc.commit(ck_b_d, m_b_d),
        cfg.ipc.commit(ck_t, [cfg.ip.compute(m_a_d, m_b_d)]),
    )
    assert gipa.verify(cfg, (ck_a_d, ck_b_d, ck_t), com, proof_s)
    print(f"sharded gipa(tipp) byte-identical ok (n={n})")


def check_sharded_aggregation_byte_identical(ctx, mesh, n=32):
    """Round-4: Groth16 aggregation's two TIPA proves ride the mesh
    (aggregate_proofs_vec(mesh=...)); the aggregate proof bytes must be
    IDENTICAL to the single-device aggregation.  Proof columns are random
    group elements - aggregation does not verify the underlying Groth16
    proofs, so transcript identity is fully exercised without a Groth16
    fixture prover on the test curve."""
    from ripp_tpu.applications import groth16_aggregation as agg
    from ripp_tpu.models import tipa
    from ripp_tpu.models.vectors import PointVec
    from ripp_tpu.utils.proof_io import ser_aggregate_proof

    rng = SeededRng(13)
    host = ctx.host
    srs = tipa.setup_srs(ctx, rng, n)
    a = PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, host.g1) for _ in range(n)])
    b = PointVec.from_host(
        ctx, "g2", [rand_sw_point(rng, host.g2) for _ in range(n)])
    c = PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, host.g1) for _ in range(n)])
    dense = agg.aggregate_proofs_vec(ctx, srs, a, b, c)
    sharded = agg.aggregate_proofs_vec(ctx, srs, a, b, c, mesh=mesh)
    assert (ser_aggregate_proof(ctx, dense)
            == ser_aggregate_proof(ctx, sharded)), \
        "sharded aggregation proof bytes diverge"
    print(f"sharded aggregation byte-identical ok (n={n})")


def check_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    print("dryrun_multichip ok")


PHASES = ("msm", "pairing", "sipp", "gipa", "agg", "dryrun")
# sipp381 is NOT in the default phase list: the full-width BLS12-381
# sharded Miller program costs >40 min of XLA:CPU compile on this
# 1-core host (warm .jax_cache_cpu: seconds).  Run it explicitly:
#   python tests/parallel_check.py sipp381
EXTRA_PHASES = ("sipp381",)


def _run_phase(name: str) -> None:
    assert len(jax.devices()) >= 8, jax.devices()
    curve = "bls12_381" if name.endswith("381") else "bls12_nano"
    ctx = dev_ctx(curve)
    mesh = data_mesh(jax.devices()[:8])
    if name == "msm":
        check_sharded_msm(ctx, mesh)
    elif name == "pairing":
        check_sharded_multi_pairing(ctx, mesh)
    elif name == "sipp":
        check_sharded_sipp_byte_identical(ctx, mesh)
    elif name == "gipa":
        check_sharded_gipa_byte_identical(ctx, mesh)
    elif name == "agg":
        check_sharded_aggregation_byte_identical(ctx, mesh)
    elif name == "sipp381":
        # the real-curve protocol-level contract (round-1 verdict #3):
        # byte-identical sharded proving at n=16 on BLS12-381
        check_sharded_sipp_byte_identical(ctx, mesh, n=16)
    elif name == "dryrun":
        check_dryrun()
    else:
        raise SystemExit(f"unknown phase {name}")


if __name__ == "__main__":
    import subprocess

    if len(sys.argv) > 1:
        _run_phase(sys.argv[1])
    else:
        # One subprocess per phase: a single XLA:CPU process accumulates
        # tens of GB of LLVM compile residue across the big sharded
        # modules and eventually dies with "LLVM compilation error:
        # Cannot allocate memory" -- separate processes release it, and
        # the persistent .jax_cache keeps warm phases fast.
        for ph in PHASES:
            r = subprocess.run([sys.executable, __file__, ph])
            if r.returncode != 0:
                raise SystemExit(f"phase {ph} failed ({r.returncode})")
        print("ALL PARALLEL CHECKS PASSED")
