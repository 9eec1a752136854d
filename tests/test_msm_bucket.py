"""Differential tests for the bucket-serial Pippenger path
(ops/msm.py _msm_bucket_serial): device vs device-scan vs host ground
truth on the toy curve at a size above BUCKET_SERIAL_MIN."""

import pytest

from ripp_tpu.ops import msm as msm_mod
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point


@pytest.fixture(scope="module")
def ctx():
    return dev_ctx("bls12_toy")


def test_bucket_serial_matches_host(ctx):
    host = ctx.host
    rng = SeededRng(17)
    n = msm_mod.BUCKET_SERIAL_MIN  # routes to the bucket-serial path
    pts = [rand_sw_point(rng, host.g1) for _ in range(n)]
    ks = [rand_field(rng, host.r) for _ in range(n)]

    dev_pts = ctx.g1_to_dev(pts)
    dev_ks = ctx.t.fr_to_dev(ks)
    got_tree = msm_mod.msm(ctx.g1, ctx.t.fr, dev_pts, dev_ks)
    # also run the scan path explicitly on the same input
    scan_tree = msm_mod._msm_impl(ctx.g1, ctx.t.fr, dev_pts, dev_ks, 8,
                                  ctx.t.fr.p.bit_length())

    import jax

    def to_host(tree):
        one = jax.tree.map(lambda x: x[None], tree)
        from ripp_tpu.ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        padded = pad_with_identity(ctx.g1, one, MIN_REDUCE_BATCH)
        return ctx.g1_from_dev(padded)[0]

    got = to_host(got_tree)
    scan = to_host(scan_tree)
    expect = host.g1.msm(pts, ks)
    assert host.g1.eq(got, expect), "bucket-serial MSM != host"
    assert host.g1.eq(scan, expect), "scan MSM != host"


def test_bucket_serial_adversarial_distribution(ctx):
    """All scalars equal: every element lands in the same buckets, so the
    while_loop runs n iterations -- correctness must not depend on the
    distribution."""
    host = ctx.host
    rng = SeededRng(18)
    n = msm_mod.BUCKET_SERIAL_MIN
    pts = [rand_sw_point(rng, host.g1) for _ in range(n)]
    k = rand_field(rng, host.r)
    ks = [k] * n

    got_tree = msm_mod.msm(ctx.g1, ctx.t.fr, ctx.g1_to_dev(pts),
                           ctx.t.fr_to_dev(ks))
    import jax
    from ripp_tpu.ops.curve import MIN_REDUCE_BATCH, pad_with_identity

    one = jax.tree.map(lambda x: x[None], got_tree)
    got = ctx.g1_from_dev(pad_with_identity(ctx.g1, one, MIN_REDUCE_BATCH))[0]
    expect = host.g1.msm(pts, ks)
    assert host.g1.eq(got, expect)
