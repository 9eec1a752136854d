"""Device pairing differential tests vs the host ground truth (toy curve:
same kernel structure as BLS12-381 at ~20x cheaper XLA compiles).

Covers the paths the protocol tests only exercise implicitly: the full
multi_pairing (Miller + product reduce + device final exponentiation via
the BLS12 seed ladder) and the batched GT exponentiation scan."""

import pytest

from ripp_tpu.host import pairing as hp
from ripp_tpu.ops.pairing import dev_pairing
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field


@pytest.fixture(scope="module")
def ctx():
    return dev_ctx("bls12_toy")


def _fixture(ctx, n, seed=17):
    host = ctx.host
    rng = SeededRng(seed)
    A = [host.g1.scalar_mul(host.g1_gen, rand_field(rng, host.r))
         for _ in range(n)]
    B = [host.g2.scalar_mul(host.g2_gen, rand_field(rng, host.r))
         for _ in range(n)]
    return A, B


def test_multi_pairing_matches_host(ctx):
    """Full device pairing product (incl. the seed-ladder final exp on
    device) must equal the host product bit-for-bit."""
    A, B = _fixture(ctx, 8)
    got = dev_pairing(ctx).multi_pairing(ctx.g1_to_dev(A), ctx.g2_to_dev(B))
    expect = hp.multi_pairing(ctx.host, A, B)
    assert got == expect


def test_multi_pairing_identity_pairs(ctx):
    """Identity points contribute the neutral Miller value."""
    A, B = _fixture(ctx, 4, seed=23)
    A2 = [A[0], None, A[2], None]
    got = dev_pairing(ctx).multi_pairing(
        ctx.g1_to_dev(A2), ctx.g2_to_dev(B)
    )
    expect = hp.multi_pairing(ctx.host, A2, B)
    assert got == expect


def test_gt_exp_batch_matches_host(ctx):
    host = ctx.host
    rng = SeededRng(29)
    A, B = _fixture(ctx, 2, seed=31)
    g1 = hp.pairing(host, A[0], B[0])
    g2 = hp.pairing(host, A[1], B[1])
    es = [rand_field(rng, host.r) for _ in range(3)] + [0, 1, host.r - 1]
    gs = [g1, g2, g1, g2, g1, g2]
    got = dev_pairing(ctx).gt_exp_batch(gs, es)
    expect = [hp.gt_exp(host, g, e) for g, e in zip(gs, es)]
    assert got == expect
