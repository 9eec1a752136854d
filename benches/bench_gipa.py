"""GIPA prove/verify bench (benches/benches/gipa.rs parity): TIPP and MIPP
configurations at LEN=16 on BLS12-381."""

from __future__ import annotations

import sys

from ripp_tpu.models import gipa
from ripp_tpu.models.instances import mipp_config, tipp_config
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng

from .common import rand_fr_vec, rand_g1_vec, rand_g2_vec, timed

LEN = 16


def bench_config(name, cfg, m_a, m_b, rng):
    ck_a = cfg.lmc.setup(rng, len(m_a))
    ck_b = cfg.rmc.setup(rng, len(m_b))
    ck_t = cfg.ipc.setup(rng, 1)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof, ms = timed(
        gipa.prove, cfg, (m_a, m_b, t), (ck_a, ck_b, ck_t), com
    )
    print(f"{name} prove, len {len(m_a)}: {ms:.1f} ms")
    ok, ms = timed(gipa.verify, cfg, (ck_a, ck_b, ck_t), com, proof)
    assert ok
    print(f"{name} verify, len {len(m_a)}: {ms:.1f} ms")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else LEN
    ctx = dev_ctx("bls12_381")
    rng = SeededRng(0)
    bench_config(
        "GIPA TIPP", tipp_config(ctx),
        rand_g1_vec(ctx, rng, n), rand_g2_vec(ctx, rng, n), rng,
    )
    bench_config(
        "GIPA MIPP", mipp_config(ctx),
        rand_g1_vec(ctx, rng, n), rand_fr_vec(ctx, rng, n), rng,
    )


if __name__ == "__main__":
    main()
