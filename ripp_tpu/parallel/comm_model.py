"""Analytic ICI cost model for the sharded provers (VERDICT r4 item 8).

The 1-chip environment cannot measure multi-chip efficiency, so this
module makes the >=80% efficiency claim CHECKABLE analytically: for each
protocol round it reports the per-device compute (Fp-mul count, the
currency every kernel roofline in BASELINE.md is stated in) against the
exact collective traffic the mesh layout incurs (ops and bytes), so a
reader can plug in any chip's mul/s and ICI bandwidth and bound the
communication overhead.

Layout facts it encodes (parallel/sipp.py, parallel/vectors.py):
  * vectors are block-cyclic over the 1-D mesh: splits, cross-pairings
    and folds are DEVICE-LOCAL for the first log2(n)-log2(D) rounds;
  * each round's two cross pairing-products end in ONE multiplicative
    Fq12 all-reduce (implemented as all_gather + local product) whose
    payload is a single Fp12 element per device: 12*nl*4 bytes;
  * folds move zero bytes;
  * the tail (vector <= D elements) is gathered once: n_tail * point
    bytes, counted as a one-off.

Fp-mul counts per unit (from the kprog schedules / BASELINE.md r4):
  pairing (fused Miller, BLS12-381): 7,745 + ~54 product-tree share
  G1 ladder bit: ~14 muls/bit (RCB15 add+double, 12 Fp muls each, a=0)
  G2 ladder bit: ~3.3x G1 (Fp2 arithmetic)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

MULS_PER_PAIR = 7_800          # fused Miller + product-tree share
G1_LADDER_MULS_PER_BIT = 26    # RCB15 dbl (12) + add (12) + overhead
G2_FACTOR = 3.3                # fp2 mul = 3 fp muls + adds


@dataclass
class RoundCost:
    rnd: int
    vec_len: int
    device_local: bool
    muls_per_device: int
    collective_ops: int
    collective_bytes_per_device: int


def sipp_round_costs(n: int, D: int, nl: int = 24,
                     r_bits: int = 255) -> List[RoundCost]:
    """Per-round cost table for the sharded SIPP prove at size n over a
    D-device mesh (nl = Fp limb count; BLS12-381 default)."""
    assert n & (n - 1) == 0 and D & (D - 1) == 0
    fp12_bytes = 12 * nl * 4
    out: List[RoundCost] = []
    rnd = 0
    length = n
    while length > 1:
        rnd += 1
        half = length // 2
        local = half >= D  # cyclic layout keeps folds local until m == 1
        # two cross products of `half` pairs, sharded over D
        pairs_per_dev = -(-half // D) * 2
        miller = pairs_per_dev * MULS_PER_PAIR
        # fold: G1 128-bit ladder + G2 r-bit ladder per local element
        per_dev_elems = -(-half // D)
        fold = per_dev_elems * (
            128 * G1_LADDER_MULS_PER_BIT
            + int(r_bits * G1_LADDER_MULS_PER_BIT * G2_FACTOR)
        )
        if local:
            # 2 multiplicative Fq12 all-reduces (one per cross product):
            # all_gather payload = one Fp12 per device
            c_ops, c_bytes = 2, 2 * fp12_bytes * D
        else:
            # tail rounds run on gathered data on one device
            c_ops, c_bytes = 0, 0
        out.append(RoundCost(rnd, length, local, miller + fold,
                             c_ops, c_bytes))
        length = half
    return out


def summarize(n: int, D: int, nl: int = 24,
              muls_per_s: float = 339e6,
              ici_bytes_per_s: float = 45e9) -> str:
    """Render the table plus a compute/communication ratio.

    Defaults: 339M in-kernel muls/s (measured fused-Miller rate on one
    v5e, BASELINE.md r4) and 45 GB/s per-link ICI (v5e 1-D ring,
    conservative). The conclusion is insensitive to either within 10x.
    """
    rows = sipp_round_costs(n, D, nl)
    lines = ["rnd  vec_len  local  muls/dev      coll_ops  bytes/dev"]
    tot_mul = tot_bytes = 0
    for r in rows:
        lines.append(
            f"{r.rnd:3d}  {r.vec_len:7d}  {str(r.device_local):5s}"
            f"  {r.muls_per_device:12,d}  {r.collective_ops:8d}"
            f"  {r.collective_bytes_per_device:9,d}")
        tot_mul += r.muls_per_device
        tot_bytes += r.collective_bytes_per_device
    t_mul = tot_mul / muls_per_s
    t_ici = tot_bytes / ici_bytes_per_s
    # one-off tail gather
    tail_bytes = D * 3 * nl * 4 * 3  # D G1+G2 projective points, approx
    lines.append(
        f"totals: {tot_mul:,d} muls/dev ({t_mul:.3f} s at "
        f"{muls_per_s/1e6:.0f}M muls/s) vs {tot_bytes:,d} collective "
        f"bytes/dev + {tail_bytes:,d} tail ({1e3*t_ici:.3f} ms at "
        f"{ici_bytes_per_s/1e9:.0f} GB/s)")
    lines.append(
        f"comm/compute = {t_ici / t_mul:.2e} "
        f"(>=80% scaling efficiency needs < 0.25)")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 14
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(summarize(n, D))
