"""ICI cost model sanity (parallel/comm_model.py, VERDICT r4 item 8)."""

from ripp_tpu.parallel.comm_model import sipp_round_costs, summarize


def test_round_structure():
    n, D = 1 << 10, 8
    rows = sipp_round_costs(n, D)
    assert len(rows) == 10  # log2(n) rounds
    # local (cyclic) rounds first, tail rounds after
    locality = [r.device_local for r in rows]
    assert locality == sorted(locality, reverse=True)
    # every local round moves exactly two Fq12 all-reduces
    for r in rows:
        assert r.collective_ops == (2 if r.device_local else 0)
    # compute shrinks geometrically with the vector
    assert rows[0].muls_per_device > rows[4].muls_per_device


def test_comm_is_trivial_at_north_star():
    # the >=80% efficiency bar needs comm/compute < 0.25; the analytic
    # ratio at the 2^14 north-star is orders of magnitude below it
    text = summarize(1 << 14, 8)
    ratio = float(text.splitlines()[-1].split()[2])
    assert ratio < 0.01
