"""CUTE-scale general sparse NLP path (round-2 verdict item 4).

Five generated families at n >= 1000 through SQP-Powell + eager Mehrotra
+ host sparse LDL' (RCM ordered) -- the role of the reference's CUTE
bridge feeding SIF problems into the engine (hqp/Prg_CUTE.C,
hqp_cute/hqp_cute.tcl) through Hqp_IpRedSpBKP.
"""

import pytest

import hqp_tpu
from hqp_tpu.models.nlp_gen import FAMILIES, solve_generated


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_family_n1000(name):
    info = solve_generated(name, n=1000, eps=1e-6)
    assert info["result"] == "optimal", info
    assert info["norm_inf"] < 1e-6


def test_lqblend_small_exact():
    """n = 200 instance with a checkable optimum: window sums pin the
    total mass, so the smoothest profile (constant 0.1 per window) is
    optimal up to boundary terms."""
    info = solve_generated("lqblend", n=200, eps=1e-8)
    assert info["result"] == "optimal"
    # f* = boundary terms + linear term: 0.5*(0.1^2 + 0.1^2) - 20*1
    assert abs(info["obj"] - (-19.99)) < 0.05
