"""Globalization evidence: the Powell watchdog rescuing the Maratos
effect, watchdog back-out, and Schittkowski convergence on the odc suite
(verdict r3 item 5; reference hqp/Hqp_SqpPowell.C:280-346 watchdog,
hqp/Hqp_SqpSchittkowski.C line search)."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.models.nlp_suite import PrgHS99, PrgMaratos, PrgTP383
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.sqp.schittkowski import SqpSchittkowski


def _run(cls, prg, **kw):
    s = cls(prg, **kw)
    s.init()
    r = s.solve()
    return s, r


# -- watchdog ----------------------------------------------------------------

def test_watchdog_rescues_maratos_effect():
    """The Maratos problem (odc/Prg_Maratos.C) makes the exact-penalty
    line search reject full steps near the solution (second-order
    constraint violation), crawling with alpha ~ 0.03 for ~45
    iterations.  The watchdog relaxation accepts full steps and restores
    fast local convergence (Hqp_SqpPowell.C:280-346)."""
    s0, r0 = _run(SqpPowell, PrgMaratos(), max_iters=60)
    assert r0 == "optimal"
    assert s0.wd_relaxed_steps == 0           # off by default (credit 0)

    s1, r1 = _run(SqpPowell, PrgMaratos(), max_iters=60,
                  watchdog_start=1, watchdog_credit=3)
    assert r1 == "optimal"
    np.testing.assert_allclose(float(s1.f), -1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.x), [1.0, 0.0], atol=1e-4)
    assert s1.wd_relaxed_steps >= 2           # relaxation actually fired
    # and it genuinely rescued the convergence speed (45 -> ~7 iters)
    assert s1.iter <= s0.iter - 10


def test_watchdog_backs_out_bad_relaxations():
    """With an aggressive credit the watchdog accepts steps that do NOT
    pay off and must restore the backed-up iterate (x, s, y, z)
    (Hqp_SqpPowell.C:313-345) -- and still converge to the optimum."""
    s, r = _run(SqpPowell, PrgMaratos(), max_iters=60,
                watchdog_start=0, watchdog_credit=2)
    assert r == "optimal"
    np.testing.assert_allclose(float(s.f), -1.0, atol=1e-5)
    assert s.wd_backouts >= 1                 # the back-out path ran


# -- Schittkowski ------------------------------------------------------------

@pytest.mark.parametrize("cls,fstar,rtol", [
    (PrgMaratos, -1.0, 1e-5),
    (PrgHS99, -0.831079892e9, 1e-5),
    (PrgTP383, 728565.5, 1e-4),
])
def test_schittkowski_converges_on_odc_suite(cls, fstar, rtol):
    """Schittkowski's augmented-Lagrangian line search drives the odc
    problems to their published optima (Hqp_SqpSchittkowski.C)."""
    s, r = _run(SqpSchittkowski, cls(), max_iters=120)
    assert r == "optimal"
    np.testing.assert_allclose(float(s.f), fstar, rtol=rtol)


def test_schittkowski_beats_plain_powell_on_maratos():
    """The augmented-Lagrangian merit does not suffer the Maratos
    effect here: it converges in ~10 iterations where plain Powell
    (no watchdog) needs ~45."""
    ss, rs = _run(SqpSchittkowski, PrgMaratos(), max_iters=120)
    sp, rp = _run(SqpPowell, PrgMaratos(), max_iters=60)
    assert rs == rp == "optimal"
    assert ss.iter <= sp.iter - 10
