"""Regression tests for the remaining odc Omuses examples."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.models.omu_suite import PrgBatchReactor, PrgBio
from hqp_tpu.sqp.powell import SqpPowell

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def test_batch_reactor():
    """odc BatchReactor: known optimum f* ~ -0.57354 (kinf=0.5, K=40)."""
    s = SqpPowell(PrgBatchReactor(K=40), max_iters=100)
    s.init()
    s.simulate()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), -0.57354, rtol=1e-3)


def test_bio():
    """odc Bio fermentation: converges; objective regression-pinned."""
    s = SqpPowell(PrgBio(K=51), max_iters=100)
    s.init()
    s.simulate()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), -6.8808, rtol=1e-3)


def test_tp383omu_matches_tp383():
    """TP383omu (14-stage multistage form) reaches the same optimum as
    the stage-free TP383 (odc/runall parity pair)."""
    from hqp_tpu.models.omu_suite import PrgTP383omu

    s = SqpPowell(PrgTP383omu(), max_iters=100)
    s.init()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), 728593.646, rtol=1e-6)


def test_hs99omu():
    """HS99omu (7-stage continuous-time form): literature optimum
    f* = -0.831079892e9 (odc/Prg_HS99omu.C)."""
    from hqp_tpu.models.omu_suite import PrgHS99omu

    s = SqpPowell(PrgHS99omu(), max_iters=100)
    s.init()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), -0.831079892e9, rtol=1e-7)


def test_cranepar_estimates_mass():
    """CranePar: recover the crane load mass (true 4000 kg) and initial
    states from noisy position measurements (odc/cranepar.tcl flow)."""
    from hqp_tpu.models.omu_suite import PrgCranePar

    prg = PrgCranePar()
    s = SqpPowell(prg, max_iters=100)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    mass = 1e3 * x[0, 0]
    np.testing.assert_allclose(mass, 4000.0, rtol=0.02)
    np.testing.assert_allclose(x[0, 4], 25.0, atol=0.1)
