"""Regression tests for the remaining odc Omuses examples."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.models.omu_suite import PrgBatchReactor, PrgBio
from hqp_tpu.sqp.powell import SqpPowell


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
