"""Exact stage equality constraints through the DOCP layer.

Round-2 verdict item 2: the reference carries genuine per-stage equality
rows, eliminated inside the Riccati recursion by generalized elimination
(hqp/Hqp_IpLQDOCP.C:1377, GE_QP meschach/addon_hqp.h:207-209) and bucketed
by Hqp_Docp's parse_constr (hqp/Hqp_Docp.C:372).  The TPU build realizes
them as (a) lb == ub fixed-variable rows for fixed states at k >= 1 and
(b) E_k v_k + e_k = 0 general stage rows for fixed (c_min == c_max)
general constraints -- both exact (penalty blocks + iterative refinement),
with no relaxation band anywhere.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.docp.program import Docp
from hqp_tpu.models.did import PrgDID
from hqp_tpu.qp.kkt import FullStageKKT, RiccatiKKT
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.sqp.powell import SqpPowell


def test_did_fixed_terminal_through_lqdocp():
    """DID has a FIXED TERMINAL STATE: with fixed states at k >= 1 kept
    as exact lb == ub equality rows (not structural pins), the flagship
    problem solves through `qp_mat_solver LQDOCP` -- the round-1 silent
    wrong-structure hazard (kkt.py raise) no longer applies to it."""
    # kmax = 60: the reference default; the path constraint makes any
    # kmax < 60 structurally infeasible (tests/test_sqp_did.py)
    prg = PrgDID(kmax=60)
    s = SqpPowell(prg, kkt_backend=RiccatiKKT(), max_iters=50)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    # boundary conditions exact to refinement tolerance, not a 1e-7 band
    np.testing.assert_allclose(x[0, :2], [1.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(x[-1, :2], [-1.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(float(s.f), 98.4, rtol=1e-6)


def test_did_lqdocp_matches_partitioned():
    prgs = [PrgDID(kmax=30, with_cns=False),
            PrgDID(kmax=30, with_cns=False)]
    fs = []
    for prg, be in zip(prgs, [RiccatiKKT(), PartitionedKKT()]):
        s = SqpPowell(prg, kkt_backend=be, max_iters=50)
        s.init()
        assert s.solve() == "optimal"
        fs.append(float(s.f))
    np.testing.assert_allclose(fs[0], fs[1], rtol=1e-7)


class PrgRing(Docp):
    """Steered integrator with a NONLINEAR general equality constraint:
    the mid-horizon state must lie ON the unit circle (c == 1, not a
    band).  Drives the E-row path (docp -> StageQP.E -> stage_eq_penalty
    + refinement)."""

    nx = 2
    nu = 2
    mc = 1

    def __init__(self, kmax=10):
        self.K = kmax
        self.kc = kmax // 2

    def setup_vars(self):
        K, K1 = self.K, self.K + 1
        inf = np.inf
        x_min = np.full((K1, 2), -inf)
        x_max = np.full((K1, 2), inf)
        x_min[0] = x_max[0] = (0.0, 0.0)
        c_min = np.full((K1, 1), -inf)
        c_max = np.full((K1, 1), inf)
        c_min[self.kc] = c_max[self.kc] = 1.0   # ||x_kc||^2 == 1 exactly
        return dict(x_min=x_min, x_max=x_max,
                    x_init=np.zeros((K1, 2)),
                    u_init=np.full((K, 2), 0.1),
                    c_min=c_min, c_max=c_max)

    def f(self, k, x, u):
        return x + 0.2 * u

    def f0(self, k, x, u):
        return jnp.sum(u * u) + 0.1 * jnp.sum(x * x)

    def c(self, k, x, u):
        return jnp.array([x[0] ** 2 + x[1] ** 2])


@pytest.mark.parametrize("backend", [None, RiccatiKKT(), FullStageKKT()],
                         ids=["SpSC", "LQDOCP", "FullKKT"])
def test_nonlinear_equality_exact(backend):
    prg = PrgRing(kmax=10)
    s = SqpPowell(prg, kkt_backend=backend, max_iters=60, eps=1e-7)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    r2 = x[prg.kc, 0] ** 2 + x[prg.kc, 1] ** 2
    # 1e-9 feasibility on the nonlinear equality: impossible with the
    # round-1 fix_band = 1e-7 relaxation
    assert abs(r2 - 1.0) < 1e-9
    # the solution is pushed to the circle, objective positive
    assert float(s.f) > 0.0


def test_eqg_multipliers_in_grd_L():
    """eval_grd_L must include the E' y_gen term: at a converged point the
    Lagrangian gradient with the converged multipliers is ~ 0."""
    prg = PrgRing(kmax=8)
    s = SqpPowell(prg, max_iters=60, eps=1e-8)
    s.init()
    assert s.solve() == "optimal"
    g = prg.eval_grd_L(s.x, s.y, s.z)
    g = jnp.where(s.qp.x_mask(), g, 0.0)
    assert float(jnp.max(jnp.abs(g))) < 1e-5
