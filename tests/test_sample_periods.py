"""Per-sample-period constraint rows (round-3 verdict item 6).

The reference gives every sample period kk its own constraint rows
(omu/Hqp_Omuses.C:566-780); summing them over a stage lets a violation
in one period cancel against slack in another.  These tests pin the
corrected semantics: stage constraint vectors are one block per sample
period, widened bounds match, and a program whose per-period constraints
violate while their stage SUM passes is detected as infeasible.
"""

import numpy as np
import jax.numpy as jnp

import hqp_tpu
from hqp_tpu.omu.model import Model
from hqp_tpu.omu.program import OmuProgram
from hqp_tpu.omu.dynamic_opt import DynamicOpt
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.sqp.solver import infeasibility


class _AltSign(OmuProgram):
    """sps=2 toy: c(kk) = (-1)^kk * 1.0 -- the per-stage SUM is 0, but
    every even period violates c <= 0.5."""

    K = 3
    sps = 2
    nx = 1
    nu = 1
    mc = 1

    def __init__(self):
        super().__init__()

    def setup_vars(self):
        K1 = self.K + 1
        return dict(
            x_init=np.zeros((K1, 1)),
            c_max=np.full((K1, 1), 0.5),
        )

    def continuous(self, kk, t, x, u, dx):
        return dx - u  # xdot = u

    def update(self, kk, x, u, xf):
        c = jnp.where(kk % 2 == 0, 1.0, -1.0)[None]
        return xf, jnp.asarray(0.0), c


def test_stage_rows_concatenate_per_period():
    prg = _AltSign()
    v0 = prg.setup()
    # stage-level constraint width = sps * mc_user
    assert prg.mc == 2
    _, _, cvals = prg.eval_vals(v0)
    assert cvals.shape == (prg.K + 1, 2)
    # block j holds period j's value: (+1, -1) per stage
    np.testing.assert_allclose(np.asarray(cvals)[: prg.K],
                               np.tile([1.0, -1.0], (prg.K, 1)))


def test_per_period_violation_is_infeasible():
    """Sum over the stage = 0 <= 0.5 would pass; the per-period +1 rows
    must violate c_max = 0.5 by 0.5."""
    prg = _AltSign()
    v0 = prg.setup()
    _, qp = prg.make_qp(v0)
    viol = float(infeasibility(qp))
    assert abs(viol - 0.5) < 1e-12, viol


class _ConstOut(Model):
    """Output is constantly 1.0 regardless of state."""

    nx = 1
    nu = 1
    ny = 1
    npar = 0

    def ode(self, t, x, u, p):
        return u

    def outputs(self, t, x, u, p):
        return jnp.ones((1,))


def test_decimation_with_output_bound_not_falsely_infeasible():
    """Advisor round-2 high finding: decimation=3 with constant output
    y = 1.0 and y_max = 2.0 summed the three per-period rows to 3.0 > 2.0
    and reported a feasible trajectory infeasible.  With per-period rows
    each is 1.0 <= 2.0 and the problem solves."""
    prg = DynamicOpt(
        _ConstOut(), K=5, x0=[0.0],
        u_min=[-1.0], u_max=[1.0],
        y_max=[2.0],
        u_weight2=[1.0],
        decimation=3,
    )
    s = SqpPowell(prg, max_iters=30)
    s.init()
    assert s.solve() == "optimal"
    assert float(infeasibility(s.qp)) < 1e-8


def _grid_positions(prg, xtraj, nsub):
    """Reconstruct positions on the fine sample grid by re-integrating
    each stage's periods with the program's own integrator, sub-divided
    ``nsub`` times per period (so decimation=1 runs can be evaluated at
    the HALF-stage points the per-period rows would constrain)."""
    pts = []
    for k in range(prg.K):
        xk = jnp.asarray(np.asarray(xtraj)[k, : prg.nx])
        u = jnp.asarray(np.asarray(xtraj)[k, prg.nx: prg.nx + prg.nu])
        for j in range(prg.sps):
            kk = k * prg.sps + j
            t0k, t1k = float(prg.ts[kk]), float(prg.ts[kk + 1])
            x0 = prg.consistic(kk, t0k, xk, u)
            for i in range(nsub):
                ta = t0k + (t1k - t0k) * i / nsub
                tb = t0k + (t1k - t0k) * (i + 1) / nsub
                pts.append((ta, float(x0[1])))
                x0 = prg.integrator.solve(prg.continuous, kk, ta, tb,
                                          x0, u)
            xk = x0
    pts.append((float(prg.ts[-1]), float(np.asarray(xtraj)[-1, 1])))
    return pts


def _braking_arc(decimation):
    """Double integrator entering at v = 1 and forced back to s = 0 at
    t = 1 under the path bound s <= 0.15: the natural return arc apexes
    ~0.19 mid-horizon, so with bounds at the K = 4 knots only the arc
    BULGES over the bound between knots; the decimation=2 half-stage
    rows are what pin it down."""
    prg = DynamicOpt(
        _DIC(), K=4, x0=[1.0, 0.0],
        u_min=[-60.0], u_max=[60.0],
        y_max=[np.inf, 0.15],
        yf_ref=[0.0, 0.0], yf_weight2=[0.0, 100.0],
        u_weight2=[1e-5],
        decimation=decimation,
    )
    s = SqpPowell(prg, max_iters=80)
    s.init()
    r = s.solve()
    assert r == "optimal"
    return prg, s


def test_decimation_per_period_bound_enforced():
    """A bound that only an interior sample period can violate must be
    enforced there (this is exactly why sps > 1 exists,
    Prg_DynamicOpt.h:227-240): with decimation=2 the reconstructed
    positions at EVERY half-stage point obey the bound, and the
    half-stage row at t = 0.375 is BINDING -- if the per-period rows
    were dropped, the solution would bulge to ~0.16 there (the
    decimation=1 control below) and this test would fail."""
    prg, s = _braking_arc(decimation=2)
    pts = _grid_positions(prg, s.x, nsub=1)   # every period start + end
    pos = np.array([p for _, p in pts])
    assert np.all(pos <= 0.15 + 1e-6), pts
    # the interior half-stage row is ACTIVE (binding at the bound)
    interior = {round(t, 3): p for t, p in pts}
    assert interior[0.375] >= 0.15 - 1e-4, pts


def test_decimation_control_knots_only_bulges():
    """Control experiment: the SAME problem with decimation=1 (knot rows
    only) produces a solution whose half-stage positions VIOLATE the
    bound -- proof that the per-period rows of the decimation=2 run are
    load-bearing, not redundant."""
    prg, s = _braking_arc(decimation=1)
    pts = _grid_positions(prg, s.x, nsub=2)   # evaluate at half-stages
    # knot positions obey the bound ...
    x = np.asarray(s.x)
    assert np.all(x[:, 1] <= 0.15 + 1e-6)
    # ... but the reconstructed half-stage apex bulges clearly above it
    assert max(p for _, p in pts) >= 0.155, pts


class _DIC(Model):
    nx = 2
    nu = 1
    ny = 2
    npar = 0

    def ode(self, t, x, u, p):
        # x = (v, s): vdot = u, sdot = v; start moving down from s=0?
        return jnp.array([u[0], x[0]])
