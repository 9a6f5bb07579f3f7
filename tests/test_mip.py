"""Mixed-integer branch & bound (Hqp_MipSolver/Hqp_LPSolve role)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.qp.program import DenseQP
from hqp_tpu.mip.branch_bound import BranchBound


def _brute_force(Q, c, A, b, C, d, grid):
    """Exhaustive check over integer grids (continuous vars absent)."""
    best, bx = np.inf, None
    for x in itertools.product(*grid):
        x = np.asarray(x, float)
        if A is not None and np.max(np.abs(A @ x + b)) > 1e-9:
            continue
        if C is not None and np.min(C @ x + d) < -1e-9:
            continue
        f = 0.5 * x @ Q @ x + c @ x
        if f < best:
            best, bx = f, x
    return bx, best


def test_pure_integer_rounding_trap():
    """min (x0-2.4)^2 + (x1-1.6)^2 + cross term, x integer in [0,4]:
    naive rounding of the relaxation is NOT optimal for this Q."""
    Q = np.array([[2.0, 1.2], [1.2, 2.0]])
    c = -Q @ np.array([2.4, 1.6])
    C = np.vstack([np.eye(2), -np.eye(2)])
    d = np.array([0.0, 0.0, 4.0, 4.0])
    qp = DenseQP.build(Q, c, C=C, d=d)

    bb = BranchBound()
    x, f, status = bb.solve(qp, int_mask=[True, True])
    assert status == "optimal"

    bx, bf = _brute_force(Q, c, None, None, C, d, [range(5), range(5)])
    np.testing.assert_allclose(np.asarray(x), bx)
    np.testing.assert_allclose(f, bf, atol=1e-6)


def test_mixed_integer_with_equality():
    """x0 integer, x1 continuous, equality x0 + x1 = 2.3."""
    Q = np.diag([2.0, 2.0])
    c = np.array([-2.0 * 1.7, -2.0 * 0.2])
    A = np.array([[1.0, 1.0]])
    b = np.array([-2.3])
    C = np.vstack([np.eye(2), -np.eye(2)])
    d = np.array([0.0, 0.0, 5.0, 5.0])
    qp = DenseQP.build(Q, c, A=A, b=b, C=C, d=d)

    bb = BranchBound()
    x, f, status = bb.solve(qp, int_mask=[True, False])
    assert status == "optimal"
    x = np.asarray(x)
    assert abs(x[0] - round(x[0])) < 1e-8
    np.testing.assert_allclose(x[0] + x[1], 2.3, atol=1e-6)

    # exhaustive over the integer variable, continuous solved exactly
    best = np.inf
    for k in range(6):
        x1 = 2.3 - k
        if not (0 <= x1 <= 5):
            continue
        f_k = 0.5 * (2 * k * k + 2 * x1 * x1) + c @ [k, x1]
        best = min(best, f_k)
    np.testing.assert_allclose(f, best, atol=1e-6)


def test_integer_infeasible():
    """Integer point cannot satisfy 0.4 <= x <= 0.6."""
    Q = np.array([[2.0]])
    c = np.array([0.0])
    C = np.array([[1.0], [-1.0]])
    d = np.array([-0.4, 0.6])
    qp = DenseQP.build(Q, c, C=C, d=d)
    bb = BranchBound()
    x, f, status = bb.solve(qp, int_mask=[True])
    assert status == "infeasible"
    assert x is None


def test_no_integers_passthrough():
    Q = np.diag([2.0, 2.0])
    c = np.array([-2.0, -4.0])
    qp = DenseQP.build(Q, c, C=np.eye(2), d=np.zeros(2))
    bb = BranchBound()
    x, f, status = bb.solve(qp, int_mask=[False, False])
    assert status == "optimal"
    np.testing.assert_allclose(np.asarray(x), [1.0, 2.0], atol=1e-6)


def test_registry():
    from hqp_tpu.utils.registry import modules

    assert modules.has("mip_solver", "LPSolve")
    assert modules.has("mip_solver", "BranchBound")


def test_mip_via_shell():
    """Reference flow: SQP solve, then the mip solver over the final
    relaxation (hqp_solve.tcl:258-262), via the command surface."""
    from hqp_tpu.docp.nlp import Nlp
    from hqp_tpu.utils.registry import modules
    from hqp_tpu.shell import Shell

    if not modules.has("prg_name", "IntDemoT"):
        @modules.register("prg_name", "IntDemoT")
        class IntDemoT(Nlp):
            name = "IntDemoT"
            n = 2
            m = 0
            x_int = [True, True]

            def setup_vars(self):
                return dict(x_min=[0.0, 0.0], x_max=[5.0, 5.0],
                            x_init=[1.0, 1.0])

            def f0(self, x):
                return ((x[0] - 2.3) ** 2 + (x[1] - 1.7) ** 2
                        + 0.2 * x[0] * x[1])

    sh = Shell()
    sh.run("prg_name IntDemoT; prg_setup")
    assert sh("hqp_solve") == "optimal"
    assert sh("mip_solve") == "optimal"
    np.testing.assert_allclose(float(sh("mip_f")), 0.98, atol=1e-9)
    assert [round(v) for v in sh._mip_x.tolist()] == [2, 1]
