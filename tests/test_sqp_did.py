"""End-to-end regression: the DID double-integrator DOCP.

This is the reference's build smoke test (Makefile.hqp:11 runs hqp_docp/docp,
a 60-stage DID through LQDOCP + Mehrotra, asserting 'optimal'); here the
same problem runs through Docp -> SQP-Powell -> Mehrotra -> RiccatiKKT."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell


def test_did_60():
    prg = PrgDID(kmax=60)
    s = SqpPowell(prg, max_iters=50)
    s.init()
    result = s.solve()
    assert result == "optimal"
    # converged to tolerance
    assert s.norm_inf < s.eps
    # boundary conditions hold
    x = np.asarray(s.x)
    np.testing.assert_allclose(x[0, :2], [1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(x[-1, :2], [-1.0, 0.0], atol=1e-5)
    # objective: cross-validated against an independent SLSQP solve of the
    # same discretization (f* = 98.4000000)
    np.testing.assert_allclose(float(s.f), 98.4, rtol=1e-6)


def test_did_no_cns():
    prg = PrgDID(kmax=30, with_cns=False)
    s = SqpPowell(prg, max_iters=50)
    s.init()
    result = s.solve()
    assert result == "optimal"
    assert s.norm_inf < s.eps


def test_did_infeasible_detected():
    """DID with the extra path constraint is INFEASIBLE for kmax < 60:
    c_0 = dt/2 * x0_0 = 1/(2 kmax) > 0.01 at the fixed initial state.
    The driver must report it (the reference raises 'error infeasible',
    hqp/hqp_solve.tcl:224-230)."""
    from hqp_tpu.sqp.solver import SqpError

    prg = PrgDID(kmax=30, with_cns=True)
    s = SqpPowell(prg, max_iters=50)
    s.init()
    with pytest.raises(SqpError) as ei:
        s.solve()
    assert ei.value.reason in ("infeasible", "stall", "iters")
