"""Tests for the hxi layer: S-function hosting, FMU hosting, and the
hosted example programs (parity of the hosted paths with the native DID
solution -- the role of odc/runallhxi)."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.hxi.sfunction import SFunction, demo_sfunction_path
from hqp_tpu.hxi.simstruct import PySimStruct, PySFunctionHost
from hqp_tpu.omu.hosted import HostedModel
from hqp_tpu.sqp.powell import SqpPowell


# ---------------------------------------------------------------------------
# binary S-functions
# ---------------------------------------------------------------------------

def test_sfun_did_loads_and_updates():
    dt = 0.1
    ev = SFunction(demo_sfunction_path("sfun_did"), params=[[dt]])
    assert (ev.nx, ev.nxd, ev.nu, ev.ny) == (0, 2, 1, 2)
    xd = ev.update(0.0, [1.0, 0.0], [2.0])
    np.testing.assert_allclose(xd, [1.0 + dt * 2.0,
                                    0.0 + dt * 1.0 + 0.5 * dt * dt * 2.0])
    y = ev.outputs(0.0, [1.0, 2.0], [0.0])
    np.testing.assert_allclose(y, [1.0, 2.0])


def test_sfun_dic_derivatives():
    ev = SFunction(demo_sfunction_path("sfun_dic"), params=[[2.0]])
    assert (ev.nx, ev.nu, ev.ny) == (2, 1, 2)
    dx = ev.derivatives(0.0, [3.0, 1.0], [4.0])
    np.testing.assert_allclose(dx, [4.0 / 2.0, 3.0])


def test_sfun_param_count_error():
    with pytest.raises(RuntimeError, match="expects 1 parameter"):
        SFunction(demo_sfunction_path("sfun_dic"), params=[])


def test_two_instances_are_independent():
    p1 = SFunction(demo_sfunction_path("sfun_dic"), params=[[1.0]])
    p2 = SFunction(demo_sfunction_path("sfun_dic"), params=[[10.0]])
    d1 = p1.derivatives(0.0, [0.0, 0.0], [1.0])
    d2 = p2.derivatives(0.0, [0.0, 0.0], [1.0])
    np.testing.assert_allclose(d1[0], 1.0)
    np.testing.assert_allclose(d2[0], 0.1)


# ---------------------------------------------------------------------------
# Python S-functions (PySimStruct emulation)
# ---------------------------------------------------------------------------

class _PyDic:
    """DIC as a Python S-function against the PySimStruct API."""

    def mdlInitializeSizes(self, S: PySimStruct):
        S.SetNumSFcnParams(1)
        if S.GetSFcnParamsCount() != 1:
            S.SetErrorStatus("need mass")
            return
        S.SetNumContStates(2)
        S.SetNumInputs(1)
        S.SetNumOutputs(2)

    def mdlDerivatives(self, S: PySimStruct):
        m = S.GetSFcnParam(0)[0]
        S.dx[0] = S.u[0] / m
        S.dx[1] = S.x[0]

    def mdlOutputs(self, S: PySimStruct):
        S.y[:] = S.x


def test_python_sfunction_host():
    host = PySFunctionHost(_PyDic(), params=[[2.0]])
    dx = host.derivatives(0.0, [3.0, 1.0], [4.0])
    np.testing.assert_allclose(dx, [2.0, 3.0])


def test_python_sfunction_error_status():
    with pytest.raises(RuntimeError, match="need mass"):
        PySFunctionHost(_PyDic(), params=[])


# ---------------------------------------------------------------------------
# hosted-model bridge: values and derivatives through JAX
# ---------------------------------------------------------------------------

def test_hosted_jacfwd_matches_analytic():
    import jax
    import jax.numpy as jnp

    m = 2.0
    ev = SFunction(demo_sfunction_path("sfun_dic"), params=[[m]])
    model = HostedModel(ev)

    def f(x, u):
        return model.ode(0.0, x, u, ())

    x = jnp.array([0.3, -0.2])
    u = jnp.array([0.7])
    np.testing.assert_allclose(np.asarray(f(x, u)), [0.7 / m, 0.3])
    Jx = jax.jacfwd(f, argnums=0)(x, u)
    Ju = jax.jacfwd(f, argnums=1)(x, u)
    np.testing.assert_allclose(np.asarray(Jx), [[0, 0], [1, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ju), [[1 / m], [0]], atol=1e-6)


# ---------------------------------------------------------------------------
# FMU path
# ---------------------------------------------------------------------------

def test_fmu_build_load_eval():
    from hqp_tpu.hxi.fmu import Fmu, build_test_fmu

    path = build_test_fmu()
    fmu = Fmu(path, params={"m": 4.0})
    assert (fmu.nx, fmu.nu, fmu.ny) == (2, 1, 2)
    dx = fmu.derivatives(0.0, [3.0, 1.0], [8.0])
    np.testing.assert_allclose(dx, [2.0, 3.0])
    y = fmu.outputs(0.0, [3.0, 1.0], [0.0])
    np.testing.assert_allclose(y, [3.0, 1.0])
    # analytic directional derivatives
    J = fmu.jacobian(0.0, [3.0, 1.0], [8.0])
    np.testing.assert_allclose(J, [[0, 0, 0.25], [1, 0, 0]], atol=1e-12)
    fmu.terminate()


# ---------------------------------------------------------------------------
# hosted example programs: parity with the native paths
# ---------------------------------------------------------------------------

def _solve(prg, **kw):
    s = SqpPowell(prg, **kw)
    s.init()
    assert s.solve() == "optimal"
    return s


def test_did_sfunction_parity():
    """Hosted discrete DID matches the native DID objective
    (runallhxi DID_SFunction vs DID)."""
    from hqp_tpu.models.did import PrgDID
    from hqp_tpu.models.hxi_suite import PrgDIDSFunction

    k = 12
    s_native = _solve(PrgDID(kmax=k, with_cns=False))
    s_hosted = _solve(PrgDIDSFunction(kmax=k, with_cns=False))
    np.testing.assert_allclose(float(s_hosted.f), float(s_native.f),
                               rtol=1e-6)


def test_dic_sfunction_parity():
    """Hosted continuous DIC matches the native DIC objective."""
    from hqp_tpu.models.hxi_suite import PrgDIC, PrgDICSFunction

    k = 8
    s_native = _solve(PrgDIC(K=k))
    s_hosted = _solve(PrgDICSFunction(K=k))
    np.testing.assert_allclose(float(s_hosted.f), float(s_native.f),
                               rtol=1e-5)


def test_dic_fmu_parity():
    """Hosted FMU DIC (analytic directional derivatives) matches the
    native DIC objective."""
    from hqp_tpu.models.hxi_suite import PrgDIC, PrgDICFMU

    k = 8
    s_native = _solve(PrgDIC(K=k))
    s_fmu = _solve(PrgDICFMU(K=k))
    np.testing.assert_allclose(float(s_fmu.f), float(s_native.f),
                               rtol=1e-5)
