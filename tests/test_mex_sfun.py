"""MEX S-function hosting (verdict r4 item 8: the last hxi hole).

A MEX-built S-function exports ONLY ``mexFunction``; the host smuggles
the SimStruct pointer through the MEX calling convention and drives the
method table the gateway registers (hxi/Hxi_MEX_SFunction.C role; our
gateway twin is native/hxi_simulink/simulink.c).  Checks:

* the in-tree demo source builds as MEX and exposes exactly the DID
  discrete dynamics;
* the REFERENCE'S OWN odc/sfun_did.c compiles with -DMATLAB_MEX_FILE
  against the emulation and its MEX drive matches the cg_sfun drive;
* mx parameter parsing (Hxi_mx_parse role);
* a MEX-built S-function drives a full hosted-model OPTIMIZATION
  (DID_MEX: SQP over the hosted stage map) to the native objective.
"""

import ctypes
import os

import numpy as np
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.hxi.mex import (MexEvaluator, MexSFunction,
                             build_mex_sfunction)
from hqp_tpu.hxi.mx_parse import MxCell, parse_args, parse_argument

_DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "hxi_simulink",
    "sfun_did_demo.c")
REF_SRC = "/root/reference/odc/sfun_did.c"


@pytest.fixture(scope="module")
def mex_demo():
    return build_mex_sfunction(_DEMO)


def test_mex_exports_only_mexfunction(mex_demo):
    lib = ctypes.CDLL(mex_demo)
    assert hasattr(lib, "mexFunction")
    # the cg_sfun export surface must NOT be present in a MEX build
    assert not hasattr(lib, "hxi_mdlOutputs")


def test_mex_lifecycle_and_dynamics(mex_demo):
    dt = 1.0 / 60.0
    sf = MexSFunction(mex_demo, params=[dt])
    assert sf.ndisc == 2 and sf.ncont == 0
    assert sf.nin == 1 and sf.nout == 2
    assert sf.has_update and not sf.has_derivatives
    assert sf.sample_time() == pytest.approx(dt)
    np.testing.assert_allclose(sf.xd, [1.0, 0.0])
    from hqp_tpu.models.did import PrgDID
    prg = PrgDID(kmax=60)
    x = np.array([1.0, 0.0])
    for k in range(8):
        u = np.array([-2.0 + 0.3 * k])
        np.testing.assert_allclose(sf.outputs(t=k * dt), x, atol=1e-14)
        sf.set_inputs(u)
        sf.update(t=k * dt)
        x = np.asarray(prg.f(k, x, u))
        np.testing.assert_allclose(sf.xd, x, atol=1e-13)


@pytest.mark.skipif(not os.path.exists(REF_SRC),
                    reason="reference tree not available")
def test_reference_source_builds_as_mex():
    """The reference's own S-function source compiles unmodified down
    the MATLAB_MEX_FILE branch and gives the same trajectory as its
    cg_sfun build."""
    from hqp_tpu.hxi.simulink import SimulinkSFunction, build_sfunction

    dt = 0.05
    mex = MexSFunction(build_mex_sfunction(REF_SRC), params=[dt])
    cg = SimulinkSFunction(build_sfunction(REF_SRC), params=[dt])
    assert (mex.ndisc, mex.nin, mex.nout) == (cg.ndisc, cg.nin, cg.nout)
    for k in range(6):
        u = np.array([0.7 - 0.2 * k])
        for sf in (mex, cg):
            sf.set_inputs(u)
            sf.update(t=k * dt)
        np.testing.assert_allclose(mex.xd, cg.xd, atol=1e-14)


def test_mx_parse():
    vals = parse_args("[1 2; 3 4], 'it''s', {1, 2}, 2.5")
    np.testing.assert_allclose(vals[0], [[1.0, 2.0], [3.0, 4.0]])
    assert vals[1] == "it's"
    assert isinstance(vals[2], MxCell) and vals[2] == "1, 2"
    np.testing.assert_allclose(vals[3], [[2.5]])
    assert parse_argument("[]").size == 0
    with pytest.raises(Exception):
        parse_argument("[1 2; 3]")


def test_mex_evaluator_and_char_param(mex_demo):
    ev = MexEvaluator(mex_demo, args="[0.1]")
    assert (ev.nxd, ev.nu, ev.ny) == (2, 1, 2)
    x1 = ev.update(0.0, np.array([1.0, 0.0]), np.array([-2.0]))
    np.testing.assert_allclose(x1, [1.0 - 0.2, 1.0 * 0.1 - 0.01])


@pytest.mark.slow
def test_mex_drives_dynamic_optimization():
    """A MEX-built S-function under the full hosted-model optimization
    (verdict r4 item 8 'Done' criterion): DID_MEX solves to the native
    DID objective."""
    import hqp_tpu.all_modules  # noqa: F401
    from hqp_tpu.sqp.powell import SqpPowell
    from hqp_tpu.utils.registry import modules

    prg = modules.create("prg_name", "DID_MEX", kmax=60)
    s = SqpPowell(prg, max_iters=50)
    s.init()
    r = s.solve()
    assert r == "optimal"
    assert float(s.f) == pytest.approx(98.4, abs=1e-3)
