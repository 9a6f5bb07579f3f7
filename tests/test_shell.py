"""Command-shell parity: reference-style driver scripts keep working."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.shell import Shell


def test_did_via_shell():
    """The hqp_docp demo flow (hqp_docp/Docp_Main.C:20-60):
    select program, configure, setup, solve, read results back."""
    sh = Shell()
    sh.run("""
        prg_name DID
        prg_kmax 60
        sqp_solver Powell
        qp_mat_solver SpSC
        sqp_max_iters 50
        prg_setup
        sqp_init
    """)
    result = sh("hqp_solve")
    assert result == "optimal"
    f = float(sh("prg_f"))
    np.testing.assert_allclose(f, 98.4, rtol=1e-5)
    assert float(sh("sqp_norm_inf")) < float(sh("sqp_eps"))


def test_knobs_and_modules():
    sh = Shell()
    sh("prg_name Maratos")
    sh("sqp_solver Schittkowski")
    sh("sqp_eps 1e-6")
    assert float(sh("sqp_eps")) == 1e-6
    sh("prg_setup")
    assert sh("hqp_solve") == "optimal"
    np.testing.assert_allclose(float(sh("prg_f")), -1.0, atol=1e-5)
    assert sh("qp_result") == "optimal"
