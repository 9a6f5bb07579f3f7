"""SIF-lite reader: real SIF files through the CUTE path (verdict r3
item 4; reference hqp/Prg_CUTE.C:117+614, hqp_cute/hqp_cute.tcl).

The fixtures in tests/sif/ are classic Hock-Schittkowski / CUTE QP test
problems written in SIF; each solves through the general sparse path
(SQP-Powell + eager Mehrotra + host sparse LDL) to its published
optimum.
"""

import os

import numpy as np
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.models.sif import (PrgSIF, SifError, load_sif, parse_sif,
                                solve_sif)
from hqp_tpu.utils.registry import modules

SIF_DIR = os.path.join(os.path.dirname(__file__), "sif")


# -- parser unit tests -------------------------------------------------------

def test_parse_hs21_structure():
    d = load_sif(os.path.join(SIF_DIR, "HS21.SIF"))
    assert d.name == "HS21"
    assert d.var_names == ["X1", "X2"]
    assert d.con_names == ["CON1"] and d.con_types == ["G"]
    np.testing.assert_allclose(d.A, [[10.0, -1.0]])
    np.testing.assert_allclose(d.Q, [[0.02, 0.0], [0.0, 2.0]])
    # objective constant: MPS rule c0 = -rhs(OBJ)
    assert d.c0 == -100.0
    c_min, c_max = d.bounds()
    np.testing.assert_allclose(c_min, [10.0])
    assert np.isposinf(c_max).all()
    np.testing.assert_allclose(d.x_lo, [2.0, -50.0])
    np.testing.assert_allclose(d.x_up, [50.0, 50.0])
    assert d.solution == pytest.approx(-99.96)


def test_parse_defaults_and_ranges():
    """Default variable bounds are [0, inf); RANGES turns one-sided rows
    two-sided (MPS semantics); negative UP with default LO frees LO."""
    d = parse_sif("""\
NAME          RNGTEST
ROWS
 N  OBJ
 L  R1
 G  R2
 E  R3
COLUMNS
    X1        OBJ       1.0            R1        1.0
    X1        R2        1.0            R3        1.0
    X2        R1        2.0
RHS
    RHS       R1        4.0            R2        1.0
    RHS       R3        2.0
RANGES
    RNG       R1        2.0            R2        3.0
    RNG       R3        -1.0
BOUNDS
 UP BND       X2        -1.0
ENDATA
""")
    c_min, c_max = d.bounds()
    np.testing.assert_allclose(c_min, [2.0, 1.0, 1.0])   # L: b-|r|; E: b+r
    np.testing.assert_allclose(c_max, [4.0, 4.0, 2.0])   # G: b+|r|
    # X1 default [0, inf); X2 negative UP frees the default lower bound
    np.testing.assert_allclose(d.x_lo, [0.0, -np.inf])
    np.testing.assert_allclose(d.x_up, [np.inf, -1.0])


def test_unsupported_nonlinear_constructs_rejected():
    """The nonlinear subset ingests ELEMENT/GROUP sections (round 5);
    constructs genuinely outside it still raise cleanly."""
    with pytest.raises(SifError, match="internal element variables"):
        parse_sif("""\
NAME          NL
GROUPS
 N  OBJ
ELEMENT TYPE
 EV SQ        V1
 IV SQ        U1
ENDATA
""")
    with pytest.raises(SifError, match="no F definition"):
        parse_sif("""\
NAME          NL
GROUPS
 N  OBJ
ELEMENT TYPE
 EV SQ        V1
ELEMENT USES
 T  E1        SQ
 V  E1        V1                       X1
GROUP USES
 E  OBJ       E1
COLUMNS
    X1        OBJ       1.0
ENDATA
""")


def test_nonlinear_structure_parsed():
    d = load_sif(os.path.join(SIF_DIR, "HS7.SIF"))
    assert d.has_nonlinear()
    assert set(d.etypes) == {"LOGSQ", "SQSQP", "SQ"}
    assert d.euses["E2"]["type"] == "SQSQP"
    assert d.grp_elems["CON1"] == [("E2", 1.0), ("E3", 1.0)]
    assert "LOGSQ" in d.elem_fns
    # HS6 exercises a group type on the objective
    d6 = load_sif(os.path.join(SIF_DIR, "HS6.SIF"))
    assert d6.grp_type["OBJ"] == "L2"
    assert "L2" in d6.group_fns
    prg = PrgSIF(d6)
    x = np.asarray([0.5, 0.25])
    # f = (1 - x1)^2; c = 10 x2 - 10 x1^2
    assert float(prg.f0(x)) == pytest.approx(0.25)
    assert float(prg.c(x)[0]) == pytest.approx(0.0)


def test_registered_as_prg_module():
    assert "SIF" in modules.names("prg_name")
    assert "CUTE" in modules.names("prg_name")


# -- end-to-end: published optima -------------------------------------------

CASES = [
    ("HS21.SIF", -99.96),
    ("HS35.SIF", 1.0 / 9.0),
    ("HS76.SIF", -4.681818181),
    ("TAME.SIF", 0.0),
    # nonlinear subset (round 5): ELEMENT/GROUP TYPE+USES with F
    # expressions compiled to jax, derivatives via jax AD
    # (models/sif.py; the reference ingests these through the SIF
    # decoder + Fortran callbacks, hqp/Prg_CUTE.C:117-614)
    ("HS6.SIF", 0.0),
    ("HS7.SIF", -1.7320508075),
    ("HS27.SIF", 0.04),
]


@pytest.mark.parametrize("fname,fstar", CASES)
def test_solve_to_published_optimum(fname, fstar):
    out = solve_sif(os.path.join(SIF_DIR, fname))
    assert out["result"] == "optimal", out
    assert out["obj"] == pytest.approx(fstar, abs=2e-5,
                                       rel=1e-4), out
    assert out["ok"], out


def test_prg_sif_from_text():
    """PrgSIF accepts raw SIF text (and the Q convention is 1/2 x'Qx)."""
    prg = PrgSIF("""\
NAME          MINI
ROWS
 N  OBJ
COLUMNS
    X         OBJ       -2.0
BOUNDS
 UP BND       X         3.0
QUADOBJ
    X         X         2.0
ENDATA
""")
    x = prg.setup()
    # f(x) = -2x + x^2, minimized at x = 1 within [0, 3]
    assert float(prg.f0(np.asarray([1.0]))) == pytest.approx(-1.0)
    assert prg.n == 1 and prg.m == 0
