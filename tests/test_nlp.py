"""Regression tests for the general NLP path (dense QP, equality rows).

Objectives pinned to the literature values the reference suite reproduces
(odc/Prg_TP383.C, Prg_Maratos.C, Prg_HS99.C)."""

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.models.nlp_suite import PrgTP383, PrgMaratos, PrgHS99
from hqp_tpu.sqp.powell import SqpPowell


def run(prg, **kw):
    s = SqpPowell(prg, **kw)
    s.init()
    result = s.solve()
    return s, result


def test_maratos():
    s, result = run(PrgMaratos())
    assert result == "optimal"
    np.testing.assert_allclose(float(s.f), -1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.x), [1.0, 0.0], atol=1e-4)


def test_tp383():
    s, result = run(PrgTP383())
    assert result == "optimal"
    # Schittkowski's published optimum for TP383
    np.testing.assert_allclose(float(s.f), 728565.5, rtol=1e-4)


def test_hs99():
    s, result = run(PrgHS99())
    assert result == "optimal"
    # Hock-Schittkowski: f* = -0.831079892e9
    np.testing.assert_allclose(float(s.f), -0.831079892e9, rtol=1e-5)
