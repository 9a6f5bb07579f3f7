"""Auxiliary subsystems: checkpoint/resume, Client QP offload,
logging/timers, evaluation counters (SURVEY.md section 5 parity)."""

import os
import tempfile

import numpy as np
import pytest

import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.models.nlp_suite import PrgMaratos
from hqp_tpu.sqp.powell import SqpPowell


def test_checkpoint_resume_matches_straight_solve():
    """Stop after 3 SQP iterations, checkpoint, restore into a fresh
    solver, finish -- same optimum as an uninterrupted solve."""
    from hqp_tpu.utils.checkpoint import save_solver, load_solver

    ref = SqpPowell(PrgDID(kmax=60), max_iters=50)
    ref.init()
    assert ref.solve() == "optimal"

    s1 = SqpPowell(PrgDID(kmax=60), max_iters=50)
    s1.init()
    for _ in range(3):
        s1.qp_update()
        s1.qp_solve()
        s1.step()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_solver(path, s1)

        s2 = SqpPowell(PrgDID(kmax=60), max_iters=50)
        s2.init()
        load_solver(path, s2)
        assert s2.iter == s1.iter
        assert s2.solve() == "optimal"
    np.testing.assert_allclose(float(s2.f), float(ref.f), rtol=1e-8)


def test_client_offload_matches_local():
    """sqp_qp_solver Client: QPs shipped to a worker process
    (Hqp_Client role) give the same NLP solution as in-process solves."""
    from hqp_tpu.qp.client import Client

    local = SqpPowell(PrgMaratos(), max_iters=50)
    local.init()
    assert local.solve() == "optimal"

    client = Client()
    try:
        remote = SqpPowell(PrgMaratos(), qp_solver=client, max_iters=50)
        remote.init()
        assert remote.solve() == "optimal"
        np.testing.assert_allclose(float(remote.f), float(local.f),
                                   atol=1e-8)
    finally:
        client.close()


def test_log_levels_and_timers(capsys):
    from hqp_tpu.utils import log

    old = log.level
    try:
        log.set_level("info")
        log.info("sqp", "hello")
        log.error("qp", "bad")
        log.log(log.LOG_ALL, "x", "hidden")
        out = capsys.readouterr().out
        assert "[info] sqp: hello" in out
        assert "[error] qp: bad" in out
        assert "hidden" not in out
    finally:
        log.level = old

    t = log.Timers()
    with t.phase("factor"):
        pass
    with t.phase("factor"):
        pass
    rep = t.report()
    assert rep["factor"]["calls"] == 2


def test_eval_counters_via_shell():
    """prg_fbd_evals readback (odc/run prints Obj-evals)."""
    from hqp_tpu.shell import Shell

    sh = Shell()
    sh.run("prg_name Maratos; prg_setup; hqp_solve")
    assert int(sh("prg_fbd_evals")) > 0
    assert int(sh("prg_grd_evals")) > 0


def test_hessian_strategies_converge():
    """Every registered Hessian strategy solves Maratos to the optimum
    (the exchangeable sqp_hela slot, Hqp_HL hierarchy)."""
    from hqp_tpu.utils.registry import modules
    import hqp_tpu.sqp.hessian  # noqa: F401

    for name in ("BFGS", "SparseBFGS", "DScale", "AugBFGS", "Gangster",
                 "Gerschgorin"):
        hela = modules.create("sqp_hela", name)
        s = SqpPowell(PrgMaratos(), hela=hela, max_iters=80)
        s.init()
        assert s.solve() == "optimal", name
        np.testing.assert_allclose(float(s.f), -1.0, atol=1e-4,
                                   err_msg=name)
