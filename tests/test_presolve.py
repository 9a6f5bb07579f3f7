"""Parallel-row presolve (hqp_tpu.qp.presolve): the scenarios256
degeneracy fix (verdict r4 item 3).  perf/scen_dedup.py holds the full
experiment matrix (drop/jitter/merge); here: semantic unit tests + the
rescue on known-failing perturbed DID instances."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.models.did import PrgDID
from hqp_tpu.parallel.scenarios import batched_qp
from hqp_tpu.qp.presolve import merge_parallel_rows, original_row_violation
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra


def _did_qp(idx=None, kmax=60):
    prg = PrgDID(kmax=kmax)
    v0 = prg.setup()
    if idx is None:
        v = v0
    else:
        v = batched_qp(prg, v0, 256, scale=1e-3)[idx]
    Q = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    _, qp = prg.make_qp(v, Q=Q)
    return qp


def test_merge_folds_parallel_row_into_box():
    qp = _did_qp()
    qp2 = merge_parallel_rows(qp, tau=0.02)
    # the DID path row x1 + dt/2 x0 <= 0.01 is tau-parallel to e_{x1}:
    # merged rows are deactivated, the x1 upper bound absorbs the rhs
    assert not bool(jnp.any(jnp.isfinite(qp2.d_up)
                            & jnp.asarray(qp2.con_mask)))
    k = 5  # an interior stage with the finite path row
    assert float(qp2.ub[k, 1]) == pytest.approx(
        min(float(qp.ub[k, 1]), float(qp.d_up[k, 0])))
    # rows NOT tau-parallel stay: widen the off-axis coefficient
    C = qp.C.at[:, 0, 0].set(0.5)
    qp3 = merge_parallel_rows(dataclasses.replace(qp, C=C), tau=0.02)
    assert bool(jnp.any(jnp.isfinite(qp3.d_up)))


def test_merge_is_exact_for_true_duplicates():
    qp = _did_qp()
    # make the general row an EXACT copy of the box row e_{x1}
    C = jnp.zeros_like(qp.C).at[:, 0, 1].set(1.0)
    qp_dup = dataclasses.replace(qp, C=C)
    qp2 = merge_parallel_rows(qp_dup, tau=1e-12)
    assert float(qp2.ub[5, 1]) == pytest.approx(float(qp.d_up[5, 0]))
    assert not bool(jnp.any(jnp.isfinite(qp2.d_up)
                            & jnp.asarray(qp2.con_mask)))


def test_lower_side_and_sign_handling():
    qp = _did_qp()
    # negative-coefficient row with a LOWER bound on the (unbounded) x0:
    # -v_0 >= -0.02 means v_0 <= 0.02 -> folds into ub
    C = jnp.zeros_like(qp.C).at[:, 0, 0].set(-1.0)
    d_lo = jnp.full_like(qp.d_lo, -0.02)
    d_up = jnp.full_like(qp.d_up, jnp.inf)
    qp_neg = dataclasses.replace(qp, C=C, d_lo=d_lo, d_up=d_up)
    qp2 = merge_parallel_rows(qp_neg, tau=1e-9)
    assert float(qp2.ub[5, 0]) == pytest.approx(0.02)


@pytest.mark.slow
def test_rescues_failing_scenarios():
    """Instances 22 and 144 defeat every raw IP variant (scen_dedup.py);
    the merged QPs solve to optimal with small original-row violation."""
    slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"),
                   eps=1e-9)
    for idx in (22, 144):
        qp = _did_qp(idx)
        st_raw = slv.solve(qp, slv.init_state(qp))
        assert int(st_raw.result) != 0       # the degeneracy is real
        qp2 = merge_parallel_rows(qp, tau=0.02)
        st = slv.solve(qp2, slv.init_state(qp2))
        assert int(st.result) == 0
        assert float(original_row_violation(qp, st.x)) < 5e-3
