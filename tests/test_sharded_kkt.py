"""Sharded partitioned KKT vs single-device PartitionedKKT and the dense
oracle, on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.qp.kkt import FullStageKKT
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.parallel.sharded_kkt import ShardedPartitionedKKT
from hqp_tpu.parallel.scenarios import make_mesh
from tests.test_kkt import random_stage_qp, random_zw, random_rhs

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def _solve_with(be, qp, seed=2):
    z, w, mask = random_zw(qp, seed=1)
    rhs = random_rhs(qp, seed=seed)
    fac = be.factor(qp, z, w, mask)
    return be.solve(fac, qp, z, w, mask, *rhs), (z, w, mask, rhs)


def _kkt_res(qp, ctx, sol):
    from hqp_tpu.qp import kkt as K_
    z, w, mask, rhs = ctx
    *_, res = K_.kkt_residual(qp, z, w, mask, *rhs, *sol)
    return float(res)


@pytest.mark.parametrize("ndev,K,nx,nu,mc,L", [
    (8, 24, 2, 1, 1, 3),
    (4, 24, 3, 2, 2, 3),
    (2, 12, 2, 2, 0, 6),
    (1, 8, 3, 1, 1, 4),
])
def test_sharded_matches_single_device(ndev, K, nx, nu, mc, L):
    qp = random_stage_qp(K, nx, nu, mc, seed=K + ndev)
    mesh = make_mesh(ndev, axes=("sp",))
    sh = ShardedPartitionedKKT(mesh, axis="sp", L=L)
    single = PartitionedKKT(L=sh._choose_L(K, nx, nu))

    (dx_s, dy_s, dz_s, dw_s), ctx = _solve_with(sh, qp)
    (dx_1, dy_1, dz_1, dw_1), _ = _solve_with(single, qp)

    # both directions are iteratively refined to their own floor; the
    # binding correctness statement is the true KKT residual, plus
    # agreement with the single-device solve at refinement-floor level
    assert _kkt_res(qp, ctx, (dx_s, dy_s, dz_s, dw_s)) < 1e-8
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy_s["dyn"]),
                               np.asarray(dy_1["dyn"]),
                               rtol=1e-5, atol=1e-6)


def test_sharded_matches_oracle():
    K, nx, nu, mc = 16, 2, 1, 1
    qp = random_stage_qp(K, nx, nu, mc, seed=5)
    mesh = make_mesh(4, axes=("sp",))
    sh = ShardedPartitionedKKT(mesh, axis="sp", L=4)
    full = FullStageKKT()

    (dx_s, dy_s, dz_s, dw_s), _ = _solve_with(sh, qp)
    (dx_f, dy_f, dz_f, dw_f), _ = _solve_with(full, qp)

    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_f),
                               rtol=1e-7, atol=1e-7)
    for f in ("bl", "bu", "gl", "gu"):
        np.testing.assert_allclose(np.asarray(getattr(dz_s, f)),
                                   np.asarray(getattr(dz_f, f)),
                                   rtol=1e-7, atol=1e-7)


def test_factor_is_actually_sharded():
    """The interior factors must be distributed: every device holds only
    P/ndev partitions of the Minv/W arrays."""
    K, nx, nu, mc, ndev = 24, 2, 1, 1, 8
    qp = random_stage_qp(K, nx, nu, mc, seed=3)
    mesh = make_mesh(ndev, axes=("sp",))
    sh = ShardedPartitionedKKT(mesh, axis="sp", L=3)
    z, w, mask = random_zw(qp, seed=1)
    fac = sh.factor(qp, z, w, mask)

    P = fac.Minv.shape[0]
    assert P % ndev == 0
    shards = fac.Minv.addressable_shards
    assert len(shards) == ndev
    for s in shards:
        assert s.data.shape[0] == P // ndev
    # master factors are replicated (every shard carries the full copy)
    dM_shards = fac.dM.addressable_shards
    assert all(s.data.shape == fac.dM.shape for s in dM_shards)


def test_sharded_ip_step_runs():
    """One Mehrotra IP step through the sharded backend on a DID DOCP."""
    from hqp_tpu.models.did import PrgDID
    from hqp_tpu.qp import mehrotra as ip

    prg = PrgDID(kmax=24)
    v0 = prg.setup()
    Q0 = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    _, qp = prg.make_qp(v0, Q=Q0)

    mesh = make_mesh(8, axes=("sp",))
    solver = ip.Mehrotra(backend=ShardedPartitionedKKT(mesh, axis="sp", L=3))
    st = solver.init_state(qp)
    st = solver.cold_start(qp, st)
    st = solver.step_jit(qp, st)
    assert int(st.iter) == 1
    assert bool(jnp.isfinite(st.test))
