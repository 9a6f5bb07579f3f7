"""Partitioned Schur-complement backend vs the dense full-KKT oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.qp.kkt import FullStageKKT
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from tests.test_kkt import random_stage_qp, random_zw, random_rhs


@pytest.mark.parametrize("K,nx,nu,mc,L", [
    (8, 3, 2, 2, 4),
    (12, 2, 1, 1, 3),
    (6, 2, 2, 0, 6),    # single partition
    (5, 3, 1, 1, 1),    # L = 1 (every stage a partition)
    (10, 2, 1, 0, 4),   # L does not divide K -> falls back to L = 2
])
def test_partitioned_matches_dense(K, nx, nu, mc, L):
    qp = random_stage_qp(K, nx, nu, mc, seed=K + L)
    z, w, mask = random_zw(qp, seed=1)
    r1, r2, r3, r4 = random_rhs(qp, seed=2)

    part = PartitionedKKT(L=L)
    full = FullStageKKT()

    fp = part.factor(qp, z, w, mask)
    dx_p, dy_p, dz_p, dw_p = part.solve(fp, qp, z, w, mask, r1, r2, r3, r4)

    ff = full.factor(qp, z, w, mask)
    dx_f, dy_f, dz_f, dw_f = full.solve(ff, qp, z, w, mask, r1, r2, r3, r4)

    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_f),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dy_p["dyn"]),
                               np.asarray(dy_f["dyn"]),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dy_p["fix"]),
                               np.asarray(dy_f["fix"]),
                               rtol=1e-7, atol=1e-7)
    for f in ("bl", "bu", "gl", "gu"):
        np.testing.assert_allclose(np.asarray(getattr(dz_p, f)),
                                   np.asarray(getattr(dz_f, f)),
                                   rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("fd", ["f32", "f64"])
def test_factor_dtype_override(fd):
    """factor_dtype pins the factor precision per instance: "f64" is the
    near-exact path (usable on TPU via the pure-jnp unrolled interior LU,
    ops/smalllin.inv_nopiv); "f32" reproduces the TPU mixed-precision
    layering on any host.  Both must match the dense oracle."""
    qp = random_stage_qp(10, 2, 1, 1, seed=3)
    z, w, mask = random_zw(qp, seed=4)
    r1, r2, r3, r4 = random_rhs(qp, seed=5)

    part = PartitionedKKT(L=5, factor_dtype=fd)
    fp = part.factor(qp, z, w, mask)
    dx_p, dy_p, dz_p, dw_p = part.solve(fp, qp, z, w, mask,
                                        r1, r2, r3, r4)
    full = FullStageKKT()
    ff = full.factor(qp, z, w, mask)
    dx_f, *_ = full.solve(ff, qp, z, w, mask, r1, r2, r3, r4)
    tol = 1e-7 if fd == "f64" else 2e-5
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_f),
                               rtol=tol, atol=tol)
