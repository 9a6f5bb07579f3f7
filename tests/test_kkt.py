"""Kernel-level tests: Riccati KKT backend vs dense full-KKT oracle.

Mirrors the rebuild test strategy of SURVEY.md section 4: factorization
kernels are verified against a dense reference solve (the role the torture
tests play for meschach, and FullSpLU plays for LQDOCP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401  (enables x64)
from hqp_tpu.qp.program import StageQP, IneqGroups
from hqp_tpu.qp.kkt import RiccatiKKT, FullStageKKT


def random_stage_qp(K=7, nx=3, nu=2, mc=2, seed=0):
    rng = np.random.default_rng(seed)
    K1, nv = K + 1, nx + nu
    M = rng.standard_normal((K1, nv, nv))
    Q = 0.5 * (M + np.swapaxes(M, 1, 2)) + 3.0 * np.eye(nv)
    c = rng.standard_normal((K1, nv))
    A = rng.standard_normal((K, nx, nv)) * 0.5
    b = rng.standard_normal((K, nx)) * 0.1
    lb = np.full((K1, nv), -np.inf)
    ub = np.full((K1, nv), np.inf)
    lb[:, :nx] = -2.0 - rng.random((K1, nx))
    ub[:, :nx] = 2.0 + rng.random((K1, nx))
    lb[:K, nx:] = -1.0
    ub[:K, nx:] = 1.0
    lb[K, nx:] = ub[K, nx:] = 0.0  # padded terminal controls
    var_mask = np.ones((K1, nv), bool)
    var_mask[K, nx:] = False
    if mc == 0:
        # mc = 0 programs carry one masked-off padding row (zero-size
        # buffers are never built; matches hqp_tpu.docp.Docp.setup)
        C = np.zeros((K1, 1, nv))
        d_lo = np.full((K1, 1), -np.inf)
        d_up = np.full((K1, 1), np.inf)
        con_mask = np.zeros((K1, 1), bool)
    else:
        C = rng.standard_normal((K1, mc, nv)) * 0.3
        C[K, :, nx:] = 0.0  # no terminal control coupling
        d_lo = np.full((K1, mc), -np.inf)
        d_up = 1.0 + rng.random((K1, mc))
        con_mask = np.ones((K1, mc), bool)
    return StageQP(
        Q=jnp.asarray(Q), c=jnp.asarray(c), A=jnp.asarray(A),
        b=jnp.asarray(b), lb=jnp.asarray(lb), ub=jnp.asarray(ub),
        C=jnp.asarray(C), d_lo=jnp.asarray(d_lo), d_up=jnp.asarray(d_up),
        var_mask=jnp.asarray(var_mask), con_mask=jnp.asarray(con_mask),
    )


def random_zw(qp, seed=1):
    rng = np.random.default_rng(seed)
    mask = qp.ineq_mask()

    def mkzw(m):
        a = rng.random(m.shape) + 0.5
        return jnp.asarray(np.where(m, a, 1.0))

    z = IneqGroups(*[mkzw(np.asarray(getattr(mask, f)))
                     for f in ("bl", "bu", "gl", "gu")])
    w = IneqGroups(*[mkzw(np.asarray(getattr(mask, f)))
                     for f in ("bl", "bu", "gl", "gu")])
    return z, w, mask


def random_rhs(qp, seed=2):
    rng = np.random.default_rng(seed)
    mask = qp.ineq_mask()
    r1 = jnp.asarray(rng.standard_normal(qp.c.shape))
    fm = np.asarray(qp.fixed_mask())
    r2 = {"dyn": jnp.asarray(rng.standard_normal(qp.b.shape)),
          "fix": jnp.asarray(np.where(fm, rng.standard_normal(fm.shape),
                                      0.0))}

    def mkr(m):
        return jnp.asarray(np.where(m, rng.standard_normal(m.shape), 0.0))

    r3 = IneqGroups(*[mkr(np.asarray(getattr(mask, f)))
                      for f in ("bl", "bu", "gl", "gu")])
    r4 = IneqGroups(*[mkr(np.asarray(getattr(mask, f)))
                      for f in ("bl", "bu", "gl", "gu")])
    return r1, r2, r3, r4


@pytest.mark.parametrize("K,nx,nu,mc", [(7, 3, 2, 2), (1, 2, 1, 1),
                                        (12, 4, 1, 0)])
def test_riccati_matches_dense(K, nx, nu, mc):
    qp = random_stage_qp(K, nx, nu, mc)
    z, w, mask = random_zw(qp)
    r1, r2, r3, r4 = random_rhs(qp)

    ric = RiccatiKKT()
    full = FullStageKKT()

    fr = ric.factor(qp, z, w, mask)
    dx_r, dy_r, dz_r, dw_r = ric.solve(fr, qp, z, w, mask, r1, r2, r3, r4)

    ff = full.factor(qp, z, w, mask)
    dx_f, dy_f, dz_f, dw_f = full.solve(ff, qp, z, w, mask, r1, r2, r3, r4)

    np.testing.assert_allclose(np.asarray(dx_r), np.asarray(dx_f),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dy_r["dyn"]),
                               np.asarray(dy_f["dyn"]),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dy_r["fix"]),
                               np.asarray(dy_f["fix"]),
                               rtol=1e-8, atol=1e-8)
    for f in ("bl", "bu", "gl", "gu"):
        np.testing.assert_allclose(np.asarray(getattr(dz_r, f)),
                                   np.asarray(getattr(dz_f, f)),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(getattr(dw_r, f)),
                                   np.asarray(getattr(dw_f, f)),
                                   rtol=1e-8, atol=1e-8)


def test_riccati_residual():
    """The Riccati solution satisfies the reduced KKT equations."""
    qp = random_stage_qp(9, 3, 2, 2, seed=5)
    z, w, mask = random_zw(qp, seed=6)
    r1, r2, r3, r4 = random_rhs(qp, seed=7)
    ric = RiccatiKKT()
    fr = ric.factor(qp, z, w, mask)
    dx, dy, dz, dw = ric.solve(fr, qp, z, w, mask, r1, r2, r3, r4)

    # row 1: -Q dx + A' dy + C' dz = r1 (on existing variables; absent
    # padded variables have identity rows pinning their step to zero)
    res1 = (-qp.matvec_Q(dx) + qp.matvec_eqT(dy)
            + qp.matvec_ineqT(dz)) - r1
    res1 = jnp.where(qp.x_mask(), res1, 0.0)
    assert float(jnp.max(jnp.abs(res1))) < 1e-8
    # row 2: A dx = r2  (linear part of eval_eq, both equality groups)
    ev = qp.eval_eq(dx)
    off = qp.eq_offsets()
    res2d = (ev["dyn"] - off["dyn"]) - r2["dyn"]
    assert float(jnp.max(jnp.abs(res2d))) < 1e-8
    fm = np.asarray(qp.fixed_mask())
    res2f = np.where(fm, np.asarray(ev["fix"] - off["fix"] - r2["fix"]), 0.0)
    assert np.max(np.abs(res2f)) < 1e-8
    # rows 3-4 on valid entries
    Cdx = qp.matvec_ineq(dx)
    for f in ("bl", "bu", "gl", "gu"):
        m = np.asarray(getattr(mask, f))
        r3f = np.asarray(getattr(r3, f))
        r4f = np.asarray(getattr(r4, f))
        res3 = np.asarray(getattr(Cdx, f)) - np.asarray(getattr(dw, f)) - r3f
        res4 = (np.asarray(getattr(w, f)) * np.asarray(getattr(dz, f))
                + np.asarray(getattr(z, f)) * np.asarray(getattr(dw, f))
                - r4f)
        assert np.max(np.abs(np.where(m, res3, 0.0))) < 1e-8
        assert np.max(np.abs(np.where(m, res4, 0.0))) < 1e-8
