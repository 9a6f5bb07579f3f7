"""Diagnostics parity: derivative checker, QP dumps, multiplier estimate.

* :func:`prg_test` -- finite-difference check of a program's first
  derivatives at the current iterate, the role of
  ``Hqp_SqpProgram::test`` exposed as the Tcl command ``prg_test``
  (hqp/Hqp_SqpProgram.C:116-186: compares analytic c, A, C against
  central differences and errors out above a tolerance).
* :func:`qp_dump` / :func:`qp_load` -- serialize the current QP
  linearization for offline analysis (``Hqp_SqpProgram::qp_dump``,
  hqp/Hqp_SqpProgram.C:188; LQDOCP ``dump()``, Hqp_IpLQDOCP.C:593).
* :func:`est_y` -- least-squares estimate of the equality multipliers
  from the stationarity condition, the role of ``Hqp_HL::est_y``
  (hqp/Hqp_HL.C: solve min_y ||c - A' y|| through an RCM/BKP factor
  of the normal equations).  Here structure-agnostic: conjugate
  gradients on J J' y = J c using only the QP's equality matvecs, so
  the same code serves StageQP and DenseQP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.utils import masked as mk


# ---------------------------------------------------------------------------
# prg_test: finite-difference derivative checking
# ---------------------------------------------------------------------------

def prg_test(prg, v=None, n_probe: int = 8, h: float = 1e-6,
             tol: float = 1e-4, seed: int = 0):
    """Check the program's derivatives against central differences along
    random directions (directional probes instead of the reference's
    per-component sweep -- O(n_probe) evaluations at any size).

    Returns a dict {max_rel_err, probes, ok}; raises ValueError above
    ``tol`` like the reference's `error` return.
    """
    if v is None:
        v = prg.setup()
    f0, qp0 = prg.make_qp(v)
    rng = np.random.default_rng(seed)
    errs = []
    for _ in range(n_probe):
        d = rng.standard_normal(np.shape(v))
        d = jnp.asarray(d / (np.linalg.norm(d.ravel()) + 1e-300))
        fp, qpp = prg.update_fbd_qp(qp0, v, v + h * d)
        fm, qpm = prg.update_fbd_qp(qp0, v, v - h * d)

        # objective gradient: c'd vs (f(v+hd) - f(v-hd)) / 2h
        fd_g = (fp - fm) / (2.0 * h)
        an_g = mk.inner(qp0.c, d)
        errs.append(_rel(an_g, fd_g))

        # equality rows: J d vs FD of the residual values at the iterate
        z0 = qp0.zero_x()
        an_e = _lin_eq(qp0, d)
        fd_e = mk.tmap(lambda a, b: (a - b) / (2.0 * h),
                       qpp.eval_eq(z0), qpm.eval_eq(z0))
        errs.append(_tree_rel(an_e, fd_e, qp0.eq_mask()))

        # inequality rows: group VALUES at the iterate (their per-group
        # signs match matvec_ineq's convention; raw offsets do not)
        an_i = qp0.matvec_ineq(d)
        fd_i = mk.tmap(lambda a, b: (a - b) / (2.0 * h),
                       qpp.eval_ineq(z0), qpm.eval_ineq(z0))
        errs.append(_tree_rel(an_i, fd_i, qp0.ineq_mask()))

    max_err = float(max(errs))
    out = {"max_rel_err": max_err, "probes": n_probe, "ok": max_err < tol}
    if not out["ok"]:
        raise ValueError(
            f"prg_test: derivative check failed, max relative error "
            f"{max_err:.3e} > {tol:.1e} (Hqp_SqpProgram::test role)")
    return out


def _rel(a, b, floor=1e-6):
    a = float(a)
    b = float(b)
    return abs(a - b) / max(abs(a), abs(b), floor)


def _tree_rel(an, fd, mask, floor=1e-6):
    num = mk.norm_inf(mk.tmap(lambda x, y: x - y, an, fd), mask)
    den = jnp.maximum(jnp.maximum(mk.norm_inf(an, mask),
                                  mk.norm_inf(fd, mask)), floor)
    return float(num / den)


def _lin_eq(qp, d):
    """Linear part of the equality rows applied to d."""
    e1 = qp.eval_eq(qp.zero_x() + d)
    e0 = qp.eval_eq(qp.zero_x())
    return mk.tmap(lambda a, b: a - b, e1, e0)


# ---------------------------------------------------------------------------
# qp_dump / qp_load
# ---------------------------------------------------------------------------

def qp_dump(qp, path: str):
    """Write every array field of the QP dataclass to an ``.npz``."""
    import dataclasses
    fields = {}
    for f in dataclasses.fields(qp):
        val = getattr(qp, f.name)
        if val is not None:
            fields[f.name] = np.asarray(val)
    np.savez(path, __type__=type(qp).__name__, **fields)


def qp_load(path: str):
    """Re-create the dumped QP object."""
    from hqp_tpu.qp import program as qprog
    data = dict(np.load(path, allow_pickle=False))
    tname = str(data.pop("__type__"))
    cls = getattr(qprog, tname)
    return cls(**{k: jnp.asarray(v) for k, v in data.items()})


# ---------------------------------------------------------------------------
# est_y: least-squares multiplier initialization
# ---------------------------------------------------------------------------

def est_y(qp, g=None, iters: int = 40, reg: float = 1e-10):
    """Least-squares equality multipliers: argmin_y ||g - J' y||^2,
    solved by conjugate gradients on (J J' + reg) y = J g where J is the
    equality-row operator (dynamics + fixed + general stage rows for a
    StageQP; the A rows of a DenseQP).  g defaults to the QP gradient c.

    Role of Hqp_HL::est_y (hqp/Hqp_HL.C), used to initialize multipliers
    before the first Hessian scale estimate (`sqp_hela init_multipliers`).
    """
    if g is None:
        g = qp.c
    emask = qp.eq_mask()

    xmask = qp.x_mask()

    def J(v):
        return _lin_eq(qp, jnp.where(xmask, v, 0.0))

    def JT(y):
        return jnp.where(xmask,
                         qp.matvec_eqT(mk.where(emask, y, 0.0)), 0.0)

    def Aop(y):
        return mk.tmap(lambda a, b: a + reg * b, J(JT(y)), y)

    b = J(jnp.where(qp.x_mask(), g, 0.0))
    y = mk.fill(qp.eq_offsets(), 0.0)
    r = mk.tmap(lambda bi, ai: bi - ai, b, Aop(y))
    r = mk.where(emask, r, 0.0)
    p = r
    rs = mk.inner(r, r, emask)
    for _ in range(iters):
        Ap = mk.where(emask, Aop(p), 0.0)
        denom = mk.inner(p, Ap, emask)
        alpha = jnp.where(denom > 0.0, rs / jnp.maximum(denom, 1e-300),
                          0.0)
        y = mk.tmap(lambda yi, pi: yi + alpha * pi, y, p)
        r = mk.tmap(lambda ri, api: ri - alpha * api, r, Ap)
        rs_new = mk.inner(r, r, emask)
        beta = jnp.where(rs > 0.0, rs_new / jnp.maximum(rs, 1e-300), 0.0)
        p = mk.tmap(lambda ri, pi: ri + beta * pi, r, p)
        rs = rs_new
    return mk.where(emask, y, 0.0)
