"""General (unstructured) NLP programs over the dense QP path.

The reference runs stage-free problems (TP383, HS99, Maratos, CUTE
problems) through the same sparse Hqp_Program, with constraint parsing that
buckets min == max into equality rows and finite one-sided bounds into
inequality rows (hqp/Hqp_Docp.C:368-444 parse_constr; Prg_CUTE.C for the
general NLP front).  Here the same parsing builds a :class:`DenseQP` whose
row structure is fixed at setup (static shapes), and derivatives come from
``jax.grad`` / ``jax.jacobian``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.qp.program import DenseQP


class Nlp:
    """Subclass and override: n, setup_vars(), f0(x), c(x).

    Constraint convention (two-sided at the user level, like
    Omu_VariableVec min/max):  c_min <= c(x) <= c_max, x_min <= x <= x_max;
    min == max rows become equality rows, exactly like the reference's
    parse_constr buckets.
    """

    n: int = 0
    m: int = 0  # number of user constraint functions

    name = "Nlp"

    # value-based jit identity (same contract as Docp._static_config):
    # programs ride as static arguments of their jitted evaluators; with
    # identity hashing every fresh instance of the same problem
    # re-traces and re-compiles them (measured: ~6 s of re-compiles per
    # warm lqblend n=2000 solve through fresh instances)
    _trace_nonce = 0

    def _static_config(self):
        return None

    def __hash__(self):
        c = self._static_config()
        return object.__hash__(self) if c is None else \
            hash((type(self), c, self._trace_nonce))

    def __eq__(self, other):
        c = self._static_config()
        if c is None:
            return self is other
        return type(other) is type(self) and \
            other._static_config() == c and \
            other._trace_nonce == self._trace_nonce

    def setup_vars(self):
        return {}

    def f0(self, x):
        raise NotImplementedError

    def c(self, x):
        return jnp.zeros((0,))

    # ------------------------------------------------------------------

    def setup(self):
        v = self.setup_vars()
        inf = np.inf

        def get(key, shape, default):
            a = v.get(key)
            if a is None:
                return np.full(shape, default, np.float64)
            return np.asarray(a, np.float64).reshape(shape)

        x_init = get("x_init", (self.n,), 0.0)
        x_min = get("x_min", (self.n,), -inf)
        x_max = get("x_max", (self.n,), inf)
        c_min = get("c_min", (self.m,), -inf)
        c_max = get("c_max", (self.m,), inf)

        # static row structure (parse_constr analog)
        self._vfix = np.where(np.isfinite(x_min) & (x_min == x_max))[0]
        self._vlb = np.where(np.isfinite(x_min) & (x_min != x_max))[0]
        self._vub = np.where(np.isfinite(x_max) & (x_min != x_max))[0]
        self._cfix = np.where(np.isfinite(c_min) & (c_min == c_max))[0]
        self._clb = np.where(np.isfinite(c_min) & (c_min != c_max))[0]
        self._cub = np.where(np.isfinite(c_max) & (c_min != c_max))[0]
        self._x_min, self._x_max = jnp.asarray(x_min), jnp.asarray(x_max)
        self._c_min, self._c_max = jnp.asarray(c_min), jnp.asarray(c_max)

        x0 = np.clip(x_init, np.where(np.isfinite(x_min), x_min, -inf),
                     np.where(np.isfinite(x_max), x_max, inf))
        return jnp.asarray(x0)

    @partial(jax.jit, static_argnums=0)
    def _eval(self, x):
        f = self.f0(x)
        cv = jnp.atleast_1d(self.c(x)) if self.m else jnp.zeros((0,))
        return f, cv

    @partial(jax.jit, static_argnums=0)
    def _derivs(self, x):
        g = jax.grad(self.f0)(x)
        J = (jax.jacobian(lambda xx: jnp.atleast_1d(self.c(xx)))(x)
             if self.m else jnp.zeros((0, self.n)))
        return g, J

    @partial(jax.jit, static_argnums=0)
    def _rows(self, x, cv, J):
        """Assemble equality/inequality rows from values + Jacobian."""
        n = self.n
        eye = jnp.eye(n)
        A = jnp.concatenate([eye[self._vfix], J[self._cfix]], axis=0)
        b = jnp.concatenate([x[self._vfix] - self._x_min[self._vfix],
                             cv[self._cfix] - self._c_min[self._cfix]])
        C = jnp.concatenate([
            eye[self._vlb], -eye[self._vub],
            J[self._clb], -J[self._cub]], axis=0)
        d = jnp.concatenate([
            x[self._vlb] - self._x_min[self._vlb],
            self._x_max[self._vub] - x[self._vub],
            cv[self._clb] - self._c_min[self._clb],
            self._c_max[self._cub] - cv[self._cub]])
        return A, b, C, d

    #: evaluation counters (prg_fbd_evals role)
    fbd_evals: int = 0
    grd_evals: int = 0

    def make_qp(self, x, Q=None):
        self.fbd_evals += 1
        self.grd_evals += 1
        f, cv = self._eval(x)
        g, J = self._derivs(x)
        A, b, C, d = self._rows(x, cv, J)
        if Q is None:
            Q = jnp.zeros((self.n, self.n))
        qp = DenseQP(
            Q=Q, c=g, A=A, b=b, C=C, d=d,
            eq_mask_=jnp.ones(A.shape[0], bool),
            ineq_mask_=jnp.ones(C.shape[0], bool),
        )
        return f, qp

    def update_fbd_qp(self, qp: DenseQP, x_old, x_new):
        """Fresh values, stale derivative rows (Hqp_SqpProgram::update_fbd)."""
        self.fbd_evals += 1
        f, cv = self._eval(x_new)
        # value rows from stale J rows are not recomputed; only offsets are
        n = self.n
        b = jnp.concatenate([x_new[self._vfix] - self._x_min[self._vfix],
                             cv[self._cfix] - self._c_min[self._cfix]])
        d = jnp.concatenate([
            x_new[self._vlb] - self._x_min[self._vlb],
            self._x_max[self._vub] - x_new[self._vub],
            cv[self._clb] - self._c_min[self._clb],
            self._c_max[self._cub] - cv[self._cub]])
        return f, dataclasses.replace(qp, b=b, d=d)

    @partial(jax.jit, static_argnums=0)
    def eval_grd_L(self, x, y, z):
        f, cv = self._eval(x)
        g, J = self._derivs(x)
        A, b, C, d = self._rows(x, cv, J)
        return g - A.T @ y - C.T @ z.g

    @partial(jax.jit, static_argnums=0)
    def eval_hess_blocks(self, x, y, z):
        """Exact Lagrangian Hessian (one block).  Variable-bound rows have
        zero curvature, so only c-rows contribute."""
        yc = y[len(self._vfix):]
        zc_lo = z.g[len(self._vlb) + len(self._vub):
                    len(self._vlb) + len(self._vub) + len(self._clb)]
        zc_up = z.g[len(self._vlb) + len(self._vub) + len(self._clb):]

        def lagr(xx):
            cv = jnp.atleast_1d(self.c(xx)) if self.m else jnp.zeros((0,))
            val = self.f0(xx)
            val = val - yc @ cv[self._cfix]
            val = val - zc_lo @ cv[self._clb] + zc_up @ cv[self._cub]
            return val

        H = jax.hessian(lagr)(x)
        return H[None]

    def split_blocks(self, vec):
        return vec[None]

    def q_to_blocks(self, Q):
        return Q[None]

    def q_from_blocks(self, Qb):
        return Qb[0]
