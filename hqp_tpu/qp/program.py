"""QP intermediate representations.

Two IRs replace the reference's single general-sparse ``Hqp_Program``
(hqp/Hqp_Program.h:33-65, min 1/2 x'Qx + c'x  s.t. Ax+b=0, Cx+d>=0):

* :class:`StageQP` -- the stage-structured (DOCP) QP.  The reference stores
  the block-banded structure inside general sparse matrices and later
  re-detects it (hqp/Hqp_IpLQDOCP.C:201-354 Get_Dim/Check_Structure); here the
  structure is explicit by construction: per-stage blocks live as
  ``[K, n, n]``-shaped HBM arrays (the TVECP/TMATP analog, hqp/t_mesch.h),
  variable bounds are diagonal box constraints rather than sparse rows, and
  the only hard equality constraints are the state transitions.  Fixed
  variables (min == max, the reference's _xu_eq bucket, hqp/Hqp_Docp.C:372)
  are tight box constraints handled by the interior point barrier.

* :class:`DenseQP` -- a dense general QP in exactly the reference's form,
  for NLP-style problems without stage structure (TP383, Maratos, HS99,
  CUTE-style), where genuine equality rows A are required.

Both provide the same protocol consumed by the IP solver
(:mod:`hqp_tpu.qp.mehrotra`): matvecs, one-sided inequality evaluation as a
pytree of constraint groups, masks, and data norms.  Padding is carried as
masks; padded variables are fixed to zero by tight bounds, padded rows are
masked out of every reduction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hqp_tpu.utils import masked as mk


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IneqGroups:
    """Pytree over the four one-sided inequality groups of a StageQP.

    box lower (v - lb >= 0), box upper (ub - v >= 0),
    general lower (Cv - d_lo >= 0), general upper (d_up - Cv >= 0).
    Used for constraint values, slacks w, multipliers z, masks, ...
    """

    bl: jnp.ndarray  # [K1, nv]
    bu: jnp.ndarray  # [K1, nv]
    gl: jnp.ndarray  # [K1, mc]
    gu: jnp.ndarray  # [K1, mc]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StageQP:
    """Stage-structured QP over variables v_k = (x_k, u_k), k = 0..K.

    minimize    sum_k 1/2 v_k' Q_k v_k + c_k' v_k
    subject to  A_k v_k - x_{k+1} + b_k = 0        k = 0..K-1   (dynamics)
                E_k v_k + e_k = 0                                (stage equality)
                lb_k <= v_k <= ub_k                              (box)
                d_lo_k <= C_k v_k <= d_up_k                      (general)

    Shapes: K1 = K + 1 stages, nv = nx + nu padded variables per stage.
    Stage K's u-components are padding (var_mask False) with lb = ub = 0.
    Infinite bounds mark absent constraints.

    The per-stage general equality rows E (masked by eqg_mask) are the
    role of the reference's stage-wise equality bucket eliminated by
    GE_QP inside the Riccati recursion (hqp/Hqp_IpLQDOCP.C:1377,
    meschach/addon_hqp.h:207-209; assembled by Hqp_Docp's parse_constr,
    hqp/Hqp_Docp.C:372).  E = None means no such rows (most programs).
    """

    Q: jnp.ndarray      # [K1, nv, nv] symmetric stage Hessian blocks
    c: jnp.ndarray      # [K1, nv]
    A: jnp.ndarray      # [K, nx, nv]  dynamics Jacobian [fx fu]
    b: jnp.ndarray      # [K, nx]
    lb: jnp.ndarray     # [K1, nv]
    ub: jnp.ndarray     # [K1, nv]
    C: jnp.ndarray      # [K1, mc, nv]
    d_lo: jnp.ndarray   # [K1, mc]
    d_up: jnp.ndarray   # [K1, mc]
    var_mask: jnp.ndarray  # [K1, nv] bool
    con_mask: jnp.ndarray  # [K1, mc] bool
    E: jnp.ndarray | None = None         # [K1, meq, nv]
    e: jnp.ndarray | None = None         # [K1, meq]
    eqg_mask: jnp.ndarray | None = None  # [K1, meq] bool

    # ---- static shape info -------------------------------------------------
    @property
    def K(self) -> int:
        return self.A.shape[0]

    @property
    def nx(self) -> int:
        return self.A.shape[1]

    @property
    def nv(self) -> int:
        return self.A.shape[2]

    @property
    def nu(self) -> int:
        return self.nv - self.nx

    @property
    def mc(self) -> int:
        return self.C.shape[1]

    @property
    def meq(self) -> int:
        return 0 if self.E is None else self.E.shape[1]

    def has_gen_eq(self) -> bool:
        """Static: does the program carry general stage equality rows?
        (decides the presence of the 'gen' key in the equality pytrees)."""
        return self.E is not None and self.E.shape[1] > 0

    # ---- masks -------------------------------------------------------------
    def fixed_mask(self) -> jnp.ndarray:
        """Variables with lb == ub: genuine equality constraints (the
        reference's _xu_eq bucket, hqp/Hqp_Docp.C:372), NOT box rows --
        tight two-sided inequalities have no strict interior and give the
        interior point a dual ray."""
        return (jnp.isfinite(self.lb) & jnp.isfinite(self.ub)
                & (self.lb == self.ub) & self.var_mask)

    def fixed_val(self) -> jnp.ndarray:
        return jnp.where(self.fixed_mask(), _z(self.lb), 0.0)

    def ineq_mask(self) -> IneqGroups:
        fix = self.fixed_mask()
        return IneqGroups(
            bl=jnp.isfinite(self.lb) & self.var_mask & ~fix,
            bu=jnp.isfinite(self.ub) & self.var_mask & ~fix,
            gl=jnp.isfinite(self.d_lo) & self.con_mask,
            gu=jnp.isfinite(self.d_up) & self.con_mask,
        )

    def eq_mask(self):
        out = {"dyn": jnp.ones_like(self.b, dtype=bool),
               "fix": self.fixed_mask()}
        if self.has_gen_eq():
            out["gen"] = self.eqg_mask
        return out

    def x_mask(self) -> jnp.ndarray:
        """Mask of existing variables.  var_mask == False components are
        STRUCTURALLY absent (padding, or variables pinned to statically
        known fixed values by the program layer): their steps are exactly
        zero and their stationarity rows are excluded from all norms (the
        role of the reference's per-stage variable allocation,
        hqp/Hqp_Docp.C:324 alloc_vars)."""
        return self.var_mask

    def A_masked(self):
        """Dynamics Jacobian with absent-variable columns zeroed."""
        return self.A * self.var_mask[:-1, None, :]

    def xcoupling_mask(self):
        """Mask of the -I next-state coupling (x-part of stages 1..K)."""
        return self.var_mask[1:, : self.nx]

    # ---- linear algebra ----------------------------------------------------
    def matvec_Q(self, v):
        return jnp.einsum("kij,kj->ki", self.Q, v)

    def eval_eq(self, v):
        """Equality groups: dynamics A_k v_k - x_{k+1} + b_k, fixed
        variables v_i - t_i, and general stage rows E_k v_k + e_k
        (all in 'Ax + b' form)."""
        Av = jnp.einsum("kij,kj->ki", self.A, v[:-1])
        fix = self.fixed_mask()
        out = {"dyn": Av - v[1:, : self.nx] + self.b,
               "fix": jnp.where(fix, v - self.fixed_val(), 0.0)}
        if self.has_gen_eq():
            Ev = jnp.einsum("kij,kj->ki", self.E, v)
            out["gen"] = jnp.where(self.eqg_mask, Ev + self.e, 0.0)
        return out

    def matvec_eqT(self, y):
        """Adjoint of eval_eq's linear part into variable space [K1, nv]."""
        out = jnp.zeros_like(self.c)
        yd = y["dyn"]
        out = out.at[:-1].add(jnp.einsum("kij,ki->kj", self.A, yd))
        out = out.at[1:, : self.nx].add(-yd)
        out = out + jnp.where(self.fixed_mask(), y["fix"], 0.0)
        if self.has_gen_eq():
            yg = jnp.where(self.eqg_mask, y["gen"], 0.0)
            out = out + jnp.einsum("kij,ki->kj", self.E, yg)
        return out

    def matvec_ineq(self, v) -> IneqGroups:
        Cv = jnp.einsum("kij,kj->ki", self.C, v)
        return IneqGroups(bl=v, bu=-v, gl=Cv, gu=-Cv)

    def matvec_ineqT(self, z: IneqGroups):
        # mask out sentinel values carried in invalid entries (the IP keeps
        # masked z/w at 1.0 to stay strictly positive)
        m = self.ineq_mask()
        zbl = jnp.where(m.bl, z.bl, 0.0)
        zbu = jnp.where(m.bu, z.bu, 0.0)
        zg = jnp.where(m.gl, z.gl, 0.0) - jnp.where(m.gu, z.gu, 0.0)
        return (zbl - zbu) + jnp.einsum("kij,ki->kj", self.C, zg)

    def eval_ineq(self, v) -> IneqGroups:
        """One-sided constraint values 'Cv + d' per group (>= 0 feasible)."""
        Cv = jnp.einsum("kij,kj->ki", self.C, v)
        return IneqGroups(
            bl=v - _z(self.lb), bu=_z(self.ub) - v,
            gl=Cv - _z(self.d_lo), gu=_z(self.d_up) - Cv,
        )

    def ineq_offsets(self) -> IneqGroups:
        """One-sided 'd' offsets (for the duality gap z'd term)."""
        return IneqGroups(
            bl=-_z(self.lb), bu=_z(self.ub), gl=-_z(self.d_lo), gu=_z(self.d_up)
        )

    def eq_offsets(self):
        out = {"dyn": self.b,
               "fix": jnp.where(self.fixed_mask(), -self.fixed_val(), 0.0)}
        if self.has_gen_eq():
            out["gen"] = jnp.where(self.eqg_mask, self.e, 0.0)
        return out

    def norm_data(self):
        """max of infinity norms of Q, A, C, c, b, d (masked).

        Analog of the relative-termination scaling in
        hqp/Hqp_IpsMehrotra.C:459-461.
        """
        im = self.ineq_mask()
        terms = [
            jnp.max(jnp.abs(self.Q)),
            jnp.max(jnp.abs(self.A)) if self.A.size else 0.0,
            jnp.max(jnp.abs(self.C)) if self.C.size else 0.0,
            mk.norm_inf(self.c, self.var_mask),
            mk.norm_inf(self.b) if self.b.size else 0.0,
            mk.norm_inf(self.fixed_val(), self.fixed_mask()),
            mk.norm_inf(_z(self.lb), im.bl),
            mk.norm_inf(_z(self.ub), im.bu),
            mk.norm_inf(_z(self.d_lo), im.gl),
            mk.norm_inf(_z(self.d_up), im.gu),
        ]
        if self.has_gen_eq():
            terms.append(jnp.max(jnp.abs(
                self.E * self.eqg_mask[:, :, None])))
            terms.append(mk.norm_inf(self.e, self.eqg_mask))
        out = jnp.asarray(0.0)
        for t in terms:
            out = jnp.maximum(out, t)
        return jnp.maximum(out, 1e-10)

    def zero_x(self):
        return jnp.zeros_like(self.c)


def _z(a):
    """Replace +-inf by 0 (used where masked-out offsets must stay finite)."""
    return jnp.where(jnp.isfinite(a), a, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseIneq:
    """Single-group inequality pytree for DenseQP (one-sided, Cx + d >= 0)."""

    g: jnp.ndarray  # [mi]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseQP:
    """Dense general QP in the reference's notation (hqp/Hqp_Program.h):

    minimize    1/2 x'Qx + c'x
    subject to  Ax + b  = 0
                Cx + d >= 0

    Rows may be padding, marked by eq_mask_ / ineq_mask_.
    """

    Q: jnp.ndarray       # [n, n]
    c: jnp.ndarray       # [n]
    A: jnp.ndarray       # [me, n]
    b: jnp.ndarray       # [me]
    C: jnp.ndarray       # [mi, n]
    d: jnp.ndarray       # [mi]
    eq_mask_: jnp.ndarray    # [me] bool
    ineq_mask_: jnp.ndarray  # [mi] bool

    @property
    def n(self) -> int:
        return self.Q.shape[0]

    @property
    def me(self) -> int:
        return self.A.shape[0]

    @property
    def mi(self) -> int:
        return self.C.shape[0]

    @staticmethod
    def build(Q, c, A=None, b=None, C=None, d=None):
        n = Q.shape[0]
        A = jnp.zeros((0, n)) if A is None else jnp.asarray(A, jnp.float64)
        b = jnp.zeros((0,)) if b is None else jnp.asarray(b, jnp.float64)
        C = jnp.zeros((0, n)) if C is None else jnp.asarray(C, jnp.float64)
        d = jnp.zeros((0,)) if d is None else jnp.asarray(d, jnp.float64)
        return DenseQP(
            Q=jnp.asarray(Q, jnp.float64), c=jnp.asarray(c, jnp.float64),
            A=A, b=b, C=C, d=d,
            eq_mask_=jnp.ones(A.shape[0], dtype=bool),
            ineq_mask_=jnp.ones(C.shape[0], dtype=bool),
        )

    def x_mask(self):
        return jnp.ones_like(self.c, dtype=bool)

    def ineq_mask(self) -> DenseIneq:
        return DenseIneq(g=self.ineq_mask_)

    def eq_mask(self):
        return self.eq_mask_

    def matvec_Q(self, x):
        return self.Q @ x

    def eval_eq(self, x):
        return self.A @ x + self.b

    def matvec_eqT(self, y):
        return self.A.T @ jnp.where(self.eq_mask_, y, 0.0)

    def matvec_ineq(self, x) -> DenseIneq:
        return DenseIneq(g=self.C @ x)

    def matvec_ineqT(self, z: DenseIneq):
        return self.C.T @ jnp.where(self.ineq_mask_, z.g, 0.0)

    def eval_ineq(self, x) -> DenseIneq:
        return DenseIneq(g=self.C @ x + self.d)

    def ineq_offsets(self) -> DenseIneq:
        return DenseIneq(g=self.d)

    def eq_offsets(self):
        return self.b

    def norm_data(self):
        terms = [
            jnp.max(jnp.abs(self.Q)) if self.Q.size else 0.0,
            jnp.max(jnp.abs(self.A)) if self.A.size else 0.0,
            jnp.max(jnp.abs(self.C)) if self.C.size else 0.0,
            mk.norm_inf(self.c),
            mk.norm_inf(self.b, self.eq_mask_) if self.b.size else 0.0,
            mk.norm_inf(self.d, self.ineq_mask_) if self.d.size else 0.0,
        ]
        out = jnp.asarray(0.0)
        for t in terms:
            out = jnp.maximum(out, t)
        return jnp.maximum(out, 1e-10)

    def zero_x(self):
        return jnp.zeros_like(self.c)
